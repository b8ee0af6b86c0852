"""Dense-grid coordinate index: O(1) kernel-map lookups.

Motivation (measured on the target TPU through this harness): XLA gathers are
the pipeline bottleneck and their rate collapses with table size (~40M/s into
a 67 MB table vs ~150M/s into a ≤10 MB one), so the binary-search kernel maps
(34 dependent gathers per query) would dominate the forward pass and even a
flat dense int32 row grid (256³ = 67 MB) pays the slow-table rate on every
query.

The index is therefore **bit-packed**: per level, a z-bitmask occupancy table
plus an exclusive prefix-popcount ("rank") per 32-cell word,

    word w = (b, cx, cy, cz >> 5)   bits[w] bit (cz & 31) = occupied
    rank[w] = # occupied cells in words before w (scan order)

Because level tables are kept in grid-scan order (= the SparseVoxels key
order: lexicographic (batch, x, y, z)), the row index of an occupied cell is
exactly ``rank[w] + popcount(bits[w] & below_bit)`` — no row grid at all.
One [W,4] row-gather (bits of w and w+1, ranks of both) answers a whole
column of kernel offsets (δz ∈ [-r, r] shares the 5-bit z-window), so a k³
kernel map costs k² row-gathers per point instead of k³ scalar gathers, into
a table ~32x smaller: measured ~5-8x faster kernel maps end-to-end.

Static grid extents come from the dataset config (3DMatch: 256³ cells @2.5 cm
= 6.4 m span; KITTI: 704x704x128 @30 cm = 211x211x38 m). Fragments larger
than the extent fall back to the binary-search maps (imfnet_tpu.sparse
.kernel_map) — same interface, same results.

Preconditions for the rank trick (guaranteed by `quantize_grid` and
`build.from_numpy`, asserted host-side via `fits_grid`): level-0 valid rows
are unique, within the static extent, and in scan order.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.sparse.coords import PAD_COORD
from imfnet_tpu.sparse.kernel_map import CoordinatePyramid, LevelMaps


class GridSpec(NamedTuple):
    """Static grid extents in stride-1 voxel cells."""

    extent: Tuple[int, int, int] = (256, 256, 256)
    num_batches: int = 2

    def level_dims(self, level: int) -> Tuple[int, int, int]:
        return tuple(-(-e // (1 << level)) for e in self.extent)


def batch_origins(coords: jax.Array, valid: jax.Array, num_batches: int) -> jax.Array:
    """Per-batch minimum voxel coordinate, int32[num_batches, 3].

    num_batches is small and static, so B masked min-reductions beat a
    scatter-min (profiled ~10x faster on the raw-point count)."""
    big = jnp.int32(1 << 20)
    vals = jnp.where(valid[:, None], coords[:, 1:], big)
    mins = [
        jnp.min(jnp.where((coords[:, :1] == b) & valid[:, None], vals, big),
                axis=0)
        for b in range(num_batches)
    ]
    return jnp.stack(mins)


def origin_lookup(origins: jax.Array, b: jax.Array) -> jax.Array:
    """Row lookup into the tiny [num_batches, 3] origin table WITHOUT a
    gather. XLA lowers ``jnp.take(origins, b)`` to a per-row gather —
    ~13 ns/row at raw-point counts, which made the origin shift the single
    largest cost of quantize keyprep (8.1 ms of a ~10 ms quantize,
    scripts_dev/profile_quant3.py). A static select chain over the batch
    count is pure elementwise VPU work. Semantics match take's index
    clamping for this table: out-of-range batch (pad rows, PAD_COORD < 0)
    resolves to origins[0]; such rows are always masked downstream."""
    num_batches = origins.shape[0]
    out = jnp.broadcast_to(origins[0], (*b.shape, origins.shape[1]))
    for i in range(1, num_batches):
        out = jnp.where((b == i)[..., None], origins[i], out)
    return out


def _cells(coords: jax.Array, level: int) -> jax.Array:
    """Voxel coords → level-l cell indices (arithmetic shift floors)."""
    return coords >> level


def build_grid(
    coords: jax.Array,      # int32[N,4] at tensor stride 2^level (multiples)
    valid: jax.Array,
    origins: jax.Array,     # int32[B,3] stride-1 voxel mins (shared all levels)
    spec: GridSpec,
    level: int,
) -> jax.Array:
    """Flat int32 grid of row indices (-1 empty), shape [B*X*Y*Z]."""
    X, Y, Z = spec.level_dims(level)
    B = spec.num_batches
    b = jnp.minimum(coords[:, 0], B - 1)
    o = _cells(origin_lookup(origins, jnp.maximum(b, 0)), level)
    c = _cells(coords[:, 1:], level) - o
    in_range = (
        valid
        & (c >= 0).all(axis=1)
        & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z)
    )
    flat = ((b * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2]
    flat = jnp.where(in_range, flat, B * X * Y * Z)
    n = coords.shape[0]
    sentinel = jnp.int32(0x7FFFFFFF)
    grid = jnp.full((B * X * Y * Z + 1,), sentinel, jnp.int32)
    # min → deterministic first-occurrence winner under duplicate cells
    grid = grid.at[flat].min(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return jnp.where(grid[:-1] == sentinel, -1, grid[:-1])


def grid_lookup(
    grid: jax.Array,
    origins: jax.Array,
    queries: jax.Array,      # int32[Q,4] voxel-space query coords
    q_valid: jax.Array,
    spec: GridSpec,
    level: int,
    check_alignment: bool = False,
) -> jax.Array:
    """Row index per query or -1. One gather per query."""
    X, Y, Z = spec.level_dims(level)
    B = spec.num_batches
    b = jnp.clip(queries[:, 0], 0, B - 1)
    o = _cells(origin_lookup(origins, b), level)
    qc = queries[:, 1:]
    if check_alignment:
        # transpose-conv queries may be off the coarse lattice → no match
        aligned = ((qc & ((1 << level) - 1)) == 0).all(axis=1)
    else:
        aligned = jnp.bool_(True)
    c = _cells(qc, level) - o
    ok = (
        q_valid
        & aligned
        & (c >= 0).all(axis=1)
        & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z)
    )
    flat = ((b * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2]
    flat = jnp.where(ok, flat, 0)
    hit = grid.at[flat].get(mode="promise_in_bounds")
    return jnp.where(ok, hit, -1)


def _offset_map(grid, origins, coords, valid, offsets: np.ndarray, spec, level,
                check_alignment=False):
    """nbr[N, K] via one batched grid lookup over all offsets (row-grid path,
    kept for quantize-time self-lookups and as a simple oracle)."""
    offs = jnp.asarray(offsets, jnp.int32)  # [K,3]
    n = coords.shape[0]
    k = offs.shape[0]
    q = jnp.broadcast_to(coords[:, None, 1:], (n, k, 3)) + offs[None, :, :]
    qb = jnp.broadcast_to(coords[:, None, :1], (n, k, 1))
    queries = jnp.concatenate([qb, q], axis=2).reshape(n * k, 4)
    q_valid = jnp.repeat(valid, k)
    nbr = grid_lookup(grid, origins, queries, q_valid, spec, level,
                      check_alignment=check_alignment)
    return nbr.reshape(n, k)


# ---------------------------------------------------------------------------
# Bit-packed occupancy + rank index (the fast kernel-map path)
# ---------------------------------------------------------------------------

HALO = 2  # cells of slack on every axis: offset queries never bounds-check


class PackedLevel(NamedTuple):
    """Packed occupancy index of one level's coordinate table.

    table[W, 4] int32: (bits[w], bits[w+1], rank[w], rank[w+1]) where w+1
    entries are zeroed/duplicated at z-column boundaries so a 2-word window
    never reads a neighboring (x, y) column.
    """

    table: jax.Array
    dims: Tuple[int, int, int, int]  # (X, Y, Zc, Zw) halo'd cell dims


def _packed_dims(spec: GridSpec, level: int) -> Tuple[int, int, int, int]:
    e = spec.level_dims(level)
    x, y, zc = e[0] + 2 * HALO, e[1] + 2 * HALO, e[2] + 2 * HALO
    zw = -(-zc // 32)
    return x, y, zc, zw


def _rel_cells(coords: jax.Array, origins: jax.Array, level: int,
               num_batches: int):
    """(b, rel_cell[N,3]) of each row at ``level`` in the halo'd grid."""
    b = jnp.clip(coords[:, 0], 0, num_batches - 1)
    o = origin_lookup(origins, b) >> level
    c = (coords[:, 1:] >> level) - o + HALO
    return b, c


def _exclusive_cumsum(x: jax.Array, chunk: int = 512) -> jax.Array:
    """Exclusive prefix sum via a 2-D decomposition (a flat 1-D cumsum over
    ~600k elements is a long latency-bound scan on TPU; row-wise cumsum over
    [W/chunk, chunk] vectorizes across sublanes)."""
    w = x.shape[0]
    pad = (-w) % chunk
    x2 = jnp.pad(x, (0, pad)).reshape(-1, chunk)
    within = jnp.cumsum(x2, axis=1)
    row_tot = within[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    out = within - x2 + row_off[:, None]
    return out.reshape(-1)[:w]


def pack_words(
    coords: jax.Array,    # int32[N,4] unique rows (any order, in extent)
    valid: jax.Array,
    origins: jax.Array,   # int32[B,3] stride-1 voxel mins
    spec: GridSpec,
    level: int,
):
    """(bits uint32[W], rank int32[W]) occupancy words + exclusive prefix
    popcount in scan order. Rows must be cell-unique (duplicate rows would
    carry into neighboring bits)."""
    x_d, y_d, zc_d, zw_d = _packed_dims(spec, level)
    num_w = spec.num_batches * x_d * y_d * zw_d
    b, c = _rel_cells(coords, origins, level, spec.num_batches)
    in_r = (
        valid
        & (c >= 0).all(axis=1)
        & (c[:, 0] < x_d) & (c[:, 1] < y_d) & (c[:, 2] < zc_d)
    )
    w = ((b * x_d + c[:, 0]) * y_d + c[:, 1]) * zw_d + (c[:, 2] >> 5)
    w = jnp.where(in_r, w, num_w)
    bit = (c[:, 2] & 31).astype(jnp.uint32)
    bits = jnp.zeros((num_w + 1,), jnp.uint32).at[w].add(
        jnp.uint32(1) << bit, mode="drop")[:num_w]
    pc = jax.lax.population_count(bits).astype(jnp.int32)
    rank = _exclusive_cumsum(pc)
    return bits, rank


def scan_position(
    bits: jax.Array, rank: jax.Array,
    coords: jax.Array, valid: jax.Array,
    origins: jax.Array, spec: GridSpec, level: int,
) -> jax.Array:
    """Scan-order position of each row's own cell (-1 if absent/out-of-extent).
    The compaction primitive behind scan-ordered level tables."""
    x_d, y_d, zc_d, zw_d = _packed_dims(spec, level)
    num_w = bits.shape[0]
    b, c = _rel_cells(coords, origins, level, spec.num_batches)
    in_r = (
        valid
        & (c >= 0).all(axis=1)
        & (c[:, 0] < x_d) & (c[:, 1] < y_d) & (c[:, 2] < zc_d)
    )
    w = ((b * x_d + c[:, 0]) * y_d + c[:, 1]) * zw_d + (c[:, 2] >> 5)
    w = jnp.clip(jnp.where(in_r, w, 0), 0, num_w - 1)
    # single row-gather for (bits, rank) — two separate 1-D takes over the
    # raw-point count profiled as one of the quantize hot spots
    table2 = jnp.stack([bits.astype(jnp.int32), rank], axis=1)
    br = jnp.take(table2, w, axis=0)
    bw = br[:, 0].astype(jnp.uint32)
    rk = br[:, 1]
    p = (c[:, 2] & 31).astype(jnp.uint32)
    exists = ((bw >> p) & 1).astype(bool)
    below = bw & ((jnp.uint32(1) << p) - 1)
    pos = rk + jax.lax.population_count(below).astype(jnp.int32)
    return jnp.where(in_r & exists, pos, -1)


def pack_level(
    coords: jax.Array,    # int32[N,4] level table (scan order, unique, in extent)
    valid: jax.Array,
    origins: jax.Array,   # int32[B,3] stride-1 voxel mins
    spec: GridSpec,
    level: int,
) -> PackedLevel:
    """Build the packed occupancy/rank index for one level table."""
    x_d, y_d, zc_d, zw_d = _packed_dims(spec, level)
    bits, rank = pack_words(coords, valid, origins, spec, level)
    num_w = bits.shape[0]
    pc = jax.lax.population_count(bits).astype(jnp.int32)
    # w+1 companions; zero bits at the last word of each z-column so the
    # 2-word window cannot leak into the next (x, y) column
    last_in_col = (jnp.arange(num_w, dtype=jnp.int32) % zw_d) == zw_d - 1
    bits1 = jnp.where(last_in_col, 0, jnp.roll(bits, -1))
    rank1 = jnp.roll(rank, -1).at[-1].set(rank[-1] + pc[-1])
    table = jnp.stack(
        [bits.astype(jnp.int32), bits1.astype(jnp.int32), rank, rank1], axis=1
    )
    return PackedLevel(table, (x_d, y_d, zc_d, zw_d))


def _window_rows(t4: jax.Array, zrel: jax.Array, zlo_w: jax.Array):
    """Row index / existence of cell with z-cell ``zrel`` given the gathered
    2-word window ``t4`` [N,4] anchored at word ``zlo_w``."""
    sel = (zrel >> 5) - zlo_w           # 0 or 1
    bits = jnp.where(sel == 0, t4[:, 0], t4[:, 1]).astype(jnp.uint32)
    rank = jnp.where(sel == 0, t4[:, 2], t4[:, 3])
    p = (zrel & 31).astype(jnp.uint32)
    exists = ((bits >> p) & 1).astype(bool)
    below = bits & ((jnp.uint32(1) << p) - 1)
    row = rank + jax.lax.population_count(below).astype(jnp.int32)
    return exists, row


def packed_offset_map(
    pt: PackedLevel,
    origins: jax.Array,
    coords: jax.Array,    # int32[N,4] query rows (at their own level's lattice)
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
    mode: str,            # 'same' | 'down' | 'up'
) -> jax.Array:
    """nbr[N, K] row indices into the packed level's table (K = kernel_size³,
    offsets in itertools.product order, -1 = absent).

    mode='same': queries on the table's own lattice, offsets of ±r cells.
    mode='down': queries at a coarser level gather from this finer table;
        offsets are ±r cells of the finer lattice (coarse coords are exact
        multiples, so cell arithmetic is linear).
    mode='up': queries at a finer level gather from this coarser table;
        target coords c + δ·t may be off the coarse lattice — parity decides
        both the cell (floor((m+δ)/2)) and existence (alignment).
    """
    x_d, y_d, _, zw_d = _packed_dims(spec, table_level)
    r = kernel_size // 2
    num_w = pt.table.shape[0]

    if mode == "up":
        # m = query coords on the FINE lattice (units of 2^(table_level-1));
        # kept absolute because (a-b)>>1 != (a>>1)-(b>>1) in general
        b = jnp.clip(coords[:, 0], 0, spec.num_batches - 1)
        m = coords[:, 1:] >> (table_level - 1)
        o_cell = origin_lookup(origins, b) >> table_level
        oc_off = HALO
    else:
        b, base = _rel_cells(coords, origins, table_level, spec.num_batches)

    base_ok = valid
    if mode != "up":
        x_hi, y_hi, zc_hi, _ = _packed_dims(spec, table_level)
        base_ok = (
            valid
            & (base >= r).all(axis=1)
            & (base[:, 0] < x_hi - r) & (base[:, 1] < y_hi - r)
            & (base[:, 2] < zc_hi - r)
        )

    cols = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            if mode == "up":
                cx = ((m[:, 0] + dx) >> 1) - o_cell[:, 0] + oc_off
                cy = ((m[:, 1] + dy) >> 1) - o_cell[:, 1] + oc_off
                zlo = ((m[:, 2] - r) >> 1) - o_cell[:, 2] + oc_off
                x_hi, y_hi, zc_hi, _ = _packed_dims(spec, table_level)
                ok_xy = (
                    valid
                    & (cx >= 0) & (cx < x_hi) & (cy >= 0) & (cy < y_hi)
                    & (zlo >= 0) & (zlo < zc_hi - 1)
                )
                ax = ((m[:, 0] + dx) & 1) == 0
                ay = ((m[:, 1] + dy) & 1) == 0
            else:
                cx = base[:, 0] + dx
                cy = base[:, 1] + dy
                zlo = base[:, 2] - r
                ok_xy = base_ok
            zlo_w = zlo >> 5
            w0 = ((b * x_d + cx) * y_d + cy) * zw_d + zlo_w
            w0 = jnp.where(ok_xy, w0, 0)
            w0 = jnp.clip(w0, 0, num_w - 1)
            t4 = jnp.take(pt.table, w0, axis=0)
            for dz in range(-r, r + 1):
                if mode == "up":
                    zrel = ((m[:, 2] + dz) >> 1) - o_cell[:, 2] + oc_off
                    aligned = ax & ay & (((m[:, 2] + dz) & 1) == 0)
                else:
                    zrel = base[:, 2] + dz
                    aligned = True
                exists, row = _window_rows(t4, zrel, zlo_w)
                ok = ok_xy & exists & aligned
                cols.append(jnp.where(ok, row, -1))
    return jnp.stack(cols, axis=1)


def quantize_grid(
    xyz: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    n_out: int,
    spec: GridSpec,
    batch_index: jax.Array | int = 0,
    compact_impl: str = "auto",
):
    """Sort-free voxel quantization via grid scatter-dedup (first-occurrence
    winner = min row, matching `ME.utils.sparse_quantize` semantics at
    `util/misc.py:83`). Points outside the grid extent are dropped — size
    extents to the dataset. Output rows are in **scan (key) order** —
    lexicographic (batch, x, y, z), the SparseVoxels contract — computed via
    the packed rank index rather than a sort.

    Implementation (this is the raw-point hot path, profiled on-chip): a
    single stable 2-key sort of (cell-key, z, row). Stability makes the first
    row of every equal-key run the min original row, run starts mark unique
    cells, and their exclusive-cumsum positions ARE the scan-order output
    slots. This replaced a dense-occupancy variant (byte scatter + packed
    bits + compact winner election, 16 ms) at ~10 ms for 512k rows — XLA's
    TPU sort at 3.8 ms beats the 6 ms dense scatter plus the per-row
    position gathers it needed.

    Returns (SparseVoxels, sel, xyz_down) like coords.quantize.
    """
    from imfnet_tpu.sparse.coords import SparseVoxels

    X, Y, Z = spec.extent
    B = spec.num_batches
    # the (b, x, y) sort key below must fit one int32
    assert B * X * Y < 2**31, (
        f"GridSpec extent {spec.extent} x {B} batches overflows the int32 "
        f"sort key (B*X*Y = {B * X * Y} >= 2^31); shrink grid_extent or batch"
    )
    n = xyz.shape[0]
    v = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    b = jnp.broadcast_to(jnp.asarray(batch_index, jnp.int32), (n,))
    coords4 = jnp.concatenate([b[:, None], v], axis=1)
    origins = batch_origins(coords4, valid, spec.num_batches)

    bb = jnp.minimum(coords4[:, 0], B - 1)
    c = coords4[:, 1:] - origin_lookup(origins, jnp.maximum(bb, 0))
    in_range = (
        valid
        & (coords4[:, 0] >= 0) & (coords4[:, 0] < B)
        & (c >= 0).all(axis=1)
        & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z)
    )
    big = jnp.int32(0x7FFFFFFF)
    rows = jnp.arange(n, dtype=jnp.int32)
    if B * X * Y * Z < 2**31:
        # full (b, x, y, z) cell id in ONE int32 key (both dataset extents
        # fit: 3DMatch 2*256^3=33.5M, KITTI 2*704*704*128=126.9M) — a 1-key
        # stable sort of 2 arrays beats the 2-key sort of 3 by ~10%
        # (scripts_dev/proto_quant_sort.py); sorted order IS scan order —
        # per-batch origins are constant shifts and preserve it
        key = jnp.where(in_range,
                        ((bb * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2], big)
        sh, sr = jax.lax.sort((key, rows), num_keys=1, is_stable=True)
        # "auto" stays on the XLA tail: the Pallas sorted_compact kernel is
        # exact but measured SLOWER end-to-end (8.9 vs 6.7 ms quantize at
        # bench shapes — 256 sequential grid steps with a [B,B] one-hot per
        # step vs XLA's 2.7 ms compaction scatter; profile_quant3.py). Kept
        # selectable + tested as the documented alternative.
        use_pallas = compact_impl == "pallas" and n % 2048 == 0
        if use_pallas:
            from imfnet_tpu.sparse.pallas_quant import sorted_compact

            sel_k, n_uniq = sorted_compact(
                sh, sr, n_out, interpret=compact_impl == "pallas"
                and jax.default_backend() != "tpu")
            ok = jnp.arange(n_out, dtype=jnp.int32) < n_uniq
            sel = jnp.where(ok, sel_k, -1)
            ss = jnp.where(ok, sel_k, 0)
            uniq = jnp.where(ok[:, None], jnp.take(coords4, ss, axis=0),
                             PAD_COORD)
            f = jnp.where(ok[:, None], jnp.take(feats, ss, axis=0), 0)
            xyz_down = jnp.where(ok[:, None], jnp.take(xyz, ss, axis=0),
                                 0.0)
            return SparseVoxels(uniq, f, n_uniq), sel, xyz_down
        first = (sh != big) & jnp.concatenate(
            [jnp.ones((1,), bool), sh[1:] != sh[:-1]])
    else:
        # huge configured extents: (b, x, y) key + z as a second sort key
        hi = jnp.where(in_range, (bb * X + c[:, 0]) * Y + c[:, 1], big)
        lo = jnp.where(in_range, c[:, 2], big)
        sh, sl, sr = jax.lax.sort((hi, lo, rows), num_keys=2, is_stable=True)
        first = (sh != big) & jnp.concatenate([
            jnp.ones((1,), bool),
            (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1]),
        ])
    pos = _exclusive_cumsum(first.astype(jnp.int32))
    slot = jnp.where(first & (pos < n_out), pos, n_out)
    sel_raw = jnp.full((n_out + 1,), big, jnp.int32).at[slot].set(
        sr, mode="drop")[:n_out]
    ok = sel_raw != big
    sel = jnp.where(ok, sel_raw, -1)
    ss = jnp.where(ok, sel_raw, 0)
    uniq = jnp.where(ok[:, None], jnp.take(coords4, ss, axis=0), PAD_COORD)
    f = jnp.where(ok[:, None], jnp.take(feats, ss, axis=0), 0)
    xyz_down = jnp.where(ok[:, None], jnp.take(xyz, ss, axis=0), 0.0)
    n_uniq = jnp.sum(ok.astype(jnp.int32))
    return SparseVoxels(uniq, f, n_uniq), sel, xyz_down


def fits_grid(coords_np: np.ndarray, valid_count: int, spec: GridSpec) -> bool:
    """Host-side check whether a batch fits the static extents."""
    c = coords_np[:valid_count]
    if len(c) == 0:
        return True
    span = c[:, 1:].max(0) - c[:, 1:].min(0) + 1
    return bool((span <= np.array(spec.extent)).all())


def build_pyramid_grid(
    coords: jax.Array,
    num_valid: jax.Array,
    *,
    spec: GridSpec,
    num_levels: int = 4,
    conv1_kernel_size: int = 5,
    level_capacity: Sequence[int] | None = None,
) -> CoordinatePyramid:
    """Packed-grid pyramid, drop-in for kernel_map.build_pyramid.

    Requires level-0 valid rows unique, in scan (key) order, and inside the
    static extent (`fits_grid` validates host-side; `quantize_grid` and
    `build.from_numpy` guarantee it). Points outside the extent get no
    neighbors. Downsampled tables are derived by sorted dedup — strided cells
    of a scan-ordered table are monotone, so first-occurrence dedup is a
    neighbor comparison, no grid or sort needed — and stay in scan order,
    keeping rows batch-contiguous and the rank==row invariant at every level.
    """
    n0 = coords.shape[0]
    if level_capacity is None:
        level_capacity = tuple(max(256, n0 >> i) for i in range(num_levels))

    valid0 = jnp.arange(n0) < num_valid
    origins = batch_origins(coords, valid0, spec.num_batches)

    # --- per-level coordinate tables: grid dedup + rank-ordered compaction.
    # NOTE a neighbor-compare dedup on the strided parent table is WRONG:
    # striding does not preserve lexicographic order (dropping x bits merges
    # x-groups, re-exposing y/z comparisons), so winners must come from a
    # grid and scan positions from the packed rank.
    tables = [(coords, num_valid)]
    for lvl in range(1, num_levels):
        prev_coords, prev_n = tables[-1]
        prev_valid = jnp.arange(prev_coords.shape[0]) < prev_n
        strided = jnp.concatenate(
            [prev_coords[:, :1], (prev_coords[:, 1:] >> lvl) << lvl], axis=1
        )
        g = build_grid(strided, prev_valid, origins, spec, lvl)
        rows = jnp.arange(prev_coords.shape[0], dtype=jnp.int32)
        win = grid_lookup(g, origins, strided, prev_valid, spec, lvl)
        keep = prev_valid & (win == rows)
        bits, rank = pack_words(strided, keep, origins, spec, lvl)
        pos = scan_position(bits, rank, strided, keep, origins, spec, lvl)
        kept = keep & (pos >= 0)
        cap = level_capacity[lvl]
        tgt = jnp.where(kept & (pos < cap), pos, cap)
        out = jnp.full((cap + 1, 4), PAD_COORD, jnp.int32)
        out = out.at[tgt].set(strided, mode="drop")
        n_uniq = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), cap)
        tables.append((out[:cap], n_uniq))

    packed = []
    for lvl in range(num_levels):
        c, n = tables[lvl]
        v = jnp.arange(c.shape[0]) < n
        packed.append(pack_level(c, v, origins, spec, lvl))

    levels = []
    for lvl in range(num_levels):
        c, n = tables[lvl]
        v = jnp.arange(c.shape[0]) < n
        k3 = packed_offset_map(packed[lvl], origins, c, v, spec,
                               table_level=lvl, kernel_size=3, mode="same")
        down = None
        if lvl > 0:
            down = packed_offset_map(packed[lvl - 1], origins, c, v, spec,
                                     table_level=lvl - 1, kernel_size=3,
                                     mode="down")
        up = None
        if lvl < num_levels - 1:
            up = packed_offset_map(packed[lvl + 1], origins, c, v, spec,
                                   table_level=lvl + 1, kernel_size=3,
                                   mode="up")
        levels.append(LevelMaps(c, n, k3, down, up))

    c0, n0v = tables[0]
    v0 = jnp.arange(c0.shape[0]) < n0v
    k5 = packed_offset_map(packed[0], origins, c0, v0, spec,
                           table_level=0, kernel_size=conv1_kernel_size,
                           mode="same")
    return CoordinatePyramid(tuple(levels), k5)
