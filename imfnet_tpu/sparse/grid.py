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


def _window_rows_vec(t4: jax.Array, zrels: jax.Array, zlo_w: jax.Array):
    """_window_rows for ALL kz z-offsets of a column at once: ``zrels`` is
    [N, kz] and the return is (exists bool[N,kz], row int32[N,kz]).

    The per-offset scalar version left the map builders dispatch-bound: the
    round-4 device trace attributed ~1.8 ms/pair to hundreds of tiny [N,1]
    selects + T(1,128) layout copies from 27 per-offset `jnp.stack` columns
    per map. One [N,kz] computation per (dx,dy) column collapses those into
    a handful of medium fusions."""
    sel = (zrels >> 5) - zlo_w[:, None]                  # [N,kz] 0 or 1
    bits = jnp.where(sel == 0, t4[:, 0:1], t4[:, 1:2]).astype(jnp.uint32)
    rank = jnp.where(sel == 0, t4[:, 2:3], t4[:, 3:4])
    p = (zrels & 31).astype(jnp.uint32)
    exists = ((bits >> p) & 1).astype(bool)
    below = bits & ((jnp.uint32(1) << p) - 1)
    row = rank + jax.lax.population_count(below).astype(jnp.int32)
    return exists, row


def _offset_columns(
    origins: jax.Array,
    coords: jax.Array,    # int32[N,4] query rows (at their own level's lattice)
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
    mode: str,            # 'same' | 'down' | 'up'
):
    """Per-(dx, dy)-column query descriptors shared by the packed-gather and
    banded-match map builders. Yields dicts with:
      w0      int32[N]     anchor word index (garbage when not ok_xy)
      zlo_w   int32[N]     anchor z-word
      ok_xy   bool[N]      column structurally valid
      zrels   int32[N,kz]  z-cell of every kernel z-offset (vectorized —
                           see _window_rows_vec)
      aligned bool[N,kz] | None  parity alignment (mode='up' only)
    """
    x_d, y_d, _, zw_d = _packed_dims(spec, table_level)
    r = kernel_size // 2

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
            dzv = jnp.arange(-r, r + 1, dtype=jnp.int32)[None, :]
            if mode == "up":
                zq = m[:, 2:3] + dzv
                zrels = (zq >> 1) - o_cell[:, 2:3] + oc_off
                aligned = (ax & ay)[:, None] & ((zq & 1) == 0)
            else:
                zrels = base[:, 2:3] + dzv
                aligned = None
            yield {"w0": w0, "zlo_w": zlo_w, "ok_xy": ok_xy, "zrels": zrels,
                   "aligned": aligned, "dxdy": (dx, dy)}


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
    num_w = pt.table.shape[0]
    cols = []
    for col in _offset_columns(origins, coords, valid, spec,
                               table_level=table_level,
                               kernel_size=kernel_size, mode=mode):
        w0 = jnp.clip(jnp.where(col["ok_xy"], col["w0"], 0), 0, num_w - 1)
        t4 = jnp.take(pt.table, w0, axis=0)
        exists, row = _window_rows_vec(t4, col["zrels"], col["zlo_w"])
        ok = col["ok_xy"][:, None] & exists
        if col["aligned"] is not None:
            ok &= col["aligned"]
        cols.append(jnp.where(ok, row, -1))
    return jnp.concatenate(cols, axis=1)


def widen_y(pt: PackedLevel, r: int) -> jax.Array:
    """y-widened packed table: wide[w] = concat(table[w + d*Zw], d=-r..r),
    zero-padded at the table ends (zero bits = absent, so edge junk can never
    claim a neighbor). Shifting w by one z-word-stride Zw moves one cell in
    y, so ONE [4*(2r+1)]-int row gather fetches the 2-word z-windows of every
    dy ∈ [-r, r] — a k³ map then costs k row-gathers instead of k²
    (`packed_offset_map_ywide`). Row width stays ≤ 128 elements (the
    measured fast-gather envelope, STATUS.md)."""
    table = pt.table
    shift = pt.dims[3]
    n_w = table.shape[0]
    parts = []
    for d in range(-r, r + 1):
        if d == 0:
            parts.append(table)
        elif d < 0:
            parts.append(jnp.concatenate(
                [jnp.zeros((-d * shift, 4), jnp.int32),
                 table[: n_w + d * shift]], axis=0))
        else:
            parts.append(jnp.concatenate(
                [table[d * shift:],
                 jnp.zeros((d * shift, 4), jnp.int32)], axis=0))
    return jnp.concatenate(parts, axis=1)


def packed_offset_map_ywide(
    pt: PackedLevel,
    wide: jax.Array,      # from widen_y(pt, rw) with rw >= kernel_size//2
    origins: jax.Array,
    coords: jax.Array,
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
    mode: str,            # 'same' | 'down' | 'up'
) -> jax.Array:
    """`packed_offset_map` computed through the y-widened table: one row
    gather per dx column instead of one per (dx, dy) — k5 pays 5 gathers
    instead of 25 against the level-0 table (the pipeline's largest).
    mode='up' goes further: ``(m+dx)>>1`` takes only TWO distinct coarse
    cells per query across dx ∈ {-1,0,1} (parity decides which), so the
    whole 3³ map costs 2 gathers + per-offset parity selects instead of 9.
    Identical output to `packed_offset_map` (oracle-tested)."""
    if mode == "up":
        return _ywide_up_map(pt, wide, origins, coords, valid, spec,
                             table_level=table_level,
                             kernel_size=kernel_size)
    x_d, y_d, zc_d, zw_d = pt.dims
    r = kernel_size // 2
    ky = 2 * r + 1
    rw = (wide.shape[1] // 4 - 1) // 2   # widening radius of the wide table
    assert rw >= r, (rw, r)
    b, base = _rel_cells(coords, origins, table_level, spec.num_batches)
    base_ok = (
        valid
        & (base >= r).all(axis=1)
        & (base[:, 0] < x_d - r) & (base[:, 1] < y_d - r)
        & (base[:, 2] < zc_d - r)
    )
    num_w = wide.shape[0]
    zlo_w = (base[:, 2] - r) >> 5
    zrels = base[:, 2:3] + jnp.arange(-r, r + 1, dtype=jnp.int32)[None, :]
    cols = []
    for dx in range(-r, r + 1):
        w0 = ((b * x_d + base[:, 0] + dx) * y_d + base[:, 1]) * zw_d + zlo_w
        w0 = jnp.clip(jnp.where(base_ok, w0, 0), 0, num_w - 1)
        g = jnp.take(wide, w0, axis=0)                   # [N, 4*(2rw+1)]
        for dy in range(-r, r + 1):
            t4 = g[:, 4 * (dy + rw): 4 * (dy + rw) + 4]
            exists, row = _window_rows_vec(t4, zrels, zlo_w)
            cols.append(jnp.where(base_ok[:, None] & exists, row, -1))
    return jnp.concatenate(cols, axis=1)


def _ywide_up_map(
    pt: PackedLevel,
    wide: jax.Array,
    origins: jax.Array,
    coords: jax.Array,
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
) -> jax.Array:
    """mode='up' kernel map in TWO row gathers (vs 9 per-(dx,dy) probes).

    Up-mode targets live on the coarse lattice: cell_x = (m_x+dx)>>1, which
    for dx ∈ {-1,0,1} takes only the two values (m_x-1)>>1 and (m_x-1)>>1+1
    (parity decides which dx lands where). So gathering the y-widened rows
    at those two x cells (anchored at the clipped coarse y of the query)
    covers every (dx, dy) target; per-offset parity selects pick the row and
    the dy sub-window. Output identical to `packed_offset_map(mode='up')`
    (oracle-tested in tests/test_grid.py)."""
    assert kernel_size == 3, kernel_size
    x_d, y_d, zc_d, zw_d = pt.dims
    rw = (wide.shape[1] // 4 - 1) // 2
    assert rw >= 1, rw
    num_w = wide.shape[0]
    b = jnp.clip(coords[:, 0], 0, spec.num_batches - 1)
    m = coords[:, 1:] >> (table_level - 1)
    o_cell = origin_lookup(origins, b) >> table_level
    zlo = ((m[:, 2] - 1) >> 1) - o_cell[:, 2] + HALO
    zlo_w = zlo >> 5
    ok_z = valid & (zlo >= 0) & (zlo < zc_d - 1)
    # anchor: clipped coarse y of the query; every (m_y+dy)>>1 is within
    # ±1 of it (within the widening radius even after clipping)
    cy_g = jnp.clip((m[:, 1] >> 1) - o_cell[:, 1] + HALO, 0, y_d - 1)
    cx_lo = ((m[:, 0] - 1) >> 1) - o_cell[:, 0] + HALO
    rows2 = []
    for e in (0, 1):
        cx = cx_lo + e
        w0 = ((b * x_d + cx) * y_d + cy_g) * zw_d + zlo_w
        ok_g = ok_z & (cx >= 0) & (cx < x_d)
        w0 = jnp.clip(jnp.where(ok_g, w0, 0), 0, num_w - 1)
        rows2.append(jnp.take(wide, w0, axis=0))  # [N, 4*(2rw+1)]
    zq = m[:, 2:3] + jnp.arange(-1, 2, dtype=jnp.int32)[None, :]
    zrels = (zq >> 1) - o_cell[:, 2:3] + HALO
    az = (zq & 1) == 0                                   # [N,3]
    cols = []
    for dx in (-1, 0, 1):
        cx_t = ((m[:, 0] + dx) >> 1) - o_cell[:, 0] + HALO
        use_hi = (cx_t - cx_lo) == 1
        g = jnp.where(use_hi[:, None], rows2[1], rows2[0])
        ok_x = (cx_t >= 0) & (cx_t < x_d)
        ax = ((m[:, 0] + dx) & 1) == 0
        for dy in (-1, 0, 1):
            cy_t = ((m[:, 1] + dy) >> 1) - o_cell[:, 1] + HALO
            d = cy_t - cy_g + rw
            t4 = g[:, 4 * rw: 4 * rw + 4]
            for dd in range(2 * rw + 1):
                if dd != rw:
                    t4 = jnp.where((d == dd)[:, None],
                                   g[:, 4 * dd: 4 * dd + 4], t4)
            ok_y = (cy_t >= 0) & (cy_t < y_d)
            ay = ((m[:, 1] + dy) & 1) == 0
            ok_col = ok_z & ok_x & ok_y & ax & ay
            exists, row = _window_rows_vec(t4, zrels, zlo_w)
            ok = ok_col[:, None] & az & exists
            cols.append(jnp.where(ok, row, -1))
    return jnp.concatenate(cols, axis=1)


def _scatter_inverse(src_cols: jax.Array, n_rows: int) -> jax.Array:
    """Inverse of an offset-map column block via one scatter.

    Offset maps satisfy m[q, k] = p ⟺ m'[p, K-1-k] = q where m' is the map
    for the negated offsets (product order reverses under negation) — the
    'same' maps are their own m', and the 'up' map is the 'down' map's m'.
    Given the source block ``src_cols[Q, C]`` holding matches for offsets
    δ_0..δ_{C-1}, returns ``inv[n_rows, C]`` holding matches for offsets
    -δ_{C-1}..-δ_0 (i.e. inv[src_cols[q, C-1-j], j] = q), -1 where unmatched.
    Exact: coordinates are unique, so scatter targets never collide (only the
    out-of-range padding row absorbs the unmatched entries)."""
    q_n, c_n = src_cols.shape
    src = src_cols[:, ::-1]
    rows = jnp.where(src >= 0, src, n_rows)
    cols = jnp.arange(c_n, dtype=jnp.int32)[None, :]
    qv = jnp.broadcast_to(
        jnp.arange(q_n, dtype=jnp.int32)[:, None], (q_n, c_n))
    # flat 1-D scatter (rows*C + col) — XLA lowers it much better than the
    # 2-D advanced-index form
    flat_idx = (rows * c_n + cols).reshape(-1)
    out = jnp.full(((n_rows + 1) * c_n,), -1, jnp.int32)
    out = out.at[flat_idx].set(qv.reshape(-1))
    return out[: n_rows * c_n].reshape(n_rows, c_n)


def transpose_offset_map(down: jax.Array, n_rows: int) -> jax.Array:
    """Derive the mode='up' map at the finer level from the finer→coarser
    mode='down' map at the coarser level: down[q, k] = j ⟺ up[j, K-1-k] = q
    (same offset set, negated; both in itertools.product order). Replaces
    K probe columns over the (larger) fine query set with one scatter of
    the (smaller) coarse map."""
    return _scatter_inverse(down, n_rows)


def packed_offset_map_sym(
    pt: PackedLevel,
    origins: jax.Array,
    coords: jax.Array,
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
) -> jax.Array:
    """mode='same' kernel map with half the probe work.

    Same-maps are self-transpose (m[q, k] = p ⟺ m[p, K-1-k] = q), so only
    the offsets δ <lex 0 (columns 0..K//2-1) are probed; the center column
    is the identity, and the mirror half is scatter-derived
    (`_scatter_inverse`). Identical output to `packed_offset_map` for
    in-extent tables (oracle-tested in tests/test_grid.py)."""
    num_w = pt.table.shape[0]
    r = kernel_size // 2
    cols = []
    for col in _offset_columns(origins, coords, valid, spec,
                               table_level=table_level,
                               kernel_size=kernel_size, mode="same"):
        dx, dy = col["dxdy"]
        if (dx, dy) > (0, 0):
            continue
        center_xy = (dx, dy) == (0, 0)
        w0 = jnp.clip(jnp.where(col["ok_xy"], col["w0"], 0), 0, num_w - 1)
        t4 = jnp.take(pt.table, w0, axis=0)
        exists, row = _window_rows_vec(t4, col["zrels"], col["zlo_w"])
        ok = col["ok_xy"][:, None] & exists
        if col["aligned"] is not None:
            ok &= col["aligned"]
        block = jnp.where(ok, row, -1)
        if center_xy:
            block = block[:, :r]  # δ ≥lex 0: center + mirror derived below
        cols.append(block)
    half = jnp.concatenate(cols, axis=1)     # columns 0..K//2-1
    n = coords.shape[0]
    center = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), -1)
    mirror = _scatter_inverse(half, n)       # columns K//2+1..K-1
    return jnp.concatenate([half, center[:, None], mirror], axis=1)


class CompactWords(NamedTuple):
    """Sorted occupied z-words of one level table + their 2-word payloads.

    The dense PackedLevel table spans every cell of the static extent
    (~1.2M words at level 0), so its per-query row gathers pay XLA's
    slow-large-table gather rate — measured as the dominant pyramid cost
    (scripts_dev/profile_pair.py: 14 ms of the 19 ms chained
    quantize+pyramid). This is the COMPACT alternative: only occupied
    words, sorted by word key, matched by banded window compares instead
    of gathers (same rank-monotonicity as the banded convs).

    wkeys:     int32[cap]  sorted occupied word keys (pad = 0x7FFFFFFF)
    payload:   f32[cap, 6] (bits_lo, bits_hi, bits1_lo, bits1_hi, rank,
               rank1) — integer-valued f32, each < 2^16 / 2^24, so the
               match's one-hot payload dot is exact at HIGHEST precision
    n_words:   int32[]
    sorted_ok: bool[]      word keys nondecreasing (the banded-match
               precondition; False routes callers to the dense fallback)
    """

    wkeys: jax.Array
    payload: jax.Array
    n_words: jax.Array
    sorted_ok: jax.Array


def compact_words(
    coords: jax.Array,    # int32[N,4] level table (scan order, unique)
    valid: jax.Array,
    origins: jax.Array,
    spec: GridSpec,
    level: int,
) -> CompactWords:
    """Build the compact sorted word table of one level (no dense grid)."""
    x_d, y_d, zc_d, zw_d = _packed_dims(spec, level)
    n = coords.shape[0]
    b, c = _rel_cells(coords, origins, level, spec.num_batches)
    in_r = (
        valid
        & (c >= 0).all(axis=1)
        & (c[:, 0] < x_d) & (c[:, 1] < y_d) & (c[:, 2] < zc_d)
    )
    WBIG = jnp.int32(0x7FFFFFFF)
    wkey = ((b * x_d + c[:, 0]) * y_d + c[:, 1]) * zw_d + (c[:, 2] >> 5)
    wkey = jnp.where(in_r, wkey, WBIG)
    # scan-ordered rows → word keys nondecreasing (verify, don't trust)
    sorted_ok = jnp.all(wkey[1:] >= wkey[:-1])
    first = (wkey != WBIG) & jnp.concatenate(
        [jnp.ones((1,), bool), wkey[1:] != wkey[:-1]])
    fi = first.astype(jnp.int32)
    pos = jnp.cumsum(fi) - fi
    widx = jnp.cumsum(fi) - 1                 # word slot of each row
    slot = jnp.where(first, pos, n)
    rows_i = jnp.arange(n, dtype=jnp.int32)
    wkeys = jnp.full((n + 1,), WBIG, jnp.int32).at[slot].set(
        wkey, mode="drop")[:n]
    # rank of a word = #cells before it in scan order = its first row index
    rank = jnp.zeros((n + 1,), jnp.int32).at[slot].set(
        rows_i, mode="drop")[:n]
    bslot = jnp.where(in_r, jnp.clip(widx, 0, n - 1), n)
    bit = (c[:, 2] & 31).astype(jnp.uint32)
    bits = jnp.zeros((n + 1,), jnp.uint32).at[bslot].add(
        jnp.uint32(1) << bit, mode="drop")[:n]
    n_words = jnp.sum(fi)
    pc = jax.lax.population_count(bits).astype(jnp.int32)
    nxt = jnp.concatenate([wkeys[1:], jnp.full((1,), WBIG, jnp.int32)])
    same_col = (nxt == wkeys + 1) & (((wkeys + 1) % zw_d) != 0)
    bits_n = jnp.concatenate([bits[1:], jnp.zeros((1,), jnp.uint32)])
    rank_n = jnp.concatenate([rank[1:], jnp.zeros((1,), jnp.int32)])
    bits1 = jnp.where(same_col, bits_n, 0)
    rank1 = jnp.where(same_col, rank_n, rank + pc)

    def pack6(bits_, bits1_, rank_, rank1_):
        return jnp.stack([
            (bits_ & 0xFFFF).astype(jnp.float32),
            (bits_ >> 16).astype(jnp.float32),
            (bits1_ & 0xFFFF).astype(jnp.float32),
            (bits1_ >> 16).astype(jnp.float32),
            rank_.astype(jnp.float32),
            rank1_.astype(jnp.float32),
        ], axis=1)

    # An anchor word w0 may itself be EMPTY while its w0+1 companion is
    # occupied (the dense table serves those through bits1) — emit a
    # companion entry at key v-1 for every occupied word v. When v-1 is
    # itself occupied, or v starts its z-column (its w-1 belongs to another
    # (x, y) column and must not see v's bits), the companion degrades to a
    # ZERO-payload duplicate of an existing key: duplicates are benign
    # because the match's one-hot payload dot SUMS entries, and zeros
    # change nothing. The interleaved (companion, anchor) sequence stays
    # nondecreasing, which is all the window matcher needs.
    valid_w = wkeys != WBIG
    prev = jnp.concatenate([jnp.full((1,), WBIG, jnp.int32), wkeys[:-1]])
    prev_occupies = prev == wkeys - 1
    col_start = (wkeys % zw_d) == 0
    need_comp = valid_w & ~prev_occupies & ~col_start
    kb = jnp.where(valid_w, jnp.where(need_comp, wkeys - 1, wkeys), WBIG)
    zero = jnp.zeros_like(bits)
    comp_payload = jnp.where(
        need_comp[:, None],
        pack6(zero, bits, rank, rank),
        jnp.zeros((n, 6), jnp.float32))
    anchor_payload = jnp.where(valid_w[:, None],
                               pack6(bits, bits1, rank, rank1), 0.0)
    keys2 = jnp.stack([kb, wkeys], axis=1).reshape(2 * n)
    payload2 = jnp.stack([comp_payload, anchor_payload],
                         axis=1).reshape(2 * n, 6)
    sorted_ok = sorted_ok & jnp.all(keys2[1:] >= keys2[:-1])
    return CompactWords(keys2, payload2, 2 * n_words, sorted_ok)


def _map_plan(mode: str, kernel_size: int,
              match_impl: str = "scan") -> Tuple[int, int]:
    """(block, window) for banded word matching, from measured per-block
    word-rank spreads on the reference sample pair
    (scripts_dev/proto_wordmap.py): same-k3 p100 314 @B=256, k5 412,
    down 873 @B=256, up 286 even @B=1024 (coarse targets). ~1.5x margin;
    an overflow only costs the in-graph dense fallback, never
    correctness. The pallas matcher 128-aligns window starts DOWN, so it
    gets one extra 128-lane tile of margin."""
    if mode == "up":
        block, win = (1024, 512) if match_impl == "scan" else (256, 512)
    elif mode == "down":
        block, win = 256, 1280
    else:
        block, win = 256, (512 if kernel_size <= 3 else 640)
    if match_impl == "pallas":
        win = -(-(win + 128) // 128) * 128
    return block, win


def _resolve_match_impl(match_impl: str, cap: int, width: int) -> str:
    """'auto' → the pallas kernel on TPU backends when the compact table
    fits its VMEM residency budget, else the XLA scan."""
    if match_impl != "auto":
        return match_impl
    from imfnet_tpu.sparse.pallas_word_map import table_fits_vmem
    fits = table_fits_vmem(cap, width)
    return "pallas" if fits and jax.default_backend() == "tpu" else "scan"


def _t6_to_t4(t6: jax.Array) -> jax.Array:
    """Reassemble the (bits, bits+1, rank, rank+1) window from the 16-bit
    halves carried through the exact one-hot payload dot."""
    bits = t6[..., 0].astype(jnp.int32) | (t6[..., 1].astype(jnp.int32) << 16)
    bits1 = t6[..., 2].astype(jnp.int32) | (t6[..., 3].astype(jnp.int32) << 16)
    return jnp.stack([bits, bits1,
                      t6[..., 4].astype(jnp.int32),
                      t6[..., 5].astype(jnp.int32)], axis=-1)


def banded_word_t4(wtab: CompactWords, q: jax.Array, block: int, width: int,
                   match_impl: str = "scan", interpret: bool = False):
    """Match per-column word queries against the sorted compact word table
    by banded window compares (no gathers).

    q : int32[N, ncol] anchor word keys per query row and (dx, dy) column;
        invalid entries < 0 (match nothing).

    match_impl 'scan' runs the lax.scan formulation below; 'pallas' runs
    the VMEM-windowed TPU kernel (`sparse.pallas_word_map`) — same
    contract, no sequential scan, requires word keys < 2^24 (the kernel
    compares keys in f32).

    Returns (t4 int32[N, ncol, 4] — (bits, bits+1, rank, rank+1) per match,
    zeros when the word is absent — and exact bool[]). When exact is False
    some block's window did not cover its query range and t4 is WRONG for
    those rows; callers fall back to the dense packed path under lax.cond.
    """
    n, ncol = q.shape
    if match_impl == "pallas":
        from imfnet_tpu.sparse import pallas_word_map as pwm
        q_pad, starts, exact = pwm.plan_word_windows(
            wtab.wkeys, q, block, width)
        t6 = pwm.word_match_planned(
            wtab.wkeys, wtab.payload, q_pad, starts,
            block=block, width=width, interpret=interpret)[:n]
        return _t6_to_t4(t6), exact & wtab.sorted_ok
    cap = wtab.wkeys.shape[0]
    B, W = block, min(width, cap)
    nb = -(-n // B)
    if nb * B != n:
        q = jnp.concatenate(
            [q, jnp.full((nb * B - n, ncol), -2, jnp.int32)], 0)
    qb = q.reshape(nb, B, ncol)
    qv = qb >= 0
    big = jnp.int32(1 << 30)
    qmin = jnp.min(jnp.where(qv, qb, big), axis=1)        # [nb, ncol]
    qmax = jnp.max(jnp.where(qv, qb, -1), axis=1)
    has = qmin != big
    wk = wtab.wkeys
    qminf = qmin.reshape(-1)
    # lower bound / coverage by broadcast counting (table is tiny vs N*k)
    cnt_lo = jnp.sum((wk[None, :] < qminf[:, None]).astype(jnp.int32), 1)
    cnt_hi = jnp.sum((wk[None, :] <= qmax.reshape(-1)[:, None]
                      ).astype(jnp.int32), 1)
    starts = jnp.where(has.reshape(-1),
                       jnp.minimum(cnt_lo, jnp.int32(cap - W)), 0)
    exact = jnp.all(
        jnp.where(has.reshape(-1), cnt_hi - starts <= W, True)
    ) & wtab.sorted_ok
    starts2 = jnp.maximum(starts, 0).reshape(nb, ncol)

    payload = wtab.payload

    def body(carry, inp):
        st, qblk = inp                       # [ncol], [B, ncol]
        # ncol window slices, then ONE batched compare + ONE batched dot —
        # per-op dispatch inside the scan body dominated the per-column
        # formulation (25 small dots/step made the k5 map slower than the
        # dense gathers it replaces)
        win_k = jnp.stack([
            jax.lax.dynamic_slice(wk, (st[ci],), (W,))
            for ci in range(ncol)])          # [ncol, W]
        win_p = jnp.stack([
            jax.lax.dynamic_slice(payload, (st[ci], 0), (W, 6))
            for ci in range(ncol)])          # [ncol, W, 6]
        oh = (win_k[:, :, None] == qblk.T[:, None, :]
              ).astype(jnp.float32)          # [ncol, W, B]
        t6 = jax.lax.dot_general(            # [ncol, 6, B], exact one-hots
            win_p, oh, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return carry, t6                     # [ncol, 6, B]

    _, t6all = jax.lax.scan(body, 0, (starts2, qb))       # [nb, ncol, 6, B]
    t6 = t6all.transpose(0, 3, 1, 2).reshape(nb * B, ncol, 6)[:n]
    return _t6_to_t4(t6), exact


def banded_offset_map(
    wtab: CompactWords,
    origins: jax.Array,
    coords: jax.Array,
    valid: jax.Array,
    spec: GridSpec,
    *,
    table_level: int,
    kernel_size: int,
    mode: str,
    block: int | None = None,
    width: int | None = None,
    match_impl: str = "auto",
    interpret: bool = False,
):
    """Gather-free packed_offset_map: identical output contract, plus an
    in-graph ``exact`` flag (False → run the dense packed path instead)."""
    _, w_pallas = _map_plan(mode, kernel_size, "pallas")
    impl = _resolve_match_impl(match_impl, wtab.wkeys.shape[0],
                               width if width is not None else w_pallas)
    cols = list(_offset_columns(origins, coords, valid, spec,
                                table_level=table_level,
                                kernel_size=kernel_size, mode=mode))
    q = jnp.stack(
        [jnp.where(c["ok_xy"], c["w0"], -2) for c in cols], axis=1)
    pb, pw = _map_plan(mode, kernel_size, impl)
    B = pb if block is None else block
    W = pw if width is None else width
    t4all, exact = banded_word_t4(wtab, q, B, W, match_impl=impl,
                                  interpret=interpret)
    outs = []
    for ci, col in enumerate(cols):
        t4 = t4all[:, ci, :]
        exists, row = _window_rows_vec(t4, col["zrels"], col["zlo_w"])
        ok = col["ok_xy"][:, None] & exists
        if col["aligned"] is not None:
            ok &= col["aligned"]
        outs.append(jnp.where(ok, row, -1))
    return jnp.concatenate(outs, axis=1), exact


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
    # Compaction by a SECOND 1-key sort instead of a scatter: run winners
    # carry their scan position as key, everything else sorts to the back —
    # the first n_out entries land in scan order. The [524k]→[40k] scatter
    # this replaces pays per input row and traced at 2.4 ms vs 0.46 ms for a
    # same-size sort (scripts_dev/profile_trace3.py, round 3).
    key2 = jnp.where(first, pos, jnp.int32(n))
    _, sel_sorted = jax.lax.sort((key2, sr), num_keys=1, is_stable=False)
    n_uniq = jnp.minimum(jnp.sum(first.astype(jnp.int32)), n_out)
    ok = jnp.arange(n_out, dtype=jnp.int32) < n_uniq
    if n_out <= n:
        sel_front = jax.lax.slice(sel_sorted, (0,), (n_out,))
    else:  # capacity exceeds the input row count; the tail is masked by ok
        sel_front = jnp.concatenate(
            [sel_sorted, jnp.zeros((n_out - n,), jnp.int32)])
    sel = jnp.where(ok, sel_front, -1)
    ss = jnp.where(ok, sel_front, 0)
    uniq = jnp.where(ok[:, None], jnp.take(coords4, ss, axis=0), PAD_COORD)
    f = jnp.where(ok[:, None], jnp.take(feats, ss, axis=0), 0)
    xyz_down = jnp.where(ok[:, None], jnp.take(xyz, ss, axis=0), 0.0)
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
    map_impl: str = "auto",  # auto (measured) | banded | packed | transpose | ywide
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

    # --- per-level coordinate tables: sort-dedup-compact over the (small)
    # parent table. A neighbor-compare dedup on the strided parent table is
    # WRONG (striding does not preserve lexicographic order: dropping x bits
    # merges x-groups, re-exposing y/z comparisons), so a per-level 2-key
    # sort of the strided cell keys re-establishes scan order. This replaced
    # a dense-grid winner election (scatter-min into the full level grid +
    # packed-rank positions): traced at ~3 ms/pair of grid materialization
    # for level tables that are only ~40k rows — the sort costs ~0.1 ms
    # (scripts_dev/profile_trace3.py, round 3).
    tables = [(coords, num_valid)]
    for lvl in range(1, num_levels):
        prev_coords, prev_n = tables[-1]
        n_prev = prev_coords.shape[0]
        prev_valid = jnp.arange(n_prev) < prev_n
        strided = jnp.concatenate(
            [prev_coords[:, :1], (prev_coords[:, 1:] >> lvl) << lvl], axis=1
        )
        b, c = _rel_cells(strided, origins, lvl, spec.num_batches)
        x_d, y_d, zc_d, _ = _packed_dims(spec, lvl)
        in_r = (
            prev_valid
            & (c >= 0).all(axis=1)
            & (c[:, 0] < x_d) & (c[:, 1] < y_d) & (c[:, 2] < zc_d)
        )
        big = jnp.int32(0x7FFFFFFF)
        # (b, x, y) fits int32 whenever the quantize key does; z rides as a
        # second sort key so huge configured extents stay safe
        key_hi = jnp.where(in_r, (b * x_d + c[:, 0]) * y_d + c[:, 1], big)
        key_lo = jnp.where(in_r, c[:, 2], big)
        rows = jnp.arange(n_prev, dtype=jnp.int32)
        sh, sl, sr = jax.lax.sort((key_hi, key_lo, rows), num_keys=2,
                                  is_stable=False)
        fi = (sh != big) & jnp.concatenate([
            jnp.ones((1,), bool),
            (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1]),
        ])
        cap = level_capacity[lvl]
        # stream-compact the run winners with a second 1-key sort (winners
        # carry their sorted position as key, the rest sort to the back) —
        # same trick as the quantize compaction; the cumsum+scatter this
        # replaced traced at ~1.7 ms/pair across the 3 levels vs ~0.1 for
        # the sorts (scripts_dev/profile_trace3.py, round 3)
        key2 = jnp.where(fi, rows, big)
        k2s, src = jax.lax.sort((key2, sr), num_keys=1, is_stable=False)
        k2s, src = k2s[:cap], src[:cap]
        out = jnp.where((k2s != big)[:, None],
                        jnp.take(strided, src, axis=0),
                        jnp.int32(PAD_COORD))
        n_uniq = jnp.minimum(jnp.sum(fi.astype(jnp.int32)), cap)
        tables.append((out, n_uniq))

    # Kernel maps: measured CHAINED choice (scripts_dev/profile_map_matrix
    # .py + profile_transpose_map.py, real sample pair, quantize+tables+
    # all-11-maps in one jit): ywide 14.4 ms < all-packed 16.4 < transpose
    # 28.9; earlier matrix: all-packed 17.9 beats every banded mix — banded
    # scan-up 18.9, banded-pallas everywhere 20.6 (19.4 without the
    # lax.cond fallback). STANDALONE the banded matchers win (pallas k5
    # 5.3 vs packed 6.6, scan up 2.1 vs 6.2 — and round-1 wired scan-up on
    # that basis), but chained XLA overlaps the packed gathers with the
    # other maps' compute while the banded variants pay plan counting,
    # compact_words builds, and cond/pallas pipeline barriers that don't
    # overlap. 'ywide' keeps the packed gathers but fetches all 2r+1 dy
    # windows in ONE row gather per dx (`widen_y`), cutting gather count
    # k²→k; 'transpose' (scatter-derived up maps + half-probed same maps)
    # loses: the [N*K] scatters serialize where probes overlapped. All
    # implementations stay selectable (map_impl=) and oracle-tested; the
    # banded ones carry an in-graph exactness flag and fall back to the
    # dense path per map — a speed penalty, never a correctness one.
    if map_impl == "auto":
        map_impl = "ywide"

    def _use_banded(mode):
        return map_impl == "banded"

    # build shared tables EAGERLY (outside any lax.cond — a fallback branch
    # must not be the first tracer of a table another map reuses)
    packs, wtabs, ywides = [], [], []
    for lvl in range(num_levels):
        c, n = tables[lvl]
        v = jnp.arange(c.shape[0]) < n
        packs.append(pack_level(c, v, origins, spec, lvl))
        wtabs.append(compact_words(c, v, origins, spec, lvl)
                     if _use_banded("same") else None)
        if map_impl == "ywide":
            rw = conv1_kernel_size // 2 if lvl == 0 else 1
            ywides.append(widen_y(packs[lvl], rw))
        else:
            ywides.append(None)

    def make_map(table_level, c, v, kernel_size, mode):
        def dense_map():
            if map_impl == "transpose" and mode == "same":
                return packed_offset_map_sym(
                    packs[table_level], origins, c, v, spec,
                    table_level=table_level, kernel_size=kernel_size)
            if map_impl == "ywide":
                return packed_offset_map_ywide(
                    packs[table_level], ywides[table_level], origins, c, v,
                    spec, table_level=table_level, kernel_size=kernel_size,
                    mode=mode)
            return packed_offset_map(packs[table_level], origins, c, v, spec,
                                     table_level=table_level,
                                     kernel_size=kernel_size, mode=mode)

        if not _use_banded(mode) or wtabs[table_level] is None:
            return dense_map()
        nbr_b, exact = banded_offset_map(
            wtabs[table_level], origins, c, v, spec,
            table_level=table_level, kernel_size=kernel_size, mode=mode)
        return jax.lax.cond(exact, lambda: nbr_b, dense_map)

    # the level-0 k3 'same' map is a strict COLUMN SUBSET of the k5 map
    # (inner 3³ of the 5³ offsets, both in itertools.product order, and
    # HALO=2 makes the r=1/r=2 validity masks identical for in-extent
    # queries) — so once conv1's k5 map exists, k3@L0 is free indexing
    # instead of 9 more gather columns
    c0, n0v = tables[0]
    v0 = jnp.arange(c0.shape[0]) < n0v
    k5 = make_map(0, c0, v0, conv1_kernel_size, "same")
    if conv1_kernel_size == 3:
        k3_l0 = k5
    elif conv1_kernel_size == 5:
        inner = [((dx + 2) * 5 + (dy + 2)) * 5 + (dz + 2)
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 for dz in (-1, 0, 1)]
        k3_l0 = k5[:, jnp.asarray(inner)]
    else:
        k3_l0 = make_map(0, c0, v0, 3, "same")

    # downs first: with map_impl="transpose" each level's up map is the
    # scatter-transpose of the NEXT level's down map (same offsets negated →
    # reversed columns; `transpose_offset_map`), replacing 27 probe columns
    # over the larger fine query set with one scatter of the smaller map.
    downs = [None] * num_levels
    for lvl in range(1, num_levels):
        c, n = tables[lvl]
        v = jnp.arange(c.shape[0]) < n
        downs[lvl] = make_map(lvl - 1, c, v, 3, "down")

    levels = []
    for lvl in range(num_levels):
        c, n = tables[lvl]
        v = jnp.arange(c.shape[0]) < n
        k3 = k3_l0 if lvl == 0 else make_map(lvl, c, v, 3, "same")
        up = None
        if lvl < num_levels - 1:
            if map_impl == "transpose":
                up = transpose_offset_map(downs[lvl + 1], c.shape[0])
            else:
                up = make_map(lvl + 1, c, v, 3, "up")
        levels.append(LevelMaps(c, n, k3, downs[lvl], up))

    return CoordinatePyramid(tuple(levels), k5)
