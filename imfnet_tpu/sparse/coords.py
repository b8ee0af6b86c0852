"""Coordinate engine for the sparse-voxel representation.

This is the TPU-native replacement for MinkowskiEngine's coordinate manager
(reference call sites: `model/resunet.py:229-233`, `util/misc.py:83-95`,
`lib/data_loaders.py:291`). Everything here is jit-compatible: static shapes,
padded rows, validity derived from sentinel coordinates.

Design
------
A sparse tensor is ``SparseVoxels(coords[N,4] int32, feats[N,C], num_valid)``
where ``coords = (batch, x, y, z)`` in *voxel units* (not multiplied by
tensor stride — the stride is carried separately as static metadata).
Rows ``>= num_valid`` are padding: their coords are the sentinel
``PAD_COORD`` and their feats are zero.

Coordinates are identified by a pair of uint32 keys:

    hi = (batch << 16) | (x + 2^15)
    lo = ((y + 2^15) << 16) | (z + 2^15)

which supports per-axis ranges [-32768, 32767] and batch < 65536 — ample for
3DMatch (voxel 0.025 m → ±800 m span) and KITTI (0.3 m → ±9.8 km span).
Valid rows are kept **sorted ascending by (hi, lo)** — i.e. grouped by batch,
then lexicographic in (x, y, z) — so membership queries are exact binary
searches (no hash collisions) and batch segments are contiguous.

Padding rows carry ``PAD_TABLE_KEY``; queries generated from padding rows use
``PAD_QUERY_KEY``; the two never compare equal, so padded queries always miss.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Coordinate offset so shifted coords are non-negative 16-bit values.
COORD_SHIFT = 1 << 15
# Sentinel coordinate stored in padding rows (outside the valid coord range).
# numpy scalars, not jnp: creating a device array at import time would
# initialize the XLA backend, which forbids a later
# jax.distributed.initialize (multi-host bring-up).
PAD_COORD = np.int32(-(1 << 20))
# Sentinel keys. Table padding sorts last; query padding never matches it.
PAD_TABLE_HI = np.uint32(0xFFFFFFFF)
PAD_TABLE_LO = np.uint32(0xFFFFFFFF)
PAD_QUERY_HI = np.uint32(0xFFFFFFFE)
PAD_QUERY_LO = np.uint32(0xFFFFFFFE)


class SparseVoxels(NamedTuple):
    """Padded, statically-shaped sparse voxel tensor.

    coords:    int32[N, 4]  (batch, x, y, z), valid rows sorted by key,
               padding rows = PAD_COORD.
    feats:     [N, C] features; padding rows are zero.
    num_valid: int32[] number of valid rows.
    """

    coords: jax.Array
    feats: jax.Array
    num_valid: jax.Array

    @property
    def n_padded(self) -> int:
        return self.coords.shape[0]

    def mask(self) -> jax.Array:
        """bool[N] validity mask."""
        n = self.coords.shape[0]
        return jnp.arange(n, dtype=jnp.int32) < self.num_valid


def make_keys(coords: jax.Array, valid: jax.Array, *, is_table: bool) -> Tuple[jax.Array, jax.Array]:
    """uint32 (hi, lo) keys for int32 coords [N,4]; invalid rows get sentinels."""
    b = coords[:, 0].astype(jnp.uint32)
    x = (coords[:, 1] + COORD_SHIFT).astype(jnp.uint32)
    y = (coords[:, 2] + COORD_SHIFT).astype(jnp.uint32)
    z = (coords[:, 3] + COORD_SHIFT).astype(jnp.uint32)
    hi = (b << 16) | (x & jnp.uint32(0xFFFF))
    lo = (y << 16) | (z & jnp.uint32(0xFFFF))
    pad_hi = PAD_TABLE_HI if is_table else PAD_QUERY_HI
    pad_lo = PAD_TABLE_LO if is_table else PAD_QUERY_LO
    hi = jnp.where(valid, hi, pad_hi)
    lo = jnp.where(valid, lo, pad_lo)
    return hi, lo


def _key_less(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def lookup(table_hi: jax.Array, table_lo: jax.Array, q_hi: jax.Array, q_lo: jax.Array) -> jax.Array:
    """Exact membership search: for each query key, the row index in the sorted
    table, or -1 if absent. Vectorized binary search, ~log2(N) fori steps.

    Replaces MinkowskiEngine's coordinate-map hash lookups with a
    collision-free, statically-shaped XLA program.
    """
    n = table_hi.shape[0]
    steps = max(1, math.ceil(math.log2(max(n, 2))) + 1)

    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = jnp.minimum((lo_b + hi_b) >> 1, n - 1)
        t_hi = jnp.take(table_hi, mid)
        t_lo = jnp.take(table_lo, mid)
        less = _key_less(t_hi, t_lo, q_hi, q_lo)
        active = lo_b < hi_b
        lo_b = jnp.where(active & less, mid + 1, lo_b)
        hi_b = jnp.where(active & ~less, mid, hi_b)
        return lo_b, hi_b

    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    safe = jnp.minimum(lo_b, n - 1)
    found = (
        (lo_b < n)
        & (jnp.take(table_hi, safe) == q_hi)
        & (jnp.take(table_lo, safe) == q_lo)
    )
    return jnp.where(found, lo_b, -1)


def unique_voxels(
    coords: jax.Array,
    valid: jax.Array,
    n_out: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deduplicate voxel coordinates, keeping the **first occurrence** per voxel
    (the semantics of `ME.utils.sparse_quantize(..., return_index=True)` at
    `util/misc.py:83` / `lib/data_loaders.py:291`).

    Returns (unique_coords[n_out,4] sorted by key, sel[n_out] index of the
    first-occurring input row per unique voxel (or -1 in padding), n_unique).
    """
    n = coords.shape[0]
    hi, lo = make_keys(coords, valid, is_table=True)
    # Sort by (hi, lo, original index): first element of each equal-key run is
    # the earliest occurrence. jnp.lexsort sorts by the LAST key primarily.
    order = jnp.lexsort((jnp.arange(n, dtype=jnp.int32), lo, hi))
    s_hi = jnp.take(hi, order)
    s_lo = jnp.take(lo, order)
    s_valid = s_hi != PAD_TABLE_HI
    is_first = s_valid & (
        (jnp.arange(n) == 0)
        | (s_hi != jnp.roll(s_hi, 1))
        | (s_lo != jnp.roll(s_lo, 1))
    )
    # Compact first-occurrences to the front (stable → stays key-sorted).
    pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    n_unique = jnp.maximum(pos[-1] + 1, 0).astype(jnp.int32)
    tgt = jnp.where(is_first & (pos < n_out), pos, n_out)  # n_out = drop slot
    sel = jnp.full((n_out + 1,), -1, jnp.int32).at[tgt].set(order, mode="drop").at[n_out].set(-1)[:n_out]
    uniq = jnp.where(
        (sel >= 0)[:, None],
        jnp.take(coords, jnp.maximum(sel, 0), axis=0),
        PAD_COORD,
    )
    n_unique = jnp.minimum(n_unique, n_out)
    return uniq, sel, n_unique


def quantize(
    xyz: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    n_out: int,
    batch_index: jax.Array | int = 0,
) -> Tuple[SparseVoxels, jax.Array, jax.Array]:
    """Voxelize points: floor(xyz/voxel) → dedup first-occurrence.

    The jit-side equivalent of `util/misc.py:82-87` (extract_features) and
    `lib/data_loaders.py:290-292`. Returns (SparseVoxels, sel, xyz_down) where
    ``sel`` indexes the chosen representative input point per voxel and
    ``xyz_down[n_out,3]`` are their original (continuous) positions.
    """
    v = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    b = jnp.broadcast_to(jnp.asarray(batch_index, jnp.int32), (v.shape[0],))
    coords4 = jnp.concatenate([b[:, None], v], axis=1)
    uniq, sel, n_unique = unique_voxels(coords4, valid, n_out)
    ok = sel >= 0
    sel_safe = jnp.maximum(sel, 0)
    f = jnp.where(ok[:, None], jnp.take(feats, sel_safe, axis=0), 0)
    xyz_down = jnp.where(ok[:, None], jnp.take(xyz, sel_safe, axis=0), 0.0)
    return SparseVoxels(uniq, f, n_unique), sel, xyz_down


def stride_coords(coords: jax.Array, valid: jax.Array, stride: int, n_out: int):
    """Output coordinates of a stride-``s`` downsampling conv: the unique set of
    ``floor(c / s) * s`` over valid inputs (floor toward -inf, uniform grid for
    negative coordinates). Mirrors MinkowskiEngine's coordinate-map stride
    (used by `model/resunet.py:54-88` stride-2 convs).

    Returns (out_coords[n_out,4] sorted, n_out_valid).
    """
    xyz = coords[:, 1:]
    strided = (xyz // stride) * stride  # jnp int // floors toward -inf
    c = jnp.concatenate([coords[:, :1], strided], axis=1)
    uniq, _, n_unique = unique_voxels(c, valid, n_out)
    return uniq, n_unique


def batch_segments(coords: jax.Array, valid: jax.Array, max_batch: int):
    """Start offset and length of each batch's contiguous row segment.

    Valid rows are key-sorted, so batch b occupies rows
    [starts[b], starts[b]+lengths[b]). The TPU-side replacement for the
    per-batch Python split loop at `model/resunet.py:237-250`.
    """
    b = jnp.where(valid, coords[:, 0], max_batch)
    counts = jnp.zeros((max_batch + 1,), jnp.int32).at[b].add(1, mode="drop")
    counts = counts[:max_batch]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    return starts, counts
