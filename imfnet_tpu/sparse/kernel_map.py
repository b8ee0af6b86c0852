"""Kernel-map construction: per-kernel-offset neighbor tables.

The TPU-native equivalent of MinkowskiEngine's kernel maps (in/out index pairs
per kernel offset, built in C++ at `MinkowskiConvolution` call sites,
reference `model/resunet.py:42-158`). Here a kernel map is a dense int32
table ``nbr[N_out, K]`` holding, for each output row and kernel offset, the
input row index or -1 — a static shape that XLA can gather through.

Offset enumeration convention: ``itertools.product`` order (dx slowest,
dz fastest), radius r = kernel_size // 2, offsets scaled by the level's
tensor stride. Odd kernels are centered, matching ME's default kernel region.

Because the UNet decoder emits coordinates that already exist at the encoder
level (ME's coordinate-manager cache guarantees this for
`MinkowskiConvolutionTranspose`; see `ME.cat` at `model/resunet.py:197`),
transpose convolutions never *generate* coordinates here: they target the
cached encoder-level coordinate table. The whole UNet coordinate structure is
precomputed once per forward as a `CoordinatePyramid`.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.sparse.coords import (
    PAD_QUERY_HI,
    PAD_QUERY_LO,
    PAD_TABLE_HI,
    lookup,
    make_keys,
    stride_coords,
)


def kernel_offsets(kernel_size: int, dilation: int = 1) -> np.ndarray:
    """int32[K,3] centered offsets in product order, scaled by dilation."""
    r = kernel_size // 2
    offs = np.array(
        list(itertools.product(range(-r, r + 1), repeat=3)), dtype=np.int32
    )
    return offs * dilation


def _query_keys(coords: jax.Array, valid: jax.Array, offset: jax.Array):
    """Keys of (coords + offset) with padding-safe sentinels."""
    shifted = coords.at[:, 1:].add(offset[None, :])
    hi, lo = make_keys(shifted, valid, is_table=False)
    return hi, lo


def _build_map(
    out_coords: jax.Array,
    out_valid: jax.Array,
    in_hi: jax.Array,
    in_lo: jax.Array,
    offsets: np.ndarray,
) -> jax.Array:
    """nbr[N_out, K]: index into the input table for each offset, or -1."""
    offs = jnp.asarray(offsets, jnp.int32)

    def one(offset):
        q_hi, q_lo = _query_keys(out_coords, out_valid, offset)
        return lookup(in_hi, in_lo, q_hi, q_lo)

    # vmap over offsets → [K, N_out]; transpose to [N_out, K].
    nbr = jax.vmap(one)(offs)
    return nbr.T


def kernel_map_same(
    coords: jax.Array,
    valid: jax.Array,
    kernel_size: int,
    tensor_stride: int,
) -> jax.Array:
    """Map for stride-1 conv: outputs == inputs, offsets in units of the
    tensor stride (`MinkowskiConvolution(kernel_size=k, stride=1)`)."""
    hi, lo = make_keys(coords, valid, is_table=True)
    offs = kernel_offsets(kernel_size) * tensor_stride
    return _build_map(coords, valid, hi, lo, offs)


def kernel_map_down(
    in_coords: jax.Array,
    in_valid: jax.Array,
    out_coords: jax.Array,
    out_valid: jax.Array,
    kernel_size: int,
    in_tensor_stride: int,
) -> jax.Array:
    """Map for a stride-2 downsampling conv (t → 2t): each output coordinate
    (a multiple of 2t) gathers inputs at out + δ·t, δ centered."""
    hi, lo = make_keys(in_coords, in_valid, is_table=True)
    offs = kernel_offsets(kernel_size) * in_tensor_stride
    return _build_map(out_coords, out_valid, hi, lo, offs)


def kernel_map_up(
    in_coords: jax.Array,
    in_valid: jax.Array,
    out_coords: jax.Array,
    out_valid: jax.Array,
    kernel_size: int,
    out_tensor_stride: int,
) -> jax.Array:
    """Map for a stride-2 transpose conv (2t → t): output coordinates are the
    cached encoder-level set at stride t; each gathers the inputs among
    out + δ·t that exist at stride 2t (`MinkowskiConvolutionTranspose`,
    `model/resunet.py:101-139`)."""
    hi, lo = make_keys(in_coords, in_valid, is_table=True)
    offs = kernel_offsets(kernel_size) * out_tensor_stride
    return _build_map(out_coords, out_valid, hi, lo, offs)


class LevelMaps(NamedTuple):
    """Kernel maps and coordinate metadata for one UNet resolution level."""

    coords: jax.Array      # int32[N,4] sorted table at this level
    num_valid: jax.Array   # int32[]
    k3_same: jax.Array     # [N,27] stride-1 k3 map at this level
    down: jax.Array | None  # [N,27] map gathering from the finer level (None at level 0)
    up: jax.Array | None    # [N,27] map gathering from the coarser level (None at last level)


class CoordinatePyramid(NamedTuple):
    """Coordinate tables + kernel maps for every UNet level, built once per
    forward. levels[0] is tensor stride 1; levels[i] is stride 2**i."""

    levels: Tuple[LevelMaps, ...]
    k5_l0: jax.Array  # [N0,125] conv1 kernel map (conv1_kernel_size=5)


def coarse_levels_fit(pyr: "CoordinatePyramid") -> jax.Array:
    """bool[]: True iff every coarser level's unique-coordinate count sits
    strictly below its static capacity. The grid builder CLAMPS the count
    at capacity (grid.build_pyramid_grid), so a full level is
    indistinguishable from an overflowed one — `num_valid >= capacity` is
    therefore treated as overflow-suspect. Extractors use this to
    re-extract at a larger capacity instead of returning descriptors
    computed on a silently truncated pyramid (the same failure class as
    the raw-point subsample fixed in round 4); an exact-fit false positive
    only costs a loud re-extract, never a wrong result."""
    ok = jnp.bool_(True)
    for lv in pyr.levels[1:]:
        ok = ok & (lv.num_valid < lv.coords.shape[0])
    return ok


def build_pyramid(
    coords: jax.Array,
    num_valid: jax.Array,
    *,
    num_levels: int = 4,
    conv1_kernel_size: int = 5,
    level_capacity: Tuple[int, ...] | None = None,
) -> CoordinatePyramid:
    """Build the full UNet coordinate structure for the IMFNet backbone
    (4 levels, strides 1/2/4/8; `model/resunet.py:42-158`).

    level_capacity[i] is the static padded row count of level i. Defaults to
    halving per level (sparse surface data shrinks by ~2-3x per stride-2).
    """
    n0 = coords.shape[0]
    if level_capacity is None:
        level_capacity = tuple(max(256, n0 >> i) for i in range(num_levels))
    assert level_capacity[0] >= n0, "level 0 capacity must hold the input"

    # Per-level coordinate tables.
    tables = [(coords, num_valid)]
    for i in range(1, num_levels):
        prev_coords, prev_n = tables[-1]
        prev_valid = jnp.arange(prev_coords.shape[0]) < prev_n
        c, n = stride_coords(prev_coords, prev_valid, 2 ** i, level_capacity[i])
        tables.append((c, n))

    levels = []
    for i in range(num_levels):
        c, n = tables[i]
        valid = jnp.arange(c.shape[0]) < n
        t = 2 ** i
        k3 = kernel_map_same(c, valid, 3, t)
        down = None
        if i > 0:
            pc, pn = tables[i - 1]
            pvalid = jnp.arange(pc.shape[0]) < pn
            down = kernel_map_down(pc, pvalid, c, valid, 3, 2 ** (i - 1))
        up = None
        if i < num_levels - 1:
            nc, nn = tables[i + 1]
            nvalid = jnp.arange(nc.shape[0]) < nn
            up = kernel_map_up(nc, nvalid, c, valid, 3, t)
        levels.append(LevelMaps(c, n, k3, down, up))

    c0, n0v = tables[0]
    valid0 = jnp.arange(c0.shape[0]) < n0v
    k5 = kernel_map_same(c0, valid0, conv1_kernel_size, 1)
    return CoordinatePyramid(tuple(levels), k5)
