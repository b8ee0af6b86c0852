"""Executable oracle for MinkowskiEngine's kernel-offset enumeration.

The weight converter (utils/torch_weights.py) permutes every sparse-conv
kernel from ME 0.5.4's region order into this engine's product order. If
that permutation were wrong, converted released checkpoints
(`/root/reference/model/resunet.py:42-158`) would produce garbage
descriptors. These tests pin the full chain:

  me_kernel_region_offsets (odometer port of ME `src/kernel_region.hpp`)
    → me_offset_permutation
    → real engine kernel maps + sparse_conv

against a numpy oracle that consumes ME-ordered weights with ME's gather
conventions (conv gathers `in[u + δ]`, transpose conv `in[u − δ]`). Any
inconsistency between the permutation, the map construction, or the gather
sign fails the comparison.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from imfnet_tpu.sparse.build import from_numpy
from imfnet_tpu.sparse.kernel_map import build_pyramid, kernel_offsets
from imfnet_tpu.sparse.ops import sparse_conv
from imfnet_tpu.utils.torch_weights import (
    me_kernel_region_offsets,
    me_offset_permutation,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_me_region_odometer_shape_and_order():
    """The odometer enumerates x fastest, z slowest, over [-r, r]^3."""
    for k in (3, 5):
        offs = me_kernel_region_offsets(k)
        r = k // 2
        assert offs.shape == (k ** 3, 3)
        assert tuple(offs[0]) == (-r, -r, -r)
        assert tuple(offs[1]) == (-r + 1, -r, -r)     # x increments first
        assert tuple(offs[k]) == (-r, -r + 1, -r)     # carry into y
        assert tuple(offs[k * k]) == (-r, -r, -r + 1) # carry into z
        assert tuple(offs[-1]) == (r, r, r)
        # complete cube, no repeats
        assert len({tuple(o) for o in offs}) == k ** 3


def test_permutation_maps_product_onto_me_order():
    for k in (3, 5):
        ours = kernel_offsets(k)          # product order (dz fastest)
        me = me_kernel_region_offsets(k)
        perm = me_offset_permutation(k)
        np.testing.assert_array_equal(me[perm], ours)
        perm_rev = me_offset_permutation(k, reverse=True)
        np.testing.assert_array_equal(me[perm_rev], -ours)


def _me_conv_oracle(out_coords, in_coords, in_feats, w_me, kernel_size,
                    offset_scale, transpose=False):
    """ME-semantics dense oracle on ME-ordered weights:
    conv:            out[u] = Σ_k W[k] · in[u + δ_me(k)·s]
    transpose conv:  out[u] = Σ_k W[k] · in[u − δ_me(k)·s]
    (see me_kernel_region_offsets docstring for the conventions)."""
    offs = me_kernel_region_offsets(kernel_size) * offset_scale
    if transpose:
        offs = -offs
    index = {tuple(c): i for i, c in enumerate(in_coords)}
    out = np.zeros((len(out_coords), w_me.shape[2]), np.float64)
    for m, c in enumerate(out_coords):
        for k, off in enumerate(offs):
            i = index.get((c[0], c[1] + off[0], c[2] + off[1], c[3] + off[2]))
            if i is not None:
                out[m] += in_feats[i].astype(np.float64) @ w_me[k].astype(np.float64)
    return out


def _pyramid(rng, n=160, cap=512):
    span = 10
    coords = np.unique(np.concatenate([
        np.concatenate([np.zeros((n, 1), np.int64),
                        rng.randint(0, span, (n, 3))], 1),
        np.concatenate([np.ones((n, 1), np.int64),
                        rng.randint(0, span, (n, 3))], 1),
    ]), axis=0)
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), cap)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=5,
                        level_capacity=(cap, cap, 256, 128))
    return sv, pyr


def _valid_coords(coords_arr, num_valid):
    c = np.asarray(coords_arr)
    return c[: int(num_valid)]


@pytest.mark.parametrize("kernel_size,map_name", [(3, "k3"), (5, "k5")])
def test_converted_stride1_conv_matches_me_oracle(rng, kernel_size, map_name):
    """Random ME-ordered weights, permuted by the converter's perm, applied
    by the real engine == the ME-semantics oracle. Fails if the enumeration
    or the gather direction is wrong."""
    sv, pyr = _pyramid(rng)
    lv0 = pyr.levels[0]
    nbr = lv0.k3_same if map_name == "k3" else pyr.k5_l0
    n = int(lv0.num_valid)
    coords = _valid_coords(lv0.coords, lv0.num_valid)

    cin, cout = 4, 5
    k = kernel_size ** 3
    w_me = rng.randn(k, cin, cout).astype(np.float32)
    feats = np.zeros((lv0.coords.shape[0], cin), np.float32)
    feats[:n] = rng.randn(n, cin)

    perm = me_offset_permutation(kernel_size)
    w_ours = w_me[perm]
    out = sparse_conv(jnp.asarray(feats), nbr, jnp.asarray(w_ours),
                      compute_dtype=jnp.float32)
    ref = _me_conv_oracle(coords, coords, feats[:n], w_me, kernel_size,
                          offset_scale=1)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-4)


def test_converted_strided_convs_match_me_oracle(rng):
    """Down conv (stride 1→2, offsets in input-stride units, forward perm)
    and transpose up conv (stride 2→1, offsets in output-stride units,
    REVERSED perm — ME centers the region on the input coordinate) against
    the ME oracle, through the real pyramid maps."""
    sv, pyr = _pyramid(rng)
    lv0, lv1 = pyr.levels[0], pyr.levels[1]
    n0, n1 = int(lv0.num_valid), int(lv1.num_valid)
    c0 = _valid_coords(lv0.coords, lv0.num_valid)
    c1 = _valid_coords(lv1.coords, lv1.num_valid)
    assert n1 > 8

    cin, cout = 3, 4
    w_me = rng.randn(27, cin, cout).astype(np.float32)

    # --- down: out at stride 2 gathers in[u + δ·1] ---
    feats0 = np.zeros((lv0.coords.shape[0], cin), np.float32)
    feats0[:n0] = rng.randn(n0, cin)
    w_ours = w_me[me_offset_permutation(3)]
    out = sparse_conv(jnp.asarray(feats0), lv1.down, jnp.asarray(w_ours),
                      compute_dtype=jnp.float32)
    ref = _me_conv_oracle(c1, c0, feats0[:n0], w_me, 3, offset_scale=1)
    np.testing.assert_allclose(np.asarray(out)[:n1], ref, rtol=1e-4, atol=1e-4)

    # --- up (transpose): out at stride 1 gathers in[u − δ·1] ---
    feats1 = np.zeros((lv1.coords.shape[0], cin), np.float32)
    feats1[:n1] = rng.randn(n1, cin)
    w_ours_t = w_me[me_offset_permutation(3, reverse=True)]
    out_t = sparse_conv(jnp.asarray(feats1), lv0.up, jnp.asarray(w_ours_t),
                        compute_dtype=jnp.float32)
    ref_t = _me_conv_oracle(c0, c1, feats1[:n1], w_me, 3, offset_scale=1,
                            transpose=True)
    np.testing.assert_allclose(np.asarray(out_t)[:n0], ref_t,
                               rtol=1e-4, atol=1e-4)


def test_one_hot_kernel_routes_to_me_offset(rng):
    """Option-(b) style check: a kernel that is an indicator at ME index
    k_me must, after conversion, move features by exactly δ_me(k_me)."""
    sv, pyr = _pyramid(rng)
    lv0 = pyr.levels[0]
    n = int(lv0.num_valid)
    coords = _valid_coords(lv0.coords, lv0.num_valid)
    index = {tuple(c): i for i, c in enumerate(coords)}
    feats = np.zeros((lv0.coords.shape[0], 1), np.float32)
    feats[:n, 0] = rng.randn(n)
    me = me_kernel_region_offsets(3)
    perm = me_offset_permutation(3)
    for k_me in [0, 1, 3, 9, 13, 26]:
        w_me = np.zeros((27, 1, 1), np.float32)
        w_me[k_me] = 1.0
        out = np.asarray(sparse_conv(jnp.asarray(feats), lv0.k3_same,
                                     jnp.asarray(w_me[perm]),
                                     compute_dtype=jnp.float32))[:n, 0]
        d = me[k_me]
        for m, c in enumerate(coords):
            j = index.get((c[0], c[1] + d[0], c[2] + d[1], c[3] + d[2]))
            expect = feats[j, 0] if j is not None else 0.0
            assert out[m] == pytest.approx(expect, abs=1e-5), (k_me, m)
