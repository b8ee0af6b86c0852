"""Unit tests for the coordinate engine and sparse conv vs numpy oracles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse import coords as C
from imfnet_tpu.sparse import kernel_map as KM
from imfnet_tpu.sparse.ops import sparse_conv, masked_batchnorm_stats

from oracles import dense_sparse_conv, unique_first_occurrence


def random_coords(rng, n, span=10, batches=2):
    c = np.stack(
        [
            rng.randint(0, batches, n),
            rng.randint(-span, span, n),
            rng.randint(-span, span, n),
            rng.randint(-span, span, n),
        ],
        axis=1,
    ).astype(np.int32)
    return c


def dedup(coords):
    _, idx = np.unique(coords, axis=0, return_index=True)
    return coords[np.sort(idx)]


def pad_coords(coords, n_pad):
    out = np.full((n_pad, 4), int(C.PAD_COORD), np.int32)
    out[: len(coords)] = coords
    return out


def test_lookup_hit_and_miss(rng):
    coords = dedup(random_coords(rng, 200))
    n = len(coords)
    n_pad = 256
    padded = pad_coords(coords, n_pad)
    valid = np.arange(n_pad) < n
    hi, lo = C.make_keys(jnp.asarray(padded), jnp.asarray(valid), is_table=True)
    order = np.asarray(jnp.lexsort((lo, hi)))
    s_coords = padded[order]
    s_hi, s_lo = C.make_keys(jnp.asarray(s_coords), jnp.asarray(valid), is_table=True)

    # queries: half present, half absent
    q = np.concatenate([coords[:50], random_coords(rng, 50, span=100)])
    q_pad = pad_coords(q, 128)
    q_valid = np.arange(128) < len(q)
    q_hi, q_lo = C.make_keys(jnp.asarray(q_pad), jnp.asarray(q_valid), is_table=False)
    idx = np.asarray(C.lookup(s_hi, s_lo, q_hi, q_lo))

    table = {tuple(c): i for i, c in enumerate(s_coords[:n])}
    for j in range(len(q)):
        expect = table.get(tuple(q[j]), -1)
        assert idx[j] == expect, (j, q[j], idx[j], expect)
    assert (idx[len(q):] == -1).all()  # padded queries never match


def test_unique_voxels_first_occurrence(rng):
    coords = random_coords(rng, 300, span=4)  # lots of duplicates
    n_pad = 512
    padded = pad_coords(coords, n_pad)
    valid = np.arange(n_pad) < len(coords)
    uniq, sel, n_unique = C.unique_voxels(
        jnp.asarray(padded), jnp.asarray(valid), 384
    )
    uniq, sel, n_unique = map(np.asarray, (uniq, sel, int(n_unique)))
    exp_uniq, exp_sel = unique_first_occurrence(coords)
    assert n_unique == len(exp_uniq)
    np.testing.assert_array_equal(uniq[:n_unique], exp_uniq)
    np.testing.assert_array_equal(sel[:n_unique], exp_sel)
    assert (sel[n_unique:] == -1).all()
    assert (uniq[n_unique:] == int(C.PAD_COORD)).all()


def test_quantize_matches_floor_unique(rng):
    xyz = rng.randn(400, 3).astype(np.float32)
    feats = rng.randn(400, 1).astype(np.float32)
    voxel = 0.3
    sv, sel, xyz_down = C.quantize(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.ones(400, bool), voxel, 512
    )
    n = int(sv.num_valid)
    v = np.floor(xyz / voxel).astype(np.int64)
    exp_uniq, exp_sel = unique_first_occurrence(
        np.concatenate([np.zeros((400, 1), np.int64), v], axis=1)
    )
    assert n == len(exp_uniq)
    np.testing.assert_array_equal(np.asarray(sv.coords)[:n], exp_uniq)
    np.testing.assert_allclose(np.asarray(xyz_down)[:n], xyz[exp_sel])
    np.testing.assert_allclose(np.asarray(sv.feats)[:n], feats[exp_sel])


def test_stride_coords(rng):
    coords = dedup(random_coords(rng, 200, span=8))
    n_pad = 256
    padded = pad_coords(coords, n_pad)
    valid = np.arange(n_pad) < len(coords)
    out, n_out = C.stride_coords(jnp.asarray(padded), jnp.asarray(valid), 2, 256)
    out, n_out = np.asarray(out), int(n_out)
    strided = coords.copy().astype(np.int64)
    strided[:, 1:] = np.floor_divide(strided[:, 1:], 2) * 2
    exp, _ = unique_first_occurrence(strided)
    assert n_out == len(exp)
    np.testing.assert_array_equal(out[:n_out], exp)


def _engine_conv(coords, feats, weight, kernel_size, rng):
    """Run the jit path: pad, build same-level map, convolve."""
    n = len(coords)
    n_pad = 1 << int(np.ceil(np.log2(n + 8)))
    padded = pad_coords(coords, n_pad)
    valid = np.arange(n_pad) < n
    f_pad = np.zeros((n_pad, feats.shape[1]), np.float32)
    f_pad[:n] = feats
    nbr = KM.kernel_map_same(
        jnp.asarray(padded), jnp.asarray(valid), kernel_size, 1
    )
    out = sparse_conv(
        jnp.asarray(f_pad), nbr, jnp.asarray(weight), compute_dtype=jnp.float32
    )
    return np.asarray(out)[:n]


def test_sparse_conv_k3_vs_oracle(rng):
    coords = dedup(random_coords(rng, 150, span=5, batches=2))
    # engine requires key-sorted tables for lookup; sort the input
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    feats = rng.randn(len(coords), 3).astype(np.float32)
    weight = rng.randn(27, 3, 5).astype(np.float32) * 0.1
    got = _engine_conv(coords, feats, weight, 3, rng)
    exp = dense_sparse_conv(coords, feats, weight, 3)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_sparse_conv_k5_vs_oracle(rng):
    coords = dedup(random_coords(rng, 100, span=4, batches=1))
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    feats = rng.randn(len(coords), 2).astype(np.float32)
    weight = rng.randn(125, 2, 4).astype(np.float32) * 0.1
    got = _engine_conv(coords, feats, weight, 5, rng)
    exp = dense_sparse_conv(coords, feats, weight, 5)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_strided_down_and_up_conv_vs_oracle(rng):
    coords = dedup(random_coords(rng, 120, span=6, batches=2))
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    n = len(coords)
    n_pad = 256
    padded = pad_coords(coords, n_pad)
    valid = np.arange(n_pad) < n
    feats = rng.randn(n, 3).astype(np.float32)
    f_pad = np.zeros((n_pad, 3), np.float32)
    f_pad[:n] = feats

    out_c, out_n = C.stride_coords(jnp.asarray(padded), jnp.asarray(valid), 2, 256)
    out_valid = jnp.arange(256) < out_n
    w_down = rng.randn(27, 3, 4).astype(np.float32) * 0.1

    nbr_down = KM.kernel_map_down(
        jnp.asarray(padded), jnp.asarray(valid), out_c, out_valid, 3, 1
    )
    got_down = np.asarray(
        sparse_conv(jnp.asarray(f_pad), nbr_down, jnp.asarray(w_down),
                    compute_dtype=jnp.float32)
    )
    m = int(out_n)
    exp_down = dense_sparse_conv(
        coords, feats, w_down, 3, out_coords=np.asarray(out_c)[:m], offset_scale=1
    )
    np.testing.assert_allclose(got_down[:m], exp_down, rtol=1e-4, atol=1e-4)
    assert np.abs(got_down[m:]).max() == 0  # padded outputs exactly zero

    # Transpose conv back up: coarse (stride-2) inputs → original coords.
    g_coarse = np.zeros((256, 4), np.float32)
    g_coarse[:m] = rng.randn(m, 4).astype(np.float32)
    w_up = rng.randn(27, 4, 3).astype(np.float32) * 0.1
    nbr_up = KM.kernel_map_up(
        out_c, out_valid, jnp.asarray(padded), jnp.asarray(valid), 3, 1
    )
    got_up = np.asarray(
        sparse_conv(jnp.asarray(g_coarse), nbr_up, jnp.asarray(w_up),
                    compute_dtype=jnp.float32)
    )
    exp_up = dense_sparse_conv(
        np.asarray(out_c)[:m], g_coarse[:m], w_up, 3,
        out_coords=coords, offset_scale=1
    )
    np.testing.assert_allclose(got_up[:n], exp_up, rtol=1e-4, atol=1e-4)


def test_masked_batchnorm_stats(rng):
    f = rng.randn(64, 8).astype(np.float32)
    n_valid = 40
    mask = np.arange(64) < n_valid
    f_pad = f * mask[:, None]
    mean, var = masked_batchnorm_stats(
        jnp.asarray(f_pad), jnp.asarray(mask), jnp.asarray(n_valid)
    )
    np.testing.assert_allclose(np.asarray(mean), f[:n_valid].mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), f[:n_valid].var(0), rtol=1e-4, atol=1e-4)


def test_build_pyramid_structure(rng):
    coords = dedup(random_coords(rng, 200, span=10, batches=2))
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    n = len(coords)
    padded = pad_coords(coords, 256)
    pyr = KM.build_pyramid(
        jnp.asarray(padded), jnp.asarray(n),
        level_capacity=(256, 256, 128, 128),
    )
    assert len(pyr.levels) == 4
    assert pyr.k5_l0.shape == (256, 125)
    # Level l coords must all be multiples of 2^l, valid counts decreasing.
    prev_n = n + 1
    for i, lvl in enumerate(pyr.levels):
        nl = int(lvl.num_valid)
        assert 0 < nl < prev_n + 1
        cl = np.asarray(lvl.coords)[:nl]
        assert (cl[:, 1:] % (2 ** i) == 0).all()
        assert lvl.k3_same.shape[1] == 27
        prev_n = nl
    # Up-map of level 0 points into level 1 rows.
    up0 = np.asarray(pyr.levels[0].up)
    n1 = int(pyr.levels[1].num_valid)
    hit = up0[up0 >= 0]
    assert hit.size > 0 and hit.max() < n1
    # Every valid level-0 row must see its own parent voxel via some offset.
    assert (up0[:n] >= 0).any(axis=1).all()


@pytest.mark.slow
def test_z_window_conv_matches_flat(rng):
    """The z-window gather path (z_adjacent=True) must match the flat
    gather exactly — forward and gradients — on real stride-1/down k3 maps
    and the conv1 k5 map, where the scan-order adjacency invariant holds."""
    from imfnet_tpu.sparse.build import from_numpy
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.sparse.ops import sparse_conv

    from test_models import make_cloud

    coords = np.concatenate([make_cloud(rng, 150, 0, span=8),
                             make_cloud(rng, 100, 1, span=8)])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 384)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=5,
                        level_capacity=(384, 256, 128, 64))
    lv = pyr.levels

    cases = [
        ("same-k3", lv[0].k3_same, lv[0].k3_same, 384, 27),
        ("down-k3", lv[1].down, lv[0].up, 384, 27),
        ("same-k5", pyr.k5_l0, pyr.k5_l0, 384, 125),
        # transpose up map: a column's existing targets are z±t — adjacent
        # coarse-lattice steps, hence consecutive coarse rows, so the
        # z-window invariant holds here too (enabled round 2)
        ("up-k3", lv[0].up, lv[1].down, 256, 27),
    ]
    for name, nbr, inv, n_in, k in cases:
        n_out = nbr.shape[0]
        cin, cout = 6, 10
        x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32))
        cot = jnp.asarray(rng.randn(n_out, cout).astype(np.float32))

        out_flat = sparse_conv(x, nbr, w, compute_dtype=jnp.float32)
        out_z = sparse_conv(x, nbr, w, compute_dtype=jnp.float32,
                            z_adjacent=True)
        np.testing.assert_allclose(np.asarray(out_z), np.asarray(out_flat),
                                   rtol=1e-5, atol=1e-5, err_msg=name)

        def loss(x, w, z):
            return jnp.sum(sparse_conv(x, nbr, w, compute_dtype=jnp.float32,
                                       nbr_inv=inv, z_adjacent=z) * cot)

        gx_r, gw_r = jax.grad(lambda a, b: loss(a, b, False), (0, 1))(x, w)
        gx_z, gw_z = jax.grad(lambda a, b: loss(a, b, True), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_z), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(gw_z), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_banded_conv_matches_flat_and_falls_back(rng):
    """_banded_apply (banded one-hot GEMM selection) must match _flat_apply
    exactly on real pyramid maps; with a deliberately tiny window the
    in-graph exactness check must trip and the lax.cond fallback must still
    produce flat-identical results."""
    from imfnet_tpu.sparse.build import from_numpy
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.sparse.ops import _banded_apply, _flat_apply

    from test_models import make_cloud

    coords = np.concatenate([make_cloud(rng, 150, 0, span=8),
                             make_cloud(rng, 100, 1, span=8)])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 384)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=5,
                        level_capacity=(384, 256, 128, 64))
    lv = pyr.levels

    cases = [
        ("same-k3", lv[0].k3_same, 384, 3),
        ("down-k3", lv[1].down, 384, 3),
        ("up-k3", lv[0].up, 256, 3),
        ("same-k5", pyr.k5_l0, 384, 5),
    ]
    for name, nbr, n_in, kz in cases:
        k = nbr.shape[1]
        cin, cout = 6, 10
        x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32))
        ref = np.asarray(_flat_apply(x, nbr, w))
        out = np.asarray(_banded_apply(x, nbr, w, kz, block=64))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=name)
        # window too small for any real block -> exact=False -> fallback
        out_fb = np.asarray(_banded_apply(x, nbr, w, kz, block=64, width=2))
        np.testing.assert_allclose(out_fb, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=name + "-fallback")


def test_mul_first_matches_flat_bf16(rng):
    """_mul_first_apply rounds each per-offset GEMM partial to the compute
    dtype before the K-way f32 sum; under bf16 that adds up to K rounding
    steps vs _flat_apply's single deep contraction. Bound the deviation at
    bf16 tolerances (the f32 exact-match case is covered above)."""
    from imfnet_tpu.sparse.ops import _flat_apply, _mul_first_apply

    n_in, n_out, k = 256, 200, 27
    cin, cout = 64, 16  # Cout < Cin → the mul-first regime
    x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) / np.sqrt(cin))
    nbr = rng.randint(-1, n_in, size=(n_out, k)).astype(np.int32)
    nbr = jnp.asarray(nbr)

    ref = _flat_apply(x.astype(jnp.bfloat16), nbr, w.astype(jnp.bfloat16))
    out = _mul_first_apply(x.astype(jnp.bfloat16), nbr, w.astype(jnp.bfloat16))
    # bf16 has ~3 decimal digits; partial-rounding error grows ~sqrt(K)*ulp
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05 * scale, rtol=0.05)


def test_transpose_backward_matches_autodiff(rng):
    """The scatter-free conv backward (gather-GEMM through the pyramid's
    inverse map) must reproduce autodiff gradients exactly for stride-1,
    down, and up convolutions."""
    from imfnet_tpu.sparse.build import from_numpy
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.sparse.ops import sparse_conv

    from test_models import make_cloud

    coords = np.concatenate([make_cloud(rng, 150, 0, span=10),
                             make_cloud(rng, 100, 1, span=10)])
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 384)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=3,
                        level_capacity=(384, 256, 128, 64))
    lv = pyr.levels

    cases = [
        ("same", lv[0].k3_same, lv[0].k3_same, 384, 384),
        ("down", lv[1].down, lv[0].up, 384, 256),
        ("up", lv[0].up, lv[1].down, 256, 384),
    ]
    for name, nbr, inv, n_in, n_out in cases:
        cin, cout = 8, 16
        x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))
        cot = jnp.asarray(rng.randn(n_out, cout).astype(np.float32))

        def loss_ref(x, w):
            return jnp.sum(sparse_conv(x, nbr, w, compute_dtype=jnp.float32,
                                       impl="scan") * cot)

        def loss_fast(x, w):
            return jnp.sum(sparse_conv(x, nbr, w, compute_dtype=jnp.float32,
                                       nbr_inv=inv) * cot)

        out_r = sparse_conv(x, nbr, w, compute_dtype=jnp.float32, impl="scan")
        out_f = sparse_conv(x, nbr, w, compute_dtype=jnp.float32, nbr_inv=inv)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_band_plan_packed_key_resolution():
    """Plan-table lookup precedence: PLAN_OVERRIDES beats _BAND_PLANS, the
    3-part (mode, cin, cout) key beats (mode, cin), and unknown shapes fall
    back to the generic _band_plan rule converted to packed rows. The
    optional 4th 'union' element must pass through untouched."""
    from imfnet_tpu.sparse import ops

    # 3-part key wins over 2-part for the colliding up-256 convs
    assert ops._band_plan_packed("up", 256, 64, 1, 13653, 5120, 27) == \
        ops._BAND_PLANS[("up", 256, 64)]
    assert ops._band_plan_packed("up", 256, 128, 1, 5120, 2048, 27) == \
        ops._BAND_PLANS[("up", 256, 128)]
    # 2-part key serves any cout not specifically planned
    assert ops._band_plan_packed("same", 64, 999, 2, 1000, 1000, 27) == \
        ops._BAND_PLANS[("same", 64)]
    # union kind passes through
    plan = ops._band_plan_packed("same", 128, 128, 1, 5120, 5120, 27)
    assert len(plan) == 4 and plan[3] == "union"
    # overrides win over the table
    ops.PLAN_OVERRIDES[("same", 64)] = (128, 99, True)
    try:
        assert ops._band_plan_packed("same", 64, 64, 2, 1000, 1000, 27) == \
            (128, 99, True)
    finally:
        del ops.PLAN_OVERRIDES[("same", 64)]
    # unknown shape: generic rule, packed conversion
    B, W = ops._band_plan(1000, 1000, 27)
    assert ops._band_plan_packed("same", 16, 16, 8, 1000, 1000, 27) == \
        (B, max(W // 8 + 8, 32), True)
