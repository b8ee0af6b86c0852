"""Model-level tests: fusion batching parity, ResUNet forward, registry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.models import load_model
from imfnet_tpu.models.fusion import (
    AttentionFusion,
    gather_from_padded,
    scatter_to_padded,
)
from imfnet_tpu.sparse.build import from_numpy, sort_coords_np
from imfnet_tpu.sparse.kernel_map import build_pyramid


def make_cloud(rng, n, batch, span=12):
    pts = rng.randint(-span, span, (4 * n, 3))
    pts = np.unique(pts, axis=0)[:n]
    coords = np.concatenate(
        [np.full((len(pts), 1), batch, np.int64), pts], axis=1
    ).astype(np.int32)
    return coords


def test_scatter_gather_roundtrip(rng):
    feats = rng.randn(16, 4).astype(np.float32)
    batch_ids = np.array([0] * 6 + [1] * 7 + [0] * 3)  # last 3 invalid
    ranks = np.array(list(range(6)) + list(range(7)) + [0, 1, 2])
    valid = np.array([True] * 13 + [False] * 3)
    padded = scatter_to_padded(
        jnp.asarray(feats), jnp.asarray(batch_ids), jnp.asarray(ranks),
        jnp.asarray(valid), 2, 8
    )
    assert padded.shape == (2, 8, 4)
    np.testing.assert_allclose(np.asarray(padded)[0, :6], feats[:6])
    np.testing.assert_allclose(np.asarray(padded)[1, :7], feats[6:13])
    assert np.abs(np.asarray(padded)[0, 6:]).max() == 0
    back = gather_from_padded(padded, jnp.asarray(batch_ids), jnp.asarray(ranks),
                              jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(back)[:13], feats[:13])
    assert np.abs(np.asarray(back)[13:]).max() == 0


def test_attention_fusion_matches_naive(rng):
    """Batched fusion == naive per-sample einsum reference."""
    B, M, T, dq, dc = 2, 5, 7, 8, 6
    ctx = rng.randn(B, T, dc).astype(np.float32)
    q = rng.randn(B, M, dq).astype(np.float32)
    mod = AttentionFusion(dim=dc, latent_dim=dq, depth=0, cross_heads=1,
                          cross_dim_head=4, compute_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(ctx), jnp.asarray(q))
    out = np.asarray(mod.apply(params, jnp.asarray(ctx), jnp.asarray(q)))

    # naive per-sample reference (same math as model/attention_fusion.py:132-154)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]

    def ln(x, s):  # flax LayerNorm
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * p[s]["scale"] + p[s]["bias"]

    def gelu(x):
        import scipy.special as sp
        return x * 0.5 * (1 + sp.erf(x / np.sqrt(2)))

    for b in range(B):
        xq = ln(q[b], "cross_norm_q")
        xc = ln(ctx[b], "cross_norm_ctx")
        qq = xq @ p["cross_attn"]["to_q"]["kernel"]
        kv = xc @ p["cross_attn"]["to_kv"]["kernel"]
        k, v = np.split(kv, 2, axis=-1)
        sim = qq @ k.T / np.sqrt(qq.shape[-1])
        attn = np.exp(sim - sim.max(-1, keepdims=True))
        attn /= attn.sum(-1, keepdims=True)
        o = attn @ v
        o = o @ p["cross_attn"]["to_out"]["kernel"] + p["cross_attn"]["to_out"]["bias"]
        x = o + q[b]
        xn = ln(x, "cross_ff_norm")
        h = xn @ p["cross_ff"]["wi"]["kernel"] + p["cross_ff"]["wi"]["bias"]
        h1, g = np.split(h, 2, axis=-1)
        ff = (h1 * gelu(g)) @ p["cross_ff"]["wo"]["kernel"] + p["cross_ff"]["wo"]["bias"]
        expect = ff + x
        np.testing.assert_allclose(out[b], expect, rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def small_model_setup():
    rng = np.random.RandomState(1)
    c0 = make_cloud(rng, 120, 0)
    c1 = make_cloud(rng, 90, 1)
    coords = np.concatenate([c0, c1])
    feats = rng.randn(len(coords), 1).astype(np.float32)
    sv = from_numpy(coords, feats, 512)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=3,
                        level_capacity=(512, 256, 128, 64))
    images = rng.rand(2, 24, 32, 3).astype(np.float32)
    model = load_model("ResUNetBN2C")(
        in_channels=1, out_channels=16, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), sv, pyr, jnp.asarray(images), train=False
    )
    return rng, c0, c1, coords, feats, sv, pyr, images, model, variables


def test_resunet_forward_shapes(small_model_setup):
    _, _, _, coords, _, sv, pyr, images, model, variables = small_model_setup
    out = model.apply(variables, sv, pyr, jnp.asarray(images), train=False)
    out = np.asarray(out)
    n = len(coords)
    assert out.shape == (512, 16)
    norms = np.linalg.norm(out[:n], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    assert np.abs(out[n:]).max() == 0  # padding stays zero
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_resunet_batch_equals_per_sample(small_model_setup):
    """Eval-mode forward of a 2-sample batch == each sample alone.

    Exercises batch-segment logic, the batched fusion, and padding hygiene.
    """
    rng, c0, c1, coords, feats, sv, pyr, images, model, variables = small_model_setup
    out = np.asarray(model.apply(variables, sv, pyr, jnp.asarray(images), train=False))

    order = sort_coords_np(coords)
    sorted_coords = coords[order]
    n0 = len(c0)

    outs = []
    for b, (cb, ib) in enumerate([(c0, images[0:1]), (c1, images[1:2])]):
        m = sorted_coords[:, 0] == b
        fb = feats[order][m]
        cb2 = sorted_coords[m].copy()
        cb2[:, 0] = 0
        svb = from_numpy(cb2, fb, 256)
        pyrb = build_pyramid(svb.coords, svb.num_valid, conv1_kernel_size=3,
                             level_capacity=(256, 128, 64, 64))
        ob = model.apply(variables, svb, pyrb, jnp.asarray(ib), train=False)
        outs.append(np.asarray(ob)[: m.sum()])

    np.testing.assert_allclose(out[:n0], outs[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out[n0:len(coords)], outs[1], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_resunet_train_grads(small_model_setup):
    _, _, _, _, _, sv, pyr, images, model, variables = small_model_setup

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            sv, pyr, jnp.asarray(images), train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out * out), updates

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the image trunk must receive gradient through the fusion
    g_img = grads["img_encoder"]["conv1"]["kernel"]
    assert float(jnp.abs(g_img).max()) > 0


def test_simpleunet_forward(rng):
    from imfnet_tpu.sparse.build import from_numpy as fn
    coords = make_cloud(rng, 100, 0)
    feats = rng.randn(len(coords), 1).astype(np.float32)
    sv = fn(coords, feats, 256)
    pyr = build_pyramid(sv.coords, sv.num_valid, conv1_kernel_size=3,
                        level_capacity=(256, 128, 64, 64))
    model = load_model("SimpleNet")(
        in_channels=1, out_channels=8, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, train=False)
    out = np.asarray(model.apply(variables, sv, pyr, train=False))
    n = len(coords)
    np.testing.assert_allclose(np.linalg.norm(out[:n], axis=1), 1.0, rtol=1e-4)


def test_registry():
    with pytest.raises(ValueError):
        load_model("NotAModel")
    # full reference zoo (`model/resunet.py:276-326`, `model/simpleunet.py`)
    names = (
        [f"ResUNet{n}2{s}" for n in ("BN", "IN") for s in ("", "B", "C", "D", "E")]
        + ["SimpleNet", "SimpleNet2", "SimpleNet3"]
        + [f"SimpleNet{n}{d}{s}" for n in ("BN", "IN") for d in ("", "2", "3")
           for s in ("", "E")]
        + ["SimpleNetBN2B", "SimpleNetBN2C", "SimpleNetBN2D",
           "SimpleNetBN3B", "SimpleNetBN3C", "SimpleNetBN3D"]
    )
    for name in names:
        assert load_model(name) is not None, name


@pytest.mark.slow
def test_simplenet_variant_forward(rng):
    """One BN and one IN variant instantiate and run (5-level SimpleNet3E)."""
    from imfnet_tpu.sparse.build import from_numpy
    from imfnet_tpu.sparse.kernel_map import build_pyramid

    coords = make_cloud(rng, 200, 0, span=16)
    sv = from_numpy(coords, np.ones((len(coords), 1), np.float32), 256)
    pyr = build_pyramid(sv.coords, sv.num_valid, num_levels=5,
                        conv1_kernel_size=3,
                        level_capacity=(256, 128, 64, 64, 64))
    for name in ("SimpleNetBN3E", "SimpleNetIN2E"):
        model = load_model(name)(in_channels=1, out_channels=8,
                                 conv1_kernel_size=3,
                                 compute_dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), sv, pyr, None, train=False)
        out = model.apply(variables, sv, pyr, None, train=False)
        assert np.isfinite(np.asarray(out)).all(), name
