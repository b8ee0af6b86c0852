"""Pallas windowed one-hot conv (sparse/pallas_conv.py) vs the gather-GEMM
oracle, in interpreter mode on CPU (the kernel itself targets TPU; Mosaic
semantics are identical)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.sparse.pallas_conv import banded_conv_pallas


def _oracle(x, nbr, w):
    n_in, cin = x.shape
    xe = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], 0)
    idx = jnp.where(nbr >= 0, nbr, n_in)
    return jnp.einsum("nkc,kcd->nd", jnp.take(xe, idx, 0).astype(jnp.float32),
                      w.astype(jnp.float32))


def _banded_map(rng, n_in, n_out, k, kz, miss=0.25, spread=7):
    """Rank-monotone-ish map: per column, targets follow the output index
    with a column-dependent shift — the structure real scan-order kernel
    maps have (see sparse/grid.py docstring)."""
    base = np.linspace(0, n_in - 1, n_out).astype(np.int64)
    nbr = np.full((n_out, k), -1, np.int32)
    for j in range(k):
        col = j // kz
        t = base + (col - (k // kz) // 2) * spread + (j % kz) - kz // 2
        ok = (t >= 0) & (t < n_in) & (rng.rand(n_out) > miss)
        nbr[:, j] = np.where(ok, np.clip(t, 0, n_in - 1), -1)
    return jnp.asarray(nbr)


@pytest.mark.parametrize("shape", [
    (700, 700, 32, 48, 27, 3, 512),    # stride-1-like
    (900, 300, 64, 32, 27, 3, 1024),   # down-like: a 256-output block spans
                                       # ~3x more input rows (cf. _band_width)
    (300, 900, 32, 64, 27, 3, 512),    # up-like
    (500, 500, 16, 16, 125, 5, 512),   # k5 column layout
])
def test_pallas_conv_matches_oracle(shape):
    n_in, n_out, cin, cout, k, kz, width = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(k, cin, cout) * 0.05).astype(np.float32))
    nbr = _banded_map(rng, n_in, n_out, k, kz)
    out, exact = banded_conv_pallas(x, nbr, w, kz=kz, width=width,
                                    interpret=True)
    assert bool(exact)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,pack", [(32, 4), (64, 2), (16, 8)])
def test_pallas_conv_lane_packed_matches_oracle(cin, pack):
    """pack=P lane-packs P rows per 128-lane table row (P*cin == 128):
    P× less selection work, bit-identical semantics."""
    rng = np.random.RandomState(4)
    n_in, n_out, cout = 700, 700, 48
    x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))
    nbr = _banded_map(rng, n_in, n_out, 27, 3)
    out, exact = banded_conv_pallas(x, nbr, w, kz=3, width=512 // pack + 8,
                                    pack=pack, interpret=True)
    assert bool(exact)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_conv_packed_missing_rows():
    rng = np.random.RandomState(5)
    n = 300
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.05)
    nbr = np.asarray(_banded_map(rng, n, n, 27, 3)).copy()
    nbr[10] = -1
    out, exact = banded_conv_pallas(x, jnp.asarray(nbr), w, kz=3, width=136,
                                    pack=4, interpret=True)
    assert bool(exact)
    assert float(jnp.max(jnp.abs(out[10]))) == 0.0
    ref = _oracle(x, jnp.asarray(nbr), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_conv_overflow_flag():
    """A window spread beyond `width` must clear the exact flag (the caller
    falls back via lax.cond — ops._apply)."""
    rng = np.random.RandomState(1)
    n = 600
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.05)
    nbr = np.asarray(_banded_map(rng, n, n, 27, 3)).copy()
    nbr[0, 0] = 0
    nbr[1, 0] = n - 1          # spread ~n inside one block
    _, exact = banded_conv_pallas(x, jnp.asarray(nbr), w, kz=3, width=64,
                                  interpret=True)
    assert not bool(exact)


def test_ops_strategy_routes_through_pallas(monkeypatch):
    """ops._apply picks the Pallas path on TPU backends; exercise the wiring
    (plan → lax.cond → kernel) in interpret mode, plus the overflow fallback
    to _flat_apply."""
    import functools

    from imfnet_tpu.sparse import ops, pallas_conv

    monkeypatch.setattr(
        ops, "banded_conv_pallas_planned",
        functools.partial(pallas_conv.banded_conv_pallas_planned,
                          interpret=True))
    monkeypatch.setattr(ops.jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(3)
    n = 700
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(27, 32, 48) * 0.05).astype(np.float32))
    nbr = _banded_map(rng, n, n, 27, 3)
    out = ops._apply(x, nbr, w, z_adjacent=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(x, nbr, w)),
                               rtol=1e-4, atol=1e-4)

    over = np.asarray(nbr).copy()
    over[0, 0] = 0
    over[1, 0] = n - 1           # block-0 spread ~n > _band_width → fallback
    out2 = ops._apply(x, jnp.asarray(over), w, z_adjacent=True)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(_oracle(x, jnp.asarray(over), w)),
        rtol=1e-4, atol=1e-4)


def test_pallas_conv_all_missing_rows():
    """Rows whose neighbors are all -1 (padding rows) come out exactly 0."""
    rng = np.random.RandomState(2)
    n = 300
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.05)
    nbr = np.asarray(_banded_map(rng, n, n, 27, 3)).copy()
    nbr[10] = -1
    out, exact = banded_conv_pallas(x, jnp.asarray(nbr), w, kz=3, width=512,
                                    interpret=True)
    assert bool(exact)
    assert float(jnp.max(jnp.abs(out[10]))) == 0.0


@pytest.mark.parametrize("shape", [
    (700, 700, 32, 48, 27, 3, 4),     # pack=4 (group-sum compression path)
    (700, 700, 64, 32, 27, 3, 2),     # pack=2
    (900, 300, 128, 64, 27, 3, 1),    # pack=1, down-like
    (300, 900, 48, 64, 27, 3, 1),     # pack=1 with lane padding (48 -> 128)
])
def test_pallas_conv_union_matches_oracle(shape):
    """Union-window kernel (one DMA per block, double-buffered across grid
    steps) vs the gather-GEMM oracle, both pack layouts."""
    from imfnet_tpu.sparse.pallas_conv import (banded_conv_pallas_union,
                                               plan_windows_union)

    n_in, n_out, cin, cout, k, kz, pack = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n_in, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(k, cin, cout) * 0.05).astype(np.float32))
    nbr = _banded_map(rng, n_in, n_out, k, kz)
    width = 2048 // max(pack, 1)
    nbr_p, starts, exact = plan_windows_union(nbr, width, n_in,
                                              block=128, pack=pack)
    assert bool(exact)
    out = banded_conv_pallas_union(x, nbr_p, starts, w, n_out, block=128,
                                   width=width, pack=pack, interpret=True)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_plan_windows_union_overflow():
    """A union width smaller than the true spread must report exact=False."""
    from imfnet_tpu.sparse.pallas_conv import plan_windows_union

    rng = np.random.RandomState(2)
    nbr = _banded_map(rng, 900, 300, 27, 3)
    _, _, exact = plan_windows_union(nbr, 16, 900, block=128)
    assert not bool(exact)


@pytest.mark.parametrize("kind,pack", [("col", 1), ("col", 2),
                                       ("union", 1), ("union", 4)])
def test_dead_suffix_blocks_skipped_and_zero(kind, pack):
    """Capacity padding (valid rows are a compacted prefix) makes trailing
    blocks all-(-1): block_live marks them dead, the kernels skip their
    DMA/compute, and their output rows are exactly zero — identical to the
    oracle over the full padded table."""
    from imfnet_tpu.sparse.pallas_conv import (banded_conv_pallas,
                                               banded_conv_pallas_union,
                                               block_live,
                                               plan_windows_union)

    cin = 128 // pack if pack > 1 else 48
    cout = 32
    n_valid, n_pad = 500, 1024            # blocks of 128: 4 live, 4 dead
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(n_pad, cin).astype(np.float32))
    w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32))
    nbr_valid = _banded_map(rng, n_valid, n_valid, 27, 3)
    nbr = jnp.concatenate(
        [nbr_valid, jnp.full((n_pad - n_valid, 27), -1, jnp.int32)], 0)
    live = block_live(nbr, 128)
    assert live.tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    if kind == "col":
        out, exact = banded_conv_pallas(x, nbr, w, kz=3, block=128,
                                        width=1024 // max(pack, 1),
                                        pack=pack, interpret=True)
        assert bool(exact)
    else:
        width = 2048 // max(pack, 1)
        nbr_p, starts, exact = plan_windows_union(nbr, width, n_pad,
                                                  block=128, pack=pack)
        assert bool(exact)
        out = banded_conv_pallas_union(x, nbr_p, starts, w, n_pad,
                                       block=128, width=width, pack=pack,
                                       live=live, interpret=True)
    ref = _oracle(x, nbr, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(out)[n_valid + 12:] == 0.0)
