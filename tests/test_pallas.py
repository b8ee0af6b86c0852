"""Pallas matching kernels vs the jnp oracles (interpret mode on CPU).

The flash-NN kernel (imfnet_tpu.match.pallas_nn) is the TPU fast path for
every matching call site: descriptor NN (`lib/eval.py:18-48` semantics),
mutual-NN FMR matching, ICP correspondence, and the training-time positive
radius search. These tests pin its semantics to `blocked_nn`.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from imfnet_tpu.match.nn import blocked_nn
from imfnet_tpu.match.pallas_nn import nn_pallas


@pytest.mark.parametrize("n,m,d", [(500, 900, 32), (300, 800, 3), (128, 256, 16)])
def test_nn_pallas_matches_blocked(rng, n, m, d):
    q = rng.randn(n, d).astype(np.float32)
    r = rng.randn(m, d).astype(np.float32)
    valid = rng.rand(m) > 0.2
    i0, d0 = blocked_nn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                        block=256, with_dist=True)
    i1, d1 = nn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                       tq=128, tr=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_nn_pallas_unpadded_tiles(rng):
    # n, m not multiples of the tile sizes
    q = rng.randn(77, 8).astype(np.float32)
    r = rng.randn(130, 8).astype(np.float32)
    i0 = blocked_nn(jnp.asarray(q), jnp.asarray(r), None, block=64)
    i1, _ = nn_pallas(jnp.asarray(q), jnp.asarray(r), None,
                      tq=64, tr=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_nn_pallas_all_but_one_invalid(rng):
    q = rng.randn(40, 4).astype(np.float32)
    r = rng.randn(64, 4).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[17] = True
    i1, d1 = nn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                       tq=32, tr=32, interpret=True)
    assert (np.asarray(i1) == 17).all()
    expect = ((q - r[17]) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(d1), expect, rtol=1e-5, atol=1e-5)
