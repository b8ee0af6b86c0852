"""sorted_compact Pallas kernel vs numpy oracle (interpret mode on CPU),
and the quantize_grid pallas compaction path vs the XLA tail.

The kernel compacts a sorted (cell-key, row) stream to first-of-run rows —
the quantization dedup tail. Reference semantics:
`ME.utils.sparse_quantize` first-occurrence winners as used at
`/root/reference/util/misc.py:83`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.sparse.pallas_quant import BIG, sorted_compact


def _oracle(key, rows, n_out):
    sh, sr = jax.lax.sort((jnp.asarray(key), jnp.asarray(rows)),
                          num_keys=1, is_stable=True)
    sh, sr = np.asarray(sh), np.asarray(sr)
    first = (sh != BIG) & np.concatenate([[True], sh[1:] != sh[:-1]])
    return sh, sr, sr[first], sh[first], min(int(first.sum()), n_out)


def _check(key, rows, n_out, block=2048):
    sh, sr, exp_rows, exp_keys, nv_exp = _oracle(key, rows, n_out)
    sel, nv = sorted_compact(jnp.asarray(sh), jnp.asarray(sr), n_out,
                             block=block, interpret=True)
    assert int(nv) == nv_exp
    np.testing.assert_array_equal(np.asarray(sel)[:nv_exp],
                                  exp_rows[:n_out])
    assert np.all(np.asarray(sel)[nv_exp:] == BIG)


def test_sorted_compact_dups_and_invalids(rng):
    n = 4096
    key = np.where(rng.rand(n) < 0.1, BIG,
                   rng.randint(0, 700, n)).astype(np.int32)
    _check(key, np.arange(n, dtype=np.int32), 1024)


def test_sorted_compact_capacity_overflow(rng):
    n = 4096
    key = rng.randint(0, 3000, n).astype(np.int32)
    _check(key, np.arange(n, dtype=np.int32), 512)


def test_sorted_compact_all_invalid():
    n = 2048
    _check(np.full(n, BIG, np.int32), np.arange(n, dtype=np.int32), 64)


def test_sorted_compact_27bit_keys_exact(rng):
    """Keys only steer marks (never cross a matmul); row payloads must
    survive the f32 one-hot dot at any magnitude < 2^24."""
    n = 2048
    key = rng.randint(0, 1 << 27, n).astype(np.int32)
    _check(key, np.arange(n, dtype=np.int32), 2048)


def test_sorted_compact_exact_under_default_matmul_precision(rng):
    """The MXU truncates f32 dot inputs to bf16 at default precision; the
    payload dot pins Precision.HIGHEST so integer payloads stay exact.
    (conftest forces highest globally — drop to default to prove the
    kernel doesn't rely on it.)"""
    n = 4096
    key = rng.randint(0, 900, n).astype(np.int32)
    with jax.default_matmul_precision("default"):
        _check(key, np.arange(n, dtype=np.int32), 1024)


def test_quantize_grid_pallas_path_matches_xla(rng):
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

    n, n_out = 4096, 1024
    spec = GridSpec(extent=(64, 64, 64), num_batches=2)
    xyz = (rng.rand(n, 3) * 1.2).astype(np.float32)
    valid = rng.rand(n) < 0.9
    bidx = (rng.rand(n) < 0.5).astype(np.int32)
    feats = rng.randn(n, 3).astype(np.float32)
    args = (jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(valid),
            0.05, n_out, spec)
    sv_x, sel_x, xd_x = quantize_grid(*args, batch_index=jnp.asarray(bidx),
                                      compact_impl="xla")
    sv_p, sel_p, xd_p = quantize_grid(*args, batch_index=jnp.asarray(bidx),
                                      compact_impl="pallas")
    assert int(sv_x.num_valid) == int(sv_p.num_valid)
    np.testing.assert_array_equal(np.asarray(sv_x.coords),
                                  np.asarray(sv_p.coords))
    np.testing.assert_array_equal(np.asarray(sel_x), np.asarray(sel_p))
    np.testing.assert_allclose(np.asarray(sv_x.feats),
                               np.asarray(sv_p.feats))
    np.testing.assert_allclose(np.asarray(xd_x), np.asarray(xd_p))
