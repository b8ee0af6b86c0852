#!/usr/bin/env python
"""Benchmark the Pallas windowed one-hot conv vs the XLA strategies at the
real bench shapes (real kernel maps from the reference sample pair).

Usage: python scripts_dev/proto_pallas_conv.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20


def timeloop(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(c, *a)
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-20)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.ops import _flat_apply, _banded_apply, _mul_first_apply
    from imfnet_tpu.sparse.pallas_conv import banded_conv_pallas
    from imfnet_tpu.train.step import make_pyramid_fn
    import bench

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, im0, im1, src = bench.load_pair(config)
    N_RAW = 1 << 18
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = np.concatenate([xyz0_raw, xyz1_raw])
    bidx = np.repeat(np.array([0, 1], np.int32), N_RAW)
    okm = np.zeros(2 * N_RAW, bool)
    okm[:n0] = True
    okm[N_RAW:N_RAW + n1] = True
    sv, _, _ = quantize_grid(jnp.asarray(xyz_cat),
                             jnp.ones((2 * N_RAW, 1), jnp.float32),
                             jnp.asarray(okm), config.voxel_size, 40960, spec,
                             batch_index=jnp.asarray(bidx))
    pyr = make_pyramid_fn(config, 40960, num_batches=2)(sv.coords,
                                                        sv.num_valid)
    lv = pyr.levels
    print(f"# voxels {int(sv.num_valid)}", flush=True)

    rng = np.random.RandomState(0)
    cases = [
        ("L0 same 32ch (block1)", lv[0].k3_same, 32, 32, 512),
        ("L0 same 64ch (block2_tr)", lv[0].k3_same, 64, 64, 512),
        ("L1 same 64ch (block2)", lv[1].k3_same, 64, 64, 512),
        ("L2 same 128ch (block3)", lv[2].k3_same, 128, 128, 512),
        ("L3 same 256ch (block4)", lv[3].k3_same, 256, 256, 512),
        ("L1 down 32->64 (conv2)", lv[1].down, 32, 64, 1536),
        ("L0 up 128->64 (conv2_tr)", lv[0].up, 128, 64, 256),
    ]
    for name, nbr, cin, cout, width in cases:
        n_out = int(nbr.shape[0])
        n_in_tab = n_out  # same-level table size for 'same'; approximate
        x = jnp.asarray(rng.randn(40960, cin).astype(np.float32)).astype(jnp.bfloat16)
        # use a table big enough for any map's targets
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32)).astype(jnp.bfloat16)

        def pallas_body(c, xx=x, nbrx=nbr, wx=w, wd=width):
            out, exact = banded_conv_pallas(xx + c.astype(xx.dtype), nbrx, wx,
                                            kz=3, width=wd)
            return out + exact.astype(jnp.float32)

        def flat_body(c, xx=x, nbrx=nbr, wx=w):
            return _flat_apply(xx + c.astype(xx.dtype), nbrx, wx)

        # correctness spot-check on TPU
        o1 = jax.jit(lambda: banded_conv_pallas(x, nbr, w, kz=3, width=width))()
        o2 = jax.jit(lambda: _flat_apply(x, nbr, w))()
        err = float(jnp.max(jnp.abs(o1[0] - o2)))
        print(f"# {name}: exact={bool(o1[1])} maxerr={err:.5f}", flush=True)

        timeloop(f"{name} pallas w={width}", pallas_body)
        timeloop(f"{name} flat", flat_body)


if __name__ == "__main__":
    main()
