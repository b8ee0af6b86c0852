#!/usr/bin/env python
"""Sweep (block, width) for the Pallas windowed one-hot conv at real shapes.

Selection FLOPs scale with block*width and per-block window spread scales
~linearly with block, so smaller blocks should win as long as the MXU stays
fed (M >= 128) and the spread still fits the narrower window.

Usage: python scripts_dev/proto_pallas_sweep.py
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
    print(f"{name:56s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.pallas_conv import banded_conv_pallas, plan_windows
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

    # measure actual per-block spreads at several block sizes first
    for name, nbr in [("same L0", lv[0].k3_same), ("down L1", lv[1].down),
                      ("up L0", lv[0].up)]:
        n_in_tab = 40960
        for B in (64, 128, 256, 512):
            t = np.asarray(nbr)
            n_out = t.shape[0]
            nb = -(-n_out // B)
            pad = np.full((nb * B - n_out, t.shape[1]), -1, t.dtype)
            tt = np.concatenate([t, pad]).reshape(nb, B, 9, 3)
            valid = tt >= 0
            tmin = np.where(valid, tt, 1 << 30).min(axis=(1, 3))
            tmax = np.where(valid, tt, -1).max(axis=(1, 3))
            has = tmin != 1 << 30
            spread = np.where(has, tmax - (tmin & ~7), 0)
            print(f"# spread {name} B={B}: p100={spread.max()} "
                  f"p99={np.percentile(spread, 99):.0f}", flush=True)

    rng = np.random.RandomState(0)
    # block must be a multiple of 128: the transposed nbr block's lane axis
    # (Mosaic requires last-dim block sizes divisible by 128)
    cases = [
        ("L0 same 32ch", lv[0].k3_same, 32, 32,
         [(256, 512), (128, 384), (128, 256), (128, 512)]),
        ("L0 same 64ch", lv[0].k3_same, 64, 64,
         [(256, 512), (128, 384), (128, 256)]),
        ("L3 same 256ch", lv[3].k3_same, 256, 256,
         [(256, 512), (128, 256)]),
        ("L1 down 32->64", lv[1].down, 32, 64,
         [(256, 1536), (128, 1024), (128, 768)]),
        ("L0 up 128->64", lv[0].up, 128, 64,
         [(256, 256), (128, 128), (128, 256), (512, 384)]),
    ]
    for name, nbr, cin, cout, cfgs in cases:
        x = jnp.asarray(rng.randn(40960, cin).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
        for B, W in cfgs:
            def body(c, xx=x, nbrx=nbr, wx=w, bb=B, wd=W):
                out, exact = banded_conv_pallas(xx + c.astype(xx.dtype), nbrx,
                                                wx, kz=3, block=bb, width=wd)
                return out + exact.astype(jnp.float32)

            ex = jax.jit(lambda bb=B, wd=W: banded_conv_pallas(
                x, nbr, w, kz=3, block=bb, width=wd)[1])()
            tag = "" if bool(ex) else "  [OVERFLOW→garbage]"
            timeloop(f"{name} B={B} W={W}{tag}", body)


if __name__ == "__main__":
    main()
