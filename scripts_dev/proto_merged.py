#!/usr/bin/env python
"""Merged-weight-matmul Pallas conv vs the per-offset accumulating kernel,
at real bench shapes with real kernel maps."""
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
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:56s} {best:8.3f} ms", flush=True)
    return best


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.pallas_conv import banded_conv_pallas
    from imfnet_tpu.sparse.ops import _band_plan
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
        ("L0 same 32ch", lv[0].k3_same, 32, 32, 3),
        ("L0 same 64ch", lv[0].k3_same, 64, 64, 3),
        ("L0 k5 1->32", pyr.k5_l0, 32, 32, 5),
        ("L1 same 64ch", lv[1].k3_same, 64, 64, 3),
        ("L3 same 256ch", lv[3].k3_same, 256, 256, 3),
        ("L1 down 32->64", lv[1].down, 32, 64, 3),
        ("L0 up 128->64", lv[0].up, 128, 64, 3),
    ]
    for name, nbr, cin, cout, kz in cases:
        if nbr is None:
            continue
        n_in_tab = 40960
        x = jnp.asarray(rng.randn(n_in_tab, cin).astype(np.float32)).astype(
            jnp.bfloat16)
        k = nbr.shape[1]
        w = jnp.asarray((rng.randn(k, cin, cout) * 0.05).astype(
            np.float32)).astype(jnp.bfloat16)
        n_out = nbr.shape[0]
        B, W = _band_plan(n_out, n_in_tab, k)
        for merged in (False, True):
            def body(c, xx=x, nbrx=nbr, wx=w, kzx=kz, bb=B, wd=W, mg=merged):
                out, exact = banded_conv_pallas(xx + c.astype(xx.dtype),
                                                nbrx, wx, kz=kzx, block=bb,
                                                width=wd, merged=mg)
                return out + exact.astype(jnp.float32)

            tag = "merged" if merged else "accum "
            timeloop(f"{name} {tag} B={B} W={W}", body)
        # exactness cross-check
        o0, e0 = jax.jit(lambda: banded_conv_pallas(x, nbr, w, kz=kz,
                                                    block=B, width=W,
                                                    merged=False))()
        o1, e1 = jax.jit(lambda: banded_conv_pallas(x, nbr, w, kz=kz,
                                                    block=B, width=W,
                                                    merged=True))()
        if bool(e0):
            err = float(jnp.max(jnp.abs(o0 - o1)))
            print(f"#   merged vs accum max |diff| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
