#!/usr/bin/env python
"""On-chip check + timing of the LANE-PACKED Pallas conv (pack=128/cin)
vs the unpacked kernel at real bench shapes (real kernel maps).

Usage: python scripts_dev/proto_packed_conv.py
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
    from imfnet_tpu.sparse.ops import _band_plan, _flat_apply
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
    # (name, map, inverse-size table hint, cin, cout)
    cases = [
        ("L0 same 32ch (block1)", lv[0].k3_same, 32, 32),
        ("L0 same 64ch (block2_tr)", lv[0].k3_same, 64, 64),
        ("L1 same 64ch (block2)", lv[1].k3_same, 64, 64),
        ("L1 down 32->64 (conv2)", lv[1].down, 32, 64),
        ("L2 down 64->128 (conv3)", lv[2].down, 64, 128),
        ("L1 up (conv3_tr in) 64ch", lv[1].up, 64, 64),
    ]
    for name, nbr, cin, cout in cases:
        n_out = int(nbr.shape[0])
        B, W = _band_plan(n_out, 40960, int(nbr.shape[1]))
        pack = 128 // cin if cin < 128 else 1
        Wp = max(W // pack + 8, 32)
        x = jnp.asarray(rng.randn(40960, cin).astype(np.float32)).astype(
            jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(
            np.float32)).astype(jnp.bfloat16)

        o_ref = jax.jit(lambda: _flat_apply(x, nbr, w))()
        o_up, e_up = jax.jit(lambda: banded_conv_pallas(
            x, nbr, w, kz=3, block=B, width=W))()
        o_pk, e_pk = jax.jit(lambda: banded_conv_pallas(
            x, nbr, w, kz=3, block=B, width=Wp, pack=pack))()
        o_pm, e_pm = jax.jit(lambda: banded_conv_pallas(
            x, nbr, w, kz=3, block=B, width=Wp, pack=pack, sel_t=False))()
        err_m = float(jnp.max(jnp.abs(o_pm - o_ref)))
        err_u = float(jnp.max(jnp.abs(o_up - o_ref)))
        err_p = float(jnp.max(jnp.abs(o_pk - o_ref)))
        print(f"# {name}: exact up={bool(e_up)} pk={bool(e_pk)} "
              f"err up={err_u:.5f} pk={err_p:.5f}", flush=True)

        def body_up(c):
            out, _ = banded_conv_pallas(x + c.astype(x.dtype), nbr, w,
                                        kz=3, block=B, width=W)
            return out

        def body_pk(c):
            out, _ = banded_conv_pallas(x + c.astype(x.dtype), nbr, w,
                                        kz=3, block=B, width=Wp, pack=pack)
            return out

        def body_pm(c):
            out, _ = banded_conv_pallas(x + c.astype(x.dtype), nbr, w,
                                        kz=3, block=B, width=Wp, pack=pack,
                                        sel_t=False)
            return out

        timeloop(f"{name} unpacked B={B} W={W}", body_up)
        timeloop(f"{name} packed-T P={pack} Wp={Wp}", body_pk)
        timeloop(f"{name} packed-mask P={pack} Wp={Wp}", body_pm)
        # block-size sweep for the transposed packed kernel (stride-1 only)
        if n_out == 40960 or True:
            for B2, W2 in ((512, W + 256), (1024, W + 768)):
                Wp2 = max(W2 // pack + 8, 32)
                ok = jax.jit(lambda b=B2, wd=Wp2: banded_conv_pallas(
                    x, nbr, w, kz=3, block=b, width=wd, pack=pack))()[1]
                def body_b2(c, b=B2, wd=Wp2):
                    out, _ = banded_conv_pallas(x + c.astype(x.dtype), nbr,
                                                w, kz=3, block=b, width=wd,
                                                pack=pack)
                    return out
                timeloop(f"{name} packed-T B={B2} Wp={Wp2} "
                         f"exact={bool(ok)}", body_b2)


if __name__ == "__main__":
    main()
