#!/usr/bin/env python
"""Round-4 union-kernel sweep: per conv case, measure the UNION window
spread (one window covering all kernel columns) on-device, then time the
union kernel (one DMA per block, double-buffered across grid steps) against
the per-column kernel at its current _BAND_PLANS plan. Winners get folded
into ops._BAND_PLANS as (B, W, sel_t, "union") entries.

Usage: python scripts_dev/sweep_union.py
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

ITERS = 30


def timeloop(fn):
    @jax.jit
    def run():
        def body(i, c):
            out = fn(c)
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-20)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    _ = float(run())
    t0 = time.perf_counter()
    _ = float(run())
    return (time.perf_counter() - t0) / ITERS * 1e3


def union_spread(nbr, B, pack):
    """max over blocks of (max target - 8-aligned min target + 1), packed."""
    n_out, k = nbr.shape
    nb = -(-n_out // B)
    if nb * B != n_out:
        nbr = jnp.concatenate(
            [nbr, jnp.full((nb * B - n_out, k), -1, jnp.int32)], 0)
    t = nbr.reshape(nb, B * k)
    v = t >= 0
    tp = jnp.where(v, t // pack, t) if pack > 1 else t
    big = jnp.int32(1 << 30)
    tmin = jnp.min(jnp.where(v, tp, big), axis=1)
    tmax = jnp.max(jnp.where(v, tp, -1), axis=1)
    has = tmin != big
    return int(jnp.max(jnp.where(has, tmax - (tmin & ~7) + 1, 0)))


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.ops import _BAND_PLANS
    from imfnet_tpu.sparse.pallas_conv import (
        banded_conv_pallas_planned, banded_conv_pallas_union,
        plan_windows, plan_windows_union)
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
    # (label, map, cin, cout, plan_key, union B candidates)
    cases = [
        ("same32 L0", lv[0].k3_same, 32, 32, ("same", 32), (256, 512)),
        ("same64 L0", lv[0].k3_same, 64, 64, ("same", 64), (256, 512)),
        ("same64 L1", lv[1].k3_same, 64, 64, ("same", 64), (256, 512)),
        ("same128 L2", lv[2].k3_same, 128, 128, ("same", 128), (128, 256)),
        ("same256 L3", lv[3].k3_same, 256, 256, ("same", 256), (128, 256)),
        ("down32", lv[1].down, 32, 64, ("down", 32), (128, 256)),
        ("down64", lv[2].down, 64, 128, ("down", 64), (128, 256)),
        ("down128", lv[3].down, 128, 256, ("down", 128), (128,)),
        ("up128", lv[0].up, 128, 64, ("up", 128), (256, 512)),
        ("up256->64", lv[1].up, 256, 64, ("up", 256, 64), (256, 512)),
        ("up256->128", lv[2].up, 256, 128, ("up", 256, 128), (128, 256)),
    ]
    results = {}
    for label, nbr, cin, cout, key, ubs in cases:
        n_out = int(nbr.shape[0])
        pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
        x = jnp.asarray(rng.randn(40960, cin).astype(np.float32)).astype(
            jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(
            np.float32)).astype(jnp.bfloat16)
        from imfnet_tpu.sparse.ops import _flat_apply
        o_ref = jax.jit(lambda: _flat_apply(x, nbr, w))()
        rows = []
        # current column-kernel plan
        Bc, Wc, sel_t = _BAND_PLANS[key][:3]
        nbr_p, starts, exact = plan_windows(nbr, 3, Wc, 40960,
                                            block=Bc, pack=pack)
        assert bool(exact), (label, "col plan overflow")

        def body_col(c, nbr_p=nbr_p, starts=starts, Bc=Bc, Wc=Wc):
            return banded_conv_pallas_planned(
                x + c.astype(x.dtype), nbr_p, starts, w, n_out,
                kz=3, block=Bc, width=Wc, pack=pack, sel_t=sel_t)

        o = jax.jit(lambda: body_col(jnp.float32(0.0)))()
        err = float(jnp.max(jnp.abs(o - o_ref)))
        dt = timeloop(body_col)
        rows.append(("col", Bc, Wc, dt, err))
        print(f"  {label:12s} col   B={Bc:4d} W={Wc:5d} {dt:7.3f} ms "
              f"err={err:.4f}", flush=True)
        for Bu in ubs:
            spread = union_spread(nbr, Bu, pack)
            Wu = -(-(spread + 8) // 16) * 16
            # VMEM guard: 2 window buffers + selbuf + out
            cp = 128 if pack > 1 else -(-cin // 128) * 128
            cw = cin if pack > 1 else cp
            vmem = (2 * Wu * cp + 27 * cw * Bu + Bu * max(cout, 128)) * 2
            if vmem > 12 * 1024 * 1024:
                print(f"  {label:12s} union B={Bu:4d} W={Wu:5d}  SKIP "
                      f"(vmem {vmem >> 20} MiB)", flush=True)
                continue
            nbr_u, ustarts, uexact = plan_windows_union(nbr, Wu, 40960,
                                                        block=Bu, pack=pack)
            if not bool(uexact):
                print(f"  {label:12s} union B={Bu:4d} W={Wu:5d}  OVERFLOW",
                      flush=True)
                continue

            def body_u(c, nbr_u=nbr_u, ustarts=ustarts, Bu=Bu, Wu=Wu):
                return banded_conv_pallas_union(
                    x + c.astype(x.dtype), nbr_u, ustarts, w, n_out,
                    block=Bu, width=Wu, pack=pack)

            o = jax.jit(lambda: body_u(jnp.float32(0.0)))()
            err = float(jnp.max(jnp.abs(o - o_ref)))
            dt = timeloop(body_u)
            rows.append((f"union", Bu, Wu, dt, err))
            print(f"  {label:12s} union B={Bu:4d} W={Wu:5d} {dt:7.3f} ms "
                  f"err={err:.4f}", flush=True)
        best = min(rows, key=lambda r: r[3])
        results[label] = best
    print("\n# summary (winner per case)")
    for label, (tag, B, W, dt, err) in results.items():
        print(f"{label:14s} {tag:6s} B={B:4d} W={W:5d} {dt:7.3f} ms")


if __name__ == "__main__":
    main()
