#!/usr/bin/env python
"""Round-4 plan sweep: per conv case, time the Pallas banded kernel at
(B, width) candidates derived from measured spreads (profile_spreads.py)
vs the previous one-size plans. Widths in PACKED rows. Winners get folded
into ops._BAND_PLANS.

Usage: python scripts_dev/sweep_plan_r4.py
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


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.ops import _flat_apply
    from imfnet_tpu.sparse.pallas_conv import (banded_conv_pallas_planned,
                                               plan_windows)
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
    # (label, map, cin, cout, candidates [(B, Wp)], old plan (B, Wp))
    # ROUND 2: round-1 winners re-timed under group-sum compression, plus
    # larger blocks (round 1 showed the kernel is issue-bound — bigger B
    # amortizes the inherent slab spread) and non-overflow up128 widths.
    cases = [
        ("same32 L0 (block1)", lv[0].k3_same, 32, 32,
         [(512, 240), (768, 336), (1024, 448)], (256, 136)),
        ("same64 L0 (block2_tr)", lv[0].k3_same, 64, 64,
         [(256, 304), (512, 464), (1024, 880)], (256, 264)),
        ("same64 L1 (block2)", lv[1].k3_same, 64, 64,
         [(256, 304), (512, 464)], (256, 264)),
        ("same128 L2 (block3)", lv[2].k3_same, 128, 128,
         [(256, 448), (512, 1008)], (256, 512)),
        ("same256 L3 (block4)", lv[3].k3_same, 256, 256,
         [(128, 224), (256, 368)], (256, 512)),
        ("down32 (conv2)", lv[1].down, 32, 64,
         [(256, 384), (512, 688)], (128, 264)),
        ("down64 (conv3)", lv[2].down, 64, 128,
         [(128, 384), (256, 640)], (128, 520)),
        ("down128 (conv4)", lv[3].down, 128, 256,
         [(128, 720)], (128, 1024)),
        ("up128 conv2_tr (lv0.up)", lv[0].up, 128, 64,
         [(256, 176), (512, 224), (512, 256), (1024, 448)], (512, 384)),
        ("up256 conv3_tr (lv1.up)", lv[1].up, 256, 64,
         [(512, 240), (1024, 416)], (512, 384)),
        ("up256 conv4_tr (lv2.up)", lv[2].up, 256, 128,
         [(128, 96), (256, 128)], (512, 384)),
    ]
    results = {}
    for label, nbr, cin, cout, cands, old in cases:
        n_out = int(nbr.shape[0])
        pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
        x = jnp.asarray(rng.randn(40960, cin).astype(np.float32)).astype(
            jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, cin, cout) * 0.05).astype(
            np.float32)).astype(jnp.bfloat16)
        o_ref = jax.jit(lambda: _flat_apply(x, nbr, w))()
        rows = []
        for tag, (B, Wp) in [("old", old)] + [("new", c) for c in cands]:
            nbr_p, starts, exact = plan_windows(nbr, 3, Wp, 40960,
                                                block=B, pack=pack)
            ok = bool(exact)

            def body(c, nbr_p=nbr_p, starts=starts, B=B, Wp=Wp):
                return banded_conv_pallas_planned(
                    x + c.astype(x.dtype), nbr_p, starts, w, n_out,
                    kz=3, block=B, width=Wp, pack=pack, sel_t=True)

            if not ok:
                print(f"  {label:28s} {tag} B={B:4d} Wp={Wp:5d}  OVERFLOW",
                      flush=True)
                continue
            o = jax.jit(lambda: body(jnp.float32(0.0)))()
            err = float(jnp.max(jnp.abs(o - o_ref)))
            dt = timeloop(body)
            rows.append((tag, B, Wp, dt, err))
            print(f"  {label:28s} {tag} B={B:4d} Wp={Wp:5d} "
                  f"{dt:7.3f} ms err={err:.4f}", flush=True)
        best = min(rows, key=lambda r: r[3])
        results[label] = best
        print(f"  -> best {label}: B={best[1]} Wp={best[2]} {best[3]:.3f} ms",
              flush=True)
    print("\n# summary")
    for label, (tag, B, Wp, dt, err) in results.items():
        print(f"{label:30s} B={B:4d} Wp={Wp:5d} {dt:7.3f} ms ({tag})")


if __name__ == "__main__":
    main()
