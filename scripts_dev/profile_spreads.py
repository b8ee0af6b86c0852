#!/usr/bin/env python
"""Window-spread statistics for every conv map at bench shapes.

For each (map, block size B, pack P): per-column per-block target spread
(max - aligned start), reported as p50/p90/p99/p100 over blocks, per
column class. This decides how much of the Pallas banded conv's selection
cost (2*width*B*128 FLOPs per offset per block) is jitter vs. B itself,
whether per-column width classes are worth a two-tier kernel, and the
best (B, W) plan per conv (VERDICT r4 item 1 avenues a/b).

Usage: python scripts_dev/profile_spreads.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def spread_stats(nbr, B, pack, kz=3):
    """Per-column window spreads over blocks, in PACKED rows, with the
    8-row aligned start plan_windows uses."""
    n_out, k = nbr.shape
    ncol = k // kz
    nb = -(-n_out // B)
    pad = nb * B - n_out
    if pad:
        nbr = np.concatenate([nbr, np.full((pad, k), -1, np.int32)])
    t = nbr.reshape(nb, B, ncol, kz)
    valid = t >= 0
    tp = np.where(valid, t // pack, t)
    big = 1 << 30
    tmin = np.where(valid, tp, big).min(axis=(1, 3))      # [nb, ncol]
    tmax = np.where(valid, tp, -1).max(axis=(1, 3))
    has = tmin != big
    start = np.where(has, tmin & ~7, 0)
    spread = np.where(has, tmax - start + 1, 0)           # packed rows
    return spread, has


def report(name, nbr, cin, packs=None):
    nbr = np.asarray(nbr)
    n_out, k = nbr.shape
    kz = 3
    pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
    print(f"\n== {name}: n_out={n_out} k={k} cin={cin} pack={pack}")
    for B in (128, 256, 512):
        spread, has = spread_stats(nbr, B, pack, kz)
        s = spread[has]
        cols = []
        ncol = k // kz
        for c in range(ncol):
            sc = spread[:, c][has[:, c]]
            if len(sc):
                cols.append((c, int(np.percentile(sc, 50)),
                             int(np.percentile(sc, 99)), int(sc.max())))
        col_str = " ".join(f"c{c}:{p50}/{p99}/{mx}" for c, p50, p99, mx in cols)
        print(f"  B={B:4d}: all p50={np.percentile(s,50):5.0f} "
              f"p90={np.percentile(s,90):5.0f} p99={np.percentile(s,99):5.0f} "
              f"max={s.max():5d}   per-col(p50/p99/max): {col_str}")


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
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
    print(f"# voxels {int(sv.num_valid)}")
    for i, l in enumerate(lv):
        counts = [int(np.asarray(x.shape[0])) for x in [l.k3_same]]
        print(f"# level {i}: rows {counts[0]}")

    report("L0 same (block1, 32ch)", lv[0].k3_same, 32)
    report("L0 same as 64ch (conv2_tr out)", lv[0].k3_same, 64)
    report("L1 same (block2, 64ch)", lv[1].k3_same, 64)
    report("L2 same (block3, 128ch)", lv[2].k3_same, 128)
    report("L3 same (block4, 256ch)", lv[3].k3_same, 256)
    report("L1 down (conv2, 32->64)", lv[1].down, 32)
    report("L2 down (conv3, 64->128)", lv[2].down, 64)
    report("L3 down (conv4, 128->256)", lv[3].down, 128)
    report("L0 up (conv2_tr, 64ch in)", lv[0].up, 64)
    report("L1 up (conv3_tr, 128ch in)", lv[1].up, 128)
    report("L2 up (conv4_tr, 256ch in)", lv[2].up, 256)


if __name__ == "__main__":
    main()
