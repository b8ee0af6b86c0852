"""Measure band structure of kernel maps on the real bench pair.

For each pyramid level and kernel offset, targets of consecutive output rows
should be nearly diagonal in scan order (rank(out) ~ out + drift). This
script quantizes the reference sample pair exactly like bench.py, pulls the
kernel maps to host, and reports per-block (B=256) spreads:

  spread = max(valid targets in block) - min(valid targets in block)

which bounds the dynamic window W a banded one-hot GEMM conv needs.

Usage: python scripts_dev/profile_band.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
from imfnet_tpu.train.step import make_pyramid_fn


def band_stats(nbr, n_valid, B=256):
    """Per-offset block spread stats over valid rows."""
    nbr = np.asarray(nbr)[:n_valid]
    n, k = nbr.shape
    nb = n // B
    out = []
    for kk in range(k):
        col = nbr[: nb * B, kk].reshape(nb, B).astype(np.int64)
        valid = col >= 0
        hi = np.where(valid, col, -1).max(axis=1)
        lo = np.where(valid, col, 1 << 60).min(axis=1)
        any_v = valid.any(axis=1)
        spread = np.where(any_v, hi - lo, 0)
        # drift: distance of block's first valid target from block start row
        drift = np.where(any_v, lo - np.arange(nb) * B, 0)
        out.append((spread, drift, any_v))
    spreads = np.stack([s for s, _, _ in out])
    drifts = np.stack([d for _, d, _ in out])
    return spreads, drifts


def main():
    import bench

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, im0, im1, src = bench.load_pair(config)
    print(f"# {src}")
    N_RAW = 1 << 18
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = np.concatenate([xyz0_raw, xyz1_raw])
    bidx = np.repeat(np.array([0, 1], np.int32), N_RAW)
    ok = np.zeros(2 * N_RAW, bool)
    ok[:n0] = True
    ok[N_RAW:N_RAW + n1] = True
    N_PAD2 = 40960
    sv, _, _ = quantize_grid(jnp.asarray(xyz_cat),
                             jnp.ones((2 * N_RAW, 1), jnp.float32),
                             jnp.asarray(ok), config.voxel_size, N_PAD2, spec,
                             batch_index=jnp.asarray(bidx))
    pyr = make_pyramid_fn(config, N_PAD2, num_batches=2)(sv.coords,
                                                         sv.num_valid)
    n_valid = int(sv.num_valid)
    print(f"# voxels: {n_valid} / pad {N_PAD2}")

    maps = [("k5_l0", pyr.k5_l0, n_valid)]
    n_lv = n_valid
    for li, lv in enumerate(pyr.levels):
        maps.append((f"L{li}.k3_same", lv.k3_same, n_lv))
        if lv.down is not None:
            maps.append((f"L{li}.down", lv.down, lv.down.shape[0]))
            n_lv = lv.down.shape[0]
        if lv.up is not None:
            maps.append((f"L{li}.up", lv.up, lv.up.shape[0]))

    for name, nbr, nv in maps:
        nv = min(nv, nbr.shape[0])
        if nv < 512:
            continue
        spreads, drifts = band_stats(nbr, nv)
        p = np.percentile(spreads, [50, 95, 99, 99.9, 100])
        dmin, dmax = drifts.min(), drifts.max()
        print(f"{name:12s} rows={nv:6d} K={nbr.shape[1]:3d} "
              f"spread p50={p[0]:6.0f} p95={p[1]:6.0f} p99={p[2]:6.0f} "
              f"p99.9={p[3]:7.0f} max={p[4]:7.0f} "
              f"drift[{dmin:7.0f},{dmax:7.0f}]")
        # union spread across ALL offsets per block (what a shared per-block
        # window must cover) for several block sizes
        nba = np.asarray(nbr)
        for B in (128, 256, 512):
            n = nba.shape[0] // B * B
            blk = nba[:n].reshape(-1, B * nba.shape[1]).astype(np.int64)
            v = blk >= 0
            hi = np.where(v, blk, -1).max(axis=1)
            lo = np.where(v, blk, 1 << 60).min(axis=1)
            anyv = v.any(axis=1)
            us = np.where(anyv, hi - lo + 1, 0)
            q = np.percentile(us, [50, 99, 100])
            print(f"  union B={B:4d}: p50={q[0]:6.0f} p99={q[1]:6.0f} "
                  f"max={q[2]:7.0f}")


if __name__ == "__main__":
    main()
