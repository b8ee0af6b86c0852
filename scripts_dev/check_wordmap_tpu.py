#!/usr/bin/env python
"""On-chip exactness check: banded-pallas kernel maps vs the dense packed
oracle on the reference sample pair (the interpret-mode test covers CPU
semantics; this drives the real MXU HIGHEST-precision payload dots)."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import bench
from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.sparse.grid import GridSpec, build_pyramid_grid, quantize_grid


def main():
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, _, _, _ = bench.load_pair(config)
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
                             jnp.asarray(okm), config.voxel_size, 40960,
                             spec, batch_index=jnp.asarray(bidx))
    pyr_b = build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                               map_impl="banded")
    pyr_p = build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                               map_impl="packed")
    bad = 0
    for name, a, b in [("k5", pyr_b.k5_l0, pyr_p.k5_l0)] + [
            (f"l{i}.{w}", getattr(lb, w), getattr(lp, w))
            for i, (lb, lp) in enumerate(zip(pyr_b.levels, pyr_p.levels))
            for w in ("k3_same", "down", "up")
            if getattr(lb, w) is not None]:
        eq = np.array_equal(np.asarray(a), np.asarray(b))
        print(f"{name:12s} {'OK' if eq else 'MISMATCH'}", flush=True)
        bad += not eq
    print("PASS" if bad == 0 else f"FAIL ({bad} maps)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
