#!/usr/bin/env python
"""Chained quantize+pyramid timing per map_impl (the honest figure: every
map output consumed, one jit program)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.sparse.grid import GridSpec, build_pyramid_grid, quantize_grid
from imfnet_tpu.train.step import level_capacities

ITERS = 20


def main():
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_RAW = 1 << 18
    xyz0, xyz1, _, _, _ = B.load_pair(config)
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    ext = (int(sys.argv[1]),) * 3 if len(sys.argv) > 1 \
        else tuple(config.grid_extent)
    print(f"# grid extent {ext}", flush=True)
    spec = GridSpec(extent=ext, num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vm = np.zeros(2 * N_RAW, bool)
    vm[:n0] = True
    vm[N_RAW:N_RAW + n1] = True
    vm = jnp.asarray(vm)
    caps = level_capacities(40960, (1, 3, 8, 20))

    def consume(pyr):
        tot = jnp.float32(0.0)
        for lvl in pyr.levels:
            tot += (jnp.sum(lvl.k3_same) + jnp.sum(lvl.coords)
                    ).astype(jnp.float32)
            if lvl.down is not None:
                tot += jnp.sum(lvl.down).astype(jnp.float32)
            if lvl.up is not None:
                tot += jnp.sum(lvl.up).astype(jnp.float32)
        return tot + jnp.sum(pyr.k5_l0).astype(jnp.float32)

    def body(c, impl):
        sv, _, _ = quantize_grid(
            xyz_cat + c, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, 40960, spec, batch_index=bidx)
        pyr = build_pyramid_grid(sv.coords, sv.num_valid, spec=spec,
                                 level_capacity=caps, map_impl=impl)
        return consume(pyr)

    for impl in ("packed", "banded", "auto"):
        @jax.jit
        def run(impl=impl):
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: body(c, impl) * jnp.float32(1e-20),
                jnp.float32(0.0))

        _ = float(run())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(run())
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"quantize+pyramid chained [{impl:6s}] {best:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
