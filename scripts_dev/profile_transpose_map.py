#!/usr/bin/env python
"""Chained quantize+pyramid timing: packed probes vs transpose-derived maps.

map_impl="transpose" builds the 3 down maps by probing, scatter-derives the
3 up maps (`transpose_offset_map`) and probes only the δ<0 half of the same
maps (`packed_offset_map_sym`). This times the REAL production pyramid
(quantize + tables + all maps in one jit, consuming every output) on the
reference sample pair shapes.
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
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vm = np.zeros(2 * N_RAW, bool)
    vm[:n0] = True
    vm[N_RAW:N_RAW + n1] = True
    vm = jnp.asarray(vm)
    caps = level_capacities(40960, (1, 3, 8, 20))

    def body(c, map_impl):
        sv, _, _ = quantize_grid(
            xyz_cat + c, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, 40960, spec, batch_index=bidx)
        pyr = build_pyramid_grid(
            sv.coords, sv.num_valid, spec=spec, conv1_kernel_size=5,
            level_capacity=caps, map_impl=map_impl)
        tot = jnp.sum(pyr.k5_l0).astype(jnp.float32)
        for lv in pyr.levels:
            tot += jnp.sum(lv.k3_same).astype(jnp.float32)
            if lv.down is not None:
                tot += jnp.sum(lv.down).astype(jnp.float32)
            if lv.up is not None:
                tot += jnp.sum(lv.up).astype(jnp.float32)
        return tot

    for map_impl in ("packed", "transpose", "ywide"):
        @jax.jit
        def run(map_impl=map_impl):
            return jax.lax.fori_loop(
                0, ITERS,
                lambda i, c: body(c, map_impl) * jnp.float32(1e-20),
                jnp.float32(0.0))

        _ = float(run())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run())
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{map_impl:12s} {best:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
