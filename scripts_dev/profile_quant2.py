#!/usr/bin/env python
"""Sub-step timing of the SORT-based quantize_grid (grid.py:379) on the
bench input: where do the ~10 ms go? Candidate walls: the 524k-row stable
sort, the exclusive cumsum, the 524k->41k compaction scatter, the output
gathers."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_pair
from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.sparse.grid import (GridSpec, PAD_COORD, batch_origins,
                                    _exclusive_cumsum, quantize_grid)

ITERS = 10


def timeloop(name, body):
    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20),
            jnp.float32(0.0))

    _ = float(run())
    t0 = time.perf_counter()
    _ = float(run())
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    config = threedmatch_config()
    N_RAW = 1 << 18
    xyz0, xyz1, im0, im1, _ = load_pair(config)
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    X, Y, Z = spec.extent
    B = spec.num_batches
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vmask = np.zeros(2 * N_RAW, bool)
    vmask[:n0] = True
    vmask[N_RAW:N_RAW + n1] = True
    vmask = jnp.asarray(vmask)
    n = 2 * N_RAW
    n_out = 40960
    feats1 = jnp.ones((n, 1), jnp.float32)
    big = jnp.int32(0x7FFFFFFF)
    rows = jnp.arange(n, dtype=jnp.int32)

    def pert(cr):
        return (cr > jnp.float32(1e30)).astype(jnp.int32)

    def make_key(cr):
        v = jnp.floor(xyz_cat / config.voxel_size).astype(jnp.int32) + pert(cr)
        coords4 = jnp.concatenate([bidx[:, None], v], axis=1)
        origins = batch_origins(coords4, vmask, B)
        bb = jnp.minimum(coords4[:, 0], B - 1)
        c = coords4[:, 1:] - jnp.take(origins, jnp.maximum(bb, 0), axis=0)
        in_range = (vmask & (coords4[:, 0] >= 0) & (coords4[:, 0] < B)
                    & (c >= 0).all(axis=1)
                    & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z))
        key = jnp.where(in_range,
                        ((bb * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2], big)
        return key, coords4

    key0, coords4_0 = jax.jit(make_key)(jnp.float32(0.0))
    sh0, sr0 = jax.jit(lambda: jax.lax.sort((key0, rows), num_keys=1,
                                            is_stable=True))()
    first0 = (sh0 != big) & jnp.concatenate(
        [jnp.ones((1,), bool), sh0[1:] != sh0[:-1]])
    pos0 = jax.jit(lambda: _exclusive_cumsum(first0.astype(jnp.int32)))()
    slot0 = jnp.where(first0 & (pos0 < n_out), pos0, n_out)
    sel0 = jax.jit(lambda: jnp.full((n_out + 1,), big, jnp.int32)
                   .at[slot0].set(sr0, mode="drop")[:n_out])()

    timeloop("a. key prep (floor/origins/in_range)",
             lambda c: make_key(c)[0][0].astype(jnp.float32))
    timeloop("b. stable 1-key sort (2 arrays)",
             lambda c: jax.lax.sort((key0 + pert(c), rows), num_keys=1,
                                    is_stable=True)[0][0].astype(jnp.float32))
    timeloop("c. first-run marks",
             lambda c: ((sh0 + pert(c) != big)
                        & jnp.concatenate([jnp.ones((1,), bool),
                                           sh0[1:] != sh0[:-1]]))[0]
             .astype(jnp.float32))
    timeloop("d. exclusive cumsum 524k",
             lambda c: _exclusive_cumsum(first0.astype(jnp.int32) + pert(c))[0]
             .astype(jnp.float32))
    timeloop("e. compaction scatter 524k->41k",
             lambda c: jnp.full((n_out + 1,), big, jnp.int32)
             .at[slot0 + pert(c)].set(sr0, mode="drop")[0].astype(jnp.float32))
    def gathers(c):
        ok = sel0 != big
        ss = jnp.where(ok, sel0, 0) + pert(c)
        uniq = jnp.where(ok[:, None], jnp.take(coords4_0, ss, axis=0),
                         PAD_COORD)
        f = jnp.where(ok[:, None], jnp.take(feats1, ss, axis=0), 0)
        xyz_down = jnp.where(ok[:, None], jnp.take(xyz_cat, ss, axis=0), 0.0)
        return (uniq[0, 0].astype(jnp.float32) + f[0, 0]
                + xyz_down[0, 0])
    timeloop("f. output gathers (41k rows x3)", gathers)

    def full(c):
        sv, _, xyz_down = quantize_grid(
            xyz_cat + c, feats1, vmask, config.voxel_size, n_out, spec,
            batch_index=bidx)
        return sv.feats[0, 0] + xyz_down[0, 0]
    timeloop("g. full quantize_grid", full)

    # DCE'd variant the bench stage measures (feats only)
    def full_dce(c):
        sv, _, _ = quantize_grid(
            xyz_cat + c, feats1, vmask, config.voxel_size, n_out, spec,
            batch_index=bidx)
        return sv.feats[0, 0]
    timeloop("h. full quantize_grid (feats-only DCE)", full_dce)


if __name__ == "__main__":
    main()
