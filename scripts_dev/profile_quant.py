#!/usr/bin/env python
"""Sub-step timing of the occupancy-byte quantize_grid on the bench input."""
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
from imfnet_tpu.sparse.grid import GridSpec, batch_origins, _exclusive_cumsum

ITERS = 10


def timeloop(name, body):
    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20), jnp.float32(0.0))

    _ = float(run())
    t0 = time.perf_counter()
    _ = float(run())
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:36s} {dt:8.2f} ms")
    return dt


def main():
    config = threedmatch_config()
    N_RAW = 1 << 18
    xyz0, xyz1, im0, im1, _ = load_pair(config)
    xyz0_raw, n0_raw = pad_points(xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    X, Y, Z = spec.extent
    B = spec.num_batches
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vmask = np.zeros(2 * N_RAW, bool)
    vmask[:n0_raw] = True
    vmask[N_RAW:N_RAW + n1_raw] = True
    vmask = jnp.asarray(vmask)
    n = 2 * N_RAW
    n_out = 40960

    v = jnp.floor(xyz_cat / config.voxel_size).astype(jnp.int32)
    coords4 = jnp.concatenate([bidx[:, None], v], axis=1)
    origins = batch_origins(coords4, vmask, spec.num_batches)
    bb = jnp.minimum(coords4[:, 0], B - 1)
    c = coords4[:, 1:] - jnp.take(origins, jnp.maximum(bb, 0), axis=0)
    in_range = (vmask & (c >= 0).all(axis=1)
                & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z))
    flat0 = ((bb * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2]
    flat0 = jnp.where(in_range, flat0, B * X * Y * Z)
    occ0 = jnp.zeros((B * X * Y * Z + 1,), jnp.uint8).at[flat0].set(
        1, mode="drop")[:-1]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bits0 = jnp.sum(occ0.reshape(-1, 32).astype(jnp.uint32) * weights[None, :], axis=1)
    pc0 = jax.lax.population_count(bits0).astype(jnp.int32)
    rank0 = _exclusive_cumsum(pc0)
    rows = jnp.arange(n, dtype=jnp.int32)

    def pert(cr):
        return (cr > jnp.float32(1e30)).astype(jnp.int32)

    def b_occ_scatter(cr):
        fl = flat0 + pert(cr)
        occ = jnp.zeros((B * X * Y * Z + 1,), jnp.uint8).at[fl].set(
            1, mode="drop")[:-1]
        return occ[0].astype(jnp.float32)

    def b_bits(cr):
        o = occ0.at[0].add(pert(cr).astype(jnp.uint8))
        bits = jnp.sum(o.reshape(-1, 32).astype(jnp.uint32) * weights[None, :], axis=1)
        return bits[0].astype(jnp.float32)

    def b_rank(cr):
        pcx = pc0.at[0].add(pert(cr))
        return _exclusive_cumsum(pcx)[-1].astype(jnp.float32)

    def b_pos(cr):
        fl = flat0 + pert(cr)
        w = jnp.where(in_range, fl >> 5, 0)
        table2 = jnp.stack([bits0.astype(jnp.int32), rank0], axis=1)
        br = jnp.take(table2, w, axis=0)
        bw = br[:, 0].astype(jnp.uint32)
        p = (fl & 31).astype(jnp.uint32)
        below = bw & ((jnp.uint32(1) << p) - 1)
        pos = br[:, 1] + jax.lax.population_count(below).astype(jnp.int32)
        return pos[0].astype(jnp.float32)

    def b_winner(cr):
        w = jnp.where(in_range, flat0 >> 5, 0)
        table2 = jnp.stack([bits0.astype(jnp.int32), rank0], axis=1)
        br = jnp.take(table2, w, axis=0)
        bw = br[:, 0].astype(jnp.uint32)
        p = (flat0 & 31).astype(jnp.uint32)
        below = bw & ((jnp.uint32(1) << p) - 1)
        pos = br[:, 1] + jax.lax.population_count(below).astype(jnp.int32) + pert(cr)
        slot = jnp.where(in_range & (pos < n_out), pos, n_out)
        big = jnp.int32(0x7FFFFFFF)
        win = jnp.full((n_out + 1,), big, jnp.int32).at[slot].min(rows)
        kept = in_range & (jnp.take(win, jnp.minimum(slot, n_out)) == rows)
        return jnp.sum(kept.astype(jnp.int32)).astype(jnp.float32)

    timeloop("occ byte scatter (33.6MB)", b_occ_scatter)
    timeloop("bits reshape-reduce", b_bits)
    timeloop("rank cumsum (1.05M)", b_rank)
    timeloop("pos gather (8.4MB table)", b_pos)
    timeloop("pos + winner election", b_winner)


if __name__ == "__main__":
    main()
