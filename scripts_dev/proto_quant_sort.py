#!/usr/bin/env python
"""Compare quantize_grid sort strategies on the bench input shapes.

Current: stable 2-key sort of (hi=(b,x,y) key, lo=z, rows) — 3 arrays.
Candidate A: single int32 key = full (b,x,y,z) flat cell id (fits 2^31 for
both dataset extents), stable 1-key sort of (key, rows) — 2 arrays.
Candidate B: same key, plus pack row into the sort as part of an int64 — no
stability needed (min row = min packed); probably slower on TPU (64-bit).

Usage: python scripts_dev/proto_quant_sort.py
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
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
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
    voxel = config.voxel_size

    v = jnp.floor(xyz_cat / voxel).astype(jnp.int32)
    coords4 = jnp.concatenate([bidx[:, None], v], axis=1)
    origins = batch_origins(coords4, vmask, B)
    bb = jnp.minimum(coords4[:, 0], B - 1)
    c = coords4[:, 1:] - jnp.take(origins, jnp.maximum(bb, 0), axis=0)
    in_range = (vmask & (c >= 0).all(axis=1)
                & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z))
    big = jnp.int32(0x7FFFFFFF)
    rows = jnp.arange(n, dtype=jnp.int32)

    hi0 = jnp.where(in_range, (bb * X + c[:, 0]) * Y + c[:, 1], big)
    lo0 = jnp.where(in_range, c[:, 2], big)
    key0 = jnp.where(in_range,
                     ((bb * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2], big)

    def pert(cr):
        return (cr > jnp.float32(1e30)).astype(jnp.int32)

    def b_sort2key(cr):
        h = hi0 + pert(cr)
        sh, sl, sr = jax.lax.sort((h, lo0, rows), num_keys=2, is_stable=True)
        return (sh[0] + sl[0] + sr[0]).astype(jnp.float32)

    def b_sort1key(cr):
        k = key0 + pert(cr)
        sk, sr = jax.lax.sort((k, rows), num_keys=1, is_stable=True)
        return (sk[0] + sr[0]).astype(jnp.float32)

    def b_sort1key_unstable(cr):
        k = key0 + pert(cr)
        sk, sr = jax.lax.sort((k, rows), num_keys=1, is_stable=False)
        return (sk[0] + sr[0]).astype(jnp.float32)

    def b_sort2key_rowkey(cr):
        # (key, row) pairs are unique → unstable 2-key sort still puts the
        # min row first in every equal-key run
        k = key0 + pert(cr)
        sk, sr = jax.lax.sort((k, rows), num_keys=2, is_stable=False)
        return (sk[0] + sr[0]).astype(jnp.float32)

    def b_sortkeyonly(cr):
        k = key0 + pert(cr)
        (sk,) = jax.lax.sort((k,), num_keys=1, is_stable=False)
        return sk[0].astype(jnp.float32)

    def full_current(cr):
        h = hi0 + pert(cr)
        sh, sl, sr = jax.lax.sort((h, lo0, rows), num_keys=2, is_stable=True)
        ok_sorted = sh != big
        first = ok_sorted & jnp.concatenate([
            jnp.ones((1,), bool), (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
        pos = _exclusive_cumsum(first.astype(jnp.int32))
        slot = jnp.where(first & (pos < n_out), pos, n_out)
        sel_raw = jnp.full((n_out + 1,), big, jnp.int32).at[slot].set(
            sr, mode="drop")[:n_out]
        return sel_raw[0].astype(jnp.float32)

    def full_1key(cr):
        k = key0 + pert(cr)
        sk, sr = jax.lax.sort((k, rows), num_keys=1, is_stable=True)
        ok_sorted = sk != big
        first = ok_sorted & jnp.concatenate([
            jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        pos = _exclusive_cumsum(first.astype(jnp.int32))
        slot = jnp.where(first & (pos < n_out), pos, n_out)
        sel_raw = jnp.full((n_out + 1,), big, jnp.int32).at[slot].set(
            sr, mode="drop")[:n_out]
        return sel_raw[0].astype(jnp.float32)

    # equivalence check (host)
    f_cur = jax.jit(lambda: full_current(jnp.float32(0.0)))
    f_new = jax.jit(lambda: full_1key(jnp.float32(0.0)))
    a, bN = float(f_cur()), float(f_new())
    print(f"first-slot sel equal: {a == bN} ({a} vs {bN})")

    timeloop("sort 2-key stable (3 arrays)", b_sort2key)
    timeloop("sort 1-key stable (2 arrays)", b_sort1key)
    timeloop("sort 1-key unstable (2 arrays)", b_sort1key_unstable)
    timeloop("sort 2-key (key,row) unstable", b_sort2key_rowkey)
    timeloop("sort key only (1 array)", b_sortkeyonly)
    timeloop("full pipeline current", full_current)
    timeloop("full pipeline 1-key", full_1key)


if __name__ == "__main__":
    main()
