#!/usr/bin/env python
"""Measure banded word-match window spreads for every pyramid map on the
reference sample pair, and time the banded vs packed map builders.

Spreads are data properties — they run fine on CPU; pass --tpu to also time
on the device.
"""
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.sparse.grid import (
    GridSpec, batch_origins, quantize_grid, compact_words, _offset_columns,
    pack_level, packed_offset_map, banded_offset_map)
from imfnet_tpu.train.step import make_pyramid_fn
import bench


def main():
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
    origins = batch_origins(sv.coords, jnp.arange(40960) < sv.num_valid, 2)

    tables = [(l.coords, l.num_valid) for l in lv]
    wtabs = [compact_words(c, jnp.arange(c.shape[0]) < n, origins, spec, i)
             for i, (c, n) in enumerate(tables)]

    jobs = []
    for lvl in range(4):
        jobs.append((lvl, lvl, 3, "same"))
        if lvl > 0:
            jobs.append((lvl - 1, lvl, 3, "down"))   # table finer
        if lvl < 3:
            jobs.append((lvl + 1, lvl, 3, "up"))
    jobs.append((0, 0, 5, "same"))

    for tab_lvl, q_lvl, kernel, mode in jobs:
        qc, qn = tables[q_lvl]
        qv = jnp.arange(qc.shape[0]) < qn
        wt = wtabs[tab_lvl]
        wk = np.asarray(wt.wkeys)
        nw = int(wt.n_words)
        cols = list(_offset_columns(origins, qc, qv, spec,
                                    table_level=tab_lvl, kernel_size=kernel,
                                    mode=mode))
        q = np.stack([np.where(np.asarray(c["ok_xy"]), np.asarray(c["w0"]),
                               -2) for c in cols], 1)
        for B in (256, 512, 1024):
            n = q.shape[0]
            nb = -(-n // B)
            qp = np.concatenate(
                [q, np.full((nb * B - n, q.shape[1]), -2, np.int32)])
            qb = qp.reshape(nb, B, -1)
            valid = qb >= 0
            big = 1 << 30
            qmin = np.where(valid, qb, big).min(1)
            qmax = np.where(valid, qb, -1).max(1)
            has = qmin != big
            lo = np.searchsorted(wk[:nw], qmin.reshape(-1))
            hi = np.searchsorted(wk[:nw], qmax.reshape(-1), side="right")
            spread = np.where(has.reshape(-1), hi - lo, 0)
            print(f"map tab_l{tab_lvl} q_l{q_lvl} k{kernel} {mode:4s} "
                  f"B={B:4d}: p100={spread.max():5d} "
                  f"p99={np.percentile(spread, 99):6.0f} nq={n}", flush=True)

    if "--tpu" in sys.argv:
        ITERS = 20

        def timeloop(name, body):
            @jax.jit
            def run():
                return jax.lax.fori_loop(
                    0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20),
                    jnp.float32(0.0))

            _ = float(run())
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                _ = float(run())
                best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
            print(f"{name:52s} {best:8.2f} ms", flush=True)

        for tab_lvl, q_lvl, kernel, mode in jobs:
            qc, qn = tables[q_lvl]
            qv = jnp.arange(qc.shape[0]) < qn
            wt = wtabs[tab_lvl]

            def banded(c, qc=qc, qv=qv, wt=wt, tl=tab_lvl, k=kernel, m=mode,
                       impl="scan"):
                nbr, exact = banded_offset_map(
                    wt, origins, qc + c.astype(jnp.int32) * 0, qv, spec,
                    table_level=tl, kernel_size=k, mode=m, match_impl=impl)
                return (jnp.sum(nbr) + exact).astype(jnp.float32)

            def banded_pl(c, banded=banded):
                return banded(c, impl="pallas")

            def packed(c, qc=qc, qv=qv, tc=tables[tab_lvl][0],
                       tn=tables[tab_lvl][1], tl=tab_lvl, k=kernel, m=mode):
                tv = jnp.arange(tc.shape[0]) < tn
                pt = pack_level(tc + c.astype(jnp.int32) * 0, tv, origins,
                                spec, tl)
                nbr = packed_offset_map(pt, origins, qc, qv, spec,
                                        table_level=tl, kernel_size=k,
                                        mode=m)
                return jnp.sum(nbr).astype(jnp.float32)

            tag = f"tab_l{tab_lvl} q_l{q_lvl} k{kernel} {mode}"
            timeloop(f"banded-scan {tag}", banded)
            timeloop(f"banded-pallas {tag}", banded_pl)
            timeloop(f"packed {tag} (incl pack_level)", packed)


if __name__ == "__main__":
    main()
