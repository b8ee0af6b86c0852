#!/usr/bin/env python
"""Chained quantize+tables+maps timing for per-mode implementation mixes,
built from grid internals (profile_pyr-style) so each variant can choose
packed / banded-scan / banded-pallas per map family and toggle the
lax.cond fallback."""
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
from imfnet_tpu.sparse.grid import (
    GridSpec, PAD_COORD, batch_origins, build_grid, grid_lookup, pack_words,
    scan_position, pack_level, compact_words, packed_offset_map,
    banded_offset_map, quantize_grid)
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

    def tables_fn(c):
        sv, _, _ = quantize_grid(
            xyz_cat + c, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, 40960, spec, batch_index=bidx)
        coords, num_valid = sv.coords, sv.num_valid
        valid0 = jnp.arange(coords.shape[0]) < num_valid
        origins = batch_origins(coords, valid0, spec.num_batches)
        tables = [(coords, num_valid)]
        for lvl in range(1, 4):
            prev_coords, prev_n = tables[-1]
            prev_valid = jnp.arange(prev_coords.shape[0]) < prev_n
            strided = jnp.concatenate(
                [prev_coords[:, :1],
                 (prev_coords[:, 1:] >> lvl) << lvl], axis=1)
            g = build_grid(strided, prev_valid, origins, spec, lvl)
            rows = jnp.arange(prev_coords.shape[0], dtype=jnp.int32)
            win = grid_lookup(g, origins, strided, prev_valid, spec, lvl)
            keep = prev_valid & (win == rows)
            bits, rank = pack_words(strided, keep, origins, spec, lvl)
            pos = scan_position(bits, rank, strided, keep, origins, spec,
                                lvl)
            kept = keep & (pos >= 0)
            cap = caps[lvl]
            tgt = jnp.where(kept & (pos < cap), pos, cap)
            out = jnp.full((cap + 1, 4), PAD_COORD, jnp.int32)
            out = out.at[tgt].set(strided, mode="drop")
            n_uniq = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), cap)
            tables.append((out[:cap], n_uniq))
        return origins, tables

    JOBS = []
    for lvl in range(4):
        JOBS.append((lvl, lvl, 3, "same"))
        if lvl > 0:
            JOBS.append((lvl - 1, lvl, 3, "down"))
        if lvl < 3:
            JOBS.append((lvl + 1, lvl, 3, "up"))
    JOBS.append((0, 0, 5, "same"))

    def body(c, impl_of, use_cond):
        origins, tables = tables_fn(c)
        need_pack = any(impl_of(mo, k) == "packed"
                        for _, _, k, mo in JOBS) or use_cond
        packs = []
        wtabs = []
        for lvl in range(4):
            cc, n = tables[lvl]
            v = jnp.arange(cc.shape[0]) < n
            packs.append(pack_level(cc, v, origins, spec, lvl)
                         if need_pack else None)
            need_w = any(impl_of(mo, k) != "packed" and tl == lvl
                         for tl, _, k, mo in JOBS)
            wtabs.append(compact_words(cc, v, origins, spec, lvl)
                         if need_w else None)
        tot = jnp.float32(0.0)
        for tab_lvl, q_lvl, kernel, mode in JOBS:
            qc, qn = tables[q_lvl]
            qv = jnp.arange(qc.shape[0]) < qn
            impl = impl_of(mode, kernel)
            if impl == "packed":
                nbr = packed_offset_map(
                    packs[tab_lvl], origins, qc, qv, spec,
                    table_level=tab_lvl, kernel_size=kernel, mode=mode)
            else:
                nbr_b, exact = banded_offset_map(
                    wtabs[tab_lvl], origins, qc, qv, spec,
                    table_level=tab_lvl, kernel_size=kernel, mode=mode,
                    match_impl=impl)
                if use_cond:
                    nbr = jax.lax.cond(
                        exact, lambda nb=nbr_b: nb,
                        lambda tl=tab_lvl, q=qc, v=qv, k=kernel, m=mode:
                        packed_offset_map(packs[tl], origins, q, v, spec,
                                          table_level=tl, kernel_size=k,
                                          mode=m))
                else:
                    nbr = nbr_b + exact.astype(jnp.int32) * 0
            tot += jnp.sum(nbr).astype(jnp.float32)
        return tot

    VARIANTS = {
        "all packed": (lambda m, k: "packed", False),
        "all pallas +cond": (lambda m, k: "pallas", True),
        "all pallas nocond": (lambda m, k: "pallas", False),
        "pallas, scan-up +cond": (
            lambda m, k: "scan" if m == "up" else "pallas", True),
        "packed, scan-up +cond (old auto)": (
            lambda m, k: "scan" if m == "up" else "packed", True),
        "packed, pallas-up +cond": (
            lambda m, k: "pallas" if m == "up" else "packed", True),
        "pallas k5+up, packed rest +cond": (
            lambda m, k: "pallas" if (m == "up" or k == 5) else "packed", True),
    }
    for name, (impl_of, use_cond) in VARIANTS.items():
        @jax.jit
        def run(impl_of=impl_of, use_cond=use_cond):
            return jax.lax.fori_loop(
                0, ITERS,
                lambda i, c: body(c, impl_of, use_cond) * jnp.float32(1e-20),
                jnp.float32(0.0))

        _ = float(run())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(run())
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{name:36s} {best:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
