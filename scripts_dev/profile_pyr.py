#!/usr/bin/env python
"""Chained prefix attribution INSIDE build_pyramid_grid: which of the
pyramid's stages (level dedup chain, pack_level builds, compact_words,
each map family) carries the 14 ms chained cost."""
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
    xyz0, xyz1, im0, im1, _ = B.load_pair(config)
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vm = np.zeros(2 * N_RAW, bool)
    vm[:n0] = True
    vm[N_RAW:N_RAW + n1] = True
    vm = jnp.asarray(vm)
    N_PAD = 40960
    caps = level_capacities(N_PAD, (1, 3, 8, 20))

    sv, _, _ = jax.jit(lambda x: quantize_grid(
        x, jnp.ones((2 * N_RAW, 1), jnp.float32), vm, config.voxel_size,
        N_PAD, spec, batch_index=bidx))(xyz_cat)
    coords_c = sv.coords
    nv_c = sv.num_valid

    def tables_fn(coords, num_valid):
        n0p = coords.shape[0]
        valid0 = jnp.arange(n0p) < num_valid
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
            pos = scan_position(bits, rank, strided, keep, origins, spec, lvl)
            kept = keep & (pos >= 0)
            cap = caps[lvl]
            tgt = jnp.where(kept & (pos < cap), pos, cap)
            out = jnp.full((cap + 1, 4), PAD_COORD, jnp.int32)
            out = out.at[tgt].set(strided, mode="drop")
            n_uniq = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), cap)
            tables.append((out[:cap], n_uniq))
        return origins, tables

    def consume_tables(origins, tables):
        t = jnp.sum(origins).astype(jnp.float32)
        for c, n in tables:
            t += jnp.sum(c).astype(jnp.float32) + n.astype(jnp.float32)
        return t

    def pert(c):
        return (c > jnp.float32(1e30)).astype(jnp.int32)

    def p_tables(c):
        origins, tables = tables_fn(coords_c, nv_c - pert(c))
        return consume_tables(origins, tables)

    def with_packs(c, lvls=(0, 1, 2, 3)):
        origins, tables = tables_fn(coords_c, nv_c - pert(c))
        t = consume_tables(origins, tables)
        for lvl in lvls:
            cc, n = tables[lvl]
            v = jnp.arange(cc.shape[0]) < n
            pt = pack_level(cc, v, origins, spec, lvl)
            t += jnp.sum(pt.table).astype(jnp.float32)
        return t

    def with_wtabs(c):
        origins, tables = tables_fn(coords_c, nv_c - pert(c))
        t = consume_tables(origins, tables)
        for lvl in (1, 2, 3):
            cc, n = tables[lvl]
            v = jnp.arange(cc.shape[0]) < n
            wt = compact_words(cc, v, origins, spec, lvl)
            t += jnp.sum(wt.wkeys).astype(jnp.float32)
        return t

    def maps_body(c, which):
        origins, tables = tables_fn(coords_c, nv_c - pert(c))
        t = consume_tables(origins, tables)
        packs = []
        for lvl in range(4):
            cc, n = tables[lvl]
            v = jnp.arange(cc.shape[0]) < n
            packs.append(pack_level(cc, v, origins, spec, lvl))
            t += jnp.sum(packs[-1].table).astype(jnp.float32)
        for lvl in range(4):
            cc, n = tables[lvl]
            v = jnp.arange(cc.shape[0]) < n
            if "k5" in which and lvl == 0:
                t += jnp.sum(packed_offset_map(
                    packs[0], origins, cc, v, spec, table_level=0,
                    kernel_size=5, mode="same")).astype(jnp.float32)
            if "same" in which:
                t += jnp.sum(packed_offset_map(
                    packs[lvl], origins, cc, v, spec, table_level=lvl,
                    kernel_size=3, mode="same")).astype(jnp.float32)
            if "down" in which and lvl > 0:
                t += jnp.sum(packed_offset_map(
                    packs[lvl - 1], origins, cc, v, spec,
                    table_level=lvl - 1, kernel_size=3,
                    mode="down")).astype(jnp.float32)
            if "up" in which and lvl < 3:
                t += jnp.sum(packed_offset_map(
                    packs[lvl + 1], origins, cc, v, spec,
                    table_level=lvl + 1, kernel_size=3,
                    mode="up")).astype(jnp.float32)
        return t

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

    timeloop("a: level dedup chain (tables)", p_tables)
    timeloop("b: + pack_level x4", with_packs)
    timeloop("c: tables + compact_words 1-3", with_wtabs)
    timeloop("d: b + k5 map", lambda c: maps_body(c, ("k5",)))
    timeloop("e: b + same maps", lambda c: maps_body(c, ("same",)))
    timeloop("f: b + down maps", lambda c: maps_body(c, ("down",)))
    timeloop("g: b + up maps", lambda c: maps_body(c, ("up",)))
    timeloop("h: b + ALL maps (full packed pyramid)",
             lambda c: maps_body(c, ("k5", "same", "down", "up")))


if __name__ == "__main__":
    main()
