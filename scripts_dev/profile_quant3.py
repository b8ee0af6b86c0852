#!/usr/bin/env python
"""Marginal (prefix-difference) cost of each quantize_grid stage.

profile_quant2's standalone per-stage numbers sum to 3x the measured full
quantize, so they mislead (layout/fusion differ in isolation). Here each
timing jits the REAL prefix of the pipeline ending after stage k, with a
perturbation carry so nothing hoists; the difference between consecutive
prefixes is the true marginal cost of a stage in context.
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
from imfnet_tpu.sparse.grid import GridSpec, PAD_COORD, batch_origins, \
    _exclusive_cumsum, origin_lookup

ITERS = 10


def timeloop(name, body):
    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20),
            jnp.float32(0.0))

    _ = float(run())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run())
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:52s} {best:8.2f} ms", flush=True)
    return best


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
    big = jnp.int32(0x7FFFFFFF)
    rows = jnp.arange(n, dtype=jnp.int32)
    feats1 = jnp.ones((n, 1), jnp.float32)

    def pert(cr):
        return (cr > jnp.float32(1e30)).astype(jnp.int32)

    def keyprep(cr):
        v = jnp.floor(xyz_cat / config.voxel_size).astype(jnp.int32) + pert(cr)
        coords4 = jnp.concatenate([bidx[:, None], v], axis=1)
        origins = batch_origins(coords4, vmask, B)
        bb = jnp.minimum(coords4[:, 0], B - 1)
        c = coords4[:, 1:] - origin_lookup(origins, jnp.maximum(bb, 0))
        in_range = (vmask & (coords4[:, 0] >= 0) & (coords4[:, 0] < B)
                    & (c >= 0).all(axis=1)
                    & (c[:, 0] < X) & (c[:, 1] < Y) & (c[:, 2] < Z))
        key = jnp.where(in_range,
                        ((bb * X + c[:, 0]) * Y + c[:, 1]) * Z + c[:, 2], big)
        return key, coords4

    def p_key(cr):
        key, coords4 = keyprep(cr)
        return jnp.sum(key).astype(jnp.float32) + jnp.sum(coords4).astype(
            jnp.float32)

    def p_sort(cr):
        key, coords4 = keyprep(cr)
        sh, sr = jax.lax.sort((key, rows), num_keys=1, is_stable=True)
        return (jnp.sum(sh) + jnp.sum(sr)).astype(jnp.float32) + jnp.sum(
            coords4).astype(jnp.float32)

    def p_sort2key(cr):
        key, coords4 = keyprep(cr)
        sh, sr = jax.lax.sort((key, rows), num_keys=2, is_stable=False)
        return (jnp.sum(sh) + jnp.sum(sr)).astype(jnp.float32) + jnp.sum(
            coords4).astype(jnp.float32)

    def marks_of(sh):
        return (sh != big) & jnp.concatenate(
            [jnp.ones((1,), bool), sh[1:] != sh[:-1]])

    def p_cumsum(cr):
        key, coords4 = keyprep(cr)
        sh, sr = jax.lax.sort((key, rows), num_keys=1, is_stable=True)
        first = marks_of(sh)
        pos = _exclusive_cumsum(first.astype(jnp.int32))
        return (jnp.sum(pos) + jnp.sum(sr)).astype(jnp.float32) + jnp.sum(
            coords4).astype(jnp.float32)

    def p_scatter(cr):
        key, coords4 = keyprep(cr)
        sh, sr = jax.lax.sort((key, rows), num_keys=1, is_stable=True)
        first = marks_of(sh)
        pos = _exclusive_cumsum(first.astype(jnp.int32))
        slot = jnp.where(first & (pos < n_out), pos, n_out)
        sel_raw = jnp.full((n_out + 1,), big, jnp.int32).at[slot].set(
            sr, mode="drop")[:n_out]
        return jnp.sum(sel_raw).astype(jnp.float32) + jnp.sum(
            coords4).astype(jnp.float32)

    def p_full(cr):
        key, coords4 = keyprep(cr)
        sh, sr = jax.lax.sort((key, rows), num_keys=1, is_stable=True)
        first = marks_of(sh)
        pos = _exclusive_cumsum(first.astype(jnp.int32))
        slot = jnp.where(first & (pos < n_out), pos, n_out)
        sel_raw = jnp.full((n_out + 1,), big, jnp.int32).at[slot].set(
            sr, mode="drop")[:n_out]
        ok = sel_raw != big
        ss = jnp.where(ok, sel_raw, 0)
        uniq = jnp.where(ok[:, None], jnp.take(coords4, ss, axis=0),
                         PAD_COORD)
        f = jnp.where(ok[:, None], jnp.take(feats1, ss, axis=0), 0)
        xyz_down = jnp.where(ok[:, None], jnp.take(xyz_cat, ss, axis=0), 0.0)
        return (jnp.sum(uniq).astype(jnp.float32) + jnp.sum(f)
                + jnp.sum(xyz_down))

    from imfnet_tpu.sparse.grid import quantize_grid

    def p_qg(impl):
        def body(cr):
            sv, sel, xd = quantize_grid(
                xyz_cat + (cr * jnp.float32(1e-30)), feats1, vmask,
                config.voxel_size, n_out, spec, batch_index=bidx,
                compact_impl=impl)
            return (jnp.sum(sv.coords).astype(jnp.float32)
                    + jnp.sum(sv.feats) + jnp.sum(xd)
                    + sv.num_valid.astype(jnp.float32)
                    + jnp.sum(sel).astype(jnp.float32))
        return body

    timeloop("prefix a: key prep", p_key)
    timeloop("prefix b: + 1-key stable sort", p_sort)
    timeloop("prefix c: + marks + cumsum", p_cumsum)
    timeloop("prefix d: + compaction scatter", p_scatter)
    timeloop("prefix e: + output gathers (full)", p_full)
    timeloop("quantize_grid compact_impl=xla", p_qg("xla"))
    timeloop("quantize_grid compact_impl=pallas", p_qg("pallas"))


if __name__ == "__main__":
    main()
