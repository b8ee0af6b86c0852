#!/usr/bin/env python
"""Time JUST the model-forward stage at exact bench shapes (bench.py's
forward_ms timeloop methodology) — the fast iteration loop for kernel work:
one compiled program instead of bench's full chain. Also prints per-level
live/total block counts so dead-block-skip gains are predictable.

Usage: python scripts_dev/profile_fwd_stage.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import load_pair  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import (DEFAULT_BUCKETS, pad_points_bucketed,
                                         pick_extent)
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.train.step import make_pyramid_fn

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_PAD_MAX = 1 << 15
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)

    xyz0, xyz1, im0, im1, source = load_pair(config)
    xyz0_raw, n0_raw = pad_points_bucketed(xyz0)
    xyz1_raw, n1_raw = pad_points_bucketed(xyz1)
    B0, B1 = len(xyz0_raw), len(xyz1_raw)
    N_CAT = B0 + B1
    ext0 = pick_extent(xyz0_raw, n0_raw, config.voxel_size, config)
    ext1 = pick_extent(xyz1_raw, n1_raw, config.voxel_size, config)
    extent = (tuple(config.grid_extent) if ext0 is None or ext1 is None
              else max(ext0, ext1))
    spec = GridSpec(extent=extent, num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.concatenate(
        [np.zeros(B0, np.int32), np.ones(B1, np.int32)]))
    n_cat_valid = np.zeros(N_CAT, bool)
    n_cat_valid[:n0_raw] = True
    n_cat_valid[B0:B0 + n1_raw] = True
    images = jnp.concatenate([jnp.asarray(im0[None]),
                              jnp.asarray(im1[None])], 0)

    @jax.jit
    def probe_fn(xyz):
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_CAT, 1), jnp.float32),
                                 jnp.asarray(n_cat_valid), config.voxel_size,
                                 2 * N_PAD_MAX, spec, batch_index=bidx)
        counts = jnp.zeros((3,), jnp.int32).at[
            jnp.clip(sv.coords[:, 0], 0, 2)].add(
            (jnp.arange(2 * N_PAD_MAX) < sv.num_valid).astype(jnp.int32))
        return counts[:2]

    counts = np.asarray(probe_fn(xyz_cat))
    n_vox = int(counts.sum())
    N_PAD2 = next((b * 2 for b in DEFAULT_BUCKETS if 2 * b >= n_vox),
                  2 * N_PAD_MAX)
    print(f"# {source}: {counts.tolist()} voxels -> pad {N_PAD2}")
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2,
                                 extent=extent)

    @jax.jit
    def quant_pyr(xyz):
        sv, _, _ = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32),
            jnp.asarray(n_cat_valid), config.voxel_size, N_PAD2, spec,
            batch_index=bidx)
        return sv, pyramid_fn(sv.coords, sv.num_valid)

    sv_c, pyr_c = quant_pyr(xyz_cat)
    variables = jax.jit(
        lambda sv, pyr: model.init(jax.random.PRNGKey(0), sv, pyr, images,
                                   train=False))(sv_c, pyr_c)

    # live/total blocks per level (B=128 display granularity)
    for li, lv in enumerate(pyr_c.levels):
        nv = int(lv.num_valid)
        cap = lv.coords.shape[0]
        print(f"# level {li}: {nv}/{cap} rows valid ({nv/cap:.2f})")

    @jax.jit
    def run(c0):
        def body(i, c):
            feats = model.apply(
                variables, sv_c._replace(feats=sv_c.feats + c), pyr_c,
                images, train=False)
            return jnp.sum(feats).astype(jnp.float32) * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, args.iters, body, c0)

    t0 = time.perf_counter()
    _ = float(run(jnp.float32(0.0)))
    print(f"# compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    _ = float(run(jnp.float32(0.0)))
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"forward_ms {ms:.2f}")


if __name__ == "__main__":
    main()
