#!/usr/bin/env python
"""Attribute the gap between bench stage-sum (~27 ms) and the chained
one_pair headline (~37 ms/pair): time chained prefixes of one_pair.
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
from imfnet_tpu.eval.extract import pad_points, DEFAULT_BUCKETS
from imfnet_tpu.eval.registration import (
    make_keypoint_registration, sample_keypoints_segment)
from imfnet_tpu.models import load_model
from imfnet_tpu.train.step import make_pyramid_fn
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

ITERS = 20


def main():
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_RAW = 1 << 18
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)
    xyz0, xyz1, im0, im1, _ = B.load_pair(config)
    xyz0_raw, n0_raw = pad_points(xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vm = np.zeros(2 * N_RAW, bool)
    vm[:n0_raw] = True
    vm[N_RAW:N_RAW + n1_raw] = True
    vm = jnp.asarray(vm)
    images = jnp.concatenate([jnp.asarray(im0[None]),
                              jnp.asarray(im1[None])], axis=0)
    N_PAD2 = 40960
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2)

    def extract_pair(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(variables, sv, pyr, images, train=False)
        return sv, xyz_down, feats

    @jax.jit
    def init_fn(xyz):
        sv, _, _ = quantize_grid(
            xyz, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return model.init(jax.random.PRNGKey(0), sv, pyr, images,
                          train=False)

    variables = init_fn(xyz_cat)
    register_kp = make_keypoint_registration(
        voxel_size=config.voxel_size, ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh)
    K = config.num_rand_keypoints
    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)

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
        return best

    def p_extract(c):
        sv, xyz_down, feats = extract_pair(xyz_cat + c)
        return feats[0, 0].astype(jnp.float32) + xyz_down[0, 0]

    def p_sample(c):
        sv, xyz_down, feats = extract_pair(xyz_cat + c)
        n0 = jnp.sum((sv.coords[:, 0] == 0).astype(jnp.int32)
                     * sv.mask().astype(jnp.int32))
        n_all = sv.num_valid
        key = jax.random.PRNGKey(0)
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0, K, xyz_down.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0, n_all - n0, K,
                                           xyz_down.shape[0])
        kp0, kd0 = jnp.take(xyz_down, i0, 0), jnp.take(feats, i0, 0)
        kp1, kd1 = jnp.take(xyz_down, i1, 0), jnp.take(feats, i1, 0)
        return (kp0[0, 0] + kd0[0, 0].astype(jnp.float32)
                + kp1[0, 0] + kd1[0, 0].astype(jnp.float32))

    def p_full(c):
        sv, xyz_down, feats = extract_pair(xyz_cat + c)
        n0 = jnp.sum((sv.coords[:, 0] == 0).astype(jnp.int32)
                     * sv.mask().astype(jnp.int32))
        n_all = sv.num_valid
        key = jax.random.fold_in(jax.random.PRNGKey(0),
                                 (c > 1e30).astype(jnp.int32))
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0, K, xyz_down.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0, n_all - n0, K,
                                           xyz_down.shape[0])
        kp0, kd0 = jnp.take(xyz_down, i0, 0), jnp.take(feats, i0, 0)
        kp1, kd1 = jnp.take(xyz_down, i1, 0), jnp.take(feats, i1, 0)
        out = register_kp(k2, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov)
        return out["rte"]

    def consume_sv(sv, xyz_down):
        return (jnp.sum(sv.coords).astype(jnp.float32)
                + jnp.sum(sv.feats) + jnp.sum(xyz_down)
                + sv.num_valid.astype(jnp.float32))

    def p_quant(c):
        sv, _, xyz_down = quantize_grid(
            xyz_cat + c, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        return consume_sv(sv, xyz_down)

    def consume_pyr(pyr):
        tot = jnp.float32(0.0)
        for lvl in pyr.levels:
            tot += jnp.sum(lvl.k3_same).astype(jnp.float32)
            tot += jnp.sum(lvl.coords).astype(jnp.float32)
            if lvl.down is not None:
                tot += jnp.sum(lvl.down).astype(jnp.float32)
            if lvl.up is not None:
                tot += jnp.sum(lvl.up).astype(jnp.float32)
        return tot + jnp.sum(pyr.k5_l0).astype(jnp.float32)

    def p_pyr(c):
        sv, _, xyz_down = quantize_grid(
            xyz_cat + c, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return consume_sv(sv, xyz_down) + consume_pyr(pyr)

    timeloop("chained quantize (all outputs)", p_quant)
    timeloop("chained quantize+pyramid (all outputs)", p_pyr)
    timeloop("extract (quant+pyramid+forward)", p_extract)
    timeloop("extract + sampling/takes", p_sample)
    timeloop("full one_pair", p_full)


if __name__ == "__main__":
    main()
