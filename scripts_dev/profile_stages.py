#!/usr/bin/env python
"""Per-stage device-time attribution of the bench pair pipeline.

Each stage is re-run ITERS times inside ONE jitted lax.fori_loop whose carry
perturbs the stage inputs (so XLA cannot hoist the body), then the whole loop
is fetched once — pure device time, immune to tunnel dispatch artifacts.
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
from imfnet_tpu.eval.registration import (
    make_keypoint_registration, sample_keypoints_segment)
from imfnet_tpu.models import load_model
from imfnet_tpu.train.step import make_pyramid_fn
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

ITERS = 10


def timeloop(name, body, iters=ITERS):
    """body(carry_f32) -> new_carry_f32. Times one jitted fori_loop."""

    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, iters, lambda i, c: body(c) * jnp.float32(1e-20), jnp.float32(0.0))

    _ = float(run())  # compile + warm
    t0 = time.perf_counter()
    _ = float(run())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_RAW = 1 << 18
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)

    xyz0, xyz1, im0, im1, source = load_pair(config)
    print(f"# input: {source}")
    xyz0_raw, n0_raw = pad_points(xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vmask = np.zeros(2 * N_RAW, bool)
    vmask[:n0_raw] = True
    vmask[N_RAW:N_RAW + n1_raw] = True
    vmask = jnp.asarray(vmask)
    images = jnp.concatenate([jnp.asarray(im0[None]), jnp.asarray(im1[None])])

    N_PAD2 = 40960
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2)

    def quant(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((2 * N_RAW, 1), jnp.float32), vmask,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        return sv, xyz_down

    sv_c, xyz_down_c = jax.jit(quant)(xyz_cat)
    pyr_c = jax.jit(lambda c, n: pyramid_fn(c, n))(sv_c.coords, sv_c.num_valid)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), sv_c, pyr_c, images, train=False))()
    feats_c = jax.jit(lambda sv, pyr: model.apply(
        variables, sv, pyr, images, train=False))(sv_c, pyr_c)

    register_kp = make_keypoint_registration(
        voxel_size=config.voxel_size, ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh)
    K = config.num_rand_keypoints
    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)
    n0_c = jnp.sum((sv_c.coords[:, 0] == 0).astype(jnp.int32)
                   * sv_c.mask().astype(jnp.int32))

    def body_quant(c):
        sv, _ = quant(xyz_cat + c)
        return sv.feats[0, 0]

    def body_pyr(c):
        nv = sv_c.num_valid - (c > jnp.float32(1e30)).astype(jnp.int32)
        p = pyramid_fn(sv_c.coords, nv)
        return p.levels[0].k3_same[0, 0].astype(jnp.float32)

    def body_fwd(c):
        sv = sv_c._replace(feats=sv_c.feats + c)
        f = model.apply(variables, sv, pyr_c, images, train=False)
        return f[0, 0]

    def body_match(c):
        key = jax.random.PRNGKey(0)
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0_c, K,
                                           xyz_down_c.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0_c, sv_c.num_valid - n0_c, K,
                                           xyz_down_c.shape[0])
        f = feats_c + c
        kp0, kd0 = jnp.take(xyz_down_c, i0, 0), jnp.take(f, i0, 0)
        kp1, kd1 = jnp.take(xyz_down_c, i1, 0), jnp.take(f, i1, 0)
        return register_kp(k2, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov)["rte"]

    def body_all(c):
        sv, xyz_down = quant(xyz_cat + c)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        f = model.apply(variables, sv, pyr, images, train=False)
        n0 = jnp.sum((sv.coords[:, 0] == 0).astype(jnp.int32)
                     * sv.mask().astype(jnp.int32))
        key = jax.random.PRNGKey(0)
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0, K, xyz_down.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0, sv.num_valid - n0, K,
                                           xyz_down.shape[0])
        kp0, kd0 = jnp.take(xyz_down, i0, 0), jnp.take(f, i0, 0)
        kp1, kd1 = jnp.take(xyz_down, i1, 0), jnp.take(f, i1, 0)
        return register_kp(k2, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov)["rte"]

    t_q = timeloop("quantize (2-batch)", body_quant)
    t_p = timeloop("pyramid build", body_pyr)
    t_f = timeloop("model forward (2-batch)", body_fwd)
    t_m = timeloop("NN+RANSAC+metrics", body_match)
    print(f"{'SUM':28s} {t_q + t_p + t_f + t_m:8.2f} ms")
    timeloop("FULL pair pipeline", body_all)


if __name__ == "__main__":
    main()
