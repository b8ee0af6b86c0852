#!/usr/bin/env python
"""Throughput of a P-pair (2P-fragment) program vs the bench's P=1.

Hypothesis: one program processing several pairs amortizes the pipeline's
serial latencies (sort, cumsum scans, per-map dispatch, RANSAC reductions)
and fills the MXU at the small UNet levels — raising pairs/s even though
per-row costs (gathers) scale linearly.

Usage: python scripts_dev/profile_multipair.py [P ...]   (default: 1 2)
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
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.eval.registration import (
    make_keypoint_registration,
    sample_keypoints_segment,
)
from imfnet_tpu.models import load_model
from imfnet_tpu.train.step import make_pyramid_fn
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

ITERS = 20
N_RAW = 1 << 18
PER_PAIR_PAD = 40960


def run(P: int):
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)

    xyz0, xyz1, im0, im1, _ = B.load_pair(config)
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    nb = 2 * P
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=nb)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw] * P))
    bidx = jnp.asarray(np.repeat(np.arange(nb, dtype=np.int32), N_RAW))
    vm = np.zeros(nb * N_RAW, bool)
    for p in range(P):
        vm[2 * p * N_RAW:2 * p * N_RAW + n0] = True
        vm[(2 * p + 1) * N_RAW:(2 * p + 1) * N_RAW + n1] = True
    vm = jnp.asarray(vm)
    images = jnp.concatenate([jnp.asarray(im0[None]),
                              jnp.asarray(im1[None])] * P, axis=0)
    N_PAD = P * PER_PAIR_PAD
    pyramid_fn = make_pyramid_fn(config, N_PAD, num_batches=nb)

    def extract(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((nb * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(variables, sv, pyr, images, train=False)
        return sv, xyz_down, feats

    variables = jax.jit(lambda xyz: model.init(
        jax.random.PRNGKey(0),
        *(lambda sv, _, xd: (sv, pyramid_fn(sv.coords, sv.num_valid)))(
            *quantize_grid(xyz, jnp.ones((nb * N_RAW, 1), jnp.float32), vm,
                           config.voxel_size, N_PAD, spec,
                           batch_index=bidx)),
        images, train=False))(xyz_cat)

    register_kp = make_keypoint_registration(
        voxel_size=config.voxel_size, ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh)
    K = config.num_rand_keypoints
    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)

    @jax.jit
    def chain(key0):
        def pair_metrics(key, sv, xyz_down, feats):
            m = sv.mask().astype(jnp.int32)
            counts = jnp.stack([jnp.sum((sv.coords[:, 0] == b) * m)
                                for b in range(nb)])
            starts = jnp.cumsum(counts) - counts
            acc = jnp.float32(0.0)
            for p in range(P):
                k0, k1, k2, key = jax.random.split(key, 4)
                i0, ok0 = sample_keypoints_segment(
                    k0, starts[2 * p], counts[2 * p], K, xyz_down.shape[0])
                i1, ok1 = sample_keypoints_segment(
                    k1, starts[2 * p + 1], counts[2 * p + 1], K,
                    xyz_down.shape[0])
                out = register_kp(
                    k2, jnp.take(xyz_down, i0, 0), jnp.take(feats, i0, 0),
                    ok0, jnp.take(xyz_down, i1, 0), jnp.take(feats, i1, 0),
                    ok1, T_gt, cov)
                acc = acc + out["rte"] + out["ir"]
            return acc

        def step(i, carry):
            key = jax.random.fold_in(key0, i)
            sv, xyz_down, feats = extract(xyz_cat + carry * jnp.float32(1e-12))
            return pair_metrics(key, sv, xyz_down, feats)

        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(chain(jax.random.PRNGKey(0)))
    print(f"P={P}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _ = float(chain(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    pps = ITERS * P / dt
    print(f"P={P}: {dt / ITERS * 1e3:.1f} ms/program, {pps:.2f} pairs/s",
          flush=True)
    return pps


def main():
    ps = [int(a) for a in sys.argv[1:]] or [1, 2]
    for p in ps:
        run(p)


if __name__ == "__main__":
    main()
