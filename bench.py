#!/usr/bin/env python
"""End-to-end throughput benchmark: fragment pairs/sec (desc + match).

Measures the full published-benchmark path per pair on one TPU chip:
  raw points → on-device voxelize → sparse UNet + attention fusion (x2 sides)
  → 5000-keypoint feature NN → 50k-hypothesis RANSAC → metrics
on 3DMatch-scale synthetic fragments (~200k raw points → ~25k voxels @2.5cm,
120x160 image), bf16 compute / f32 accum.

Baseline: the reference (CUDA MinkowskiEngine + Open3D CPU RANSAC) publishes
no throughput number (BASELINE.md); on its documented setup the same path
costs roughly 0.35 s/fragment descriptor extraction (generate_desc.py "AVG"
on a 2080Ti-class GPU) plus ~0.3 s CPU RANSAC per pair → ~1.0 pair/s.
vs_baseline uses that 1.0 pair/s estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.synthetic import synthetic_pair
    from imfnet_tpu.eval.extract import make_extractor, pad_points
    from imfnet_tpu.eval.registration import make_pair_registration
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.coords import SparseVoxels, quantize
    from imfnet_tpu.sparse.kernel_map import build_pyramid
    from imfnet_tpu.train.step import level_capacities

    config = threedmatch_config()
    N_RAW = 1 << 18          # raw-point bucket (~262k, covers 3DMatch fragments)
    N_PAD = 1 << 15          # voxel bucket (32768 ≥ typical ~25k @ 2.5 cm)

    model = load_model(config.model)(
        in_channels=1,
        out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum,
        compute_dtype=jnp.bfloat16,
    )

    # synthetic 3DMatch-scale pair
    rng = np.random.RandomState(0)
    pair = synthetic_pair(rng, n_points=200_000, voxel_size=config.voxel_size,
                          extent=2.5, image_hw=(config.image_H, config.image_W))
    xyz0_raw, n0_raw = pad_points(pair.xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(pair.xyz1, N_RAW)
    image0 = pair.image0[None]
    image1 = pair.image1[None]

    # init params using a real quantized cloud
    valid = jnp.arange(N_RAW) < n0_raw
    sv, _, _ = quantize(jnp.asarray(xyz0_raw), jnp.ones((N_RAW, 1), jnp.float32),
                        valid, config.voxel_size, N_PAD)
    pyr = build_pyramid(sv.coords, sv.num_valid,
                        conv1_kernel_size=config.conv1_kernel_size,
                        level_capacity=level_capacities(N_PAD))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, jnp.asarray(image0),
                           train=False)

    extract = make_extractor(model, variables, voxel_size=config.voxel_size,
                             n_pad=N_PAD,
                             conv1_kernel_size=config.conv1_kernel_size)
    register = make_pair_registration(
        num_keypoints=config.num_rand_keypoints, voxel_size=config.voxel_size,
        ransac_n=config.ransac_n, num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh,
    )

    T_gt = jnp.asarray(pair.T_gt)
    cov = jnp.eye(6, dtype=jnp.float32)
    xyz0_raw = jnp.asarray(xyz0_raw)
    xyz1_raw = jnp.asarray(xyz1_raw)
    image0 = jnp.asarray(image0)
    image1 = jnp.asarray(image1)

    def one_pair(key):
        x0, f0, m0 = extract(xyz0_raw, n0_raw, image0)
        x1, f1, m1 = extract(xyz1_raw, n1_raw, image1)
        return register(key, x0, f0, m0, x1, f1, m1, T_gt, cov)

    # warmup / compile
    out = one_pair(jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = one_pair(jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = iters / dt
    baseline_pairs_per_sec = 1.0  # estimated reference throughput (see header)
    print(json.dumps({
        "metric": "fragment-pairs/sec (desc+match)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
