#!/usr/bin/env python
"""End-to-end throughput benchmark: fragment pairs/sec (desc + match).

Measures the full published-benchmark path per pair on one TPU chip:
  raw points → on-device voxelize → sparse UNet + attention fusion (x2 sides)
  → 5000-keypoint feature NN → 50k-hypothesis RANSAC → metrics
on the reference's own sample fragment pair (`files/cloud_bin_{0,1}.ply` +
images, ~258k points → ~19k voxels @2.5 cm) when the reference tree is
mounted, else on synthetic fragments of the same scale. bf16 compute / f32
accumulation, 120x160 images — the shipped IMFNet configuration.

Baseline: the reference (CUDA MinkowskiEngine + Open3D CPU RANSAC) publishes
no throughput number (BASELINE.md); on its documented setup this path costs
roughly 0.35 s/fragment descriptor extraction (generate_desc.py "AVG" on a
2080Ti-class GPU) plus ~0.3 s CPU RANSAC per pair → ~1.0 pair/s estimated.
vs_baseline uses that 1.0 pair/s estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

# persistent compile cache: the axon remote compiler is slow and variable;
# repeated bench runs must not re-pay multi-minute compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

REF_FILES = "/root/reference/files"


def load_pair(config):
    """Real sample pair if available, else synthetic at the same scale."""
    p0 = os.path.join(REF_FILES, "cloud_bin_0.ply")
    if os.path.exists(p0):
        from imfnet_tpu.geom.image import load_image, process_image
        from imfnet_tpu.geom.ply import read_ply

        xyz0 = read_ply(p0)["points"].astype(np.float32)
        xyz1 = read_ply(os.path.join(REF_FILES, "cloud_bin_1.ply"))["points"].astype(np.float32)
        im0 = process_image(load_image(os.path.join(REF_FILES, "cloud_bin_0_0.png")),
                            config.image_H, config.image_W)
        im1 = process_image(load_image(os.path.join(REF_FILES, "cloud_bin_1_0.png")),
                            config.image_H, config.image_W)
        return xyz0, xyz1, im0, im1, "reference files/ sample pair"
    from imfnet_tpu.data.synthetic import synthetic_pair

    rng = np.random.RandomState(0)
    pair = synthetic_pair(rng, n_points=200_000, voxel_size=config.voxel_size,
                          extent=1.5, image_hw=(config.image_H, config.image_W))
    return pair.xyz0, pair.xyz1, pair.image0, pair.image1, "synthetic pair"


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import make_extractor, pad_points
    from imfnet_tpu.eval.registration import make_pair_registration
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.train.step import level_capacities, make_pyramid_fn
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_RAW = 1 << 18          # raw-point bucket (covers 3DMatch fragments)
    N_PAD_MAX = 1 << 15      # voxel capacity ceiling (32768 >= ~19k @ 2.5 cm)

    model = load_model(config.model)(
        in_channels=1,
        out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum,
        compute_dtype=jnp.bfloat16,
        conv1_occupancy=True,
    )

    xyz0, xyz1, im0, im1, source = load_pair(config)
    print(f"# bench input: {source} ({len(xyz0)} / {len(xyz1)} points)",
          file=sys.stderr)
    xyz0_raw, n0_raw = pad_points(xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(xyz1, N_RAW)
    image0 = jnp.asarray(im0[None])
    image1 = jnp.asarray(im1[None])

    # Probe the voxel count once and pick the shape bucket the whole run
    # compiles at (scan-ordered quantize packs valid rows first, so the
    # bucketed pipeline is a row slice; see eval.extract.make_bucketed_*).
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=1)

    @jax.jit
    def probe_fn(xyz, n):
        valid = jnp.arange(N_RAW) < n
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_RAW, 1), jnp.float32), valid,
                                 config.voxel_size, N_PAD_MAX, spec)
        return sv.num_valid

    n_vox = max(int(probe_fn(jnp.asarray(xyz0_raw), n0_raw)),
                int(probe_fn(jnp.asarray(xyz1_raw), n1_raw)))
    from imfnet_tpu.eval.extract import DEFAULT_BUCKETS
    N_PAD = next((b for b in DEFAULT_BUCKETS if b >= n_vox), N_PAD_MAX)
    print(f"# bench bucket: {n_vox} voxels -> n_pad {N_PAD}", file=sys.stderr)
    pyramid_fn = make_pyramid_fn(config, N_PAD, num_batches=1)

    @jax.jit
    def init_fn(xyz):
        valid = jnp.arange(N_RAW) < n0_raw
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_RAW, 1), jnp.float32), valid,
                                 config.voxel_size, N_PAD, spec)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return model.init(jax.random.PRNGKey(0), sv, pyr, image0, train=False)

    variables = init_fn(jnp.asarray(xyz0_raw))

    extract = make_extractor(model, variables, config=config, n_pad=N_PAD)
    register = make_pair_registration(
        num_keypoints=config.num_rand_keypoints, voxel_size=config.voxel_size,
        ransac_n=config.ransac_n, num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh,
    )

    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)
    xyz0_raw = jnp.asarray(xyz0_raw)
    xyz1_raw = jnp.asarray(xyz1_raw)

    @jax.jit
    def one_pair(key, eps):
        # eps chains each pair to the previous pair's OUTPUT: iterations form
        # a real dataflow chain the device must execute sequentially and
        # completely (the tunnel's block_until_ready returns early and
        # independent dispatches overlap, so an unchained loop measures
        # dispatch rate, not compute). Dispatch cost itself pipelines, which
        # is the production streaming behavior.
        x0, f0, m0 = extract(xyz0_raw + eps, n0_raw, image0)
        x1, f1, m1 = extract(xyz1_raw + eps, n1_raw, image1)
        return register(key, x0, f0, m0, x1, f1, m1, T_gt, cov)

    # warmup / compile; force a real host read
    out = one_pair(jax.random.PRNGKey(0), jnp.float32(0.0))
    _ = float(out["ir"])

    iters = 20
    t0 = time.perf_counter()
    eps = jnp.float32(0.0)
    for i in range(iters):
        out = one_pair(jax.random.PRNGKey(i), eps)
        eps = out["rte"] * jnp.float32(1e-12)  # device-side dependency link
    _ = float(out["ir"])  # one final fetch drains the whole chain
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
