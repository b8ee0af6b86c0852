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

Prints PROGRESSIVELY COMPLETE JSON lines with the same "metric" key — the
headline first (so a driver timeout can never erase the measured
throughput), then stages, MFU/roofline, and the train step as each section
finishes. Consumers must take the LAST line (or filter "partial": false —
only the final line has it). Each section is guarded by a wall-clock budget
(BENCH_BUDGET_S, default 480 s): if the remote compiler eats the budget,
remaining sections are skipped and reported in "skipped_sections" instead of
the whole artifact dying rc=124 (the BENCH_r04 failure mode). Per-section
compile seconds are recorded in "compile_s" so a cold cache is diagnosable.
"""
import json
import os
import sys
import time

_T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))


def _elapsed():
    return time.perf_counter() - _T_START


def _budget_left(section: str, need_s: float = 60.0) -> bool:
    """True if `section` may start: at least ``need_s`` of budget remain."""
    left = BUDGET_S - _elapsed()
    if left < need_s:
        print(f"# budget guard: skipping {section} "
              f"({left:.0f}s left < {need_s:.0f}s needed)", file=sys.stderr)
        return False
    return True

# persistent compile cache: the axon remote compiler is slow and variable;
# repeated bench runs must not re-pay multi-minute compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# the axon sitecustomize imports jax at interpreter startup, BEFORE this
# script's env vars exist — so the env-var route silently never enabled the
# cache (this is why BENCH_r04 re-paid full compiles and timed out, rc=124).
# Setting the config directly works regardless of import order.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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


def model_forward_flops(model, variables, pyr, images) -> float:
    """Algorithmic forward FLOPs: 2·nnz·Cin·Cout per sparse conv from actual
    kernel-map occupancy (ME's work metric — each valid (out,k) map entry is
    one Cin×Cout MAC row), plus the dense image trunk and attention fusion
    from XLA's cost model (pure matmuls, no selection overhead to inflate).

    Conv walk mirrors models/resunet.py::ResUNetIMF.__call__ exactly
    (reference `model/resunet.py:163-235`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    lv = pyr.levels
    ch, tr = model.channels, model.tr_channels

    def nnz(m):
        return int((np.asarray(m) >= 0).sum())

    n_valid0 = int(lv[0].num_valid)
    convs = [(nnz(pyr.k5_l0), model.in_channels, ch[0])]          # conv1
    # residual block i = two k3 convs at its level (models/layers.py)
    convs += [(nnz(lv[0].k3_same), ch[0], ch[0])] * 2             # block1
    convs += [(nnz(lv[1].down), ch[0], ch[1])]                    # conv2
    convs += [(nnz(lv[1].k3_same), ch[1], ch[1])] * 2             # block2
    convs += [(nnz(lv[2].down), ch[1], ch[2])]                    # conv3
    convs += [(nnz(lv[2].k3_same), ch[2], ch[2])] * 2             # block3
    convs += [(nnz(lv[3].down), ch[2], ch[3])]                    # conv4
    convs += [(nnz(lv[3].k3_same), ch[3], ch[3])] * 2             # block4
    convs += [(nnz(lv[2].up), ch[3], tr[3])]                      # conv4_tr
    convs += [(nnz(lv[2].k3_same), tr[3], tr[3])] * 2             # block4_tr
    convs += [(nnz(lv[1].up), ch[2] + tr[3], tr[2])]              # conv3_tr
    convs += [(nnz(lv[1].k3_same), tr[2], tr[2])] * 2             # block3_tr
    convs += [(nnz(lv[0].up), ch[1] + tr[2], tr[1])]              # conv2_tr
    convs += [(nnz(lv[0].k3_same), tr[1], tr[1])] * 2             # block2_tr
    convs += [(n_valid0, ch[0] + tr[1], tr[0])]                   # conv1_tr 1x1
    convs += [(n_valid0, tr[0], model.out_channels)]              # final 1x1
    sparse_flops = float(sum(2.0 * n * cin * cout for n, cin, cout in convs))

    dense_flops = 0.0
    try:
        from imfnet_tpu.models.fusion import AttentionFusion
        from imfnet_tpu.models.resnet import ResNetTrunk

        trunk = ResNetTrunk(compute_dtype=model.compute_dtype)
        tvars = {"params": variables["params"]["img_encoder"],
                 "batch_stats": variables["batch_stats"]["img_encoder"]}
        tjit = jax.jit(lambda im: trunk.apply(tvars, im, train=False))
        dense_flops += float(
            tjit.lower(images).compile().cost_analysis()["flops"])

        fusion = AttentionFusion(
            dim=model.image_channels, latent_dim=ch[3],
            depth=model.fusion_depth, cross_heads=1, latent_heads=8,
            cross_dim_head=ch[3] // 2, latent_dim_head=ch[3] // 2,
            compute_dtype=model.compute_dtype)
        b = images.shape[0]
        img = tjit(images)
        tokens = jnp.zeros((b, img.shape[1] * img.shape[2], img.shape[3]),
                           jnp.float32)
        queries = jnp.zeros((b, lv[3].coords.shape[0], ch[3]), jnp.float32)
        fvars = {"params": variables["params"]["attention_fusion"]}
        fjit = jax.jit(lambda t, q: fusion.apply(fvars, t, q))
        dense_flops += float(
            fjit.lower(tokens, queries).compile().cost_analysis()["flops"])
    except Exception as e:  # pragma: no cover - cost analysis availability
        print(f"# dense-flops cost analysis unavailable: {e}", file=sys.stderr)
        return float("nan")
    return sparse_flops + dense_flops


def bench_train_step(n_pad: int = 24576, iters: int = 5):
    """Full training step (2 fragment pairs, fwd+bwd+SGD, in-graph kernel
    maps) timed with the same chained-fori_loop discipline as the eval
    stages, plus a model-FLOPs MFU for it.

    Model train FLOPs = 3 × forward model FLOPs per side (backward dX and
    dW each cost the same 2·nnz·Cin·Cout as the forward; optimizer and the
    hardest-contrastive loss pdist are <1% and excluded) — the same
    can't-be-inflated accounting as `forward_mfu_model` (VERDICT r3 weak 6).
    Reference train-loop contract: `lib/trainer.py:495-569`.
    """
    import optax

    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.synthetic import synthetic_pair
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.train.step import PairBatch, make_pyramid_fn, make_train_step
    from imfnet_tpu.train.trainer import TrainState, build_model_from_config

    config = threedmatch_config()
    rng = np.random.RandomState(0)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    n_raw = 1 << 16

    sides = []
    for side in range(2):
        raws, bidx, vmask = [], [], []
        for b in range(2):
            pair = synthetic_pair(
                rng, n_points=60000, voxel_size=config.voxel_size,
                extent=1.2, image_hw=(config.image_H, config.image_W))
            xyz = (pair.xyz0 if side == 0 else pair.xyz1)[:n_raw]
            raw = np.zeros((n_raw, 3), np.float32)
            raw[:len(xyz)] = xyz
            raws.append(raw)
            bidx.append(np.full(n_raw, b, np.int32))
            v = np.zeros(n_raw, bool)
            v[:len(xyz)] = True
            vmask.append(v)
        sv, _, xd = quantize_grid(
            jnp.asarray(np.concatenate(raws)),
            jnp.ones((2 * n_raw, 1), jnp.float32),
            jnp.asarray(np.concatenate(vmask)), config.voxel_size,
            n_pad, spec, batch_index=jnp.asarray(np.concatenate(bidx)))
        sides.append((sv, xd))

    batch = PairBatch(
        coords0=sides[0][0].coords, feats0=sides[0][0].feats,
        xyz0=sides[0][1], n0=sides[0][0].num_valid,
        coords1=sides[1][0].coords, feats1=sides[1][0].feats,
        xyz1=sides[1][1], n1=sides[1][0].num_valid,
        image0=jnp.asarray(rng.rand(
            2, config.image_H, config.image_W, 3).astype(np.float32)),
        image1=jnp.asarray(rng.rand(
            2, config.image_H, config.image_W, 3).astype(np.float32)),
        T_gt=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (2, 4, 4)),
        pairs=None, pair_valid=None,
    )

    model = build_model_from_config(config)
    tx = optax.sgd(config.lr, momentum=config.momentum, nesterov=False)
    step = make_train_step(model, tx, config)

    pyramid_fn = make_pyramid_fn(config, n_pad, 2)
    sv0 = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr0 = pyramid_fn(batch.coords0, batch.n0)
    pyr1 = pyramid_fn(batch.coords1, batch.n1)
    variables = model.init(jax.random.PRNGKey(0), sv0, pyr0, batch.image0,
                           train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       step=jnp.int32(0))

    # state/batch are explicit jit ARGUMENTS, not closure captures: captured
    # device arrays bake into the HLO as literal constants, so any
    # run-to-run bit difference in the on-device-computed batch re-keys the
    # ~125 MB compiled program and defeats the persistent cache (observed:
    # the train section re-compiled ~400 s on every bench run). As
    # parameters, the cache key depends only on shapes/dtypes.
    @jax.jit
    def run(state, batch):
        def body(i, carry):
            eps, _ = carry
            st, metrics = step(
                state, batch._replace(feats0=batch.feats0 + eps),
                jax.random.fold_in(jax.random.PRNGKey(0), i))
            return metrics["loss"] * jnp.float32(1e-20), metrics["loss"]

        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), jnp.float32(0.0)))

    _ = float(run(state, batch)[1])
    t0 = time.perf_counter()
    _ = float(run(state, batch)[1])
    train_ms = (time.perf_counter() - t0) / iters * 1e3

    fwd0 = model_forward_flops(model, variables, pyr0, batch.image0)
    fwd1 = model_forward_flops(model, variables, pyr1, batch.image1)
    train_flops = 3.0 * (fwd0 + fwd1)
    peak_tflops = 197.0
    mfu = train_flops / (train_ms * 1e-3) / 1e12 / peak_tflops
    return train_ms, mfu, train_flops / 1e9


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points_bucketed
    from imfnet_tpu.eval.registration import (
        make_keypoint_registration,
        sample_keypoints_segment,
    )
    from imfnet_tpu.models import load_model
    from imfnet_tpu.train.step import level_capacities, make_pyramid_fn
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
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
    # Per-fragment raw buckets: EVERY raw point is quantized, like the
    # reference (`util/misc.py:82-87`) — the sample pair's 268,977-point
    # fragment exceeds 2^18 and must not be subsampled (VERDICT r3 weak 3).
    xyz0_raw, n0_raw = pad_points_bucketed(xyz0)
    xyz1_raw, n1_raw = pad_points_bucketed(xyz1)
    B0, B1 = len(xyz0_raw), len(xyz1_raw)
    N_CAT = B0 + B1
    image0 = jnp.asarray(im0[None])
    image1 = jnp.asarray(im1[None])

    # Both fragments run as ONE 2-batch program: one voxelize (batch column
    # keeps fragments apart), one coordinate pyramid, one model forward with
    # images [2,H,W,3] — shared dispatch + better MXU utilization than two
    # B=1 extracts. Probe the voxel counts once to pick the shape bucket,
    # and each fragment's voxel span to pick the extent bucket (smaller
    # static extents → smaller packed tables → cheaper pyramid).
    from imfnet_tpu.eval.extract import pick_extent

    ext0 = pick_extent(xyz0_raw, n0_raw, config.voxel_size, config)
    ext1 = pick_extent(xyz1_raw, n1_raw, config.voxel_size, config)
    extent = (tuple(config.grid_extent) if ext0 is None or ext1 is None
              else max(ext0, ext1))
    print(f"# bench extent bucket: {extent}", file=sys.stderr)
    spec = GridSpec(extent=extent, num_batches=2)
    xyz_cat = np.concatenate([xyz0_raw, xyz1_raw])          # [N_CAT, 3]
    bidx = np.concatenate([np.zeros(B0, np.int32), np.ones(B1, np.int32)])
    n_cat_valid = np.zeros(N_CAT, bool)
    n_cat_valid[:n0_raw] = True
    n_cat_valid[B0:B0 + n1_raw] = True
    images = jnp.concatenate([image0, image1], axis=0)      # [2,H,W,3]

    @jax.jit
    def probe_fn(xyz):
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_CAT, 1), jnp.float32),
                                 jnp.asarray(n_cat_valid), config.voxel_size,
                                 2 * N_PAD_MAX, spec, batch_index=jnp.asarray(bidx))
        counts = jnp.zeros((3,), jnp.int32).at[
            jnp.clip(sv.coords[:, 0], 0, 2)].add(
            (jnp.arange(2 * N_PAD_MAX) < sv.num_valid).astype(jnp.int32))
        return counts[:2]

    counts = np.asarray(probe_fn(jnp.asarray(xyz_cat)))
    from imfnet_tpu.eval.extract import DEFAULT_BUCKETS
    n_vox = int(counts.sum())
    N_PAD2 = next((b * 2 for b in DEFAULT_BUCKETS if 2 * b >= n_vox),
                  2 * N_PAD_MAX)
    print(f"# bench bucket: {counts.tolist()} voxels -> 2-batch pad {N_PAD2}",
          file=sys.stderr)
    caps = level_capacities(N_PAD2, tuple(config.level_capacity_divisors))
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2,
                                 extent=extent)

    @jax.jit
    def extract_pair(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32),
            jnp.asarray(n_cat_valid), config.voxel_size, N_PAD2, spec,
            batch_index=jnp.asarray(bidx))
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(variables, sv, pyr, images, train=False)
        return sv, xyz_down, feats

    @jax.jit
    def init_fn(xyz):
        sv, _, _ = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32),
            jnp.asarray(n_cat_valid), config.voxel_size, N_PAD2, spec,
            batch_index=jnp.asarray(bidx))
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return model.init(jax.random.PRNGKey(0), sv, pyr, images, train=False)

    variables = init_fn(jnp.asarray(xyz_cat))

    register_kp = make_keypoint_registration(
        voxel_size=config.voxel_size, ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh,
    )
    K = config.num_rand_keypoints

    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)
    xyz_cat = jnp.asarray(xyz_cat)

    @jax.jit
    def one_pair(key, eps):
        # eps chains each pair to the previous pair's OUTPUT: iterations form
        # a real dataflow chain the device must execute sequentially and
        # completely (the tunnel's block_until_ready returns early and
        # independent dispatches overlap, so an unchained loop measures
        # dispatch rate, not compute). Dispatch cost itself pipelines, which
        # is the production streaming behavior.
        sv, xyz_down, feats = extract_pair(xyz_cat + eps)
        # scan order packs fragment 0's rows before fragment 1's
        n0 = jnp.sum((sv.coords[:, 0] == 0).astype(jnp.int32)
                     * sv.mask().astype(jnp.int32))
        n_all = sv.num_valid
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0, K, xyz_down.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0, n_all - n0, K, xyz_down.shape[0])
        kp0, kd0 = jnp.take(xyz_down, i0, 0), jnp.take(feats, i0, 0)
        kp1, kd1 = jnp.take(xyz_down, i1, 0), jnp.take(feats, i1, 0)
        return register_kp(k2, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov)

    # warmup / compile; force a real host read
    t_c = time.perf_counter()
    out = one_pair(jax.random.PRNGKey(0), jnp.float32(0.0))
    _ = float(out["ir"])
    compile_s = {"one_pair": round(time.perf_counter() - t_c, 1)}

    # Steady-state throughput: iterations chained INSIDE one jitted fori_loop
    # through a real data dependency (eps links each pair to the previous
    # pair's rte), so the device must execute every pair completely and in
    # order. Production streaming behaves like this: the host enqueues
    # dispatches asynchronously and the device runs back-to-back; chaining
    # dispatches host-side instead would add ~24 ms/pair of axon-tunnel
    # round-trip that neither a local host nor a pipelined queue pays.
    iters = 20

    @jax.jit
    def run_chain(key0):
        def step(i, carry):
            eps, _ = carry
            key = jax.random.fold_in(key0, i)
            out = one_pair(key, eps)
            return out["rte"] * jnp.float32(1e-12), out["ir"]

        return jax.lax.fori_loop(0, iters, step, (jnp.float32(0.0), jnp.float32(0.0)))

    t_c = time.perf_counter()
    _ = jax.block_until_ready(run_chain(jax.random.PRNGKey(0)))  # compile
    compile_s["run_chain"] = round(time.perf_counter() - t_c, 1)
    t0 = time.perf_counter()
    _, ir_last = run_chain(jax.random.PRNGKey(1))
    _ = float(ir_last)  # drains the whole chain
    dt = time.perf_counter() - t0

    pairs_per_sec = iters / dt
    baseline_pairs_per_sec = 1.0  # estimated reference throughput (see header)
    record = {
        "metric": "fragment-pairs/sec (desc+match)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        # the denominator is the 1.0 pair/s ESTIMATE from the header — the
        # reference publishes no throughput number
        "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 2),
        "baseline_is_estimate": True,
        "partial": True,
    }
    skipped = []

    def emit(final=False):
        # Progressively complete JSON lines, same metric key; consumers take
        # the LAST line (only the final one has "partial": false). A driver
        # timeout mid-attribution therefore loses only the unfinished
        # sections, never the headline (BENCH_r04 was rc=124 with only the
        # provisional line — this incremental emission is the fix).
        record["partial"] = not final
        record["compile_s"] = compile_s
        if skipped:
            record["skipped_sections"] = list(skipped)
        record["elapsed_s"] = round(_elapsed(), 1)
        print(json.dumps(record), flush=True)

    emit()

    # ---- per-stage attribution + MFU (same chained-loop discipline) ----
    def timeloop(body, name):
        @jax.jit
        def run():
            return jax.lax.fori_loop(
                0, iters, lambda i, c: body(c) * jnp.float32(1e-20),
                jnp.float32(0.0))

        t_c = time.perf_counter()
        _ = float(run())
        compile_s[name] = round(time.perf_counter() - t_c, 1)
        t = time.perf_counter()
        _ = float(run())
        return (time.perf_counter() - t) / iters * 1e3

    def quant_only(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32),
            jnp.asarray(n_cat_valid), config.voxel_size, N_PAD2, spec,
            batch_index=jnp.asarray(bidx))
        return sv, xyz_down

    t_c = time.perf_counter()
    sv_c, xyz_down_c = jax.jit(quant_only)(xyz_cat)
    pyr_c = jax.jit(lambda c, n: pyramid_fn(c, n))(sv_c.coords, sv_c.num_valid)
    fwd_jit = jax.jit(lambda sv, pyr: model.apply(variables, sv, pyr, images,
                                                  train=False))
    feats_c = fwd_jit(sv_c, pyr_c)
    compile_s["stage_prep"] = round(time.perf_counter() - t_c, 1)
    n0_c = jnp.sum((sv_c.coords[:, 0] == 0).astype(jnp.int32)
                   * sv_c.mask().astype(jnp.int32))

    def _match_body(c):
        key = jax.random.PRNGKey(0)
        k0, k1, k2 = jax.random.split(key, 3)
        i0, ok0 = sample_keypoints_segment(k0, 0, n0_c, K, xyz_down_c.shape[0])
        i1, ok1 = sample_keypoints_segment(k1, n0_c, sv_c.num_valid - n0_c, K, xyz_down_c.shape[0])
        f = feats_c + c
        kp0, kd0 = jnp.take(xyz_down_c, i0, 0), jnp.take(f, i0, 0)
        kp1, kd1 = jnp.take(xyz_down_c, i1, 0), jnp.take(f, i1, 0)
        return register_kp(k2, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov)["rte"]

    # each stage timer consumes ALL of the stage's outputs — a shallow
    # consumer (one scalar) lets XLA dead-code-eliminate most of the stage
    # and report a flattered number (measured 2.2 "ms" for a pyramid whose
    # chained marginal cost was 14 ms, scripts_dev/profile_pair.py)
    def _consume_sv(sv, xyz_down):
        return (jnp.sum(sv.coords).astype(jnp.float32) + jnp.sum(sv.feats)
                + jnp.sum(xyz_down) + sv.num_valid.astype(jnp.float32))

    def _consume_pyr(pyr):
        tot = jnp.float32(0.0)
        for lvl in pyr.levels:
            tot += (jnp.sum(lvl.k3_same) + jnp.sum(lvl.coords)
                    ).astype(jnp.float32)
            if lvl.down is not None:
                tot += jnp.sum(lvl.down).astype(jnp.float32)
            if lvl.up is not None:
                tot += jnp.sum(lvl.up).astype(jnp.float32)
        return tot + jnp.sum(pyr.k5_l0).astype(jnp.float32)

    def _quant_body(c):
        sv, xyz_down = quant_only(xyz_cat + c)
        return _consume_sv(sv, xyz_down)

    def _pyr_body(c):
        pyr = pyramid_fn(
            sv_c.coords,
            sv_c.num_valid - (c > jnp.float32(1e30)).astype(jnp.int32))
        return _consume_pyr(pyr)

    stage_bodies = {
        "quantize_ms": _quant_body,
        "pyramid_ms": _pyr_body,
        "forward_ms": lambda c: jnp.sum(model.apply(
            variables, sv_c._replace(feats=sv_c.feats + c), pyr_c, images,
            train=False)).astype(jnp.float32),
        "match_ms": _match_body,
    }
    stages = {}
    for name, body in stage_bodies.items():
        if not _budget_left(f"stage:{name}", 45.0):
            skipped.append(f"stage:{name}")
            continue
        stages[name] = round(timeloop(body, name), 2)
        record["stages"] = stages
        emit()

    # ---- two MFU figures for the model forward ----
    # (a) XLA-cost MFU: flops from XLA's cost model of the compiled program.
    #     A *utilization* number — it counts the one-hot selection matmuls
    #     the banded conv strategy introduces, so it can rise by making the
    #     kernel LESS efficient.
    if "forward_ms" in stages and _budget_left("mfu", 30.0):
        try:
            fwd_flops = float(fwd_jit.lower(sv_c, pyr_c).compile()
                              .cost_analysis()["flops"])
        except Exception:
            fwd_flops = float("nan")
        # (b) model-FLOPs MFU: algorithmic work only — 2·nnz·Cin·Cout per
        #     sparse conv counted from actual kernel-map occupancy, plus the
        #     dense image trunk + attention fusion (XLA-counted; those are
        #     plain matmuls with no selection overhead). This is the
        #     reference-comparable number: it cannot improve by adding
        #     selection work.
        model_flops = model_forward_flops(model, variables, pyr_c, images)
        peak_tflops = 197.0  # TPU v5e bf16 peak
        ach = fwd_flops / (stages["forward_ms"] * 1e-3) / 1e12
        ach_model = model_flops / (stages["forward_ms"] * 1e-3) / 1e12
        record.update({
            "forward_gflops_xla": round(fwd_flops / 1e9, 1),
            # XLA cost analysis sums BOTH branches of every conv's in-graph
            # 2x-width retry lax.cond (sparse/ops.py tier-2), so gflops_xla /
            # mfu_xla overstate the executed program since round 4; the
            # executed tier-1 branch is what the wall clock measures, and
            # *_model stays the honest reference-comparable accounting.
            "xla_flops_include_untaken_retry_branches": True,
            "forward_gflops_model": round(model_flops / 1e9, 1),
            "forward_mfu_xla": round(ach / peak_tflops, 4),
            "forward_mfu_model": round(ach_model / peak_tflops, 4),
            "forward_tflops_per_s_xla": round(ach, 2),
            "forward_tflops_per_s_model": round(ach_model, 2),
        })
        # ---- forward roofline: bytes the conv stack must move through HBM
        # (VERDICT r4 item 3 — quantify the "DMA-bound" claim) ----
        try:
            from imfnet_tpu.sparse.roofline import forward_hbm_bytes

            hbm_bytes = forward_hbm_bytes(model, pyr_c)
            peak_gbps = 819.0  # TPU v5e HBM bandwidth (16 GB @ 819 GB/s)
            gbps = hbm_bytes / (stages["forward_ms"] * 1e-3) / 1e9
            record.update({
                "forward_hbm_gbytes": round(hbm_bytes / 1e9, 3),
                "forward_hbm_gbps": round(gbps, 1),
                "forward_hbm_bw_util": round(gbps / peak_gbps, 3),
            })
        except Exception as e:  # pragma: no cover
            print(f"# roofline unavailable: {e}", file=sys.stderr)
        emit()
    else:
        # skipped either because forward_ms itself was skipped or because
        # the budget guard fired — record it either way (the docstring's
        # skipped_sections contract)
        skipped.append("mfu")
        emit()

    # ---- training-step timing + MFU (VERDICT r3 weak item 6: the training
    # path gets the same honest FLOP accounting as the eval forward) ----
    # the train section costs ~300 s even with a warm compile cache: its
    # SETUP (tracing the full train step, quantizing two 131k-point sides,
    # model init) runs every process regardless of caching on this 1-CPU
    # host — demand that much budget so a slow day degrades to a recorded
    # skip instead of a driver-timeout kill
    if _budget_left("train", 300.0):
        t_c = time.perf_counter()
        train_ms, train_mfu_model, train_gflops_model = bench_train_step()
        compile_s["train"] = round(time.perf_counter() - t_c
                                   - 2 * train_ms * 5e-3, 1)
        record.update({
            "train_step_ms": round(train_ms, 2),
            "train_gflops_model": round(train_gflops_model, 1),
            "train_mfu_model": round(train_mfu_model, 4),
        })
    else:
        skipped.append("train")
    emit(final=True)


if __name__ == "__main__":
    main()
