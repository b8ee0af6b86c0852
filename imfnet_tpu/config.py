"""Single dataclass config with dataset presets.

Replaces the reference's two near-identical argparse files
(`config_3dmatch.py:18-143`, `config_kitti.py`) with one serializable
dataclass. The config is written into the run dir and embedded in
checkpoints, mirroring `lib/trainer.py:87-91` / `scripts/generate_desc.py:160-161`.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class Config:
    # --- trainer (reference: config_3dmatch.py:21-36) ---
    trainer: str = "HardestContrastiveLossTrainer"
    batch_size: int = 2
    val_batch_size: int = 1
    num_pos_per_batch: int = 1024
    num_hn_samples_per_batch: int = 256
    neg_thresh: float = 1.4
    pos_thresh: float = 0.1
    neg_weight: float = 1.0

    # --- augmentation (config_3dmatch.py:39-43) ---
    use_random_scale: bool = False
    min_scale: float = 0.8
    max_scale: float = 1.2
    use_random_rotation: bool = True
    rotation_range: float = 360.0

    # --- validation (config_3dmatch.py:50-57) ---
    stat_freq: int = 40
    test_valid: bool = True
    val_max_iter: int = 400
    val_epoch_freq: int = 1
    positive_pair_search_voxel_size_multiplier: float = 1.5
    hit_ratio_thresh: float = 0.1

    # --- triplet losses (config_3dmatch.py:60-62) ---
    triplet_num_pos: int = 256
    triplet_num_hn: int = 512
    triplet_num_rand: int = 1024

    # --- network (config_3dmatch.py:66-71) ---
    model: str = "ResUNetBN2C"
    model_n_out: int = 32
    conv1_kernel_size: int = 5
    normalize_feature: bool = True
    dist_type: str = "L2"
    best_val_metric: str = "feat_match_ratio"
    in_channels: int = 1

    # --- optimizer (config_3dmatch.py:75-87) ---
    optimizer: str = "SGD"
    max_epoch: int = 200
    lr: float = 1e-1
    momentum: float = 0.8
    weight_decay: float = 1e-4
    iter_size: int = 1
    bn_momentum: float = 0.05
    exp_gamma: float = 0.99

    # --- data (config_3dmatch.py:117-143) ---
    dataset: str = "ThreeDMatchPairDataset"
    voxel_size: float = 0.025
    threed_match_dir: str = ""
    overlap_path: str = ""
    kitti_root: str = ""
    kitti_max_time_diff: int = 3
    kitti_date: str = "2020_09_30"
    icp_cache_path: str = ""
    image_W: int = 160
    image_H: int = 120

    # --- eval (scripts/evaluation_3dmatch.py:28-32,580; benchmark_util.py:16-34) ---
    num_rand_keypoints: int = 5000
    # replay persisted per-pair keypoint indices instead of sampling
    # (the reference's cfg.keypoints, `evaluation_3dmatch.py:146-151`)
    use_saved_keypoints: bool = False
    inlier_thresh: float = 0.1
    fmr_inlier_ratio_threshes: Tuple[float, ...] = (0.05, 0.20)
    ransac_n: int = 3
    ransac_max_iteration: int = 50000
    ransac_edge_length_ratio: float = 0.9
    # NN chunk size (result-invariant): the reference's GPU-memory knob
    # (`lib/eval.py:18-48`, default 500); larger blocks suit the TPU MXU
    nn_max_n: int = 4096
    # validation subsample (`lib/trainer.py:419` hardcodes 5000)
    val_subsample_size: int = 5000

    # --- TPU-specific (new capability; no reference equivalent) ---
    # Static padded sizes (per concatenated batch) for the sparse engine.
    # Variable point counts are padded to these shapes to avoid recompiles.
    max_points: int = 65536           # stride-1 voxels per batch side
    max_correspondences: int = 16384  # positive pairs per batch
    # Dense-grid coordinate index (fast kernel maps). Extents in stride-1
    # voxel cells per fragment; fragments outside fall back to binary search.
    use_grid_maps: bool = True
    grid_extent: Tuple[int, int, int] = (256, 256, 256)
    # Additional SMALLER extent fast-paths for EXTRACTION: the extractor
    # probes each fragment's voxel span host-side and runs the smallest
    # extent bucket that holds it. grid_extent stays the ceiling (beyond
    # it → exact binary-search path); entries >= grid_extent are ignored
    # (eval.extract.extent_buckets). Training always uses grid_extent.
    # Default None (single bucket): 128³ measured FASTER in isolation
    # (quantize+pyramid 12.8 vs 16.3 ms) but SLOWER end-to-end on the
    # bench chain (28.7 vs 29.9 pairs/s — its level-0 packed table lands
    # at 174k words, the pessimal row-gather size on v5e, paid by all 25
    # k5 columns). Opt in per dataset only with a chained measurement.
    grid_extent_buckets: Optional[Tuple[Tuple[int, int, int], ...]] = None
    # Static per-UNet-level row capacities: level i holds max_points //
    # divisor[i]. Surface data shrinks ~3.4x per stride-2; (1,2,4,8) is the
    # safe default, (1,3,8,20) fits 3DMatch fragments with margin.
    level_capacity_divisors: Tuple[int, int, int, int] = (1, 2, 4, 8)
    compute_dtype: str = "bfloat16"   # conv/attention compute dtype (f32 accum)
    param_dtype: str = "float32"
    # Device-mesh size over the pair axis (data parallelism — new capability
    # vs the single-GPU reference, SURVEY.md §2.3). 0 = auto: use every
    # addressable device, clamped so at least one optimizer step per epoch
    # remains. 1 = single device. >1 = exactly that many devices (error if
    # unavailable). The Trainer consumes `data_parallel` loader batches per
    # optimizer step and pmean's grads/BN stats over the mesh
    # (parallel/dp.py); `cli train --num-devices` sets this. Default 1 —
    # DP changes training dynamics (N× effective batch, N× fewer optimizer
    # steps per epoch), so scaling is OPT-IN and a flagless rerun of an old
    # command keeps its reference-parity loss curve.
    data_parallel: int = 1
    # SyntheticPairDataset size knobs (smoke training / CI; not in the
    # reference): pairs per epoch and raw points per fragment
    synthetic_length: int = 64
    synthetic_n_points: int = 4000
    seed: int = 0
    out_dir: str = "outputs"
    save_freq_epoch: int = 1
    resume: Optional[str] = None
    weights: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=False)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        if "fmr_inlier_ratio_threshes" in d:
            d["fmr_inlier_ratio_threshes"] = tuple(d["fmr_inlier_ratio_threshes"])
        return cls(**d)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def threedmatch_config(**overrides) -> Config:
    """Defaults of the reference's `config_3dmatch.py`."""
    return Config(**overrides)


def kitti_config(**overrides) -> Config:
    """Deltas of the reference's `config_kitti.py` vs 3DMatch: voxel 0.3,
    random_scale on, hit_ratio 0.3, best_val 'success', KITTINMPairDataset,
    ransac_n=4 (`scripts/evaluation_kitti.py:99-112`)."""
    base = dict(
        dataset="KITTINMPairDataset",
        voxel_size=0.3,
        use_random_scale=True,
        hit_ratio_thresh=0.3,
        best_val_metric="success",
        ransac_n=4,
        out_dir="outputs_kitti",
        max_points=131072,
        grid_extent=(704, 704, 128),
        # velodyne scans span most of the static range — a half-extent
        # bucket would almost never fit, so don't pay its compiles
        grid_extent_buckets=None,
        # velodyne scans are thin and sparse: coarse levels shrink far more
        # slowly than indoor surface data, so per-level capacities must stay
        # generous (overflow silently drops coarse voxels)
        level_capacity_divisors=(1, 1, 2, 4),
    )
    base.update(overrides)
    return Config(**base)
