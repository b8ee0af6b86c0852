"""KITTI pipeline end-to-end on a synthetic fixture.

Builds a fake odometry layout (velodyne .bin scans + poses txt), drives
KITTIPairDataset (pair listing, pose→GT math incl. velo2cam, device-ICP
refinement + .npy caching, voxelize/collate) and the success-rate evaluator
(`scripts/evaluation_kitti.py:29-147` semantics) with a shared untrained
model — same-geometry voxels get identical descriptors, so registration
must succeed.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.config import kitti_config
from imfnet_tpu.data.datasets import KITTIPairDataset, PairLoader, velo2cam
from imfnet_tpu.geom.transforms import apply_transform_np


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.RandomState(0)
    seq = root / "dataset" / "sequences" / "00" / "velodyne"
    poses_dir = root / "dataset" / "poses"
    os.makedirs(seq)
    os.makedirs(poses_dir)

    # desired velo-frame GT between consecutive scans: a voxel-aligned pure
    # translation, so both sides voxelize to congruent grids and an untrained
    # (but shared) model emits identical descriptors for matched voxels —
    # isolating the pipeline mechanics from descriptor quality
    M = np.eye(4)
    M[:3, 3] = [1.5, 0.6, 0.0]   # multiples of voxel_size 0.3

    # scans: scan_t = M^t applied to a common cloud (velo frame)
    base = np.stack([rng.uniform(-20, 20, 4000), rng.uniform(-20, 20, 4000),
                     rng.uniform(-1.5, 1.5, 4000)], 1).astype(np.float32)
    n_scans = 4
    Ms = [np.linalg.matrix_power(M, t) for t in range(n_scans)]
    for t in range(n_scans):
        # GT maps xyz0 → xyz1 where scans share world content:
        # scan_t = inv(M^t) · world  (so M_{t0→t1} = inv(M^t1)·M^t0 ... keep
        # the simple form: scan_t = apply(inv(Ms[t]), base)
        pts = apply_transform_np(base, np.linalg.inv(Ms[t])).astype(np.float32)
        arr = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        arr.tofile(seq / ("%06d.bin" % t))

    # poses chosen so the dataset's closed-form GT equals the velo-frame GT:
    # gt = (V p0^T inv(p1^T) inv(V))^T with p0 = I  ⇒
    # p_t^T = inv( inv(V) · gt_{0→t}^T · V )
    V = velo2cam()
    with open(poses_dir / "00.txt", "w") as f:
        for t in range(n_scans):
            gt_0t = np.linalg.inv(Ms[t])  # maps scan_0 → scan_t
            pT = np.linalg.inv(np.linalg.inv(V) @ gt_0t.T @ V)
            f.write(" ".join(f"{v:.9f}" for v in pT.T[:3].reshape(-1)) + "\n")

    with open(root / "test_list.txt", "w") as f:
        f.write("0\n")
    return root


@pytest.mark.slow
def test_kitti_dataset_and_eval(kitti_root, monkeypatch):
    monkeypatch.setitem(KITTIPairDataset.DATA_FILES, "test",
                        str(kitti_root / "test_list.txt"))
    config = kitti_config(
        kitti_root=str(kitti_root), max_points=8192,
        kitti_max_time_diff=4,
        # untrained descriptors have no spatial smoothness: keypoints must
        # cover all voxels or subsampling kills the correspondence inlier rate
        num_rand_keypoints=4096, ransac_max_iteration=8192, compute_dtype="float32",
        conv1_kernel_size=3, model_n_out=16, batch_size=1,
    )
    dset = KITTIPairDataset("test", config, random_rotation=False,
                            random_scale=False)
    assert len(dset) >= 2          # time diffs 2 and 3 from scan 0, etc.
    sample = dset[0]
    # GT must align the voxelized clouds (ICP cache written)
    assert os.path.isdir(os.path.join(str(kitti_root), "icp"))
    moved = apply_transform_np(sample.xyz0, sample.T_gt)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(sample.xyz1).query(moved)
    assert np.median(d) < config.voxel_size, np.median(d)

    # full evaluator with an untrained (but shared) model
    from imfnet_tpu.eval.kitti import evaluate_kitti
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.train.step import make_pyramid_fn

    loader = PairLoader(dset, 1, config.max_points, shuffle=False)
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=True, compute_dtype=jnp.float32)
    batch = next(iter(loader))
    sv = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr = make_pyramid_fn(config, config.max_points, 1)(batch.coords0, batch.n0)
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, batch.image0,
                           train=False)
    stats = evaluate_kitti(model, variables, config, loader)
    assert stats["num_pairs"] >= 2
    assert stats["success_rate"] >= 0.5, stats
    # every fixture pair clears the <1000-GT-match rejection
    assert stats["failed_loads"] == 0
    # unscaled phase → per-sample search radius is matching_search_voxel_size
    assert sample.search_radius == pytest.approx(
        config.voxel_size * config.positive_pair_search_voxel_size_multiplier)


def test_pair_rejection_counted():
    """<1000-GT-match pairs raise in __getitem__ (`lib/data_loaders.py:588`)
    and PairLoader counts the skip the way `evaluation_kitti.py:66-70`
    does."""
    from imfnet_tpu.config import threedmatch_config as base_config
    from imfnet_tpu.data.datasets import SyntheticPairDataset

    config = base_config(max_points=4096)

    class Flaky(SyntheticPairDataset):
        def __getitem__(self, idx):
            if idx % 2 == 1:
                raise ValueError(f"pair {idx}: too few matches")
            return super().__getitem__(idx)

    dset = Flaky("val", config, length=6, n_points=500)
    loader = PairLoader(dset, 1, config.max_points, shuffle=False,
                        drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    assert loader.skip_count == 3


def test_scale_scales_search_radius():
    """The positive-search radius carries the sampled random scale
    (`lib/data_loaders.py:273-276`: matching_search_voxel_size *= scale)."""
    from imfnet_tpu.config import threedmatch_config as base_config
    from imfnet_tpu.data.datasets import PairDataset

    config = base_config(use_random_scale=True)
    dset = PairDataset("train", config, random_rotation=False,
                       random_scale=True, manual_seed=True)
    rng = np.random.RandomState(3)
    xyz = rng.rand(100, 3).astype(np.float32)
    radii = set()
    for _ in range(8):
        x0, x1, _, radius = dset._augment(xyz.copy(), xyz.copy())
        scale = float(x0[0, 0] / xyz[0, 0])
        assert radius == pytest.approx(
            dset.matching_search_voxel_size * scale, rel=1e-5)
        radii.add(round(radius, 6))
    assert len(radii) > 1  # the scale actually varies
