"""Datasets + loader: 3DMatch/3DImageMatch pairs, KITTI odometry pairs.

Host-side mirror of `lib/data_loaders.py`:
- ThreeDMatchPairDataset / IndoorPairDataset (:206-348,717-723): pair lists
  from per-scene overlap txts, PLY + `_0.png`/`_0.jpg` image, random
  scale [0.8,1.2] (p=0.95) and random rotation augmentation, voxel dedup.
- ThreeDMatchTestDataset (:147-203): gt.log-driven raw test pairs.
- KITTIPairDataset / KITTINMPairDataset (:351-714): velodyne .bin pairs by
  time difference or >=10 m apart, GT from odometry poses + velo2cam,
  refined by ICP and cached to .npy (ICP runs on-device via
  imfnet_tpu.match.icp instead of Open3D).
- make_data_loader (:730-772): shuffling iterator producing padded
  PairBatch with a background prefetch thread (replaces worker processes).

Positive-correspondence search happens on-device in the train step
(train.step.compute_correspondences), not here.
"""
from __future__ import annotations

import glob
import logging
import os
import pathlib
import queue
import threading
from typing import List, Optional

import numpy as np

from imfnet_tpu.config import Config
from imfnet_tpu.data.collate import VoxelizedPair, collate_pairs, voxelize_np
from imfnet_tpu.geom.image import load_image, process_image
from imfnet_tpu.geom.ply import read_ply
from imfnet_tpu.geom.trajectory import read_trajectory
from imfnet_tpu.geom.transforms import Jitter, apply_transform_np, sample_random_trans
from imfnet_tpu.utils.native import count_pairs_within_radius

_kitti_pose_cache = {}
_kitti_icp_cache = {}



def _resolve_data_file(path: str) -> str:
    """Split-list resolution: CWD-relative (reference layout) first, else the
    standard split lists shipped with the package (data/config/*.txt)."""
    if os.path.exists(path):
        return path
    pkg = os.path.join(os.path.dirname(__file__), "config", os.path.basename(path))
    if os.path.exists(pkg):
        return pkg
    raise FileNotFoundError(f"split list not found: {path} (also tried {pkg})")


class PairDataset:
    """Base: augmentation state + config (`lib/data_loaders.py:107-144`)."""

    def __init__(self, phase: str, config: Config, random_rotation=True,
                 random_scale=True, manual_seed=False, transform=None):
        self.phase = phase
        self.files: List = []
        self.config = config
        self.transform = transform
        self.voxel_size = config.voxel_size
        self.matching_search_voxel_size = (
            config.voxel_size * config.positive_pair_search_voxel_size_multiplier
        )
        self.random_scale = random_scale
        self.min_scale = config.min_scale
        self.max_scale = config.max_scale
        self.random_rotation = random_rotation
        self.rotation_range = config.rotation_range
        self.randg = np.random.RandomState()
        if manual_seed:
            self.reset_seed()

    def reset_seed(self, seed=0):
        logging.info("Resetting the data loader seed to %d", seed)
        self.randg.seed(seed)

    def __len__(self):
        return len(self.files)

    # -- shared augmentation + voxelize tail of __getitem__ -----------------
    def _finalize(self, xyz0, xyz1, trans, image0, image1,
                  search_radius=0.0) -> VoxelizedPair:
        c0, sel0 = voxelize_np(xyz0, self.voxel_size)
        c1, sel1 = voxelize_np(xyz1, self.voxel_size)
        f0 = np.ones((len(c0), 1), np.float32)
        f1 = np.ones((len(c1), 1), np.float32)
        if self.transform is not None:
            c0, f0 = self.transform(self.randg, c0, f0)
            c1, f1 = self.transform(self.randg, c1, f1)
        return VoxelizedPair(
            coords0=c0.astype(np.int32), xyz0=xyz0[sel0].astype(np.float32),
            feats0=f0.astype(np.float32),
            coords1=c1.astype(np.int32), xyz1=xyz1[sel1].astype(np.float32),
            feats1=f1.astype(np.float32),
            image0=image0, image1=image1,
            T_gt=trans.astype(np.float32),
            search_radius=float(search_radius),
        )

    def _augment(self, xyz0, xyz1, base_trans=None):
        """Random scale + rotation (`lib/data_loaders.py:273-288,556-572`).
        Returns (xyz0', xyz1', trans, search_radius) with
        xyz1' ≈ trans @ xyz0'; search_radius is matching_search_voxel_size
        scaled by the sampled scale (`lib/data_loaders.py:273-276`)."""
        search_radius = self.matching_search_voxel_size
        if self.random_scale and self.randg.rand() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * self.randg.rand()
            search_radius *= scale
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1
        if self.random_rotation:
            T0 = sample_random_trans(xyz0, self.randg, self.rotation_range)
            T1 = sample_random_trans(xyz1, self.randg, self.rotation_range)
            mid = base_trans if base_trans is not None else np.eye(4)
            trans = T1 @ mid @ np.linalg.inv(T0)
            xyz0 = apply_transform_np(xyz0, T0)
            xyz1 = apply_transform_np(xyz1, T1)
        else:
            trans = base_trans if base_trans is not None else np.eye(4)
        return xyz0, xyz1, trans, search_radius

    def _load_image_for(self, ply_or_bin_path: str) -> np.ndarray:
        for suffix in ("_0.png", "_0.jpg", ".png"):
            p = ply_or_bin_path.rsplit(".", 1)[0] + suffix
            if os.path.exists(p):
                img = load_image(p)
                return process_image(img, self.config.image_H, self.config.image_W)
        # missing image → zeros (keeps the pipeline total; callers that train
        # multimodal models should ensure images exist)
        return np.zeros((self.config.image_H, self.config.image_W, 3), np.float32)


class IndoorPairDataset(PairDataset):
    """3DImageMatch fragment pairs from overlap txt lists
    (`lib/data_loaders.py:206-348`)."""

    DATA_FILES = {}

    def __init__(self, phase, config, **kw):
        super().__init__(phase, config, **kw)
        self.root = config.threed_match_dir
        subset_names = open(_resolve_data_file(self.DATA_FILES[phase])).read().split()
        for name in subset_names:
            fnames_txt = glob.glob(os.path.join(config.overlap_path, name + "*"))
            assert len(fnames_txt) > 0, (
                f"Missing overlap files for {name} under {config.overlap_path}"
            )
            for fname_txt in fnames_txt:
                with open(fname_txt) as f:
                    content = f.readlines()
                for line in content:
                    parts = line.strip().split()
                    if parts:
                        self.files.append([parts[0], parts[1]])

    def __getitem__(self, idx) -> VoxelizedPair:
        file0 = os.path.join(self.root, self.files[idx][0])
        file1 = os.path.join(self.root, self.files[idx][1])
        xyz0 = read_ply(file0)["points"]
        xyz1 = read_ply(file1)["points"]
        image0 = self._load_image_for(file0)
        image1 = self._load_image_for(file1)
        xyz0, xyz1, trans, radius = self._augment(xyz0, xyz1)
        return self._finalize(xyz0, xyz1, trans, image0, image1, radius)


class ThreeDMatchPairDataset(IndoorPairDataset):
    OVERLAP_RATIO = 0.3
    DATA_FILES = {
        "train": "./config/train_3dmatch.txt",
        "val": "./config/val_3dmatch.txt",
        "test": "./config/test_3dmatch.txt",
    }


class ThreeDMatchTestDataset(PairDataset):
    """gt.log-driven raw test pairs (`lib/data_loaders.py:147-203`)."""

    DATA_FILES = {"test": "./config/test_3dmatch.txt"}

    def __init__(self, phase, config, scene_id=None, return_ply_names=False, **kw):
        assert phase == "test"
        super().__init__(phase, config, **kw)
        self.root = config.threed_match_dir
        subset_names = open(_resolve_data_file(self.DATA_FILES[phase])).read().split()
        if scene_id is not None:
            subset_names = [subset_names[scene_id]]
        for sname in subset_names:
            traj_file = os.path.join(self.root, sname + "-evaluation/gt.log")
            assert os.path.exists(traj_file), traj_file
            for ctraj in read_trajectory(traj_file):
                self.files.append(
                    (sname, ctraj.metadata[0], ctraj.metadata[1], ctraj.pose)
                )
        self.return_ply_names = return_ply_names

    def __getitem__(self, idx):
        sname, i, j, T_gt = self.files[idx]
        ply0 = os.path.join(self.root, sname, f"cloud_bin_{i}.ply")
        ply1 = os.path.join(self.root, sname, f"cloud_bin_{j}.ply")
        if self.return_ply_names:
            return sname, ply0, ply1, T_gt
        return sname, read_ply(ply0)["points"], read_ply(ply1)["points"], T_gt


_VELO2CAM = None


def velo2cam() -> np.ndarray:
    """KITTI velodyne→cam0 extrinsics (`lib/data_loaders.py:408-420`)."""
    global _VELO2CAM
    if _VELO2CAM is None:
        R = np.array([
            7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02,
            7.280733e-04, -9.998902e-01, 9.998621e-01, 7.523790e-03,
            1.480755e-02,
        ]).reshape(3, 3)
        T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)
        _VELO2CAM = np.vstack((np.hstack([R, T]), [0, 0, 0, 1])).T
    return _VELO2CAM


class KITTIPairDataset(PairDataset):
    """Odometry pairs with time difference in [2, max_time_diff)
    (`lib/data_loaders.py:351-623`)."""

    DATA_FILES = {
        "train": "./config/train_kitti.txt",
        "val": "./config/val_kitti.txt",
        "test": "./config/test_kitti.txt",
    }
    TEST_RANDOM_ROTATION = False
    MIN_SAMPLE_DIST = None  # set by KITTINMPairDataset

    def __init__(self, phase, config, **kw):
        if "random_rotation" in kw:
            kw["random_rotation"] = self.TEST_RANDOM_ROTATION
        super().__init__(phase, config, **kw)
        self.root = os.path.join(config.kitti_root, "dataset")
        self.icp_path = config.icp_cache_path or os.path.join(config.kitti_root, "icp")
        pathlib.Path(self.icp_path).mkdir(parents=True, exist_ok=True)
        self.max_time_diff = config.kitti_max_time_diff
        subset_names = open(_resolve_data_file(self.DATA_FILES[phase])).read().split()
        self._build_file_list(subset_names)

    def _scan_ids(self, drive_id: int):
        fnames = glob.glob(self.root + "/sequences/%02d/velodyne/*.bin" % drive_id)
        assert len(fnames) > 0, f"no velodyne data for drive {drive_id} in {self.root}"
        return sorted(int(os.path.split(f)[-1][:-4]) for f in fnames)

    def _build_file_list(self, subset_names):
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = self._scan_ids(drive_id)
            iset = set(inames)
            for start_time in inames:
                for time_diff in range(2, self.max_time_diff):
                    pair_time = time_diff + start_time
                    if pair_time in iset:
                        self.files.append((drive_id, start_time, pair_time))

    def _poses(self, drive: int) -> np.ndarray:
        path = self.root + "/poses/%02d.txt" % drive
        if path not in _kitti_pose_cache:
            _kitti_pose_cache[path] = np.genfromtxt(path)
        return _kitti_pose_cache[path]

    def _position(self, odometry: np.ndarray) -> np.ndarray:
        T = odometry.reshape(3, 4)
        return np.vstack((T, [0, 0, 0, 1]))

    def _velodyne_fn(self, drive: int, t: int) -> str:
        return self.root + "/sequences/%02d/velodyne/%06d.bin" % (drive, t)

    def _refined_gt(self, drive, t0, t1, xyz0, xyz1) -> np.ndarray:
        """ICP-refined ground truth, cached to .npy
        (`lib/data_loaders.py:527-554`); ICP on device (match.icp)."""
        key = "%d_%d_%d" % (drive, t0, t1)
        fname = os.path.join(self.icp_path, key + ".npy")
        if key in _kitti_icp_cache:
            return _kitti_icp_cache[key]
        if os.path.exists(fname):
            M2 = np.load(fname)
        else:
            poses = self._poses(drive)
            p0 = self._position(poses[t0])
            p1 = self._position(poses[t1])
            v2c = velo2cam()
            M = (v2c @ p0.T @ np.linalg.inv(p1.T) @ np.linalg.inv(v2c)).T
            _, sel0 = voxelize_np(xyz0, 0.05)
            _, sel1 = voxelize_np(xyz1, 0.05)
            M2 = self._run_icp(apply_transform_np(xyz0[sel0], M), xyz1[sel1]) @ M
            np.save(fname, M2)
        _kitti_icp_cache[key] = M2
        return M2

    @staticmethod
    def _run_icp(xyz0_t: np.ndarray, xyz1: np.ndarray, threshold=0.2) -> np.ndarray:
        import jax.numpy as jnp

        from imfnet_tpu.match.icp import icp_point_to_point

        n_pad = 1 << int(np.ceil(np.log2(max(len(xyz0_t), len(xyz1), 2))))

        def pad(x):
            out = np.zeros((n_pad, 3), np.float32)
            out[: len(x)] = x
            return jnp.asarray(out)

        T = icp_point_to_point(
            pad(xyz0_t), pad(xyz1),
            jnp.arange(n_pad) < len(xyz0_t), jnp.arange(n_pad) < len(xyz1),
            jnp.eye(4), threshold, iters=30,
        )
        return np.asarray(T, np.float64)

    def __getitem__(self, idx) -> VoxelizedPair:
        drive, t0, t1 = self.files[idx]
        fname0 = self._velodyne_fn(drive, t0)
        fname1 = self._velodyne_fn(drive, t1)
        xyz0 = np.fromfile(fname0, dtype=np.float32).reshape(-1, 4)[:, :3]
        xyz1 = np.fromfile(fname1, dtype=np.float32).reshape(-1, 4)[:, :3]
        image0 = self._load_image_for(fname0)
        image1 = self._load_image_for(fname0)  # reference uses frame0's image twice (:508-509)
        M2 = self._refined_gt(drive, t0, t1, xyz0, xyz1)

        if self.random_rotation:
            T0 = sample_random_trans(xyz0, self.randg, 45.0)  # pi/4, :557
            T1 = sample_random_trans(xyz1, self.randg, 45.0)
            trans = T1 @ M2 @ np.linalg.inv(T0)
            xyz0 = apply_transform_np(xyz0, T0)
            xyz1 = apply_transform_np(xyz1, T1)
        else:
            trans = M2
        radius = self.matching_search_voxel_size
        if self.random_scale and self.randg.rand() < 0.95:
            scale = self.min_scale + (self.max_scale - self.min_scale) * self.randg.rand()
            radius *= scale  # `lib/data_loaders.py:566-570`
            xyz0 = scale * xyz0
            xyz1 = scale * xyz1
        sample = self._finalize(xyz0, xyz1, trans, image0, image1, radius)
        # pair rejection: the reference raises when the voxelized pair has
        # fewer than 1000 GT correspondences (`lib/data_loaders.py:586-588`);
        # KITTI eval counts these skips (`scripts/evaluation_kitti.py:66-70`)
        n_matches = count_pairs_within_radius(
            apply_transform_np(sample.xyz0, trans), sample.xyz1, radius)
        if n_matches < 1000:
            raise ValueError(f"{drive}, {t0}, {t1}")
        return sample


class KITTINMPairDataset(KITTIPairDataset):
    """Pairs >= 10 m apart (`lib/data_loaders.py:626-714`)."""

    MIN_DIST = 10

    def _build_file_list(self, subset_names):
        for dirname in subset_names:
            drive_id = int(dirname)
            inames = self._scan_ids(drive_id)
            iset = set(inames)
            all_pos = np.array([self._position(p) for p in self._poses(drive_id)])
            Ts = all_pos[:, :3, 3]
            pdist = np.sqrt(
                ((Ts.reshape(1, -1, 3) - Ts.reshape(-1, 1, 3)) ** 2).sum(-1)
            )
            valid_pairs = pdist > self.MIN_DIST
            curr_time = inames[0]
            while curr_time in iset:
                next_time = np.where(
                    valid_pairs[curr_time][curr_time:curr_time + 100]
                )[0]
                if len(next_time) == 0:
                    curr_time += 1
                    continue
                next_time = next_time[0] + curr_time - 1
                if next_time in iset:
                    self.files.append((drive_id, curr_time, next_time))
                    curr_time = next_time + 1
                else:
                    curr_time += 1
        # problematic sequence (`lib/data_loaders.py:708-714`)
        for item in [(8, 15, 58)]:
            if item in self.files:
                self.files.remove(item)


class SyntheticPairDataset(PairDataset):
    """Self-contained synthetic dataset (no files needed) — used for smoke
    training, benchmarks, and CI. Not in the reference."""

    def __init__(self, phase, config, length=None, n_points=None, **kw):
        super().__init__(phase, config, **kw)
        self.files = list(range(
            length if length is not None
            else getattr(config, "synthetic_length", 64)))
        self.n_points = (n_points if n_points is not None
                         else getattr(config, "synthetic_n_points", 4000))

    def __getitem__(self, idx) -> VoxelizedPair:
        from imfnet_tpu.data.synthetic import synthetic_pair

        # per-index deterministic in EVERY phase: sample i is the same no
        # matter which process/loader-shard draws it or in what order —
        # required for multi-host DP feeding to equal a single-process run
        # (train uses a seed-mixed stream so train/val/test differ)
        if self.phase == "train":
            seed = (1_000_003 + idx * 7919 + self.config.seed) % (1 << 31)
        else:
            seed = idx
        rng = np.random.RandomState(seed)
        return synthetic_pair(
            rng,
            n_points=self.n_points,
            voxel_size=self.voxel_size,
            image_hw=(self.config.image_H, self.config.image_W),
        )


ALL_DATASETS = [ThreeDMatchPairDataset, KITTIPairDataset, KITTINMPairDataset,
                SyntheticPairDataset]
dataset_str_mapping = {d.__name__: d for d in ALL_DATASETS}


class PairLoader:
    """Iterable over padded PairBatch with background prefetch
    (`make_data_loader` contract, `lib/data_loaders.py:730-772`)."""

    def __init__(self, dataset, batch_size: int, n_pad: int, shuffle=True,
                 seed=0, prefetch: int = 2, drop_last=True,
                 grid_extent=None, shard=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.n_pad = n_pad
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.grid_extent = grid_extent  # loud guard, see collate_pairs
        # multi-host data parallelism: shard=(rank, world, group) keeps only
        # batch b when (b // group) % world == rank — contiguous groups of
        # ``group`` batches (= local devices per process) rotate over
        # processes, so the union over processes at each global step equals
        # the single-process epoch (the DP Trainer consumes ``group``
        # batches per optimizer step). Identical epoch seed on every process
        # keeps the permutations aligned. Only COMPLETE rounds (one group
        # per rank) are kept: a ragged tail would give ranks unequal batch
        # counts, and the rank with the extra group would enter the global
        # pmean collective alone and deadlock the job.
        self.shard = shard
        # samples dropped by ValueError (e.g. KITTI <1000-GT-match rejection,
        # `lib/data_loaders.py:588`); reset each __iter__, consumed by
        # eval.kitti the way `scripts/evaluation_kitti.py:66-70` counts skips
        self.skip_count = 0

    def _total_batches(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _keep_batch(self, b: int) -> bool:
        if self.shard is None:
            return True
        rank, world, group = self.shard
        rounds = (self._total_batches() // group) // world
        g = b // group
        return g % world == rank and g // world < rounds

    def __len__(self):
        t = self._total_batches()
        if self.shard is None:
            return t
        _, world, group = self.shard
        return ((t // group) // world) * group  # complete rounds only

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self):
        self.skip_count = 0
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                idx = self._epoch_indices()
                for b in range(self._total_batches()):
                    if not self._keep_batch(b):
                        continue
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if len(sel) < self.batch_size and self.drop_last:
                        break
                    samples = []
                    for i in sel:
                        try:
                            samples.append(self.dataset[int(i)])
                        except ValueError as e:
                            # skippable pair (e.g. KITTI <1000 matches,
                            # `scripts/evaluation_kitti.py:66-70`)
                            self.skip_count += 1
                            logging.warning(
                                "skipping pair %d (%s); %d skipped so far",
                                int(i), e, self.skip_count)
                            continue
                    if samples:
                        q.put(collate_pairs(samples, self.n_pad,
                                            grid_extent=self.grid_extent))
            except BaseException as e:  # surface in the consumer thread —
                q.put(e)                # a silent stop would truncate epochs
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def make_data_loader(config: Config, phase: str, batch_size: int,
                     shuffle: Optional[bool] = None) -> PairLoader:
    assert phase in ("train", "trainval", "val", "test")
    if shuffle is None:
        shuffle = phase != "test"
    Dataset = dataset_str_mapping[config.dataset]
    use_random_rotation = False
    use_random_scale = False
    transform = None
    if phase in ("train", "trainval"):
        use_random_rotation = config.use_random_rotation
        use_random_scale = config.use_random_scale
        transform = _compose_jitter()
    dset = Dataset(
        phase, config,
        random_rotation=use_random_rotation,
        random_scale=use_random_scale,
        transform=transform,
    )
    # deterministic augmentation stream (reference reproducibility aid:
    # `PairDataset.reset_seed`, `lib/data_loaders.py:133-135`, seeded at
    # `train_3DMatch.py:26-27`) — also what keeps multi-process loaders'
    # sample streams aligned with a single-process run
    dset.reset_seed(config.seed)
    # multi-host DP: the TRAIN loader of each process loads only its own
    # batch groups (group size = local devices); val/test stay unsharded so
    # every process computes identical metrics and best-val gating agrees
    shard = None
    if phase in ("train", "trainval"):
        import jax

        if jax.process_count() > 1:
            shard = (jax.process_index(), jax.process_count(),
                     jax.local_device_count())
    return PairLoader(dset, batch_size, config.max_points, shuffle=shuffle,
                      seed=config.seed, shard=shard,
                      grid_extent=(tuple(config.grid_extent)
                                   if config.use_grid_maps else None))


def _compose_jitter():
    from imfnet_tpu.geom.transforms import Compose

    return Compose([Jitter()])
