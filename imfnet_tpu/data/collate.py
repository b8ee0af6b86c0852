"""Host-side voxelization + batch collation into padded PairBatch.

The numpy half of the pipeline (datasets run here: file I/O, augmentation,
voxel dedup); everything downstream — kernel maps, correspondence search,
model — is on-device. Mirrors `collate_pair_fn` (`lib/data_loaders.py:28-91`)
with batch indices in the coords column and per-side concatenation, plus
static padding.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from imfnet_tpu.sparse.coords import PAD_COORD
from imfnet_tpu.train.step import PairBatch


@dataclass
class VoxelizedPair:
    """One sample as produced by a dataset __getitem__ (already augmented)."""

    coords0: np.ndarray  # int32[n0,3] voxel coords (floor(xyz/voxel))
    xyz0: np.ndarray     # float32[n0,3] representative points
    feats0: np.ndarray   # float32[n0,F]
    coords1: np.ndarray
    xyz1: np.ndarray
    feats1: np.ndarray
    image0: np.ndarray   # float32[H,W,3]
    image1: np.ndarray
    T_gt: np.ndarray     # float32[4,4] (xyz1 ≈ T_gt @ xyz0)
    # positive-search radius for this sample, scaled by the sample's random
    # scale like the reference's matching_search_voxel_size
    # (`lib/data_loaders.py:273-276`); 0 → config default
    search_radius: float = 0.0


def voxelize_np(xyz: np.ndarray, voxel_size: float):
    """floor + first-occurrence unique (host mirror of sparse.coords.quantize;
    semantics of `ME.utils.sparse_quantize`, `lib/data_loaders.py:290-295`).
    Uses the native hash dedup (native/host_ops.cpp) when built."""
    from imfnet_tpu.utils.native import voxel_dedup

    return voxel_dedup(xyz, voxel_size)


def _pack_side(coords_list, xyz_list, feats_list, n_pad: int):
    rows = []
    for b, (c, x, f) in enumerate(zip(coords_list, xyz_list, feats_list)):
        bc = np.concatenate([np.full((len(c), 1), b, np.int32), c.astype(np.int32)], 1)
        rows.append((bc, x, f))
    coords = np.concatenate([r[0] for r in rows])
    xyz = np.concatenate([r[1] for r in rows])
    feats = np.concatenate([r[2] for r in rows])
    n = len(coords)
    if n > n_pad:
        raise ValueError(f"batch has {n} voxels > capacity {n_pad}; "
                         f"raise config.max_points or reduce batch size")
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    cp = np.full((n_pad, 4), int(PAD_COORD), np.int32)
    cp[:n] = coords[order]
    xp = np.zeros((n_pad, 3), np.float32)
    xp[:n] = xyz[order]
    fp = np.zeros((n_pad, feats.shape[1]), np.float32)
    fp[:n] = feats[order]
    return cp, xp, fp, n


def collate_pairs(samples: List[VoxelizedPair], n_pad: int,
                  grid_extent=None) -> PairBatch:
    """Concatenate a list of voxelized pairs into one padded device batch.
    Positive correspondences are computed on-device (train.step
    .compute_correspondences), so none are carried here.

    ``grid_extent``: when the training step uses the static dense-grid
    pyramid (config.use_grid_maps), a sample whose voxel span exceeds the
    extent would be silently cropped by quantize_grid — fail loudly here
    instead (the eval extractor falls back to the exact pyramid; the jitted
    train step cannot switch per batch)."""
    if grid_extent is not None:
        ext = np.asarray(grid_extent)
        for s in samples:
            for side, c in (("0", s.coords0), ("1", s.coords1)):
                span = c.max(0) - c.min(0) + 1
                if (span > ext).any():
                    raise RuntimeError(
                        f"sample side {side} spans {tuple(span)} voxels > "
                        f"grid_extent {tuple(ext)}; points would be dropped."
                        f" Raise config.grid_extent or set use_grid_maps="
                        f"False for this dataset")
    c0, x0, f0, n0 = _pack_side(
        [s.coords0 for s in samples], [s.xyz0 for s in samples],
        [s.feats0 for s in samples], n_pad)
    c1, x1, f1, n1 = _pack_side(
        [s.coords1 for s in samples], [s.xyz1 for s in samples],
        [s.feats1 for s in samples], n_pad)
    images0 = np.stack([s.image0 for s in samples])
    images1 = np.stack([s.image1 for s in samples])
    T = np.stack([s.T_gt for s in samples]).astype(np.float32)
    return PairBatch(
        coords0=jnp.asarray(c0), feats0=jnp.asarray(f0),
        n0=jnp.asarray(n0, jnp.int32), image0=jnp.asarray(images0),
        coords1=jnp.asarray(c1), feats1=jnp.asarray(f1),
        n1=jnp.asarray(n1, jnp.int32), image1=jnp.asarray(images1),
        pairs=None, pair_valid=None,
        xyz0=jnp.asarray(x0), xyz1=jnp.asarray(x1),
        T_gt=jnp.asarray(T),
        search_radius=jnp.asarray(
            np.array([s.search_radius for s in samples], np.float32)),
    )
