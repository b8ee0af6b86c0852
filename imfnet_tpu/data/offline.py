"""Offline dataset-construction tools (3DImageMatch preparation).

TPU-native equivalents of the reference's `data/` scripts:
- TSDF fusion of RGB-D frames into fragment clouds
  (`data/fuse_fragments_3DMatch.py:47-96`, o3d ScalableTSDFVolume) — here a
  jit-compiled dense TSDF volume: per frame, project all voxel centers into
  the depth image, accumulate truncated signed distances + colors; surface
  points extracted at zero crossings.
- Pairwise overlap computation (`data/compute_overlap.py:93-141`, pyflann) —
  blocked NN on device; writes the `<p>-<q>-overlap.txt` pair lists consumed
  by IndoorPairDataset (`lib/data_loaders.py:234`).
- Per-point radius (`data/compute_radius.py:19-53`) — mean half NN distance
  within a radius, via blocked NN.
"""
from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.match.nn import blocked_nn


# ---------------------------------------------------------------------------
# TSDF fusion
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dims",))
def tsdf_integrate(
    tsdf: jax.Array,       # [X*Y*Z] running SDF
    weight: jax.Array,     # [X*Y*Z]
    depth: jax.Array,      # [H,W] metres (0 = invalid)
    intrinsic: jax.Array,  # [3,3]
    cam_from_world: jax.Array,  # [4,4]
    origin: jax.Array,     # [3] world position of voxel (0,0,0)
    voxel: float,
    trunc: float,
    dims: Tuple[int, int, int],
):
    """One frame of TSDF integration over a dense grid (weighted average,
    truncation ``trunc`` — o3d sdf_trunc=0.04 contract)."""
    X, Y, Z = dims
    ii = jnp.arange(X * Y * Z, dtype=jnp.int32)
    vx = ii // (Y * Z)
    vy = (ii // Z) % Y
    vz = ii % Z
    pts = origin + jnp.stack([vx, vy, vz], 1).astype(jnp.float32) * voxel
    cam = pts @ cam_from_world[:3, :3].T + cam_from_world[:3, 3]
    z = cam[:, 2]
    u = cam[:, 0] / jnp.maximum(z, 1e-6) * intrinsic[0, 0] + intrinsic[0, 2]
    v = cam[:, 1] / jnp.maximum(z, 1e-6) * intrinsic[1, 1] + intrinsic[1, 2]
    h, w = depth.shape
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
    d = depth[vi, ui]
    valid = (z > 1e-4) & (d > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    sdf = d - z
    valid &= sdf > -trunc
    sdf = jnp.minimum(sdf / trunc, 1.0)
    w_new = weight + valid.astype(jnp.float32)
    tsdf_new = jnp.where(
        valid,
        (tsdf * weight + sdf) / jnp.maximum(w_new, 1.0),
        tsdf,
    )
    return tsdf_new, w_new


def extract_surface(tsdf: np.ndarray, weight: np.ndarray, origin: np.ndarray,
                    voxel: float, dims: Tuple[int, int, int]) -> np.ndarray:
    """Zero-crossing surface points (voxel centers where |sdf| small and
    observed) — the point-cloud analogue of o3d's extract_point_cloud."""
    X, Y, Z = dims
    t = tsdf.reshape(X, Y, Z)
    w = weight.reshape(X, Y, Z)
    surf = (np.abs(t) < 0.5) & (w > 1)
    idx = np.argwhere(surf)
    return origin + idx.astype(np.float64) * voxel


class TSDFVolume:
    """Host wrapper around the jitted integration (fragment-scale grids)."""

    def __init__(self, origin, dims=(256, 256, 256), voxel=3.0 / 512, trunc=0.04):
        self.dims = tuple(dims)
        self.voxel = float(voxel)
        self.trunc = float(trunc)
        self.origin = np.asarray(origin, np.float32)
        n = dims[0] * dims[1] * dims[2]
        self.tsdf = jnp.ones((n,), jnp.float32)
        self.weight = jnp.zeros((n,), jnp.float32)

    def integrate(self, depth: np.ndarray, intrinsic: np.ndarray,
                  cam_from_world: np.ndarray):
        self.tsdf, self.weight = tsdf_integrate(
            self.tsdf, self.weight, jnp.asarray(depth, jnp.float32),
            jnp.asarray(intrinsic, jnp.float32),
            jnp.asarray(cam_from_world, jnp.float32),
            jnp.asarray(self.origin), self.voxel, self.trunc, self.dims,
        )

    def extract_point_cloud(self) -> np.ndarray:
        return extract_surface(np.asarray(self.tsdf), np.asarray(self.weight),
                               self.origin.astype(np.float64), self.voxel,
                               self.dims)


# ---------------------------------------------------------------------------
# Overlap computation → training pair lists
# ---------------------------------------------------------------------------

def compute_overlap_pair(
    pts_src: np.ndarray,
    pts_dst: np.ndarray,
    dist_thresh: float = 0.075,
    block: int = 4096,
) -> Tuple[float, np.ndarray]:
    """(overlap_ratio, corr_indices[N,2] (src_idx, dst_idx)) — semantics of
    `data/compute_overlap.py:111-127`: NN of each dst point in src."""
    n_pad = 1 << int(np.ceil(np.log2(max(len(pts_dst), 2))))
    q = np.zeros((n_pad, 3), np.float32)
    q[: len(pts_dst)] = pts_dst
    idx, d2 = blocked_nn(
        jnp.asarray(q), jnp.asarray(pts_src.astype(np.float32)),
        block=block, with_dist=True,
    )
    idx = np.asarray(idx)[: len(pts_dst)]
    d = np.sqrt(np.asarray(d2)[: len(pts_dst)])
    keep = d <= dist_thresh
    corr = np.stack([idx[keep], np.nonzero(keep)[0]], axis=1)
    ratio = float(keep.sum()) / max(len(pts_src), len(pts_dst))
    return ratio, corr


def build_overlap_lists(
    fragments: List[Tuple[str, np.ndarray]],
    out_dir: str,
    dist_thresh: float = 0.075,
    min_overlap: float = 0.3,
    skip_adjacent: bool = True,
) -> List[Tuple[str, str, float]]:
    """All-pairs overlap; writes `<p>-<q>.npy` correspondences and
    `<p>-<q>-overlap.txt` (the files IndoorPairDataset globs,
    `lib/data_loaders.py:234-241`)."""
    os.makedirs(out_dir, exist_ok=True)
    kept = []
    for i in range(len(fragments)):
        name_i, pts_i = fragments[i]
        id_i = int(name_i.split("_")[-1])
        for j in range(i + 1, len(fragments)):
            name_j, pts_j = fragments[j]
            id_j = int(name_j.split("_")[-1])
            if skip_adjacent and id_i + 1 == id_j:
                continue
            ratio, corr = compute_overlap_pair(pts_i, pts_j, dist_thresh)
            if ratio < min_overlap:
                continue
            np.save(osp.join(out_dir, f"{name_i}-{name_j}.npy"), corr)
            with open(osp.join(out_dir, f"{name_i}-{name_j}-overlap.txt"), "w") as f:
                f.write(f"{ratio}")
            kept.append((name_i, name_j, ratio))
    return kept


# ---------------------------------------------------------------------------
# Per-point radius
# ---------------------------------------------------------------------------

def compute_radius(pts: np.ndarray, nn_radius: float = 0.1, k: int = 16) -> np.ndarray:
    """Mean half-distance to neighbors within nn_radius
    (`data/compute_radius.py:19-53`). Offline host-side tool (the reference
    runs it through an Open3D KD-tree); the k nearest within the radius
    approximate the reference's full radius set at surface densities."""
    n = len(pts)
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    dd, ii = tree.query(pts, k=min(k + 1, n))
    radii = np.zeros(n, np.float32)
    for i in range(n):
        nn_d = dd[i][(ii[i] != i) & (dd[i] <= nn_radius)]
        radii[i] = 0.0 if nn_d.size == 0 else float(nn_d.mean() * 0.5)
    return radii
