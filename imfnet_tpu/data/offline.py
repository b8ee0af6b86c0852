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


def read_depth_png(path: str, depth_scale: float = 1000.0,
                   depth_trunc: float = 6.0) -> np.ndarray:
    """Depth frame in metres from a 16-bit PNG (0 = invalid), the 3DMatch
    frame format consumed at `data/fuse_fragments_3DMatch.py:36-45`."""
    from PIL import Image

    d = np.asarray(Image.open(path)).astype(np.float32) / depth_scale
    return np.where(d > depth_trunc, 0.0, d)


def fuse_fragment_frames(
    depth_paths: List[str],
    pose_paths: List[str],
    intrinsic: np.ndarray,
    *,
    dims: Tuple[int, int, int] = (256, 256, 256),
    cubic_size: float = 6.0,
    trunc: float | None = None,
    depth_scale: float = 1000.0,
    depth_trunc: float = 6.0,
):
    """Fuse one fragment's RGB-D frames into a surface cloud + base pose
    (`process_single_fragment`, `data/fuse_fragments_3DMatch.py:47-96`):
    poses are rebased to the first valid frame, integration runs in the base
    frame, and the returned pose maps the fragment to world coordinates.

    Returns (points [N,3] float64 in the base frame, pose_base2world [4,4])
    or (None, None) when no frame has a valid pose.
    """
    voxel = cubic_size / dims[0]
    if trunc is None:
        # o3d default sdf_trunc=0.04 at voxel 3/512; keep the band ≥2 voxels
        # wide so coarse test-scale grids still carry a zero crossing
        trunc = max(0.04, 2.0 * voxel)
    # volume centered on the base camera, biased forward along +z (view dir)
    origin = np.array(
        [-cubic_size / 2, -cubic_size / 2, -cubic_size / 4], np.float32)
    vol = TSDFVolume(origin, dims=dims, voxel=voxel, trunc=trunc)
    pose_base2world = None
    base_inv = None
    for dpath, ppath in zip(depth_paths, pose_paths):
        pose = np.loadtxt(ppath).reshape(4, 4)
        if not np.isfinite(pose).all():
            continue
        if base_inv is None:
            pose_base2world = pose
            base_inv = np.linalg.inv(pose)
        cam2base = base_inv @ pose
        depth = read_depth_png(dpath, depth_scale, depth_trunc)
        vol.integrate(depth, intrinsic, np.linalg.inv(cam2base))
    if base_inv is None:
        return None, None
    return vol.extract_point_cloud(), pose_base2world


def fuse_scene(
    scene_dir: str,
    out_dir: str,
    *,
    frames_per_fragment: int = 50,
    frame_step: int = 1,
    dims: Tuple[int, int, int] = (256, 256, 256),
    cubic_size: float = 6.0,
    depth_scale: float = 1000.0,
    depth_trunc: float = 6.0,
) -> List[str]:
    """Walk a 3DMatch-style scene sequence (`frame-XXXXXX.depth.png` +
    `frame-XXXXXX.pose.txt` + `camera-intrinsics.txt`) and write
    `cloud_bin_<k>.ply` / `cloud_bin_<k>.pose.npy` per fragment — the output
    contract of `data/fuse_fragments_3DMatch.py:92-96`."""
    from imfnet_tpu.geom.ply import write_ply

    os.makedirs(out_dir, exist_ok=True)
    K = np.loadtxt(osp.join(scene_dir, "camera-intrinsics.txt")).reshape(3, 3)
    seq = scene_dir
    if osp.isdir(osp.join(scene_dir, "seq-01")):
        seq = osp.join(scene_dir, "seq-01")
    depths = sorted(
        osp.join(seq, f) for f in os.listdir(seq) if f.endswith(".depth.png")
    )[::frame_step]
    written = []
    n_frags = len(depths) // frames_per_fragment
    for frag_id in range(n_frags):
        chunk = depths[frag_id * frames_per_fragment:(frag_id + 1) * frames_per_fragment]
        poses = [d[: -len(".depth.png")] + ".pose.txt" for d in chunk]
        pts, pose = fuse_fragment_frames(
            chunk, poses, K, dims=dims, cubic_size=cubic_size,
            depth_scale=depth_scale, depth_trunc=depth_trunc)
        if pts is None:
            continue
        ply = osp.join(out_dir, f"cloud_bin_{frag_id}.ply")
        write_ply(ply, pts.astype(np.float32))
        np.save(osp.join(out_dir, f"cloud_bin_{frag_id}.pose.npy"), pose)
        written.append(ply)
    return written


# ---------------------------------------------------------------------------
# Overlap computation → training pair lists
# ---------------------------------------------------------------------------

def voxel_down_sample_np(pts: np.ndarray, voxel: float) -> np.ndarray:
    """Mean-per-voxel downsample (`o3d.voxel_down_sample` semantics used to cap
    overlap-tool inputs at `data/compute_overlap.py:101-108`)."""
    keys = np.floor(pts / voxel).astype(np.int64)
    _, inv, cnt = np.unique(keys, axis=0, return_inverse=True,
                            return_counts=True)
    out = np.zeros((len(cnt), pts.shape[1]), np.float64)
    np.add.at(out, inv, pts)
    return (out / cnt[:, None]).astype(pts.dtype)

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
