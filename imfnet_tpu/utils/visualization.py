"""Visualization suite → colored PLY artifacts.

The reference (`util/visualization.py:98-645`) opens Open3D windows showing
registration before/after and DAM maps. Headless TPU pods have no display, so
every view is written as a colored PLY instead (drop into any viewer).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from imfnet_tpu.geom.ply import write_ply
from imfnet_tpu.geom.transforms import apply_transform_np

# the reference's two-cloud coloring (yellow/blue, `util/visualization.py`)
COLOR_SRC = np.array([1.0, 0.706, 0.0])
COLOR_DST = np.array([0.0, 0.651, 0.929])


def save_registration_view(
    path: str,
    xyz0: np.ndarray,
    xyz1: np.ndarray,
    transform: Optional[np.ndarray] = None,
) -> None:
    """Both clouds in one PLY; xyz0 transformed when a pose is given
    (before/after views of `visualization_ours`, `util/visualization.py:98-194`)."""
    p0 = apply_transform_np(xyz0, transform) if transform is not None else xyz0
    pts = np.concatenate([p0, xyz1]).astype(np.float32)
    cols = np.concatenate([
        np.tile(COLOR_SRC, (len(p0), 1)),
        np.tile(COLOR_DST, (len(xyz1), 1)),
    ])
    write_ply(path, pts, colors=cols)


def visualize_pair_registration(
    model, variables, config,
    ply0: str, image0: str, ply1: str, image1: str,
    out_dir: str,
    num_keypoints: int = 5000,
):
    """The `visualization_ours` pipeline (`util/visualization.py:98-194`):
    extract descriptors on both fragments, register with feature RANSAC, and
    write before/after + correspondence views as colored PLYs. Returns the
    estimated transform (maps cloud0 → cloud1) and RANSAC fitness."""
    import os

    import jax
    import jax.numpy as jnp

    from imfnet_tpu.eval.extract import (make_bucketed_extractor,
                                         pad_points_bucketed)
    from imfnet_tpu.eval.registration import make_pair_registration
    from imfnet_tpu.geom.image import load_image, process_image
    from imfnet_tpu.geom.ply import read_ply

    os.makedirs(out_dir, exist_ok=True)
    extract = make_bucketed_extractor(model, variables, config=config)

    sides = []
    for ply, img in ((ply0, image0), (ply1, image1)):
        pts = read_ply(ply)["points"].astype(np.float32)
        if img and len(img) > 0:
            im = process_image(load_image(img), config.image_H, config.image_W)
        else:
            im = np.zeros((config.image_H, config.image_W, 3), np.float32)
        raw, n_raw = pad_points_bucketed(pts)
        xyz_down, feats = extract(raw, n_raw, jnp.asarray(im[None]))
        sides.append((pts, xyz_down, feats))

    n_pad = 1 << int(np.ceil(np.log2(max(len(sides[0][1]), len(sides[1][1])))))

    def padded(x, width):
        out = np.zeros((n_pad, width), np.float32)
        out[: len(x)] = x
        return jnp.asarray(out)

    register = make_pair_registration(
        num_keypoints=num_keypoints, voxel_size=config.voxel_size,
        ransac_n=config.ransac_n, num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh)
    out = register(
        jax.random.PRNGKey(0),
        padded(sides[0][1], 3), padded(sides[0][2], sides[0][2].shape[1]),
        len(sides[0][1]),
        padded(sides[1][1], 3), padded(sides[1][2], sides[1][2].shape[1]),
        len(sides[1][1]),
        jnp.eye(4), jnp.eye(6))
    # registration returns the gt.log-convention pose (1→0); invert for 0→1
    T01 = np.linalg.inv(np.asarray(out["transformation"]))

    save_registration_view(os.path.join(out_dir, "before.ply"),
                           sides[0][0], sides[1][0])
    save_registration_view(os.path.join(out_dir, "after.ply"),
                           sides[0][0], sides[1][0], transform=T01)
    return T01, float(out["fitness"])


def save_correspondence_view(
    path: str,
    xyz0: np.ndarray,
    xyz1: np.ndarray,
    pairs: np.ndarray,        # [K,2] indices
    correct: Optional[np.ndarray] = None,  # bool[K] (green/red lines)
    line_points: int = 8,
) -> None:
    """Correspondence 'lines' rendered as point samples between matched pairs
    (green = correct, red = wrong)."""
    if correct is None:
        correct = np.ones(len(pairs), bool)
    t = np.linspace(0.0, 1.0, line_points)[None, :, None]
    a = xyz0[pairs[:, 0]][:, None, :]
    b = xyz1[pairs[:, 1]][:, None, :]
    segs = (a * (1 - t) + b * t).reshape(-1, 3)
    col = np.where(
        np.repeat(correct, line_points)[:, None],
        np.array([[0.0, 1.0, 0.0]]),
        np.array([[1.0, 0.0, 0.0]]),
    )
    pts = np.concatenate([xyz0, xyz1, segs]).astype(np.float32)
    cols = np.concatenate([
        np.tile(COLOR_SRC, (len(xyz0), 1)),
        np.tile(COLOR_DST, (len(xyz1), 1)),
        col,
    ])
    write_ply(path, pts, colors=cols)
