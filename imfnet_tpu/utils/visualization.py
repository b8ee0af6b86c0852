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
