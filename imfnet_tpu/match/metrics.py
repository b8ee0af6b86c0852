"""Registration metric stack, all jit-friendly.

Replaces: `lib/metrics.py:13-29` (pdist/corr_dist), `util/uio.py:102-198`
(RRE/RTE/inlier ratio/covariance transform error).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from imfnet_tpu.match.procrustes import rotmat_to_quat


def apply_transform(pts: jax.Array, T: jax.Array) -> jax.Array:
    """pts [..,N,3], T [..,4,4] → R pts + t (`util/uio.py:102-110`)."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def pdist_sq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full squared-L2 distance matrix [N,M] (`lib/metrics.py:22-27`).
    For large inputs prefer imfnet_tpu.match.nn.blocked_nn."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
    return jnp.maximum(sq - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32), 0.0)


def corr_dist(T_est, T_gt, xyz, valid=None, max_dist: float = 1.0):
    """Mean clipped distance between xyz under est vs gt transform
    (`lib/metrics.py:13-19`)."""
    d = jnp.linalg.norm(apply_transform(xyz, T_est) - apply_transform(xyz, T_gt), axis=-1)
    d = jnp.minimum(d, max_dist)
    if valid is None:
        return jnp.mean(d)
    w = valid.astype(jnp.float32)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def relative_rotation_error(R_gt, R_est, degrees: bool = True):
    """acos((trace(R_estᵀ R_gt) − 1)/2) (`util/uio.py:129-145`)."""
    x = 0.5 * (jnp.trace(jnp.swapaxes(R_est, -1, -2) @ R_gt, axis1=-2, axis2=-1) - 1.0)
    ang = jnp.arccos(jnp.clip(x, -1.0, 1.0))
    return jnp.degrees(ang) if degrees else ang


def relative_translation_error(t_gt, t_est):
    return jnp.linalg.norm(t_gt - t_est, axis=-1)


def registration_error(T_gt, T_est, degrees: bool = True):
    """(RRE, RTE) (`util/uio.py:161-176`)."""
    rre = relative_rotation_error(T_gt[..., :3, :3], T_est[..., :3, :3], degrees)
    rte = relative_translation_error(T_gt[..., :3, 3], T_est[..., :3, 3])
    return rre, rte


def transform_error(T_gt, covariance, T_est):
    """Covariance-weighted pose error used for Registration Recall acceptance
    (`util/uio.py:192-198`): p = eᵀ Σ e / Σ₀₀ with e = [t, q_xyz] of
    T_gt⁻¹ T_est; accepted when p < 0.2²
    (`scripts/evaluation_3dmatch.py:189-191`)."""
    rel = jnp.linalg.inv(T_gt) @ T_est
    q = rotmat_to_quat(rel[..., :3, :3])
    e = jnp.concatenate([rel[..., :3, 3], q[..., 1:]], axis=-1)
    p = jnp.einsum("...i,...ij,...j->...", e, covariance, e) / covariance[..., 0, 0]
    return p


def inlier_ratio(ref_pts, src_pts, T_gt, valid=None, positive_radius: float = 0.1):
    """Fraction of correspondences within radius after the gt transform
    (`util/uio.py:112-122`)."""
    moved = apply_transform(src_pts, T_gt)
    d = jnp.linalg.norm(ref_pts - moved, axis=-1)
    ok = (d < positive_radius).astype(jnp.float32)
    if valid is None:
        return jnp.mean(ok)
    w = valid.astype(jnp.float32)
    return jnp.sum(ok * w) / jnp.maximum(jnp.sum(w), 1.0)


def hit_ratio(xyz0, xyz1, T_gt, valid=None, thresh: float = 0.1):
    """`ContrastiveLossTrainer.evaluate_hit_ratio` (`lib/trainer.py:432-435`)."""
    moved = apply_transform(xyz0, T_gt)
    d = jnp.sqrt(jnp.sum((moved - xyz1) ** 2, axis=-1) + 1e-6)
    ok = (d < thresh).astype(jnp.float32)
    if valid is None:
        return jnp.mean(ok)
    w = valid.astype(jnp.float32)
    return jnp.sum(ok * w) / jnp.maximum(jnp.sum(w), 1.0)
