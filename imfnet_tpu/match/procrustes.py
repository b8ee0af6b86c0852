"""Weighted rigid alignment (Kabsch/Umeyama) via Horn's quaternion method.

Batched and branch-free: the rotation comes from the dominant eigenvector of
Horn's 4x4 K matrix, obtained with a fixed-iteration shifted power method —
no SVD/eigh, so it vmaps over tens of thousands of RANSAC hypotheses at MXU
throughput. Used by RANSAC (`scripts/benchmark_util.py:16-34` equivalent) and
ICP (`lib/data_loaders.py:540-543` GT refinement equivalent).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def _horn_K(H: jax.Array) -> jax.Array:
    """Horn's symmetric 4x4 from the 3x3 cross-covariance H (batched [..,3,3])."""
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    tr = Sxx + Syy + Szz
    row0 = jnp.stack([tr, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1)
    row1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1)
    row2 = jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1)
    row3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) [..,4] → rotation matrix [..,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..,3,3] → unit quaternion (w,x,y,z), branch-free.

    Uses the four-candidate construction and picks the numerically best via
    the largest diagonal-based magnitude (replaces `nibabel.quaternions
    .mat2quat` used at `util/uio.py:196`)."""
    m = R
    t = jnp.trace(m, axis1=-2, axis2=-1)
    qs = []
    # candidate 0: w-major
    w = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2
    qs.append(jnp.stack([
        w,
        (m[..., 2, 1] - m[..., 1, 2]) / (4 * w),
        (m[..., 0, 2] - m[..., 2, 0]) / (4 * w),
        (m[..., 1, 0] - m[..., 0, 1]) / (4 * w),
    ], axis=-1))
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        s = jnp.sqrt(jnp.maximum(1.0 + m[..., i, i] - m[..., j, j] - m[..., k, k], 1e-12)) * 2
        q = [None] * 4
        q[0] = (m[..., k, j] - m[..., j, k]) / s
        q[i + 1] = s / 4
        q[j + 1] = (m[..., j, i] + m[..., i, j]) / s
        q[k + 1] = (m[..., k, i] + m[..., i, k]) / s
        qs.append(jnp.stack(q, axis=-1))
    cand = jnp.stack(qs, axis=-2)  # [..,4cand,4]
    mags = jnp.stack(
        [1.0 + t, 1.0 + 2 * m[..., 0, 0] - t, 1.0 + 2 * m[..., 1, 1] - t,
         1.0 + 2 * m[..., 2, 2] - t],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # canonical sign: w >= 0 (nibabel convention)
    return q * jnp.where(q[..., :1] >= 0, 1.0, -1.0)


def kabsch_umeyama(
    src: jax.Array,   # [.., N, 3]
    dst: jax.Array,   # [.., N, 3]
    weights: jax.Array | None = None,  # [.., N] (>=0)
    power_iters: int = 16,
) -> jax.Array:
    """Weighted least-squares rigid transform T (4x4, batched) with
    T @ src ≈ dst. Degenerate inputs yield a valid (if arbitrary) rotation —
    callers like RANSAC filter those by inlier count."""
    f32 = jnp.float32
    src, dst = src.astype(f32), dst.astype(f32)
    if weights is None:
        weights = jnp.ones(src.shape[:-1], f32)
    w = weights.astype(f32)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    mu_s = jnp.einsum("...n,...nd->...d", wn, src)
    mu_d = jnp.einsum("...n,...nd->...d", wn, dst)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, sc, dc)
    K = _horn_K(H)
    # Shift so the max eigenvalue of K is also max in magnitude, then take the
    # dominant eigenvector by repeated matrix squaring: m squarings act like
    # 2^m power iterations, so near-degenerate eigengaps still converge.
    shift = jnp.sqrt(jnp.sum(K * K, axis=(-2, -1)))[..., None, None] + 1e-9
    Ks = K + shift * jnp.eye(4, dtype=f32)
    M = Ks / shift

    def square(_, M):
        M = jnp.einsum("...ij,...jk->...ik", M, M)
        nrm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
        return M / jnp.maximum(nrm, 1e-30)

    M = jax.lax.fori_loop(0, max(1, power_iters // 2), square, M)
    v = jnp.broadcast_to(jnp.array([0.7, 0.5, 0.4, 0.3], f32), K.shape[:-1])
    q = jnp.einsum("...ij,...j->...i", M, v)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # one exact polish step against the original shifted matrix
    q = jnp.einsum("...ij,...j->...i", Ks, q)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    R = quat_to_rotmat(q)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    # assemble by concatenation — .at[].set lowers to dynamic-update-slice,
    # which profiled as 2/3 of the whole batched-Kabsch cost
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], f32), K.shape[:-2] + (1, 4))
    return jnp.concatenate(
        [jnp.concatenate([R, t[..., :, None]], axis=-1), bottom], axis=-2)
