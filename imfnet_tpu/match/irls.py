"""Robust IRLS rigid pose from weighted correspondences.

Port of the reference's validation-time pose solver
`est_quad_linear_robust` (`util/transform_estimation.py:89-116`): 20
iterations of a linearized small-angle rigid solve with Cauchy-like weights
w = par / (r + par), par halved every 5 iterations — expressed as a
`lax.fori_loop` over 6x6 normal equations (never materializing the [3N,6]
design matrix)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _euler_trans(x: jax.Array) -> jax.Array:
    """T = [Rz(x2) Ry(x1) Rx(x0) | x3:6] (`util/transform_estimation.py:5-45`)."""
    cx, sx = jnp.cos(x[0]), jnp.sin(x[0])
    cy, sy = jnp.cos(x[1]), jnp.sin(x[1])
    cz, sz = jnp.cos(x[2]), jnp.sin(x[2])
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], jnp.float32)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(Rz @ Ry @ Rx)
    T = T.at[:3, 3].set(x[3:6])
    return T


def est_rigid_irls(
    pts0: jax.Array,              # [N,3] source
    pts1: jax.Array,              # [N,3] target
    weight: jax.Array | None = None,  # [N]
    valid: jax.Array | None = None,
    iters: int = 20,
    par0: float = 1.0,
) -> jax.Array:
    """Returns T (4x4) with T @ pts0 ≈ pts1."""
    n = pts0.shape[0]
    pts0 = pts0.astype(jnp.float32)
    pts1 = pts1.astype(jnp.float32)
    w0 = jnp.ones((n,), jnp.float32) if weight is None else weight.astype(jnp.float32)
    if valid is not None:
        w0 = w0 * valid.astype(jnp.float32)

    def build_and_solve(p, w):
        """Normal-equation solve of the reference's stacked [A0;A1;A2] system
        (`util/transform_estimation.py:56-82`), with per-row weight w."""
        x_, y_, z_ = p[:, 0], p[:, 1], p[:, 2]
        zero = jnp.zeros_like(x_)
        one = jnp.ones_like(x_)
        A0 = jnp.stack([zero, z_, -y_, one, zero, zero], 1)
        A1 = jnp.stack([-z_, zero, x_, zero, one, zero], 1)
        A2 = jnp.stack([y_, -x_, zero, zero, zero, one], 1)
        A = jnp.concatenate([A0, A1, A2], 0) * jnp.tile(w, 3)[:, None]
        b = jnp.concatenate(
            [pts1[:, 0] - x_, pts1[:, 1] - y_, pts1[:, 2] - z_], 0
        )[:, None] * jnp.tile(w, 3)[:, None]
        AtA = A.T @ A + 1e-9 * jnp.eye(6, dtype=jnp.float32)
        Atb = A.T @ b
        return jnp.linalg.solve(AtA, Atb)[:, 0]

    def body(i, carry):
        p_curr, w, par, T = carry
        par = jnp.where((i > 0) & (i % 5 == 0), par / 2.0, par)
        x = build_and_solve(p_curr, w)
        T_curr = _euler_trans(x)
        p_curr = p_curr @ T_curr[:3, :3].T + T_curr[:3, 3]
        r = jnp.linalg.norm(p_curr - pts1, axis=1)
        w_new = par / (r + par)
        if valid is not None:
            w_new = w_new * valid.astype(jnp.float32)
        return p_curr, w_new, par, T_curr @ T

    init = (pts0, w0, jnp.float32(par0), jnp.eye(4, dtype=jnp.float32))
    _, _, _, T = jax.lax.fori_loop(0, iters, body, init)
    return T
