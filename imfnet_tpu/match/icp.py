"""Point-to-point ICP as a fixed-iteration jit loop.

Replaces `o3d.pipelines.registration.registration_icp` used to refine KITTI
ground-truth poses (`lib/data_loaders.py:540-543`, threshold 0.2,
TransformationEstimationPointToPoint). Correspondences come from the blocked
NN op; each iteration refits with Horn/Kabsch over inliers within
``max_correspondence_distance``."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from imfnet_tpu.match.nn import nn_auto
from imfnet_tpu.match.metrics import apply_transform
from imfnet_tpu.match.procrustes import kabsch_umeyama


@partial(jax.jit, static_argnames=("iters", "block"))
def icp_point_to_point(
    src: jax.Array,      # [N,3]
    dst: jax.Array,      # [M,3]
    src_valid: jax.Array,
    dst_valid: jax.Array,
    init_T: jax.Array,   # [4,4]
    max_correspondence_distance: float,
    *,
    iters: int = 30,
    block: int = 4096,
) -> jax.Array:
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)

    def body(_, T):
        moved = apply_transform(src, T)
        idx, d2 = nn_auto(moved, dst, dst_valid, block=block)
        ok = src_valid & (d2 <= max_correspondence_distance**2)
        matched = jnp.take(dst, idx, axis=0)
        # fit on the ORIGINAL src so T is absolute, not incremental
        return kabsch_umeyama(src, matched, weights=ok.astype(jnp.float32))

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32))
