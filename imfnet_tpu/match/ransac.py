"""Batched RANSAC rigid registration on correspondences.

TPU-native equivalent of Open3D's
`registration_ransac_based_on_feature_matching` as configured by the
reference (`scripts/benchmark_util.py:16-34`): ransac_n samples, edge-length
checker (ratio 0.9, both directions) and distance checker at 1.5×voxel,
criteria (max_iteration=50000, max_validation=1000), followed by a final
least-squares refit on the best model's inliers.

Instead of sequential hypotheses with early exit, a fixed batch of hypotheses
is evaluated entirely on-device: sample → Horn/Kabsch per hypothesis →
checker masks → blocked inlier count → argmax (fitness, −rmse). Statistical
power matches or exceeds the sequential criterion: every hypothesis is
validated against all correspondences (o3d validates at most 1000 candidates).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from imfnet_tpu.match.procrustes import (
    kabsch_umeyama,
    kabsch_umeyama_soa,
    soa_to_matrix,
)
from imfnet_tpu.match.metrics import apply_transform


class RansacResult(NamedTuple):
    transformation: jax.Array  # [4,4]
    fitness: jax.Array         # inliers / valid correspondences
    inlier_rmse: jax.Array
    inlier_mask: jax.Array     # bool[C]


def _compact_valid(valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Indices of valid rows compacted to the front (for uniform sampling)."""
    c = valid.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, pos, c)
    comp = jnp.zeros((c + 1,), jnp.int32).at[tgt].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop"
    )[:c]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return comp, n_valid


@partial(
    jax.jit,
    static_argnames=("ransac_n", "num_hypotheses", "hypo_block", "refine",
                     "edge_length_ratio", "fit_power_iters"),
)
def ransac_registration(
    key: jax.Array,
    src: jax.Array,            # [C,3] source points of candidate correspondences
    dst: jax.Array,            # [C,3] matched target points
    valid: jax.Array,          # bool[C]
    distance_threshold: float,
    *,
    ransac_n: int = 3,
    num_hypotheses: int = 50000,
    edge_length_ratio: float = 0.9,
    hypo_block: int = 12500,
    refine: bool = True,
    fit_power_iters: int = 0,
) -> RansacResult:
    c = src.shape[0]
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    comp, n_valid = _compact_valid(valid)

    # Validation subset: every hypothesis is scored on a stratified subset of
    # the valid correspondences (o3d's criteria validate at most 1000
    # candidates, `scripts/benchmark_util.py:30-33`); only per-block winners
    # get a full count below. Subset inlier fraction at 512 samples ranks
    # hypotheses within ~2% — far tighter than the gap RANSAC needs.
    n_subset = min(512, c)
    sub_rows = jnp.take(
        comp, (jnp.arange(n_subset) * jnp.maximum(n_valid, 1)) // n_subset)
    sub_src = jnp.take(src, sub_rows, axis=0)
    sub_dst = jnp.take(dst, sub_rows, axis=0)
    sub_valid = jnp.take(valid, sub_rows)

    # Pre-compact src|dst into ONE 6-wide table in compact order: the
    # per-hypothesis sampling then costs a single row gather per sample
    # instead of three (comp indirection, src, dst) — row gathers at these
    # counts (num_hypotheses * ransac_n per block) are the dominant
    # RANSAC cost on TPU, not the fit or the checkers.
    sd_c = jnp.concatenate([jnp.take(src, comp, axis=0),
                            jnp.take(dst, comp, axis=0)], axis=1)   # [C,6]

    def eval_block(key_b):
        # --- sample ransac_n distinct-ish correspondences per hypothesis ---
        r = jax.random.randint(key_b, (hypo_block, ransac_n), 0, jnp.maximum(n_valid, 1))
        sd = jnp.take(sd_c, r, axis=0)               # [B,n,6]
        s = sd[..., :3]                              # [B,n,3]
        d = sd[..., 3:]
        # --- edge-length checker (both directions, o3d ratio 0.9) ---
        # unrolled over the n(n-1)/2 edges: [B]-wide vector ops, no padded
        # [B,n,n,3] minor dims
        edge_ok = jnp.ones((hypo_block,), bool)
        for a in range(ransac_n):
            for b_ in range(a + 1, ransac_n):
                ls2 = jnp.sum((s[:, a] - s[:, b_]) ** 2, axis=-1)
                ld2 = jnp.sum((d[:, a] - d[:, b_]) ** 2, axis=-1)
                ratio2 = edge_length_ratio ** 2
                edge_ok &= (ls2 > ratio2 * ld2) & (ld2 > ratio2 * ls2)
        # degenerate duplicate picks → zero edges fail the checker already.
        # fit_power_iters=0 → the closed-form quartic eigensolver: exact
        # λmax with no eigengap sensitivity. History: noisy 3-point fits
        # have a near-degenerate Horn eigengap after the positivity shift,
        # and 10 power iters (5 squarings) lost HALF the good samples —
        # success prob 0.505 vs the o3d oracle's 0.69 at 3% inliers; 24
        # iters reached exact-SVD parity and the closed form matches it
        # with ~5x fewer VPU ops (scripts_dev/ransac_power.py, round 3).
        # All hypothesis transforms stay in SoA component form ([B] arrays):
        # a [B,4,4] tensor pads its minor dims to full TPU tiles and the
        # einsum-style checkers were 4x the cost of the whole fit
        R, t3 = kabsch_umeyama_soa(s, d, power_iters=fit_power_iters)
        # --- distance checker on the sampled correspondences ---
        samp_ok = jnp.ones((hypo_block,), bool)
        for p in range(ransac_n):
            dd = jnp.zeros((hypo_block,), jnp.float32)
            for i in range(3):
                mi = (R[i][0] * s[:, p, 0] + R[i][1] * s[:, p, 1]
                      + R[i][2] * s[:, p, 2] + t3[i])
                dd += (mi - d[:, p, i]) ** 2
            samp_ok &= dd <= distance_threshold**2
        ok = edge_ok & samp_ok
        # --- subset inlier count / rmse ([B,S] planes, rotation components
        # broadcast as [B,1] scalars) ---
        sx, sy, sz = (sub_src[None, :, i] for i in range(3))
        d2 = jnp.zeros((hypo_block, n_subset), jnp.float32)
        for i in range(3):
            mi = (R[i][0][:, None] * sx + R[i][1][:, None] * sy
                  + R[i][2][:, None] * sz + t3[i][:, None])
            d2 += (mi - sub_dst[None, :, i]) ** 2
        inl = (d2 <= distance_threshold**2) & sub_valid[None, :]
        count = jnp.sum(inl, axis=1)
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inl, d2, 0.0), axis=1)
            / jnp.maximum(count, 1).astype(jnp.float32)
        )
        # best within block (max count, then min rmse); failed checkers → -1
        score = jnp.where(
            ok & (count > 0),
            count.astype(jnp.float32) - rmse / (rmse + 1.0),  # rmse∈[0,∞)→[0,1)
            -1.0,
        )
        b = jnp.argmax(score)
        T_b = soa_to_matrix(
            [[R[i][j][b] for j in range(3)] for i in range(3)],
            [t3[i][b] for i in range(3)])
        return score[b], T_b

    n_blocks = -(-num_hypotheses // hypo_block)
    keys = jax.random.split(key, n_blocks)
    if n_blocks == 1:
        s1, t1 = eval_block(keys[0])
        block_scores, block_Ts = s1[None], t1[None]
    else:
        block_scores, block_Ts = jax.lax.map(eval_block, keys)  # [nb], [nb,4,4]

    # full validation of the block winners: the finalist with the highest
    # exact inlier count wins
    moved_all = apply_transform(src[None], block_Ts)        # [nb,C,3]
    d2_all = jnp.sum((moved_all - dst[None]) ** 2, axis=-1)
    full_counts = jnp.sum(
        (d2_all <= distance_threshold**2) & valid[None, :], axis=1)
    full_counts = jnp.where(block_scores > 0, full_counts, -1)
    best_T = block_Ts[jnp.argmax(full_counts)]

    # final inliers + optional least-squares refit (improves on o3d, which
    # returns the raw best sample model in 0.12)
    def inliers_of(T):
        moved = apply_transform(src, T)
        d2 = jnp.sum((moved - dst) ** 2, axis=-1)
        return (d2 <= distance_threshold**2) & valid, d2

    inl, d2 = inliers_of(best_T)
    if refine:
        refit = kabsch_umeyama(src, dst, weights=inl.astype(jnp.float32))
        inl_r, d2_r = inliers_of(refit)
        use = jnp.sum(inl_r) >= jnp.sum(inl)
        best_T = jnp.where(use, refit, best_T)
        inl = jnp.where(use, inl_r, inl)
        d2 = jnp.where(use, d2_r, d2)

    count = jnp.sum(inl)
    fitness = count / jnp.maximum(jnp.sum(valid), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(count, 1))
    return RansacResult(best_T, fitness, rmse, inl)
