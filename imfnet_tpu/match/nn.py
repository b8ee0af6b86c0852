"""Nearest-neighbor search as blocked MXU matmuls.

Replaces: `lib/eval.py:18-48` (chunked GPU NN, nn_max_n), `util/uio.py:245-258`
(Open3D KDTreeFlann knn_search), `lib/eval.py:9-15` (scipy cKDTree), and the
per-point KD-tree radius match in `util/pointcloud.py:56-69`.

L2 distances are computed via d² = |a|² + |b|² − 2a·b over column blocks under
`lax.scan`, keeping a running (min, argmin) — the full N×M matrix is never
materialized, so fragment-scale inputs (~50k × 50k) stream through VMEM-sized
tiles on the MXU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _block_count(m: int, block: int) -> int:
    return -(-m // block)


@partial(jax.jit, static_argnames=("block", "with_dist"))
def blocked_nn(
    queries: jax.Array,      # [N, D]
    refs: jax.Array,         # [M, D]
    ref_valid: Optional[jax.Array] = None,  # bool[M]
    *,
    block: int = 4096,
    with_dist: bool = False,
):
    """argmin_j ||q_i - r_j||² for every query. Returns idx[N] (and squared
    distance if with_dist). Invalid references are excluded."""
    n, d = queries.shape
    m = refs.shape[0]
    nb = _block_count(m, block)
    pad_m = nb * block
    refs_p = jnp.zeros((pad_m, d), refs.dtype).at[:m].set(refs)
    valid = jnp.zeros((pad_m,), bool)
    valid = valid.at[:m].set(True if ref_valid is None else ref_valid)

    q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    refs_b = refs_p.reshape(nb, block, d)
    valid_b = valid.reshape(nb, block)

    def step(carry, inp):
        best_d, best_i = carry
        rb, vb, off = inp
        r_sq = jnp.sum(rb.astype(jnp.float32) ** 2, axis=1)
        cross = jnp.dot(
            queries.astype(jnp.float32), rb.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        d2 = q_sq + r_sq[None, :] - 2.0 * cross
        d2 = jnp.where(vb[None, :], d2, jnp.inf)
        loc = jnp.argmin(d2, axis=1)
        loc_d = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
        better = loc_d < best_d
        best_d = jnp.where(better, loc_d, best_d)
        best_i = jnp.where(better, off + loc.astype(jnp.int32), best_i)
        return (best_d, best_i), None

    offs = jnp.arange(nb, dtype=jnp.int32) * block
    init = (jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(step, init, (refs_b, valid_b, offs))
    if with_dist:
        return best_i, jnp.maximum(best_d, 0.0)
    return best_i


def use_pallas() -> bool:
    """Pallas matching kernels on TPU; jnp fallback elsewhere (CPU tests)."""
    return jax.default_backend() == "tpu"


def nn_auto(
    queries: jax.Array,
    refs: jax.Array,
    ref_valid: Optional[jax.Array] = None,
    *,
    block: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """(idx, d²) nearest valid reference per query — Pallas flash-NN kernel
    on TPU (match.pallas_nn), blocked jnp scan elsewhere."""
    if use_pallas():
        from imfnet_tpu.match.pallas_nn import nn_pallas

        return nn_pallas(queries, refs, ref_valid)
    return blocked_nn(queries, refs, ref_valid, block=block, with_dist=True)


def find_nn(f0, f1, valid1=None, block: int = 4096):
    """Descriptor NN, the `find_nn_gpu` contract (`lib/eval.py:18-48`)."""
    return nn_auto(f0, f1, valid1, block=block)[0]


def mutual_nn(f0, f1, valid0=None, valid1=None, block: int = 4096):
    """Mutual-NN match filter (`scripts/evaluation_3dmatch.py:207-217`).

    Returns (nn01[N0], mutual[N0]) where mutual[i] = (nn10[nn01[i]] == i).
    """
    nn01 = nn_auto(f0, f1, valid1, block=block)[0]
    nn10 = nn_auto(f1, f0, valid0, block=block)[0]
    back = jnp.take(nn10, nn01)
    mutual = back == jnp.arange(f0.shape[0], dtype=nn01.dtype)
    if valid0 is not None:
        mutual = mutual & valid0
    return nn01, mutual


@partial(jax.jit, static_argnames=("block",))
def radius_match(
    xyz0: jax.Array,       # [N0,3] (already transformed into frame 1)
    xyz1: jax.Array,       # [N1,3]
    valid0: jax.Array,
    valid1: jax.Array,
    radius: float,
    *,
    block: int = 2048,
):
    """Positive-pair search: for each point in xyz0, its NN in xyz1 if within
    ``radius``. The reference uses a per-point KD-tree radius query keeping
    *all* neighbors (`util/pointcloud.py:56-69`); training samples from those
    pairs anyway (`lib/trainer.py:456-460`), so nearest-within-radius is the
    same supervision at a fraction of the cost. Returns (idx[N0], ok[N0]).
    """
    idx, d2 = nn_auto(xyz0, xyz1, valid1, block=block)
    ok = valid0 & (d2 <= radius * radius)
    return idx, ok
