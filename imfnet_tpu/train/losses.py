"""Metric-learning losses, fully on-device with masked static shapes.

Reference semantics: `lib/trainer.py`
- contrastive_loss              — ContrastiveLossTrainer (:236-329)
- hardest_contrastive_loss      — HardestContrastiveLossTrainer (:440-492)
- triplet_loss                  — TripletLossTrainer (:574-621)
- hardest_triplet_loss          — HardestTripletLossTrainer (:702-775)

The reference round-trips indices through numpy `_hash`/`np.isin` to drop
mined "negatives" that are actually positive pairs (`util/misc.py:6-18`);
here positive-pair membership is a sorted-uint32-key binary search, so the
whole loss is one XLA program. Sampling without replacement uses the
uniform-key top-k trick over validity-masked candidates.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_without_replacement(key, valid: jax.Array, k: int):
    """k distinct indices of True entries (uniform); (idx[k], ok[k])."""
    scores = jax.random.uniform(key, valid.shape)
    scores = jnp.where(valid, scores, -1.0)
    top, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32), top >= 0.0


def _pair_keys(i: jax.Array, j: jax.Array) -> jax.Array:
    """uint32 key of an (i, j) index pair; requires i, j < 2^16."""
    return (i.astype(jnp.uint32) << 16) | j.astype(jnp.uint32)


def _make_pair_set(pairs: jax.Array, pair_valid: jax.Array) -> jax.Array:
    """Sorted key table of positive pairs (invalid → max key, sorts last)."""
    keys = _pair_keys(pairs[:, 0], pairs[:, 1])
    keys = jnp.where(pair_valid, keys, jnp.uint32(0xFFFFFFFF))
    return jnp.sort(keys)

def _in_pair_set(table: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    q = _pair_keys(i, j)
    pos = jnp.searchsorted(table, q)
    pos = jnp.minimum(pos, table.shape[0] - 1)
    return jnp.take(table, pos) == q


def _masked_mean(x: jax.Array, m: jax.Array) -> jax.Array:
    w = m.astype(jnp.float32)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _pdist_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """sqrt distances, `lib/metrics.py:22-25` (adds 1e-7 under the root)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq = (
        jnp.sum(a * a, 1)[:, None]
        + jnp.sum(b * b, 1)[None, :]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0) + 1e-7)


def hardest_contrastive_loss(
    key: jax.Array,
    f0: jax.Array, valid0: jax.Array,
    f1: jax.Array, valid1: jax.Array,
    pairs: jax.Array,       # int32[P,2] positive pairs (rows into f0/f1)
    pair_valid: jax.Array,  # bool[P]
    *,
    num_pos: int = 1024,
    num_hn_samples: int = 256,
    pos_thresh: float = 0.1,
    neg_thresh: float = 1.4,
) -> Tuple[jax.Array, jax.Array]:
    """(pos_loss, neg_loss) of `contrastive_hardest_negative_loss`
    (`lib/trainer.py:440-492`)."""
    k0, k1, k2 = jax.random.split(key, 3)
    sel0, sel0_ok = _sample_without_replacement(k0, valid0, num_hn_samples)
    sel1, sel1_ok = _sample_without_replacement(k1, valid1, num_hn_samples)
    psel, psel_ok = _sample_without_replacement(k2, pair_valid, num_pos)

    pi = jnp.take(pairs[:, 0], psel)
    pj = jnp.take(pairs[:, 1], psel)
    pos_f0 = jnp.take(f0, pi, axis=0)
    pos_f1 = jnp.take(f1, pj, axis=0)
    sub_f0 = jnp.take(f0, sel0, axis=0)
    sub_f1 = jnp.take(f1, sel1, axis=0)

    d01 = _pdist_l2(pos_f0, sub_f1)
    d10 = _pdist_l2(pos_f1, sub_f0)
    d01 = jnp.where(sel1_ok[None, :], d01, jnp.inf)
    d10 = jnp.where(sel0_ok[None, :], d10, jnp.inf)
    d01_min, d01_arg = jnp.min(d01, 1), jnp.argmin(d01, 1)
    d10_min, d10_arg = jnp.min(d10, 1), jnp.argmin(d10, 1)

    table = _make_pair_set(pairs, pair_valid)
    neg0_j = jnp.take(sel1, d01_arg)
    neg1_i = jnp.take(sel0, d10_arg)
    mask0 = psel_ok & ~_in_pair_set(table, pi, neg0_j)
    mask1 = psel_ok & ~_in_pair_set(table, neg1_i, pj)

    pos_sq = jnp.sum((pos_f0 - pos_f1) ** 2, axis=1)
    pos_loss = _masked_mean(jnp.maximum(pos_sq - pos_thresh, 0.0), psel_ok)
    neg_loss0 = _masked_mean(jnp.maximum(neg_thresh - d01_min, 0.0) ** 2, mask0)
    neg_loss1 = _masked_mean(jnp.maximum(neg_thresh - d10_min, 0.0) ** 2, mask1)
    return pos_loss, (neg_loss0 + neg_loss1) / 2.0


def contrastive_loss(
    key: jax.Array,
    f0: jax.Array, valid0: jax.Array,
    f1: jax.Array, valid1: jax.Array,
    pairs: jax.Array,
    pair_valid: jax.Array,
    *,
    num_neg: int = 0,
    neg_thresh: float = 1.4,
) -> Tuple[jax.Array, jax.Array]:
    """Random-negative contrastive loss (`lib/trainer.py:236-305`):
    pos L2² mean over all valid pairs; hinge² on sqrt-distance of random
    (i, j) pairs that are not positives (`generate_rand_negative_pairs`,
    :220-234; default N_neg = 2 * num_pos)."""
    if num_neg == 0:
        num_neg = 2 * pairs.shape[0]
    k0, k1 = jax.random.split(key)
    n0 = jnp.sum(valid0.astype(jnp.int32))
    n1 = jnp.sum(valid1.astype(jnp.int32))
    ri = jax.random.randint(k0, (num_neg,), 0, jnp.maximum(n0, 1))
    rj = jax.random.randint(k1, (num_neg,), 0, jnp.maximum(n1, 1))
    # valid rows are compacted at the front of f0/f1 (key-sorted layout)
    table = _make_pair_set(pairs, pair_valid)
    neg_ok = ~_in_pair_set(table, ri, rj)

    pos_f0 = jnp.take(f0, pairs[:, 0], axis=0)
    pos_f1 = jnp.take(f1, pairs[:, 1], axis=0)
    pos_loss = _masked_mean(jnp.sum((pos_f0 - pos_f1) ** 2, 1), pair_valid)

    neg_d = jnp.sqrt(
        jnp.sum((jnp.take(f0, ri, axis=0) - jnp.take(f1, rj, axis=0)) ** 2, 1) + 1e-4
    )
    neg_loss = _masked_mean(jnp.maximum(neg_thresh - neg_d, 0.0) ** 2, neg_ok)
    return pos_loss, neg_loss


def triplet_loss(
    key: jax.Array,
    f0: jax.Array, valid0: jax.Array,
    f1: jax.Array, valid1: jax.Array,
    pairs: jax.Array,
    pair_valid: jax.Array,
    *,
    num_pos: int = 1024,
    num_rand_triplet: int = 1024,
    neg_thresh: float = 1.4,
):
    """Random-triplet loss (`lib/trainer.py:574-621`). Returns
    (loss, mean_pos_dist, mean_neg_dist)."""
    k0, k1, k2 = jax.random.split(key, 3)
    psel, psel_ok = _sample_without_replacement(k0, pair_valid, num_pos)
    pi = jnp.take(pairs[:, 0], psel)
    pj = jnp.take(pairs[:, 1], psel)
    pos_dist = jnp.sqrt(
        jnp.sum((jnp.take(f0, pi, 0) - jnp.take(f1, pj, 0)) ** 2, 1) + 1e-7
    )

    rsel, rsel_ok = _sample_without_replacement(k1, pair_valid, num_rand_triplet)
    negs, negs_ok = _sample_without_replacement(k2, valid1, num_rand_triplet)
    ai = jnp.take(pairs[:, 0], rsel)
    aj = jnp.take(pairs[:, 1], rsel)
    table = _make_pair_set(pairs, pair_valid)
    tri_ok = rsel_ok & negs_ok & ~_in_pair_set(table, ai, negs)

    rp = jnp.sqrt(jnp.sum((jnp.take(f0, ai, 0) - jnp.take(f1, aj, 0)) ** 2, 1) + 1e-7)
    rn = jnp.sqrt(jnp.sum((jnp.take(f0, ai, 0) - jnp.take(f1, negs, 0)) ** 2, 1) + 1e-7)
    loss = _masked_mean(jnp.maximum(rp + neg_thresh - rn, 0.0), tri_ok)
    return loss, _masked_mean(pos_dist, psel_ok), _masked_mean(rn, tri_ok)


def hardest_triplet_loss(
    key: jax.Array,
    f0: jax.Array, valid0: jax.Array,
    f1: jax.Array, valid1: jax.Array,
    pairs: jax.Array,
    pair_valid: jax.Array,
    *,
    num_pos: int = 1024,
    num_hn_samples: int = 512,
    num_rand_triplet: int = 1024,
    neg_thresh: float = 1.4,
):
    """Hardest-in-batch triplet loss (`lib/trainer.py:702-775`): hinge over the
    concatenation of random triplets and both directions of mined hardest
    negatives."""
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    sel0, sel0_ok = _sample_without_replacement(k0, valid0, num_hn_samples)
    sel1, sel1_ok = _sample_without_replacement(k1, valid1, num_hn_samples)
    psel, psel_ok = _sample_without_replacement(k2, pair_valid, num_pos)

    pi = jnp.take(pairs[:, 0], psel)
    pj = jnp.take(pairs[:, 1], psel)
    pos_f0 = jnp.take(f0, pi, 0)
    pos_f1 = jnp.take(f1, pj, 0)
    d01 = jnp.where(sel1_ok[None, :], _pdist_l2(pos_f0, jnp.take(f1, sel1, 0)), jnp.inf)
    d10 = jnp.where(sel0_ok[None, :], _pdist_l2(pos_f1, jnp.take(f0, sel0, 0)), jnp.inf)
    d01_min, d01_arg = jnp.min(d01, 1), jnp.argmin(d01, 1)
    d10_min, d10_arg = jnp.min(d10, 1), jnp.argmin(d10, 1)

    table = _make_pair_set(pairs, pair_valid)
    mask0 = psel_ok & ~_in_pair_set(table, pi, jnp.take(sel1, d01_arg))
    mask1 = psel_ok & ~_in_pair_set(table, jnp.take(sel0, d10_arg), pj)
    pos_dist = jnp.sqrt(jnp.sum((pos_f0 - pos_f1) ** 2, 1) + 1e-7)

    rsel, rsel_ok = _sample_without_replacement(k3, pair_valid, num_rand_triplet)
    negs, negs_ok = _sample_without_replacement(k4, valid1, num_rand_triplet)
    ai = jnp.take(pairs[:, 0], rsel)
    aj = jnp.take(pairs[:, 1], rsel)
    tri_ok = rsel_ok & negs_ok & ~_in_pair_set(table, ai, negs)
    rp = jnp.sqrt(jnp.sum((jnp.take(f0, ai, 0) - jnp.take(f1, aj, 0)) ** 2, 1) + 1e-7)
    rn = jnp.sqrt(jnp.sum((jnp.take(f0, ai, 0) - jnp.take(f1, negs, 0)) ** 2, 1) + 1e-7)

    # masked mean over the concatenated hinge terms (`lib/trainer.py:768-773`)
    terms = jnp.concatenate([
        jnp.maximum(rp + neg_thresh - rn, 0.0),
        jnp.maximum(pos_dist + neg_thresh - d01_min, 0.0),
        jnp.maximum(pos_dist + neg_thresh - d10_min, 0.0),
    ])
    masks = jnp.concatenate([tri_ok, mask0, mask1])
    loss = _masked_mean(terms, masks)
    neg_d = (_masked_mean(d01_min, psel_ok) + _masked_mean(d10_min, psel_ok)) / 2
    return loss, _masked_mean(pos_dist, psel_ok), neg_d
