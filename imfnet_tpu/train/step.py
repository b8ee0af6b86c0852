"""The jitted training / validation step over padded pair batches.

Equivalent of the per-iteration body of
`HardestContrastiveLossTrainer._train_epoch` (`lib/trainer.py:495-569`):
two model forwards (one per fragment side), metric-learning loss, SGD update.
Everything — kernel-map construction included — runs inside one XLA program.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from imfnet_tpu.config import Config
from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.kernel_map import build_pyramid
from imfnet_tpu.train.losses import (
    contrastive_loss,
    hardest_contrastive_loss,
    hardest_triplet_loss,
    triplet_loss,
)
from imfnet_tpu.train.state import TrainState


class PairBatch(NamedTuple):
    """One padded batch of fragment pairs, concatenated per side.

    The host pipeline voxelizes/augments and pads (`collate` equivalent,
    `lib/data_loaders.py:28-91`); the device does everything else.
    """

    coords0: jax.Array   # int32[N,4] key-sorted, batch column = pair index
    feats0: jax.Array    # [N,1] occupancy
    n0: jax.Array        # int32[]
    image0: jax.Array    # [B,H,W,3]
    coords1: jax.Array
    feats1: jax.Array
    n1: jax.Array
    image1: jax.Array
    pairs: jax.Array      # int32[P,2] positive correspondences (rows in side arrays)
    pair_valid: jax.Array # bool[P]
    xyz0: jax.Array       # [N,3] continuous positions of voxel representatives
    xyz1: jax.Array
    T_gt: jax.Array       # [B,4,4]
    # per-pair positive-search radius; 0 → fall back to the config default.
    # Carries the reference's scale-dependent matching radius
    # (`lib/data_loaders.py:273-276`: matching_search_voxel_size *= scale).
    search_radius: jax.Array = None  # float32[B]


def level_capacities(
    n_pad: int, divisors: Tuple[int, ...] = (1, 2, 4, 8)
) -> Tuple[int, ...]:
    """Static per-level row capacities. Surface voxelization shrinks ~3-4x per
    stride-2; divisors trade padding waste against overflow margin."""
    return tuple(max(n_pad // d, 256) for d in divisors)


LOSS_FNS = {
    "HardestContrastiveLossTrainer": "hardest_contrastive",
    "ContrastiveLossTrainer": "contrastive",
    "TripletLossTrainer": "triplet",
    "HardestTripletLossTrainer": "hardest_triplet",
}


def make_pyramid_fn(config: Config, n_pad: int, num_batches: int,
                    use_grid: bool | None = None,
                    extent: Tuple[int, int, int] | None = None):
    """Coordinate-pyramid builder per config: dense-grid index (fast path,
    imfnet_tpu.sparse.grid) or exact binary search fallback. ``use_grid``
    overrides config.use_grid_maps (the extractor routes fragments whose
    span exceeds the static grid extent to the exact path — see
    sparse.grid.fits_grid). ``extent`` overrides config.grid_extent: the
    extractor passes the smallest configured extent bucket that holds the
    fragment's probed span (config.grid_extent_buckets) — smaller static
    extents mean smaller packed tables and a cheaper pyramid."""
    caps = level_capacities(n_pad, tuple(config.level_capacity_divisors))
    if use_grid is None:
        use_grid = config.use_grid_maps
    if use_grid:
        from imfnet_tpu.sparse.grid import GridSpec, build_pyramid_grid

        spec = GridSpec(
            extent=tuple(extent if extent is not None
                         else config.grid_extent),
            num_batches=num_batches)

        def fn(coords, n):
            return build_pyramid_grid(
                coords, n, spec=spec,
                conv1_kernel_size=config.conv1_kernel_size,
                level_capacity=caps,
            )

        return fn

    def fn(coords, n):
        return build_pyramid(
            coords, n, conv1_kernel_size=config.conv1_kernel_size,
            level_capacity=caps,
        )

    return fn


def forward_pair(model, params, batch_stats, batch: PairBatch, *, train: bool,
                 config: Config):
    """Run the model on both sides; side 1 consumes side 0's updated batch
    stats (the reference updates BN stats sequentially per side,
    `lib/trainer.py:521-527`)."""
    num_batches = batch.image0.shape[0]
    pyramid_fn = make_pyramid_fn(config, batch.coords0.shape[0], num_batches)
    sv0 = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr0 = pyramid_fn(batch.coords0, batch.n0)
    sv1 = SparseVoxels(batch.coords1, batch.feats1, batch.n1)
    pyr1 = pyramid_fn(batch.coords1, batch.n1)
    if train:
        f0, upd = model.apply(
            {"params": params, "batch_stats": batch_stats},
            sv0, pyr0, batch.image0, train=True, mutable=["batch_stats"],
        )
        f1, upd = model.apply(
            {"params": params, "batch_stats": upd["batch_stats"]},
            sv1, pyr1, batch.image1, train=True, mutable=["batch_stats"],
        )
        return f0, f1, upd["batch_stats"]
    v = {"params": params, "batch_stats": batch_stats}
    f0 = model.apply(v, sv0, pyr0, batch.image0, train=False)
    f1 = model.apply(v, sv1, pyr1, batch.image1, train=False)
    return f0, f1, batch_stats


def compute_correspondences(batch: PairBatch, search_radius) -> Tuple[jax.Array, jax.Array]:
    """Device-side positive-pair search (replaces the per-sample CPU KD-tree
    radius query at `util/pointcloud.py:56-69`, a data-loading hot spot).

    For every valid voxel of side 0: its nearest side-1 voxel of the same pair
    within ``search_radius`` after the gt transform. Pairs are kept apart in
    one blocked NN pass by a large per-pair coordinate offset.

    ``search_radius`` may be a scalar or a per-pair [B] array (the reference
    scales the radius by each sample's random scale,
    `lib/data_loaders.py:273-276`).
    """
    n0 = batch.coords0.shape[0]
    n1 = batch.coords1.shape[0]
    v0 = jnp.arange(n0) < batch.n0
    v1 = jnp.arange(n1) < batch.n1
    b0 = jnp.where(v0, batch.coords0[:, 0], 0)
    b1 = jnp.where(v1, batch.coords1[:, 0], 0)
    big = jnp.float32(1e5)
    # per-batch transform via a static select chain: a per-row
    # jnp.take(T_gt, b0) gather pays the XLA per-row gather rate on every
    # point (see sparse.grid.origin_lookup); num_batches matmuls + selects
    # are pure MXU/VPU work
    nb = batch.T_gt.shape[0]
    bc = jnp.minimum(b0, nb - 1)
    x0 = None
    for i in range(nb):
        Ti = batch.T_gt[i]
        xi = batch.xyz0 @ Ti[:3, :3].T + Ti[:3, 3]
        x0 = xi if x0 is None else jnp.where((bc == i)[:, None], xi, x0)
    x0 = x0 + (b0 * big)[:, None]
    x1 = batch.xyz1 + (b1 * big)[:, None]
    from imfnet_tpu.match.nn import nn_auto

    idx, d2 = nn_auto(x0, x1, v1, block=4096)
    r = jnp.asarray(search_radius, jnp.float32)
    if r.ndim == 0:
        r0 = r
    else:
        rc = jnp.minimum(b0, r.shape[0] - 1)
        r0 = jnp.full(b0.shape, r[0])
        for i in range(1, r.shape[0]):
            r0 = jnp.where(rc == i, r[i], r0)
    ok = v0 & (d2 <= r0 * r0)
    pairs = jnp.stack([jnp.arange(n0, dtype=jnp.int32), idx.astype(jnp.int32)], axis=1)
    return pairs, ok


def make_loss_fn(model, config: Config):
    """loss_fn(params, batch_stats, batch, key) → (loss, (metrics, stats))."""
    loss_kind = LOSS_FNS[config.trainer]

    def loss_fn(params, batch_stats, batch: PairBatch, key):
        f0, f1, new_stats = forward_pair(
            model, params, batch_stats, batch, train=True, config=config,
        )
        valid0 = jnp.arange(f0.shape[0]) < batch.n0
        valid1 = jnp.arange(f1.shape[0]) < batch.n1
        if batch.pairs is None:
            # on-device positive search (matching_search_voxel_size =
            # voxel * multiplier, `lib/data_loaders.py:122`); per-pair radii
            # from the batch carry the random-scale factor, 0 → default
            radius = config.voxel_size * config.positive_pair_search_voxel_size_multiplier
            if batch.search_radius is not None:
                radius = jnp.where(batch.search_radius > 0,
                                   batch.search_radius, radius)
            pairs, pair_valid = compute_correspondences(batch, radius)
        else:
            pairs, pair_valid = batch.pairs, batch.pair_valid
        args = (key, f0, valid0, f1, valid1, pairs, pair_valid)
        if loss_kind == "hardest_contrastive":
            pos, neg = hardest_contrastive_loss(
                *args,
                num_pos=config.num_pos_per_batch * config.batch_size,
                num_hn_samples=config.num_hn_samples_per_batch * config.batch_size,
                pos_thresh=config.pos_thresh,
                neg_thresh=config.neg_thresh,
            )
            loss = pos + config.neg_weight * neg
            metrics = {"loss": loss, "pos_loss": pos, "neg_loss": neg}
        elif loss_kind == "contrastive":
            pos, neg = contrastive_loss(*args, neg_thresh=config.neg_thresh)
            loss = pos + config.neg_weight * neg
            metrics = {"loss": loss, "pos_loss": pos, "neg_loss": neg}
        elif loss_kind == "triplet":
            loss, pd, nd = triplet_loss(
                *args,
                num_pos=config.triplet_num_pos * config.batch_size,
                num_rand_triplet=config.triplet_num_rand * config.batch_size,
                neg_thresh=config.neg_thresh,
            )
            metrics = {"loss": loss, "pos_dist": pd, "neg_dist": nd}
        else:
            loss, pd, nd = hardest_triplet_loss(
                *args,
                num_pos=config.triplet_num_pos * config.batch_size,
                num_hn_samples=config.triplet_num_hn * config.batch_size,
                num_rand_triplet=config.triplet_num_rand * config.batch_size,
                neg_thresh=config.neg_thresh,
            )
            metrics = {"loss": loss, "pos_dist": pd, "neg_dist": nd}
        return loss, (metrics, new_stats)

    return loss_fn


def make_train_step(model, tx, config: Config, axis_name: str | None = None):
    """Returns train_step(state, batch, key) → (state, metrics). When
    ``axis_name`` is set the step is shard_map-compatible: grads/stats are
    pmean'd over that mesh axis (data parallel over fragment pairs — new
    capability vs the single-GPU reference, SURVEY.md §2.3)."""
    loss_fn = make_loss_fn(model, config)

    def train_step(state: TrainState, batch: PairBatch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, key
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return state, metrics

    return train_step


def make_accum_steps(model, tx, config: Config):
    """Gradient accumulation over ``config.iter_size`` micro-batches — the
    reference's only scaling knob (`lib/trainer.py:252-307`: loss is divided
    by iter_size, backward accumulates, one optimizer step per group; BN
    running stats update every micro-batch).

    Returns (grad_step, apply_step):
      grad_step(params, batch_stats, batch, key, grads_acc) →
          (grads_acc', metrics, new_batch_stats) — call per micro-batch with
          a zero grads tree to start the group; losses are pre-scaled by
          1/iter_size so the accumulated tree is the group-mean gradient
      apply_step(state, grads_acc, batch_stats) → state — one optimizer step
    """
    loss_fn = make_loss_fn(model, config)
    scale = 1.0 / float(max(config.iter_size, 1))

    def grad_step(params, batch_stats, batch: PairBatch, key, grads_acc):
        def scaled_loss(p, bs, b, k):
            loss, aux = loss_fn(p, bs, b, k)
            return loss * scale, aux

        grad_fn = jax.value_and_grad(scaled_loss, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(params, batch_stats, batch, key)
        acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        return acc, metrics, new_stats

    def apply_step(state: TrainState, grads_acc, batch_stats):
        updates, opt_state = tx.update(grads_acc, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=batch_stats, opt_state=opt_state)

    return jax.jit(grad_step), jax.jit(apply_step)
