"""Data-parallel training over a pair-sharded mesh (shard_map + psum).

Each device processes its own concatenated batch of fragment pairs (a full
`PairBatch` slice); gradients, BN running-stat updates, and metrics are
pmean'd over the mesh axis. Batches carry a leading device axis sharded over
the mesh, params/state are replicated.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from imfnet_tpu.config import Config
from imfnet_tpu.parallel.mesh import DP_AXIS
from imfnet_tpu.train.step import PairBatch, make_train_step


def shard_pair_batches(mesh: Mesh, batches: PairBatch) -> PairBatch:
    """Place a stacked PairBatch (leading axis = mesh size) onto the mesh."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batches
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(model, tx, config: Config, mesh: Mesh) -> Callable:
    """train_step(state, stacked_batch, key) with a leading device axis on the
    batch. Gradient all-reduce rides ICI inside shard_map."""
    inner = make_train_step(model, tx, config, axis_name=DP_AXIS)

    def device_step(state, batch, key):
        # strip the per-device leading axis of size 1
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        key = jax.random.fold_in(key[0], jax.lax.axis_index(DP_AXIS))
        return inner(state, batch, key)

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state, stacked_batch, keys):
        return sharded(state, stacked_batch, keys)

    return step


def make_parallel_registration(mesh: Mesh, *, voxel_size: float = 0.025,
                               ransac_n: int = 3, num_hypotheses: int = 50000,
                               inlier_thresh: float = 0.1) -> Callable:
    """Sharded pair registration: a stack of keypoint sets (leading axis =
    mesh size) registers concurrently, one pair per device — benchmark
    evaluation throughput scales with the mesh (SURVEY.md §2.3: batch-of-
    pairs sharding is new capability vs the single-GPU reference).

    Returns register(keys[D], kp0[D,K,3], kd0[D,K,C], ok0[D,K], kp1, kd1,
    ok1, T_gt[D,4,4], cov[D,6,6]) → metrics dict with leading device axis.
    """
    from imfnet_tpu.eval.registration import make_keypoint_registration

    register_kp = make_keypoint_registration(
        voxel_size=voxel_size, ransac_n=ransac_n,
        num_hypotheses=num_hypotheses, inlier_thresh=inlier_thresh)

    def device_register(key, kp0, kd0, ok0, kp1, kd1, ok1, T_gt, cov):
        out = register_kp(key[0], kp0[0], kd0[0], ok0[0], kp1[0], kd1[0],
                          ok1[0], T_gt[0], cov[0])
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = shard_map(
        device_register,
        mesh=mesh,
        in_specs=(P(DP_AXIS),) * 9,
        out_specs=P(DP_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_eval_forward(model, config: Config, mesh: Mesh) -> Callable:
    """Sharded descriptor extraction: a batch of independent fragments spread
    over the mesh (eval-throughput scaling, SURVEY.md §2.3)."""
    from imfnet_tpu.train.step import forward_pair

    def device_forward(params, batch_stats, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        f0, f1, _ = forward_pair(
            model, params, batch_stats, batch, train=False, config=config,
        )
        return f0[None], f1[None]

    sharded = shard_map(
        device_forward,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS)),
        out_specs=(P(DP_AXIS), P(DP_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)
