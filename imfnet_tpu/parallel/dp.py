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


def stack_batches(batches):
    """Stack per-device PairBatches (or any pytrees) along a new leading
    device axis. None leaves (pairs/pair_valid) stay None."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def put_stacked(mesh: Mesh, tree, *, process_local: bool = False):
    """Place a stacked tree (leading axis = devices) onto the mesh, sharded
    over DP_AXIS. With ``process_local`` (multi-host: each process stacked
    only its own ``n_local`` batches) the leading axis is this process's
    shard and the global array is assembled across processes."""
    import numpy as np

    sharding = NamedSharding(mesh, P(DP_AXIS))
    if process_local:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


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


def make_emulated_dp_step(model, tx, config: Config, n_devices: int) -> Callable:
    """Single-device reference semantics of :func:`make_parallel_train_step`:
    the same per-device loss/grad with the same fold_in(key, device_index)
    RNG, grads/BN-stats/metrics MEAN'd over the device axis (what pmean
    computes), one optimizer step. Used by tests to assert the shard_map DP
    step is step-for-step equal to its sequential definition."""
    import jax.numpy as jnp

    from imfnet_tpu.train.state import TrainState
    from imfnet_tpu.train.step import make_loss_fn

    loss_fn = make_loss_fn(model, config)

    @jax.jit
    def step(state, stacked_batch, keys):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        outs = []
        for d in range(n_devices):
            batch = jax.tree_util.tree_map(lambda x: x[d], stacked_batch)
            key = jax.random.fold_in(keys[0], d)
            (_, (metrics, stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, key)
            outs.append((grads, stats, metrics))
        mean = lambda *xs: sum(xs[1:], xs[0]) / n_devices  # noqa: E731
        grads = jax.tree_util.tree_map(mean, *[o[0] for o in outs])
        new_stats = jax.tree_util.tree_map(mean, *[o[1] for o in outs])
        metrics = jax.tree_util.tree_map(mean, *[o[2] for o in outs])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), metrics

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


def make_sharded_extractor(model, variables, config: Config, mesh: Mesh, *,
                           n_raw: int, n_pad: int,
                           use_grid: bool | None = None) -> Callable:
    """Sharded descriptor extraction: D independent fragments, one per
    device, through the full in-graph pipeline (voxelize → pyramid →
    forward) — `generate-desc` eval-throughput scaling (SURVEY.md §2.3;
    the reference extracts fragments strictly serially,
    `scripts/generate_desc.py:83-123`).

    Returns extract(xyz_raw[D,n_raw,3], n_valid[D], images[D,H,W,3]) →
    (xyz_down[D,n_pad,3], feats[D,n_pad,C], num_valid[D], fits[D]).
    Overflow contract: a fragment with more than ``n_pad`` voxels reports
    num_valid == n_pad, and one whose COARSER pyramid levels overflow their
    ``n_pad``-derived capacities reports fits == False
    (kernel_map.coarse_levels_fit); callers MUST re-extract such fragments
    single-device (the bucketed extractor escalates until every level
    fits) rather than accept a truncation.
    """
    import jax.numpy as jnp

    from imfnet_tpu.train.step import make_pyramid_fn

    if use_grid is None:
        use_grid = config.use_grid_maps
    extent = tuple(config.grid_extent) if use_grid else None
    pyramid_fn = make_pyramid_fn(config, n_pad, num_batches=1,
                                 use_grid=use_grid, extent=extent)
    vox = config.voxel_size
    if use_grid:
        from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

        spec = GridSpec(extent=extent, num_batches=1)

        def quantize_fn(x, f, valid):
            return quantize_grid(x, f, valid, vox, n_pad, spec)
    else:
        from imfnet_tpu.sparse.coords import quantize

        def quantize_fn(x, f, valid):
            return quantize(x, f, valid, vox, n_pad)

    def device_extract(vars_, xyz, n, image):
        from imfnet_tpu.sparse.kernel_map import coarse_levels_fit

        xyz, n = xyz[0], n[0]
        valid = jnp.arange(xyz.shape[0]) < n
        feats_in = jnp.ones((xyz.shape[0], 1), jnp.float32)
        sv, _, xyz_down = quantize_fn(xyz, feats_in, valid)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(vars_, sv, pyr, image, train=False)
        return (xyz_down[None], feats[None], sv.num_valid[None],
                coarse_levels_fit(pyr)[None])

    sharded = shard_map(
        device_extract,
        mesh=mesh,
        in_specs=(P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    return lambda xyz, n, images: jitted(variables, xyz, n, images)


def make_parallel_kitti_eval(model, config: Config, mesh: Mesh,
                             register) -> Callable:
    """Sharded KITTI pair evaluation: D loader pairs register concurrently,
    one per device (forward both sides + full-cloud feature RANSAC —
    `scripts/evaluation_kitti.py:77-112` semantics per pair). Returns
    fn(params, batch_stats, stacked_batch, keys[D]) → metrics with a
    leading D axis."""
    import jax.numpy as jnp

    from imfnet_tpu.train.step import forward_pair

    def device_eval(params, batch_stats, batch, key):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        f0, f1, _ = forward_pair(
            model, params, batch_stats, batch, train=False, config=config)
        out = register(
            key[0], batch.xyz0, f0, batch.n0, batch.xyz1, f1, batch.n1,
            batch.T_gt[0], jnp.eye(6, dtype=jnp.float32))
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS), P(DP_AXIS)),
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
