"""Data-parallel tests on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.data.synthetic import synthetic_batch
from imfnet_tpu.models import load_model
from imfnet_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_pair_batches,
)
from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.kernel_map import build_pyramid
from imfnet_tpu.train.state import create_train_state, make_optimizer
from imfnet_tpu.train.step import level_capacities, make_train_step


def stack_batches(batches):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs) if xs[0] is not None else None, *batches
    )


@pytest.mark.slow
def test_dp_matches_single_device_grads(rng):
    """One DP step over 2 devices == sequential single-device math.

    With SGD and pmean'd grads, a 2-device step on (b0, b1) must equal a
    single-device step on the loss (L(b0)+L(b1))/2. We verify the metrics
    agree and params stay replicated-identical.
    """
    assert jax.device_count() >= 2, "conftest must fake >=2 CPU devices"
    config = threedmatch_config(
        batch_size=1, conv1_kernel_size=3, model_n_out=8,
        num_pos_per_batch=64, num_hn_samples_per_batch=32,
        max_points=1024, compute_dtype="float32",
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=8, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    b0 = synthetic_batch(rng, 1, 400, config.max_points, image_hw=(24, 32))
    b1 = synthetic_batch(rng, 1, 400, config.max_points, image_hw=(24, 32))

    sv = SparseVoxels(b0.coords0, b0.feats0, b0.n0)
    pyr = build_pyramid(b0.coords0, b0.n0, conv1_kernel_size=3,
                        level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, b0.image0, train=False)
    tx = make_optimizer(config, steps_per_epoch=10)

    mesh = make_mesh(2)
    state = replicate(mesh, create_train_state(variables, tx))
    pstep = make_parallel_train_step(model, tx, config, mesh)
    stacked = shard_pair_batches(mesh, stack_batches([b0, b1]))
    keys = jnp.stack([jax.random.PRNGKey(42)] * 2)
    state2, metrics = pstep(state, stacked, keys)
    assert np.isfinite(float(metrics["loss"]))

    # single-device reference: average of the two per-batch grads
    sstep = jax.jit(make_train_step(model, tx, config))
    s_ref = create_train_state(variables, tx)
    k0 = jax.random.fold_in(jax.random.PRNGKey(42), 0)
    k1 = jax.random.fold_in(jax.random.PRNGKey(42), 1)
    _, m0 = sstep(s_ref, b0, k0)
    _, m1 = sstep(s_ref, b1, k1)
    expect_loss = (float(m0["loss"]) + float(m1["loss"])) / 2
    np.testing.assert_allclose(float(metrics["loss"]), expect_loss, rtol=2e-4)

    # updated params finite and replicated
    p = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.isfinite(np.asarray(p)).all()


@pytest.mark.slow
def test_dp_step_runs_on_8_devices(rng):
    config = threedmatch_config(
        batch_size=1, conv1_kernel_size=3, model_n_out=8,
        num_pos_per_batch=32, num_hn_samples_per_batch=16,
        max_points=512, compute_dtype="float32",
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=8, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    batches = [
        synthetic_batch(rng, 1, 200, config.max_points, image_hw=(24, 32))
        for _ in range(8)
    ]
    sv = SparseVoxels(batches[0].coords0, batches[0].feats0, batches[0].n0)
    pyr = build_pyramid(batches[0].coords0, batches[0].n0, conv1_kernel_size=3,
                        level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, batches[0].image0,
                           train=False)
    tx = make_optimizer(config, steps_per_epoch=10)
    mesh = make_mesh(8)
    state = replicate(mesh, create_train_state(variables, tx))
    pstep = make_parallel_train_step(model, tx, config, mesh)
    stacked = shard_pair_batches(mesh, stack_batches(batches))
    keys = jnp.stack([jax.random.PRNGKey(7)] * 8)
    state, metrics = pstep(state, stacked, keys)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_parallel_registration_matches_single(rng):
    """Sharded batch-of-pairs registration == per-pair registration."""
    import jax
    import jax.numpy as jnp
    from imfnet_tpu.eval.registration import make_keypoint_registration
    from imfnet_tpu.parallel import make_mesh
    from imfnet_tpu.parallel.dp import make_parallel_registration

    D, K = 8, 128
    mesh = make_mesh(D)
    # build D synthetic pairs: random rigid transforms with noise + outliers
    kp0s, kd0s, kp1s, kd1s, Ts = [], [], [], [], []
    for d in range(D):
        src = rng.rand(K, 3).astype(np.float32) * 2
        from imfnet_tpu.geom.transforms import sample_random_trans
        T = sample_random_trans(src, rng).astype(np.float32)
        dst = src @ T[:3, :3].T + T[:3, 3]
        desc = rng.randn(K, 16).astype(np.float32)
        kp0s.append(src); kp1s.append(dst)
        kd0s.append(desc); kd1s.append(desc + rng.randn(K, 16).astype(np.float32) * 1e-3)
        Ts.append(np.linalg.inv(T))  # gt.log convention: maps 1→0
    ok = jnp.ones((D, K), bool)
    args = (
        jnp.stack([jax.random.PRNGKey(i) for i in range(D)]),
        jnp.asarray(np.stack(kp0s)), jnp.asarray(np.stack(kd0s)), ok,
        jnp.asarray(np.stack(kp1s)), jnp.asarray(np.stack(kd1s)), ok,
        jnp.asarray(np.stack(Ts)),
        jnp.broadcast_to(jnp.eye(6), (D, 6, 6)),
    )
    par = make_parallel_registration(mesh, voxel_size=0.05,
                                     num_hypotheses=2048)
    out = par(*args)
    assert out["rr"].shape == (D,)
    single = make_keypoint_registration(voxel_size=0.05, num_hypotheses=2048)
    for d in range(0, D, 3):
        ref = single(*(jax.tree_util.tree_map(lambda x: x[d], args)))
        np.testing.assert_allclose(float(out["ir"][d]), float(ref["ir"]),
                                   atol=1e-5)
        assert float(out["rr"][d]) == float(ref["rr"])


@pytest.mark.slow
def test_parallel_eval_forward_matches_single(rng):
    """Sharded descriptor extraction (`parallel/dp.py
    make_parallel_eval_forward`) == per-batch single-device forwards."""
    from imfnet_tpu.parallel.dp import make_parallel_eval_forward
    from imfnet_tpu.train.step import forward_pair

    D = 4
    config = threedmatch_config(
        batch_size=1, conv1_kernel_size=3, model_n_out=8,
        max_points=512, compute_dtype="float32",
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=8, conv1_kernel_size=3,
        normalize_feature=True, compute_dtype=jnp.float32,
    )
    batches = [
        synthetic_batch(rng, 1, 200, config.max_points, image_hw=(24, 32))
        for _ in range(D)
    ]
    sv = SparseVoxels(batches[0].coords0, batches[0].feats0, batches[0].n0)
    pyr = build_pyramid(batches[0].coords0, batches[0].n0, conv1_kernel_size=3,
                        level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, batches[0].image0,
                           train=False)
    mesh = make_mesh(D)
    params = replicate(mesh, variables["params"])
    stats = replicate(mesh, variables["batch_stats"])
    stacked = shard_pair_batches(mesh, stack_batches(batches))
    pfwd = make_parallel_eval_forward(model, config, mesh)
    f0s, f1s = pfwd(params, stats, stacked)
    assert f0s.shape[0] == D and f1s.shape[0] == D
    for d in range(D):
        r0, r1, _ = forward_pair(
            model, variables["params"], variables["batch_stats"],
            batches[d], train=False, config=config)
        np.testing.assert_allclose(np.asarray(f0s[d]), np.asarray(r0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1s[d]), np.asarray(r1),
                                   atol=1e-5)
