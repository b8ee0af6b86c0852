"""Training-path tests: losses, train step, loss decreases, data parallel."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.data.synthetic import synthetic_batch
from imfnet_tpu.models import load_model
from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.kernel_map import build_pyramid
from imfnet_tpu.train.losses import (
    _in_pair_set,
    _make_pair_set,
    hardest_contrastive_loss,
)
from imfnet_tpu.train.state import create_train_state, make_optimizer
from imfnet_tpu.train.step import (
    compute_correspondences,
    forward_pair,
    level_capacities,
    make_train_step,
)


def small_config():
    return threedmatch_config(
        batch_size=2,
        conv1_kernel_size=3,
        model_n_out=16,
        num_pos_per_batch=128,
        num_hn_samples_per_batch=64,
        max_points=2048,
        compute_dtype="float32",
    )


def make_model(config):
    return load_model(config.model)(
        in_channels=1,
        out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum,
        compute_dtype=jnp.float32,
    )


def test_pair_set_membership(rng):
    pairs = jnp.asarray(rng.randint(0, 1000, (50, 2)).astype(np.int32))
    valid = jnp.asarray(np.ones(50, bool))
    table = _make_pair_set(pairs, valid)
    hit = _in_pair_set(table, pairs[:, 0], pairs[:, 1])
    assert np.asarray(hit).all()
    miss = _in_pair_set(table, pairs[:, 0] + 2000, pairs[:, 1])
    assert not np.asarray(miss).any()


def test_hardest_contrastive_separates(rng):
    """Loss must be ~0 for well-separated embeddings, positive for collapsed."""
    n = 256
    f_good0 = np.eye(n, 32, dtype=np.float32)  # distinct rows
    f_good0[:, 0] += np.arange(n) * 10
    f_good1 = f_good0.copy()
    pairs = np.stack([np.arange(n), np.arange(n)], 1).astype(np.int32)
    valid = np.ones(n, bool)
    key = jax.random.PRNGKey(0)
    pos, neg = hardest_contrastive_loss(
        key, jnp.asarray(f_good0), jnp.asarray(valid),
        jnp.asarray(f_good1), jnp.asarray(valid),
        jnp.asarray(pairs), jnp.asarray(valid),
        num_pos=128, num_hn_samples=64,
    )
    assert float(pos) < 1e-6       # identical positives
    assert float(neg) < 1e-6       # all negatives far apart

    f_bad = np.ones((n, 32), np.float32)  # collapsed
    pos_b, neg_b = hardest_contrastive_loss(
        key, jnp.asarray(f_bad), jnp.asarray(valid),
        jnp.asarray(f_bad), jnp.asarray(valid),
        jnp.asarray(pairs), jnp.asarray(valid),
        num_pos=128, num_hn_samples=64,
    )
    assert float(neg_b) > 1.0      # hinge at neg_thresh=1.4 fully active


def test_compute_correspondences(rng):
    config = small_config()
    batch = synthetic_batch(rng, batch_size=2, n_points=700,
                            n_pad=config.max_points, image_hw=(24, 32))
    pairs, ok = compute_correspondences(batch, 0.0375)
    pairs, ok = np.asarray(pairs), np.asarray(ok)
    n0 = int(batch.n0)
    assert ok[:n0].mean() > 0.5          # most voxels have a positive
    assert not ok[n0:].any()
    # verify: matched points really are within radius under T_gt, same pair
    c0 = np.asarray(batch.coords0)
    c1 = np.asarray(batch.coords1)
    x0 = np.asarray(batch.xyz0)
    x1 = np.asarray(batch.xyz1)
    T = np.asarray(batch.T_gt)
    sel = np.where(ok)[0][:500]
    j = pairs[sel, 1]
    assert (c0[sel, 0] == c1[j, 0]).all()
    b = c0[sel, 0]
    moved = np.einsum("nij,nj->ni", T[b, :3, :3], x0[sel]) + T[b, :3, 3]
    d = np.linalg.norm(moved - x1[j], axis=1)
    assert (d <= 0.0375 + 1e-5).all()


@pytest.mark.slow
def test_grad_accumulation_matches_fused_step(rng):
    """iter_size accumulation over identical micro-batches must produce the
    same parameter update as one fused train step (grads are computed at
    fixed params and pre-scaled by 1/iter_size)."""
    from imfnet_tpu.train.step import make_accum_steps

    config = small_config().replace(iter_size=2)
    model = make_model(config)
    batch = synthetic_batch(rng, batch_size=2, n_points=500,
                            n_pad=config.max_points, image_hw=(24, 32))
    sv0 = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr0 = build_pyramid(batch.coords0, batch.n0,
                         conv1_kernel_size=config.conv1_kernel_size,
                         level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv0, pyr0, batch.image0,
                           train=False)
    tx = make_optimizer(config, steps_per_epoch=10)
    state0 = create_train_state(variables, tx)

    fused = jax.jit(make_train_step(model, tx, config.replace(iter_size=1)))
    state_f, metrics_f = fused(state0, batch, jax.random.PRNGKey(7))

    grad_step, apply_step = make_accum_steps(model, tx, config)
    grads = jax.tree_util.tree_map(jnp.zeros_like, state0.params)
    stats = state0.batch_stats
    for _ in range(2):
        grads, metrics_a, stats = grad_step(
            state0.params, stats, batch, jax.random.PRNGKey(7), grads)
    state_a = apply_step(state0, grads, stats)

    flat_f = jax.tree_util.tree_leaves(state_f.params)
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    for a, b in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    assert np.isfinite(float(metrics_a["loss"]))


@pytest.mark.slow
def test_train_step_decreases_loss(rng):
    config = small_config()
    model = make_model(config)
    batch = synthetic_batch(rng, batch_size=2, n_points=700,
                            n_pad=config.max_points, image_hw=(24, 32))
    sv0 = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr0 = build_pyramid(batch.coords0, batch.n0,
                         conv1_kernel_size=config.conv1_kernel_size,
                         level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv0, pyr0, batch.image0,
                           train=False)
    tx = make_optimizer(config.replace(lr=0.03), steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, config))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_training_improves_matching(rng):
    """Quality regression gate ('training works' as a number, not a smoke
    test — the full-generalization curve lives in
    scripts_dev/train_quality_curve.py): overfitting one fixed pair batch
    must drive the matching hit-ratio sharply up. Uses DENSE synthetic
    surfaces (extent 0.45 @ 900 pts ~= 5 occupied k3 neighbors/voxel): at
    the default extent most voxels are isolated, the geometry carries no
    signal, and descriptors rightly collapse."""
    from imfnet_tpu.data.collate import collate_pairs
    from imfnet_tpu.data.synthetic import synthetic_pair
    from imfnet_tpu.train.validate import make_val_step

    config = small_config().replace(lr=0.3, num_pos_per_batch=256,
                                    val_subsample_size=1024)
    model = make_model(config)
    batch = collate_pairs(
        [synthetic_pair(np.random.RandomState(s), n_points=900, extent=0.45,
                        image_hw=(24, 32)) for s in (7, 8)],
        config.max_points)
    val_batch = collate_pairs(
        [synthetic_pair(np.random.RandomState(7), n_points=900, extent=0.45,
                        image_hw=(24, 32))], config.max_points)

    sv = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr = build_pyramid(batch.coords0, batch.n0,
                        conv1_kernel_size=config.conv1_kernel_size,
                        level_capacity=level_capacities(config.max_points))
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, batch.image0,
                           train=False)
    tx = make_optimizer(config, steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, config))
    val_step = make_val_step(model, config.replace(batch_size=1))

    def hit_ratio(s):
        return float(val_step(s.params, s.batch_stats, val_batch,
                              jax.random.PRNGKey(7))["hit_ratio"])

    hr0 = hit_ratio(state)
    losses = []
    for i in range(40):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    hr1 = hit_ratio(state)
    assert losses[-1] < 0.7 * losses[0], losses
    assert hr1 > max(2.5 * hr0, hr0 + 0.1), (hr0, hr1)
