"""End-to-end eval pipeline + DAM + checkpoint tests (small sizes, CPU)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.data.synthetic import synthetic_pair
from imfnet_tpu.eval.extract import make_extractor, pad_points
from imfnet_tpu.eval.registration import make_pair_registration
from imfnet_tpu.models import load_model
from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
from imfnet_tpu.train.step import make_pyramid_fn


@pytest.fixture(scope="module")
def setup():
    # shapes sized down for compile time: this module fixture alone cost
    # ~230 s of the default suite at max_points=4096
    config = threedmatch_config(
        conv1_kernel_size=3, model_n_out=16, max_points=2048,
        compute_dtype="float32", grid_extent=(96, 96, 96),
        num_rand_keypoints=384, ransac_max_iteration=1024,
    )
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=3, normalize_feature=True,
        compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    pair = synthetic_pair(rng, n_points=2000, voxel_size=config.voxel_size,
                          extent=0.8, image_hw=(24, 32))
    n_raw_pad = 4096
    raw0, n0 = pad_points(pair.xyz0, n_raw_pad)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=1)
    sv, _, _ = quantize_grid(
        jnp.asarray(raw0), jnp.ones((n_raw_pad, 1), jnp.float32),
        jnp.arange(n_raw_pad) < n0, config.voxel_size, config.max_points, spec)
    pyr = make_pyramid_fn(config, config.max_points, 1)(sv.coords, sv.num_valid)
    image = jnp.zeros((1, 24, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, image, train=False)
    return config, model, variables, pair, n_raw_pad, sv, pyr, image


@pytest.mark.slow
def test_extract_and_register_recovers_pose(setup):
    """The full eval path: extract on both sides of a synthetic pair with an
    untrained-but-shared model must still register (same-geometry voxels get
    near-identical descriptors), validating keypoints+NN+RANSAC end-to-end."""
    config, model, variables, pair, n_raw_pad, *_ = setup
    extract = make_extractor(model, variables, config=config,
                             n_pad=config.max_points)
    register = make_pair_registration(
        num_keypoints=config.num_rand_keypoints,
        voxel_size=config.voxel_size, ransac_n=3,
        num_hypotheses=config.ransac_max_iteration, hypo_block=512,
    )
    raw0, n0 = pad_points(pair.xyz0, n_raw_pad)
    raw1, n1 = pad_points(pair.xyz1, n_raw_pad)
    img = jnp.zeros((1, 24, 32, 3), jnp.float32)
    x0, f0, m0 = extract(jnp.asarray(raw0), n0, img)
    x1, f1, m1 = extract(jnp.asarray(raw1), n1, img)
    assert int(m0) > 100
    fn = np.asarray(f0)[: int(m0)]
    np.testing.assert_allclose(np.linalg.norm(fn, axis=1), 1.0, rtol=1e-3)

    out = register(
        jax.random.PRNGKey(0), x0, f0, m0, x1, f1, m1,
        jnp.asarray(pair.T_gt),
        jnp.asarray(np.eye(6, dtype=np.float32)),
    )
    # untrained descriptors are weak; the pipeline must still run and produce
    # finite metrics; IR under gt is a geometry-only check
    assert np.isfinite(float(out["ir"]))
    assert np.isfinite(float(out["rre"]))
    assert 0.0 <= float(out["inlier_ratio_mutual"]) <= 1.0


def test_dam_attribution(setup):
    from imfnet_tpu.dam.dam import descriptor_activation_map, dam_colors

    config, model, variables, pair, n_raw_pad, sv, pyr, image = setup
    w = descriptor_activation_map(model, variables, sv, pyr, image, 5)
    w = np.asarray(w)
    n = int(sv.num_valid)
    assert w.shape == (sv.coords.shape[0],)
    assert (w >= 0).all()          # ReLU'd
    assert np.isfinite(w).all()
    assert w[:n].max() > 0         # some attribution present
    colors = dam_colors(w, n)
    assert colors.shape == (n, 3)
    assert colors.min() >= 0 and colors.max() <= 1


@pytest.mark.slow
def test_dam_image_overlay(tmp_path, setup):
    """Image-side attribution: nonzero saliency (the descriptor depends on
    the image through the fusion block) and a valid PNG overlay."""
    from imfnet_tpu.dam.dam import image_activation_map, save_dam_image_overlay
    from imfnet_tpu.geom.image import load_image

    config, model, variables, pair, n_raw_pad, sv, pyr, _ = setup
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, 24, 32, 3).astype(np.float32))
    sal = np.asarray(image_activation_map(model, variables, sv, pyr, image, 5))
    assert sal.shape == (24, 32)
    assert np.isfinite(sal).all() and sal.max() > 0
    out = tmp_path / "overlay.png"
    save_dam_image_overlay(str(out), np.asarray(image[0]), sal)
    back = load_image(str(out))
    assert back.shape == (24, 32, 3)
    assert back.max() <= 1.0 and back.min() >= 0.0


def test_checkpoint_roundtrip(tmp_path, setup):
    from imfnet_tpu.train.checkpoint import (
        load_checkpoint,
        load_config_from_checkpoint,
        save_checkpoint,
    )
    from imfnet_tpu.train.state import create_train_state, make_optimizer

    config, model, variables, *_ = setup
    tx = make_optimizer(config, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    path = save_checkpoint(str(tmp_path), "checkpoint", state, config,
                           epoch=3, best_val=0.5, best_val_epoch=2,
                           best_val_metric="feat_match_ratio", val_value=0.5)
    # perturb and restore
    state2 = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state.params))
    restored, meta = load_checkpoint(path, state2)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert meta["epoch"] == 3
    cfg2 = load_config_from_checkpoint(path)
    assert cfg2.model_n_out == config.model_n_out
    assert tuple(cfg2.grid_extent) == tuple(config.grid_extent)


def test_synthetic_loader():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.data.datasets import SyntheticPairDataset, PairLoader

    config = threedmatch_config(max_points=4096)
    ds = SyntheticPairDataset("val", config, length=6, n_points=800)
    loader = PairLoader(ds, batch_size=2, n_pad=4096, shuffle=True)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b.coords0.shape == (4096, 4)
    assert int(b.n0) > 0 and int(b.n1) > 0
    assert b.image0.shape[0] == 2


@pytest.mark.slow
def test_bucketed_extractor_matches_fixed(setup):
    from imfnet_tpu.eval.extract import make_bucketed_extractor, make_extractor

    config, model, variables, pair, n_raw_pad, *_ = setup
    fixed = make_extractor(model, variables, config=config,
                           n_pad=config.max_points)
    bucketed = make_bucketed_extractor(
        model, variables, config=config,
        buckets=(1024, 2048, config.max_points))
    raw0, n0 = pad_points(pair.xyz0, n_raw_pad)
    img = jnp.zeros((1, 24, 32, 3), jnp.float32)
    xd_f, f_f, nv = fixed(jnp.asarray(raw0), n0, img)
    nv = int(nv)
    xd_b, f_b = bucketed(raw0, n0, img)
    assert len(xd_b) == nv
    np.testing.assert_allclose(np.asarray(xd_f)[:nv], xd_b, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_f)[:nv], f_b, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_oversized_fragment_falls_back_to_exact_pyramid(setup):
    """A fragment spanning more voxels than config.grid_extent must route to
    the binary-search pyramid and lose ZERO valid voxels (the dense grid
    would silently crop it — sparse/grid.py quantize_grid drops
    out-of-extent points)."""
    from imfnet_tpu.eval.extract import make_bucketed_extractor

    config, model, variables, pair, n_raw_pad, *_ = setup
    assert config.use_grid_maps
    bucketed = make_bucketed_extractor(
        model, variables, config=config,
        buckets=(1024, 2048, config.max_points))
    # stretch the cloud far beyond the static extent (96*0.025 = 2.4 m)
    wide = pair.xyz0 * 6.0
    assert not all(s <= e for s, e in zip(
        np.ptp(np.floor(wide / config.voxel_size), axis=0) + 1,
        config.grid_extent))
    raw0, n0 = pad_points(wide, n_raw_pad)
    img = jnp.zeros((1, 24, 32, 3), jnp.float32)
    xd_b, f_b = bucketed(raw0, n0, img)
    # exact voxel count of the stretched cloud (numpy oracle)
    v = np.unique(np.floor(wide / config.voxel_size).astype(np.int64), axis=0)
    assert len(xd_b) == len(v), (len(xd_b), len(v))
    assert np.isfinite(f_b).all()


def test_oversized_training_sample_fails_loudly():
    """The jitted train step cannot switch pyramids per batch, so an
    oversized sample must raise a clear error instead of silently cropping
    (collate_pairs grid_extent guard), and the loader must surface it."""
    from imfnet_tpu.data.collate import collate_pairs
    from imfnet_tpu.data.datasets import PairLoader, SyntheticPairDataset

    config = threedmatch_config(max_points=4096, grid_extent=(16, 16, 16))
    dset = SyntheticPairDataset("val", config, length=2, n_points=500)
    sample = dset[0]  # spans ~1.5 m / 0.025 m = 60 voxels >> 16
    with pytest.raises(RuntimeError, match="grid_extent"):
        collate_pairs([sample], config.max_points,
                      grid_extent=config.grid_extent)
    loader = PairLoader(dset, 1, config.max_points, shuffle=False,
                        grid_extent=config.grid_extent)
    with pytest.raises(RuntimeError, match="grid_extent"):
        list(loader)


def test_extent_bucket_selection():
    """Host-side extent-bucket policy: smallest fitting bucket wins,
    grid_extent stays the authoritative ceiling (buckets at/above it are
    ignored), and spans beyond grid_extent route to the exact path."""
    from imfnet_tpu.eval.extract import extent_buckets, pick_extent

    config = threedmatch_config(
        grid_extent=(96, 96, 96),
        grid_extent_buckets=((48, 48, 48), (128, 128, 128)))
    # the 128 bucket exceeds grid_extent and must be dropped
    assert extent_buckets(config) == [(48, 48, 48), (96, 96, 96)]

    vox = config.voxel_size
    small = np.random.RandomState(0).rand(100, 3).astype(np.float32) * (
        40 * vox)
    assert pick_extent(small, 100, vox, config) == (48, 48, 48)
    mid = small * 1.8          # ~72 cells: over 48, fits 96
    assert pick_extent(mid, 100, vox, config) == (96, 96, 96)
    wide = small * 3.0         # ~120 cells: beyond grid_extent
    assert pick_extent(wide, 100, vox, config) is None
    assert pick_extent(
        wide, 100, vox, config.replace(use_grid_maps=False)) is None


@pytest.mark.slow
def test_extractor_extent_buckets_match(setup):
    """Descriptors must be identical whichever extent bucket runs the
    pyramid: a small cloud extracted through a (64³, 96³)-bucketed config
    (picks 64³) must reproduce the single-96³-bucket output exactly."""
    from imfnet_tpu.eval.extract import make_extractor

    config, model, variables, pair, n_raw_pad, *_ = setup
    cfg_small = config.replace(grid_extent_buckets=((64, 64, 64),))
    cfg_one = config.replace(grid_extent_buckets=None)
    ex_small = make_extractor(model, variables, config=cfg_small,
                              n_pad=config.max_points)
    ex_one = make_extractor(model, variables, config=cfg_one,
                            n_pad=config.max_points)
    raw0, n0 = pad_points(pair.xyz0, n_raw_pad)
    # the synthetic pair spans ~57 cells: fits the 64-cell bucket
    from imfnet_tpu.eval.extract import pick_extent
    assert pick_extent(raw0, n0, config.voxel_size, cfg_small) == (64,) * 3
    img = jnp.zeros((1, 24, 32, 3), jnp.float32)
    xd_s, f_s, n_s = ex_small(jnp.asarray(raw0), n0, img)
    xd_o, f_o, n_o = ex_one(jnp.asarray(raw0), n0, img)
    assert int(n_s) == int(n_o)
    np.testing.assert_array_equal(np.asarray(xd_s), np.asarray(xd_o))
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_o),
                               rtol=1e-5, atol=1e-6)
