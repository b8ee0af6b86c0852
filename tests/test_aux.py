"""Auxiliary parity components: checkpoint key migration, recall curve,
point→image projection."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from imfnet_tpu.geom.image import (
    crop_around_pixel,
    fragment_image_crop,
    point_to_pixel,
    project_points,
)


def test_project_points_pinhole():
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]])
    uv = project_points(pts, K)
    np.testing.assert_allclose(uv[0], [50, 40])
    np.testing.assert_allclose(uv[1], [abs(0.1 * 100 / 2 + 50), abs(-0.2 * 100 / 2 + 40)])


def test_crop_wraps_and_tiles(rng):
    img = rng.rand(10, 12, 3).astype(np.float32)
    c = crop_around_pixel(img, u=1, v=1, size=6)
    assert c.shape == (6, 6, 3)
    # center pixel of the crop is the requested pixel
    np.testing.assert_array_equal(c[3, 3], img[1, 1])
    # wrap: row index v-3 = -2 → 8
    np.testing.assert_array_equal(c[0, 3], img[8, 1])
    # tiling when crop larger than image
    big = crop_around_pixel(img, 0, 0, 24)
    assert big.shape == (24, 24, 3)


def test_fragment_image_crop_center(rng):
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    img = rng.rand(24, 32, 3).astype(np.float32)
    pts = rng.rand(100, 3).astype(np.float64) + np.array([0, 0, 2.0])
    crop = fragment_image_crop(pts, np.eye(4), K, img, size=8)
    assert crop.shape == (8, 8, 3)


def test_checkpoint_key_migration(tmp_path, rng):
    from flax import serialization
    from imfnet_tpu.train.checkpoint import migrate_checkpoint_keys

    tree = {
        "params": {
            "perceiver_io": {"w": np.ones((2, 2), np.float32)},
            "conv1": {"kernel": np.zeros((3,), np.float32)},
        },
        "step": np.int32(7),
    }
    src = tmp_path / "ckpt"
    os.makedirs(src)
    with open(src / "state.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(tree))
    with open(src / "meta.json", "w") as f:
        json.dump({"epoch": 1}, f)

    dst = tmp_path / "out"
    moved = migrate_checkpoint_keys(
        str(src), str(dst),
        {"params/perceiver_io": "params/attention_fusion"},
    )
    assert moved == 1
    with open(dst / "state.msgpack", "rb") as f:
        new = serialization.msgpack_restore(f.read())
    assert "attention_fusion" in new["params"]
    assert "perceiver_io" not in new["params"]
    np.testing.assert_array_equal(
        new["params"]["attention_fusion"]["w"], tree["params"]["perceiver_io"]["w"])
    np.testing.assert_array_equal(new["params"]["conv1"]["kernel"],
                                  tree["params"]["conv1"]["kernel"])
    assert int(new["step"]) == 7


def test_recall_curve_artifacts(tmp_path):
    from imfnet_tpu.eval.threedmatch import plot_recall_curve

    payloads = [{
        "register_results": [
            {"inlier_ratio": 0.3}, {"inlier_ratio": 0.04}, {"inlier_ratio": 0.5},
        ],
        "scene_name": "s", "seq_name": "seq-01", "num_pairs": 3,
    }]
    out = plot_recall_curve(payloads, str(tmp_path), "TEST")
    assert os.path.exists(out)
    csv = tmp_path / "TEST-recall-curve.csv"
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "tau2,recall"
    # at tau2=0.05: 2 of 3 pairs above
    row = dict(l.split(",") for l in lines[1:])
    assert abs(float(row["0.05"]) - 2 / 3) < 1e-6


def test_meter_weighted_welford():
    """Meter.add(value, weight) is the O(1) closed form: statistics match
    feeding the value `weight` times, at any weight (the reference's
    `AverageMeter.update(val, n)` path, `lib/timer.py:34-41`)."""
    from imfnet_tpu.utils.timer import AverageMeter, Meter

    rng = np.random.RandomState(0)
    vals = rng.randn(20)
    weights = rng.randint(1, 10_000, size=20)
    m = Meter()
    for v, w in zip(vals, weights):
        m.add(v, weight=int(w))
    flat = np.repeat(vals, weights)
    assert m.count == int(weights.sum())
    assert m.mean == pytest.approx(flat.mean(), rel=1e-10)
    assert m.var == pytest.approx(flat.var(), rel=1e-9)
    assert m.min == pytest.approx(flat.min())
    assert m.max == pytest.approx(flat.max())
    # large-n update is O(1), not O(n): must return instantly
    big = AverageMeter()
    big.update(3.0, n=10**9)
    big.update(5.0, n=10**9)
    assert big.avg == pytest.approx(4.0)
    # zero/negative weight is a no-op
    before = (m.count, m.mean, m.var)
    m.add(123.0, weight=0)
    assert (m.count, m.mean, m.var) == before


def test_resolve_benchmark_dir(tmp_path):
    """--benchmark selects <root>/<benchmark> (`evaluation_3dmatch.py:272`),
    accepts an already-resolved dir, and refuses a mislabeling mismatch."""
    from imfnet_tpu.eval.threedmatch import resolve_benchmark_dir

    root = tmp_path / "benchmarks"
    (root / "3DMatch").mkdir(parents=True)
    (root / "3DLoMatch").mkdir()
    assert resolve_benchmark_dir(str(root), "3DLoMatch") == \
        str(root / "3DLoMatch")
    assert resolve_benchmark_dir(str(root / "3DMatch"), "3DMatch") == \
        str(root / "3DMatch")
    # no flag -> pass-through (label inferred by the caller)
    assert resolve_benchmark_dir(str(root / "3DMatch"), None) == \
        str(root / "3DMatch")
    with pytest.raises(ValueError):
        resolve_benchmark_dir(str(root / "3DMatch"), "3DLoMatch")
