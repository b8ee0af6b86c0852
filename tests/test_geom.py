"""geom utilities: PLY I/O, trajectory parsers, transforms, image resize."""
import os

import numpy as np
import pytest

from imfnet_tpu.geom.ply import read_ply, write_ply
from imfnet_tpu.geom.trajectory import (
    CameraPose,
    read_info_file,
    read_log,
    read_trajectory,
    write_trajectory,
)
from imfnet_tpu.geom.transforms import axis_angle_rotation, sample_random_trans
from imfnet_tpu.geom.image import process_image

REF_FILES = "/root/reference/files"


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(100, 3).astype(np.float32)
    cols = rng.rand(100, 3).astype(np.float64)
    path = str(tmp_path / "test.ply")
    write_ply(path, pts, colors=cols)
    d = read_ply(path)
    np.testing.assert_allclose(d["points"], pts, atol=1e-6)
    np.testing.assert_allclose(d["colors"], cols, atol=1 / 255.0)


@pytest.mark.skipif(not os.path.exists(REF_FILES), reason="reference not mounted")
def test_ply_reads_reference_sample():
    d = read_ply(os.path.join(REF_FILES, "cloud_bin_0.ply"))
    assert d["points"].shape[0] > 100000
    assert np.isfinite(d["points"]).all()


def test_trajectory_roundtrip(tmp_path, rng):
    poses = [CameraPose([0, 1, 60], rng.randn(4, 4)) for _ in range(3)]
    path = str(tmp_path / "gt.log")
    write_trajectory(poses, path)
    back = read_trajectory(path)
    assert len(back) == 3
    for a, b in zip(poses, back):
        assert a.metadata == b.metadata
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-9)
    # read_log contract
    logs = read_log(path)
    np.testing.assert_allclose(logs[1].pose, poses[1].pose, atol=1e-9)


def test_read_info_file(tmp_path, rng):
    cov = rng.randn(6, 6).astype(np.float32)
    with open(tmp_path / "gt.info", "w") as f:
        f.write("0 3 60\n")
        for row in cov:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    out = read_info_file(str(tmp_path / "gt.info"))
    assert out[0]["test_pair"] == [0, 3]
    np.testing.assert_allclose(out[0]["covariance"], cov, atol=1e-5)


def test_axis_angle_matches_expm(rng):
    from scipy.linalg import expm

    for _ in range(5):
        axis = rng.rand(3) - 0.5
        angle = rng.rand() * 2 * np.pi - np.pi
        R1 = axis_angle_rotation(axis, angle)
        R2 = expm(np.cross(np.eye(3), axis / np.linalg.norm(axis) * angle))
        np.testing.assert_allclose(R1, R2, atol=1e-10)


def test_sample_random_trans_centers(rng):
    pcd = rng.randn(50, 3) + 5.0
    T = sample_random_trans(pcd, rng)
    moved = pcd @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(moved.mean(0), 0.0, atol=1e-9)


def test_process_image_resize(rng):
    img = rng.rand(480, 640, 3).astype(np.float32)
    out = process_image(img, 120, 160)
    assert out.shape == (120, 160, 3)
    # identity when already right size
    out2 = process_image(out, 120, 160)
    np.testing.assert_array_equal(out, out2)
    # bilinear: constant image stays constant
    const = np.full((33, 47, 3), 0.25, np.float32)
    np.testing.assert_allclose(process_image(const, 120, 160), 0.25, atol=1e-6)


def test_chromatic_shift(rng):
    from imfnet_tpu.geom.transforms import ChromaticShift

    feats = np.zeros((10, 4), np.float32)
    t = ChromaticShift(sigma=0.5, p=1.0)
    _, out = t(rng, None, feats)
    # same shift applied to all rows, first 3 channels only
    assert (out[:, 3] == 0).all()
    assert np.allclose(out[:, :3], out[0, :3])
    assert np.abs(out[0, :3]).max() > 0
