"""Native host library vs numpy reference."""
import numpy as np
import pytest

from imfnet_tpu.utils import native


def numpy_dedup(xyz, voxel):
    v = np.floor(xyz / voxel).astype(np.int32)
    _, sel = np.unique(v, axis=0, return_index=True)
    sel = np.sort(sel)
    return v[sel], sel


def test_native_builds():
    assert native.have_native(), "native library failed to build"


def test_voxel_dedup_matches_numpy(rng):
    xyz = (rng.rand(5000, 3).astype(np.float32) - 0.5) * 4
    coords_n, sel_n = native.voxel_dedup(xyz, 0.1)
    coords_e, sel_e = numpy_dedup(xyz, 0.1)
    assert len(sel_n) == len(sel_e)
    np.testing.assert_array_equal(np.sort(sel_n), np.sort(sel_e))
    # first-occurrence per voxel
    mn = {tuple(c): s for c, s in zip(coords_n, sel_n)}
    me = {tuple(c): s for c, s in zip(coords_e, sel_e)}
    assert mn == me
    # input-order output
    assert (np.diff(sel_n) > 0).all()


def test_voxel_dedup_negative_coords(rng):
    xyz = rng.randn(2000, 3).astype(np.float32) * 3 - 5
    coords_n, sel_n = native.voxel_dedup(xyz, 0.25)
    coords_e, sel_e = numpy_dedup(xyz, 0.25)
    np.testing.assert_array_equal(sel_n, sel_e)
    np.testing.assert_array_equal(coords_n, coords_e)


def test_count_within_radius(rng):
    src = rng.rand(500, 3).astype(np.float32)
    dst = src + rng.randn(500, 3).astype(np.float32) * 0.002
    c = native.count_within_radius(src, dst, 0.05)
    from scipy.spatial import cKDTree

    dd, _ = cKDTree(dst).query(src, k=1)
    assert c == int((dd <= 0.05).sum())
