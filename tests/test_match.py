"""Tests for the matching/registration subsystem against closed forms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imfnet_tpu.match import (
    blocked_nn,
    mutual_nn,
    radius_match,
    kabsch_umeyama,
    ransac_registration,
    est_rigid_irls,
    icp_point_to_point,
)
from imfnet_tpu.match.metrics import (
    apply_transform,
    registration_error,
    transform_error,
    inlier_ratio,
    hit_ratio,
)
from imfnet_tpu.match.procrustes import rotmat_to_quat, quat_to_rotmat


def random_rigid(rng, max_angle=np.pi):
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rng.rand() * max_angle
    K = np.cross(np.eye(3), axis)
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3)
    return T.astype(np.float32)


def test_blocked_nn_exact(rng):
    q = rng.randn(137, 8).astype(np.float32)
    r = rng.randn(259, 8).astype(np.float32)
    idx = np.asarray(blocked_nn(jnp.asarray(q), jnp.asarray(r), block=64))
    d = ((q[:, None] - r[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(1))


def test_blocked_nn_respects_validity(rng):
    q = rng.randn(20, 4).astype(np.float32)
    r = rng.randn(50, 4).astype(np.float32)
    valid = np.arange(50) < 30
    idx = np.asarray(blocked_nn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid), block=16))
    d = ((q[:, None] - r[None, :30]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(1))


def test_mutual_nn(rng):
    f0 = rng.randn(40, 6).astype(np.float32)
    f1 = rng.randn(55, 6).astype(np.float32)
    nn01, mutual = mutual_nn(jnp.asarray(f0), jnp.asarray(f1))
    nn01, mutual = np.asarray(nn01), np.asarray(mutual)
    d01 = ((f0[:, None] - f1[None]) ** 2).sum(-1)
    e01 = d01.argmin(1)
    e10 = d01.argmin(0)
    np.testing.assert_array_equal(nn01, e01)
    np.testing.assert_array_equal(mutual, e10[e01] == np.arange(40))


def test_quat_roundtrip(rng):
    for _ in range(20):
        T = random_rigid(rng)
        q = np.asarray(rotmat_to_quat(jnp.asarray(T[:3, :3])))
        R2 = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, T[:3, :3], atol=1e-5)


def test_kabsch_recovers_rigid(rng):
    T = random_rigid(rng)
    src = rng.randn(50, 3).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    Te = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Te, T, atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    T = random_rigid(rng)
    src = rng.randn(60, 3).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    dst[40:] += rng.randn(20, 3) * 5  # corrupt
    w = np.concatenate([np.ones(40), np.zeros(20)]).astype(np.float32)
    Te = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(Te, T, atol=1e-4)


def test_kabsch_batched(rng):
    src = rng.randn(8, 3, 3).astype(np.float32)
    Ts = np.stack([random_rigid(rng) for _ in range(8)])
    dst = np.einsum("bij,bnj->bni", Ts[:, :3, :3], src) + Ts[:, None, :3, 3]
    Te = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(Te, Ts, atol=1e-3)


def test_kabsch_closed_form_matches_eigh(rng):
    """power_iters=0 (closed-form quartic eigensolver) must align noisy
    3-point samples — the RANSAC hypothesis-fit regime where the shifted
    power method needed 24 iterations — as well as an exact dense eigh:
    identical alignment residual up to f32 conditioning."""
    batch = 512
    src = rng.randn(batch, 3, 3).astype(np.float32)
    Ts = np.stack([random_rigid(rng) for _ in range(batch)])
    dst = (np.einsum("bij,bnj->bni", Ts[:, :3, :3], src)
           + Ts[:, None, :3, 3]).astype(np.float32)
    dst += rng.randn(*dst.shape).astype(np.float32) * 0.05
    # some near-degenerate (near-collinear) samples — the hard regime
    src[: batch // 4, 2] = (src[: batch // 4, 0]
                            + 1e-3 * rng.randn(batch // 4, 3))
    dst[: batch // 4, 2] = (dst[: batch // 4, 0]
                            + 1e-3 * rng.randn(batch // 4, 3))

    Tc = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst),
                                   power_iters=0))

    def resid(T):
        m = np.einsum("bij,bnj->bni", T[:, :3, :3], src) + T[:, None, :3, 3]
        return np.sqrt(((m - dst) ** 2).sum(-1).mean(-1))

    # exact-SVD Kabsch oracle (float64)
    ms = src.mean(1, keepdims=True).astype(np.float64)
    md = dst.mean(1, keepdims=True).astype(np.float64)
    H = np.einsum("bni,bnj->bij", src - ms, dst - md)
    U, _, Vt = np.linalg.svd(H)
    V, Ut = np.transpose(Vt, (0, 2, 1)), np.transpose(U, (0, 2, 1))
    det = np.linalg.det(np.einsum("bij,bjk->bik", V, Ut))
    S = np.tile(np.eye(3), (batch, 1, 1))
    S[:, 2, 2] = det
    Ro = np.einsum("bij,bjk,bkl->bil", V, S, Ut)
    To = np.tile(np.eye(4), (batch, 1, 1))
    To[:, :3, :3] = Ro
    To[:, :3, 3] = md[:, 0] - np.einsum("bij,bj->bi", Ro, ms[:, 0])
    rc, ro = resid(Tc), resid(To)
    # closed form must match the exact solver's residual everywhere
    assert np.max(rc - ro) < 5e-3, float(np.max(rc - ro))
    assert np.mean(rc) <= np.mean(ro) * 1.02 + 1e-6


def test_kabsch_closed_form_degenerate_eigengap(rng):
    """Exactly collinear point sets make Horn's K have a REPEATED dominant
    eigenvalue (rotation about the line axis is free), which collapses
    adj(K - λI) to ~0 — the regime ADVICE r3 flagged: without a guard the
    quaternion comes from a noise row and R≈I regardless of the data. The
    guard must still return SOME optimal rotation: alignment residual on
    the line must match the exact float64 SVD Kabsch."""
    batch = 64
    axis = rng.randn(batch, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ts = rng.randn(batch, 5).astype(np.float32)
    src = ts[..., None] * axis[:, None, :]           # collinear points
    Ts = np.stack([random_rigid(rng) for _ in range(batch)])
    dst = (np.einsum("bij,bnj->bni", Ts[:, :3, :3], src)
           + Ts[:, None, :3, 3]).astype(np.float32)

    Tc = np.asarray(kabsch_umeyama(jnp.asarray(src), jnp.asarray(dst),
                                   power_iters=0))
    R = Tc[:, :3, :3]
    # valid rotations
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.tile(np.eye(3), (batch, 1, 1)),
        atol=1e-3)
    mapped = np.einsum("bij,bnj->bni", R, src) + Tc[:, None, :3, 3]
    resid = np.sqrt(((mapped - dst) ** 2).sum(-1)).max()
    assert resid < 1e-2, float(resid)


def test_ransac_recovers_pose_with_outliers(rng):
    T = random_rigid(rng)
    n = 500
    src = (rng.rand(n, 3) * 4).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    n_out = 300
    dst[:n_out] = rng.rand(n_out, 3) * 4  # 60% outliers
    valid = np.ones(n, bool)
    res = ransac_registration(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(valid), 0.0375, ransac_n=3, num_hypotheses=4096,
        hypo_block=512,
    )
    rre, rte = registration_error(jnp.asarray(T), res.transformation)
    assert float(rre) < 1.0 and float(rte) < 0.05, (float(rre), float(rte))
    assert float(res.fitness) > 0.3


def test_irls_recovers_pose(rng):
    T = random_rigid(rng, max_angle=0.5)
    src = rng.randn(200, 3).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3] + rng.randn(200, 3).astype(np.float32) * 0.001
    Te = np.asarray(est_rigid_irls(jnp.asarray(src), jnp.asarray(dst)))
    rre, rte = registration_error(jnp.asarray(T), jnp.asarray(Te))
    assert float(rre) < 0.5 and float(rte) < 0.02


def test_icp_refines_pose(rng):
    T = random_rigid(rng, max_angle=0.2)
    src = (rng.rand(300, 3) * 2).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = T[:3, 3] + 0.05
    # perturb rotation slightly
    Te = np.asarray(
        icp_point_to_point(
            jnp.asarray(src), jnp.asarray(dst),
            jnp.ones(300, bool), jnp.ones(300, bool),
            jnp.asarray(init), 0.5, iters=30, block=128,
        )
    )
    rre, rte = registration_error(jnp.asarray(T), jnp.asarray(Te))
    assert float(rre) < 0.5 and float(rte) < 0.01


def test_transform_error_zero_for_exact(rng):
    T = random_rigid(rng)
    cov = np.eye(6, dtype=np.float32) * 2.0
    p = float(transform_error(jnp.asarray(T), jnp.asarray(cov), jnp.asarray(T)))
    assert p < 1e-8
    # a perturbed pose must give a positive error
    T2 = T.copy()
    T2[:3, 3] += 0.5
    p2 = float(transform_error(jnp.asarray(T), jnp.asarray(cov), jnp.asarray(T2)))
    assert p2 > 0.1


def test_radius_match(rng):
    T = np.eye(4, dtype=np.float32)
    xyz1 = (rng.rand(100, 3) * 2).astype(np.float32)
    xyz0 = xyz1 + rng.randn(100, 3).astype(np.float32) * 0.01
    idx, ok = radius_match(
        jnp.asarray(xyz0), jnp.asarray(xyz1),
        jnp.ones(100, bool), jnp.ones(100, bool), 0.05, block=32,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.mean() > 0.9
    d = np.linalg.norm(xyz0 - xyz1[idx], axis=1)
    assert (d[ok] <= 0.05).all()


def test_hit_and_inlier_ratio(rng):
    T = random_rigid(rng)
    xyz0 = rng.randn(100, 3).astype(np.float32)
    xyz1 = xyz0 @ T[:3, :3].T + T[:3, 3]
    assert float(hit_ratio(jnp.asarray(xyz0), jnp.asarray(xyz1), jnp.asarray(T))) > 0.99
    ir = inlier_ratio(jnp.asarray(xyz1), jnp.asarray(xyz0), jnp.asarray(T))
    assert float(ir) > 0.99


@pytest.mark.slow
def test_ransac_statistical_power(rng):
    """VERDICT r2 item 4 / SURVEY §7 hard-part 3: the fixed-hypothesis-batch
    RANSAC must match the sequential o3d (50000, 1000) criteria's success
    probability at every inlier ratio. Shortened version of
    scripts_dev/ransac_power.py (full 200-trial sweep recorded in
    ransac_power_r03.json); the oracle implements o3d 0.12's sample →
    checkers → capped-validation flow (`scripts/benchmark_util.py:16-34`).
    Also a regression test for the power-iteration Kabsch: at 10 power
    iters the 3-point hypothesis fit lost half the good samples."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                      "scripts_dev"))
    from ransac_power import make_trial
    from oracles import o3d_ransac_oracle

    thr = 0.0375
    C, hyp, trials = 600, 12000, 40
    valid = jnp.ones(C, bool)
    for ratio in (0.05, 0.15):
        ours = oracle = 0
        for trial in range(trials):
            trng = np.random.RandomState(7000 + trial)
            T, src, dst = make_trial(trng, C, ratio)
            res = ransac_registration(
                jax.random.PRNGKey(trial), jnp.asarray(src), jnp.asarray(dst),
                valid, thr, ransac_n=3, num_hypotheses=hyp, hypo_block=4000)
            rre, rte = registration_error(jnp.asarray(T), res.transformation)
            ours += bool(rre < 5.0) and bool(rte < 0.3)
            T_o, _ = o3d_ransac_oracle(trng, src.astype(np.float64),
                                       dst.astype(np.float64), thr,
                                       max_iteration=hyp)
            rre, rte = registration_error(jnp.asarray(T), jnp.asarray(T_o))
            oracle += bool(rre < 5.0) and bool(rte < 0.3)
        # >= oracle power minus the ~2-sigma binomial margin at 40 trials
        assert ours >= oracle - 6, (ratio, ours, oracle)
