#!/usr/bin/env python
"""Statistical power sweep: batched TPU RANSAC vs sequential o3d semantics.

VERDICT r2 item 4 / SURVEY §7 hard-part 3: the reference's o3d RANSAC runs
up to 50000 sequential sampling iterations but fully validates at most the
first 1000 checker-passing models (`scripts/benchmark_util.py:16-34`,
criteria (50000, 1000)).  Our `ransac_registration` replaces that with a
fixed 50000-hypothesis batch where EVERY hypothesis is subset-scored and the
block winners are exactly validated.  This script measures whether the two
have equivalent statistical power: success probability of pose recovery as
a function of the inlier ratio of the correspondence set.

For each inlier ratio in the sweep it runs N independent synthetic trials
(random rigid transform, C correspondences, fraction p inliers with 1 cm
noise, the rest uniform outliers) through both implementations and records
P(success) with success := RRE < 5 deg and RTE < 0.3 m (well below any
ambiguity in the synthetic geometry).  Output JSON goes to STATUS.md's
evidence section; the shortened regression version is
tests/test_match.py::test_ransac_statistical_power.

Usage: python scripts_dev/ransac_power.py [--trials 200] [--out ransac_power.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


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


def make_trial(rng, C, inlier_ratio, noise=0.01, box=4.0):
    T = random_rigid(rng)
    src = (rng.rand(C, 3) * box).astype(np.float32)
    dst = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    dst += rng.randn(C, 3).astype(np.float32) * noise
    n_out = C - int(round(C * inlier_ratio))
    out_rows = rng.choice(C, size=n_out, replace=False)
    lo, hi = dst.min(axis=0), dst.max(axis=0)
    dst[out_rows] = (lo + rng.rand(n_out, 3) * (hi - lo)).astype(np.float32)
    return T, src, dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--corres", type=int, nargs="+", default=[1000, 5000],
                    help="correspondence-set sizes; 5000 is the published "
                         "3DMatch eval shape (num_rand_keypoints)")
    ap.add_argument("--ratios", type=float, nargs="+",
                    default=[0.03, 0.05, 0.1, 0.2, 0.3, 0.5])
    ap.add_argument("--hypotheses", type=int, default=50000)
    ap.add_argument("--fit-iters", type=int, default=0,
                    help="0 = closed-form quartic eigensolver")
    ap.add_argument("--out", default="ransac_power.json")
    ap.add_argument("--timing-only", action="store_true",
                    help="skip the power-trial loop; record only the "
                         "on-device chained-loop wall clock per C (VERDICT "
                         "r4 item 7: run this once on the real TPU — the "
                         "power columns are platform-independent and stay "
                         "with the CPU sweep)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imfnet_tpu.match.ransac import ransac_registration
    from imfnet_tpu.match.metrics import registration_error
    from oracles import o3d_ransac_oracle

    thr = 0.025 * 1.5  # reference 3DMatch distance threshold

    def success(T_gt, T_est):
        rre, rte = registration_error(jnp.asarray(T_gt),
                                      jnp.asarray(np.asarray(T_est)))
        return bool(rre < 5.0) and bool(rte < 0.3)

    def run_ours(key, src, dst, valid):
        return ransac_registration(
            key, jnp.asarray(src), jnp.asarray(dst), valid, thr,
            ransac_n=3, num_hypotheses=args.hypotheses,
            fit_power_iters=args.fit_iters)

    table = []
    for C in args.corres:
        valid = jnp.ones(C, bool)
        # WARMUP: compile the (C,)-shaped program OUTSIDE the clock — the
        # round-3 sweep's 1352 ms first row was compile time amortized into
        # the per-trial column (VERDICT r3 weak item 5).
        T_w, src_w, dst_w = make_trial(np.random.RandomState(0), C, 0.5)
        res_w = run_ours(jax.random.PRNGKey(0), src_w, dst_w, valid)
        np.asarray(res_w.transformation)

        # on-device time: the jitted hypothesis program chained inside one
        # fori_loop (the bench methodology — host dispatch excluded)
        @jax.jit
        def dev_loop(src, dst):
            def body(i, c):
                r = run_ours(jax.random.fold_in(jax.random.PRNGKey(7), i),
                             src + c, dst, valid)
                return jnp.max(r.transformation) * jnp.float32(1e-20)
            return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))

        _ = float(dev_loop(jnp.asarray(src_w), jnp.asarray(dst_w)))
        t0 = time.perf_counter()
        _ = float(dev_loop(jnp.asarray(src_w), jnp.asarray(dst_w)))
        dev_ms = (time.perf_counter() - t0) / 20 * 1e3

        if args.timing_only:
            row = {"corres": C, "ours_device_ms": round(dev_ms, 2)}
            table.append(row)
            print(json.dumps(row), flush=True)
            continue

        for ratio in args.ratios:
            ours = oracle = 0
            t_ours = t_oracle = 0.0
            for trial in range(args.trials):
                rng = np.random.RandomState(1000 * int(ratio * 100) + trial)
                T, src, dst = make_trial(rng, C, ratio)
                t0 = time.perf_counter()
                res = run_ours(jax.random.PRNGKey(trial), src, dst, valid)
                ours += success(T, res.transformation)
                t_ours += time.perf_counter() - t0
                t0 = time.perf_counter()
                T_o, _ = o3d_ransac_oracle(rng, src.astype(np.float64),
                                           dst.astype(np.float64), thr,
                                           max_iteration=args.hypotheses)
                oracle += success(T, T_o)
                t_oracle += time.perf_counter() - t0
            row = {
                "corres": C,
                "inlier_ratio": ratio,
                "ours": ours / args.trials,
                "o3d_oracle": oracle / args.trials,
                "trials": args.trials,
                "ours_host_ms_per_trial": round(1000 * t_ours / args.trials, 2),
                "ours_device_ms": round(dev_ms, 2),
                "oracle_ms_per_trial": round(1000 * t_oracle / args.trials, 2),
            }
            table.append(row)
            print(json.dumps(row), flush=True)

    platform = jax.devices()[0].platform
    with open(args.out, "w") as f:
        json.dump({
            "criteria": [args.hypotheses, 1000],
            "corres": args.corres, "threshold": thr,
            "platform": platform,
            "timing_note": (
                "ours_host_ms_per_trial includes host dispatch + transfers "
                "(compile excluded by a per-shape warmup); ours_device_ms is "
                "the same program chained in one on-device fori_loop (the "
                "bench methodology) on the 'platform' backend — the POWER "
                "columns are platform-independent; for TPU wall-clock see "
                "the bench match stage. oracle_ms_per_trial is numpy host "
                "time for the sequential o3d-semantics oracle."),
            "table": table}, f, indent=2)
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
