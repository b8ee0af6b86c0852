"""End-to-end 3DMatch benchmark evaluation on a synthetic fixture.

Builds a fake scene (3 fragments with known rigid relations, descriptors
constructed so matched points share features), writes gt.log/gt.info and
descriptor .npz files in the reference's artifact formats, and runs the full
evaluate() loop — gt parsing → keypoints → NN → RANSAC → RR/RRE/RTE/IR →
CSV/JSON/recall-curve artifacts (`scripts/evaluation_3dmatch.py:501-553`
semantics). Pins the evaluator's end-to-end behavior, which unit tests of
the pieces cannot (a pose-attribute mismatch between trajectory I/O and the
evaluator was only caught here).
"""
import os
import os.path as osp

import numpy as np
import pytest

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.threedmatch import evaluate
from imfnet_tpu.geom.transforms import sample_random_trans


@pytest.mark.parametrize("seed", [3])
def test_evaluate_synthetic_benchmark(tmp_path, seed):
    rng = np.random.RandomState(seed)
    scene = "synthetic-scene"
    seq = "seq-01"
    n_pts, n_desc = 600, 16

    # fragment 0 in world frame; fragments 1, 2 are rigid transforms of
    # overlapping point sets
    base = rng.rand(n_pts * 2, 3).astype(np.float32) * 2.0
    frag_world = [base[:n_pts], base[n_pts // 2: n_pts // 2 + n_pts],
                  base[n_pts:]]
    descs_world = rng.randn(n_pts * 2, n_desc).astype(np.float32)
    descs_world /= np.linalg.norm(descs_world, axis=1, keepdims=True)
    frag_desc = [descs_world[:n_pts],
                 descs_world[n_pts // 2: n_pts // 2 + n_pts],
                 descs_world[n_pts:]]

    desc_root = tmp_path / "descs"
    bench_dir = tmp_path / "benchmarks"
    out_root = tmp_path / "out"
    scene_desc = desc_root / scene / seq
    scene_bench = bench_dir / scene
    os.makedirs(scene_desc)
    os.makedirs(scene_bench)

    # per-fragment local frames: fragment k stored as T_k^-1 @ world
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(2):
        poses.append(sample_random_trans(base, rng).astype(np.float32))
    for k in range(3):
        inv = np.linalg.inv(poses[k])
        local = frag_world[k] @ inv[:3, :3].T + inv[:3, 3]
        np.savez_compressed(
            scene_desc / f"cloud_bin_{k}.npz",
            points=local, xyz=local, feature=frag_desc[k])

    # gt.log / gt.info for pairs (0,1) and (1,2): gt maps frame j → frame i
    pairs = [(0, 1), (1, 2)]
    with open(scene_bench / "gt.log", "w") as flog, \
         open(scene_bench / "gt.info", "w") as finfo:
        for i, j in pairs:
            T = np.linalg.inv(poses[i]) @ poses[j]
            flog.write(f"{i} {j} 3\n")
            for r in range(4):
                flog.write("\t".join(f"{v:.12f}" for v in T[r]) + "\n")
            finfo.write(f"{i} {j} 3\n")
            cov = np.eye(6) * 400.0   # tight acceptance scale
            for r in range(6):
                finfo.write("\t".join(f"{v:.6f}" for v in cov[r]) + "\n")

    config = threedmatch_config(
        num_rand_keypoints=256, ransac_max_iteration=4096, ransac_n=3)
    summary = evaluate(
        config, str(desc_root), str(out_root), str(bench_dir),
        desc_type="TEST", scenes=[scene], seq_name=seq)

    # identical descriptors on shared points → near-perfect matching
    assert summary["num_pairs"] == 2
    assert summary["registration_recall"] == 1.0
    assert summary["FMR"][0] == 1.0             # τ2 = 0.05
    assert summary["inlier_ratio"] > 0.4
    assert summary["RRE"] < 2.0 and summary["RTE"] < 0.1
    # artifact contracts
    assert osp.exists(out_root / "TEST-summary.json")
    assert osp.exists(out_root / f"TEST-metrics-{config.inlier_thresh:.2f}.csv")
    assert osp.exists(out_root / "TEST-recall-curve.csv")
    assert osp.exists(out_root / "TEST" /
                      f"{scene}-{seq}-{config.inlier_thresh:.2f}.txt")
