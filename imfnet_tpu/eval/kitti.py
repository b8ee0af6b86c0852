"""KITTI odometry evaluation: RANSAC success rate (RTE<2m, RRE<5°).

`scripts/evaluation_kitti.py:29-147` equivalent: dataloader-driven pair
evaluation — model forwards on both sides, feature-NN RANSAC (ransac_n=4,
distance threshold = voxel_size), success accounting and timing meters.
Failed dataset pairs (<1000 GT matches) are counted and skipped
(:66-70 / `lib/data_loaders.py:588`).
"""
from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.config import Config
from imfnet_tpu.eval.registration import make_pair_registration
from imfnet_tpu.train.step import forward_pair
from imfnet_tpu.utils.timer import AverageMeter, Timer


def evaluate_kitti(model, variables, config: Config, loader,
                   num_devices: int = 1) -> Dict:
    """loader yields PairBatch with batch_size 1 (random_rotation off).
    ``num_devices`` > 1 (0 = all devices) registers that many pairs
    concurrently over a device mesh — batch-of-pairs eval scaling
    (SURVEY.md §2.3), with identical per-pair math and RNG keys."""
    register = make_pair_registration(
        # the reference KITTI evaluator feeds the FULL voxelized clouds to
        # RANSAC (`evaluation_kitti.py:77-99`, no keypoint subsample);
        # num_keypoints = pad capacity makes the stratified sampler the
        # identity over every valid row
        num_keypoints=config.max_points,
        voxel_size=config.voxel_size,
        ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh,
        # KITTI RANSAC distance = voxel_size * 1.0 (evaluation_kitti.py:99),
        # unlike 3DMatch's * 1.5 (benchmark_util.py:17)
        distance_multiplier=1.0,
    )

    @jax.jit
    def eval_pair(params, batch_stats, batch, key):
        f0, f1, _ = forward_pair(
            model, params, batch_stats, batch, train=False, config=config,
        )
        return register(
            key, batch.xyz0, f0, batch.n0, batch.xyz1, f1, batch.n1,
            batch.T_gt[0], jnp.eye(6, dtype=jnp.float32),
        )

    rte_meter, rre_meter = AverageMeter(), AverageMeter()
    success_meter = AverageMeter()
    feat_timer, reg_timer = Timer(), Timer()

    def fail_count():
        # pairs the dataset rejected (<1000 GT matches) — PairLoader counts
        # them as it skips, mirroring `scripts/evaluation_kitti.py:66-70`
        return getattr(loader, "skip_count", 0)

    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def account(i, batch_T_gt, transformation):
        # registration returns the gt.log-convention estimate (maps 1→0,
        # `evaluation_3dmatch.py:182-187`); KITTI GT maps 0→1 — invert
        T_est = np.linalg.inv(np.asarray(transformation))
        T_gt = np.asarray(batch_T_gt)
        rte = np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])
        x = 0.5 * (np.trace(T_est[:3, :3].T @ T_gt[:3, :3]) - 1.0)
        rre = np.degrees(np.arccos(np.clip(x, -1, 1)))
        # success := RTE < 2 m ∧ RRE < 5° (`scripts/evaluation_kitti.py:120-131`)
        if rte < 2.0 and not np.isnan(rre) and rre < 5.0:
            success_meter.update(1)
            rte_meter.update(rte)
            rre_meter.update(rre)
        else:
            success_meter.update(0)
            logging.info("failed pair %d: rte=%.3f rre=%.3f", i, rte, rre)
        if (i + 1) % 10 == 0:
            logging.info(
                "pair %d: RTE %.3f, RRE %.3f, Success %.4f (%d skipped), "
                "feat t %.3f, reg t %.3f",
                i, rte_meter.avg, rre_meter.avg, success_meter.avg,
                fail_count(), feat_timer.avg, reg_timer.avg,
            )

    D = num_devices if num_devices else jax.device_count()
    if D > 1:
        from imfnet_tpu.parallel.dp import (make_parallel_kitti_eval,
                                            put_stacked, stack_batches)
        from imfnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(D)
        peval = make_parallel_kitti_eval(model, config, mesh, register)
        group, group_idx = [], []
        it = enumerate(loader)

        def flush():
            n_real = len(group)
            while len(group) < D:               # tail: pad + mask out
                group.append(group[0])
            feat_timer.tic()
            stacked = put_stacked(mesh, stack_batches(group))
            keys = put_stacked(mesh, jnp.stack(
                [jax.random.PRNGKey(group_idx[d] if d < n_real else 0)
                 for d in range(D)]))
            out = peval(params, batch_stats, stacked, keys)
            Ts = np.asarray(out["transformation"])
            feat_timer.toc()
            reg_timer.tic()
            for d in range(n_real):
                account(group_idx[d], np.asarray(group[d].T_gt)[0], Ts[d])
            reg_timer.toc()
            group.clear()
            group_idx.clear()

        for i, batch in it:
            group.append(batch)
            group_idx.append(i)
            if len(group) == D:
                flush()
        if group:
            flush()
    else:
        for i, batch in enumerate(loader):
            feat_timer.tic()
            out = eval_pair(params, batch_stats, batch, jax.random.PRNGKey(i))
            T = np.asarray(out["transformation"])
            feat_timer.toc()
            reg_timer.tic()
            account(i, np.asarray(batch.T_gt)[0], T)
            reg_timer.toc()

    result = {
        "rte": rte_meter.avg,
        "rre": rre_meter.avg,
        "success_rate": success_meter.avg,
        "num_pairs": success_meter.count,
        "failed_loads": fail_count(),
    }
    logging.info("KITTI eval: %s", result)
    return result
