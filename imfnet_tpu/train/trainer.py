"""High-level training orchestration.

The `AlignmentTrainer` equivalent (`lib/trainer.py:28-198`): builds the model
from config, runs epochs, validates every `val_epoch_freq`, tracks the best
validation metric (max for feat_match_ratio/success, min for rre/rte,
`lib/trainer.py:148-181`), writes `config.json` into the run dir, saves
per-epoch + best checkpoints with the metric value in the name, and resumes
full state. One Trainer class covers all four loss flavours (the loss is
selected inside the jitted step via config.trainer).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imfnet_tpu.config import Config
from imfnet_tpu.models import load_model
from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.kernel_map import build_pyramid
from imfnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from imfnet_tpu.train.state import TrainState, create_train_state, make_optimizer
from imfnet_tpu.train.step import PairBatch, level_capacities, make_train_step
from imfnet_tpu.train.validate import make_val_step
from imfnet_tpu.utils.timer import AverageMeter, Timer


class MetricsWriter:
    """JSONL scalar log (stands in for tensorboardX, `lib/trainer.py:101`).
    ``enabled=False`` (non-zero processes in multi-host runs) writes
    nothing."""

    def __init__(self, out_dir: str, enabled: bool = True):
        self._f = None
        if enabled:
            os.makedirs(out_dir, exist_ok=True)
            self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self._f is None:
            return
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()


def build_model_from_config(config: Config, compute_dtype=None,
                            eval_fast: bool = False):
    """eval_fast enables inference-only fast paths (occupancy conv1); the
    param structure is unchanged, so checkpoints are interchangeable."""
    import jax.numpy as jnp

    dt = compute_dtype or getattr(jnp, config.compute_dtype)
    kw = dict(
        in_channels=config.in_channels,
        out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum,
        compute_dtype=dt,
    )
    factory = load_model(config.model)
    if eval_fast and config.model.startswith("ResUNet") and config.in_channels == 1:
        kw["conv1_occupancy"] = True
    return factory(**kw)


class Trainer:
    _MAX_METRICS = ("feat_match_ratio", "success")
    _MIN_METRICS = ("rre", "rte")

    def __init__(
        self,
        config: Config,
        data_loader: Iterable,
        val_data_loader: Optional[Iterable] = None,
        steps_per_epoch: Optional[int] = None,
    ):
        self.config = config
        self.data_loader = data_loader
        self.val_data_loader = val_data_loader
        self.model = build_model_from_config(config)
        # data parallelism over the pair axis (new capability vs the
        # single-GPU reference `train_3DMatch.py:45-68`, SURVEY.md §2.3):
        # the Trainer consumes n_devices loader batches per optimizer step,
        # stacks them on a leading device axis, and runs the shard_map DP
        # step (grads/BN stats pmean'd over ICI). Checkpoints, validation,
        # and best-val gating are identical to single-device.
        self.n_devices = self._resolve_devices(steps_per_epoch)
        self.is_main = jax.process_index() == 0
        # the loader is PROCESS-LOCAL (multi-host shards it by batch groups,
        # datasets.make_data_loader), so optimizer steps/epoch divide by the
        # LOCAL devices consuming from it, not the global mesh size
        n_local = max(self.n_devices // jax.process_count(), 1)
        spe = ((steps_per_epoch or len(data_loader))
               // max(config.iter_size, 1) // n_local)
        self.tx = make_optimizer(config, max(spe, 1))
        self.mesh = None
        if self.n_devices > 1:
            from imfnet_tpu.parallel.dp import make_parallel_train_step
            from imfnet_tpu.parallel.mesh import make_mesh

            if config.iter_size > 1:
                raise NotImplementedError(
                    "iter_size gradient accumulation is not wired together "
                    "with data parallelism; use data_parallel=1 or "
                    "iter_size=1")
            self.mesh = make_mesh(self.n_devices)
            self.train_step = make_parallel_train_step(
                self.model, self.tx, config, self.mesh)
        else:
            self.train_step = jax.jit(
                make_train_step(self.model, self.tx, config))
        if config.iter_size > 1:
            from imfnet_tpu.train.step import make_accum_steps

            self.grad_step, self.apply_step = make_accum_steps(
                self.model, self.tx, config)
        self.val_step = make_val_step(self.model, config)

        self.best_val_metric = config.best_val_metric
        self.best_val = -np.inf if self.best_val_metric in self._MAX_METRICS else np.inf
        self.best_val_epoch = -1
        self.start_epoch = 1
        self.out_dir = config.out_dir
        if self.is_main:
            os.makedirs(self.out_dir, exist_ok=True)
            with open(os.path.join(self.out_dir, "config.json"), "w") as f:
                f.write(config.to_json())
        self.writer = MetricsWriter(self.out_dir, enabled=self.is_main)
        self.state: Optional[TrainState] = None
        self.key = jax.random.PRNGKey(config.seed)

    def _resolve_devices(self, steps_per_epoch: Optional[int]) -> int:
        """Mesh size from config.data_parallel: 0 = auto (every addressable
        device, clamped so ≥1 optimizer step per epoch survives), else the
        explicit count (validated)."""
        config = self.config
        avail = jax.device_count()
        n = config.data_parallel
        batches = steps_per_epoch or len(self.data_loader)
        if n == 0:
            # feasibility: each process must feed its local share of the
            # mesh from its (sharded) loader at least once per epoch
            feed = (batches // max(config.iter_size, 1)) * jax.process_count()
            n = max(min(avail, feed), 1)
            if n > 1 and config.iter_size > 1:
                n = 1  # accumulation not wired with DP; auto falls back
        if n > avail:
            raise ValueError(
                f"config.data_parallel={n} but only {avail} devices are "
                f"addressable")
        if jax.process_count() > 1 and n != avail:
            raise ValueError(
                f"multi-process training requires the mesh to cover every "
                f"device: data_parallel={n} != global device count {avail} "
                f"(use --num-devices 0 for auto)")
        # ``batches`` counts the PROCESS-LOCAL loader (multi-host loaders are
        # sharded by batch groups), so starvation is judged against the
        # devices this process feeds
        n_local = max(n // jax.process_count(), 1)
        if batches // max(config.iter_size, 1) // n_local == 0:
            raise ValueError(
                f"loader yields {batches} batches per epoch but "
                f"data_parallel={n} × iter_size={config.iter_size} consumes "
                f"more; no optimizer step would run")
        return n

    # -- state init ---------------------------------------------------------
    def init_state(self, example_batch: PairBatch) -> TrainState:
        sv = SparseVoxels(example_batch.coords0, example_batch.feats0, example_batch.n0)
        pyr = build_pyramid(
            example_batch.coords0, example_batch.n0,
            conv1_kernel_size=self.config.conv1_kernel_size,
            level_capacity=level_capacities(example_batch.coords0.shape[0]),
        )
        variables = self.model.init(
            jax.random.PRNGKey(self.config.seed), sv, pyr, example_batch.image0,
            train=False,
        )
        self.state = create_train_state(variables, self.tx)
        if self.config.resume:
            self.state, meta = load_checkpoint(self.config.resume, self.state)
            self.start_epoch = meta["epoch"]
            self.best_val = meta.get("best_val", self.best_val)
            self.best_val_epoch = meta.get("best_val_epoch", -1)
            self.best_val_metric = meta.get("best_val_metric", self.best_val_metric)
            logging.info("resumed from %s at epoch %d", self.config.resume, self.start_epoch)
        if self.mesh is not None:
            from imfnet_tpu.parallel.dp import replicate

            self.state = replicate(self.mesh, self.state)
        return self.state

    # -- epochs -------------------------------------------------------------
    def train(self):
        config = self.config
        if self.val_data_loader is not None and config.test_valid:
            val = self._valid_epoch()
            for k, v in val.items():
                self.writer.add_scalar(f"val/{k}", v, 0)

        for epoch in range(self.start_epoch, config.max_epoch + 1):
            self._train_epoch(epoch)
            if self.val_data_loader is not None and epoch % config.val_epoch_freq == 0:
                val = self._valid_epoch()
                for k, v in val.items():
                    self.writer.add_scalar(f"val/{k}", v, epoch)
                self._save(epoch, val, "checkpoint")
                cur = val[self.best_val_metric]
                better = (
                    cur > self.best_val
                    if self.best_val_metric in self._MAX_METRICS
                    else cur < self.best_val
                )
                if better:
                    logging.info("new best %s=%.4f at epoch %d",
                                 self.best_val_metric, cur, epoch)
                    self.best_val, self.best_val_epoch = cur, epoch
                    self._save(epoch, val, "best_val_checkpoint")

    def _train_epoch(self, epoch: int):
        config = self.config
        total_timer, data_timer = Timer(), Timer()
        loss_meter = AverageMeter()
        it = iter(self.data_loader)
        # iter_size gradient accumulation: n_iter optimizer steps consume
        # n_iter*iter_size loader batches (`lib/trainer.py:252-307` semantics);
        # data parallelism consumes n_devices loader batches per step instead
        # (each device gets a full PairBatch, grads pmean'd — parallel/dp.py)
        n_local = self.n_devices // jax.process_count()
        n_iter = len(self.data_loader) // max(config.iter_size, 1) // n_local
        if n_iter == 0:
            raise ValueError(
                f"loader yields {len(self.data_loader)} batches per epoch but "
                f"iter_size={config.iter_size} x data_parallel={self.n_devices}"
                f"; no optimizer step would run — "
                f"lower them or grow the dataset/batch split")
        for curr_iter in range(n_iter):
            total_timer.tic()
            data_timer.tic()
            if self.mesh is not None:
                batches = [next(it)]
                data_timer.toc()
                for _ in range(n_local - 1):
                    data_timer.tic()
                    batches.append(next(it))
                    data_timer.toc()
            else:
                batch = next(it)
                data_timer.toc()
            self.key, sub = jax.random.split(self.key)
            if self.mesh is not None:
                from imfnet_tpu.parallel.dp import put_stacked, stack_batches

                multiproc = jax.process_count() > 1
                stacked = put_stacked(self.mesh, stack_batches(batches),
                                      process_local=multiproc)
                keys = put_stacked(
                    self.mesh,
                    jnp.broadcast_to(sub, (n_local,) + sub.shape),
                    process_local=multiproc)
                self.state, metrics = self.train_step(self.state, stacked,
                                                      keys)
            elif config.iter_size > 1:
                grads = jax.tree_util.tree_map(
                    jnp.zeros_like, self.state.params)
                stats = self.state.batch_stats
                # metrics stay device arrays per micro-step (a float() here
                # would sync and serialize the accumulation pipeline); one
                # conversion per group below
                group = {}
                for micro in range(config.iter_size):
                    if micro > 0:
                        data_timer.tic()
                        batch = next(it)
                        data_timer.toc()
                        self.key, sub = jax.random.split(self.key)
                    grads, metrics, stats = self.grad_step(
                        self.state.params, stats, batch, sub, grads)
                    for k, v in metrics.items():
                        group[k] = group.get(k, 0.0) + v
                self.state = self.apply_step(self.state, grads, stats)
                metrics = {k: float(v) / config.iter_size
                           for k, v in group.items()}
            else:
                self.state, metrics = self.train_step(self.state, batch, sub)
            loss = float(metrics["loss"])
            loss_meter.update(loss)
            total_timer.toc()
            if curr_iter % config.stat_freq == 0:
                step = (epoch - 1) * n_iter + curr_iter
                for k, v in metrics.items():
                    self.writer.add_scalar(f"train/{k}", float(v), step)
                logging.info(
                    "Train Epoch: %d [%d/%d], Loss: %.3e  Data t: %.4f, Iter t: %.4f",
                    epoch, curr_iter, n_iter, loss, data_timer.avg, total_timer.avg,
                )

    def _valid_epoch(self):
        config = self.config
        meters = {k: AverageMeter() for k in
                  ("loss", "rre", "rte", "success", "hit_ratio",
                   "feat_match_ratio", "corr_inliers", "irls_resid_med",
                   "irls_resid_inlier")}
        tot = len(self.val_data_loader)
        if config.val_max_iter > 0:
            tot = min(config.val_max_iter, tot)
        # under a mesh, params are replicated global arrays; materialize host
        # copies once so the single-device val jit is free to place them
        params, stats = self.state.params, self.state.batch_stats
        if self.mesh is not None:
            params = jax.device_get(params)
            stats = jax.device_get(stats)
        it = iter(self.val_data_loader)
        for i in range(tot):
            batch = next(it)
            out = self.val_step(params, stats, batch, jax.random.PRNGKey(i))
            out = {k: float(v) for k, v in out.items()}
            if not np.isnan(out["rre"]):
                meters["rre"].update(out["rre"])
            for k in ("loss", "rte", "success", "hit_ratio",
                      "feat_match_ratio", "corr_inliers", "irls_resid_med",
                      "irls_resid_inlier"):
                if k in out and not np.isnan(out[k]):
                    meters[k].update(out[k])
        result = {k: m.avg for k, m in meters.items()}
        logging.info(
            "Validation: loss %.3f rte %.3f rre %.3f success %.3f "
            "hit_ratio %.3f fmr %.3f",
            result["loss"], result["rte"], result["rre"], result["success"],
            result["hit_ratio"], result["feat_match_ratio"],
        )
        return result

    def _save(self, epoch, val, name):
        if not self.is_main:
            return  # multi-host: params are replicated; process 0 writes
        save_checkpoint(
            self.out_dir, name, self.state, self.config, epoch,
            self.best_val, self.best_val_epoch, self.best_val_metric,
            val_value=val[self.best_val_metric],
        )
