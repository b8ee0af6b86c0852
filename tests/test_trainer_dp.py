"""User-reachable data-parallel training (VERDICT r4 item 1).

The Trainer builds a mesh from config.data_parallel and routes through the
shard_map DP step; these tests drive that wiring end-to-end on the
8-virtual-device CPU mesh (conftest):

- `cli train --num-devices 8` runs a full epoch loop, validates, and writes
  checkpoints exactly like single-device.
- A mesh Trainer's params match, step for step, a Trainer whose step is the
  SEQUENTIAL definition of the DP semantics (make_emulated_dp_step: same
  per-device fold_in RNG, mean of grads/BN stats == pmean, one optimizer
  step) — proving the shard_map path computes its specification.
- PairLoader batch-group sharding partitions an epoch exactly (multi-host
  feeding contract).
"""
import glob
import os

import numpy as np
import pytest
import jax

from imfnet_tpu.config import threedmatch_config


def _dp_config(out_dir, **kw):
    base = dict(
        dataset="SyntheticPairDataset",
        synthetic_length=16,
        synthetic_n_points=400,
        batch_size=1,
        max_points=1024,
        voxel_size=0.05,
        conv1_kernel_size=3,
        model_n_out=16,
        num_pos_per_batch=64,
        num_hn_samples_per_batch=32,
        compute_dtype="float32",
        data_parallel=8,
        max_epoch=1,
        out_dir=out_dir,
        use_random_rotation=False,
    )
    base.update(kw)
    return threedmatch_config(**base)


def test_cli_train_num_devices_8_end_to_end(tmp_path):
    from imfnet_tpu.cli import _load_model_and_vars, main

    run_dir = str(tmp_path / "run")
    main(["train", "--dataset", "synthetic", "--num-devices", "8",
          "--batch-size", "1", "--max-epoch", "2", "--lr", "0.05",
          "--voxel-size", "0.05", "--max-points", "1024",
          "--model-n-out", "16", "--conv1-kernel-size", "3",
          "--synthetic-length", "8", "--synthetic-n-points", "400",
          "--out-dir", run_dir])

    ckpts = sorted(glob.glob(os.path.join(run_dir, "checkpoint*")))
    assert ckpts, "DP training wrote no checkpoints"
    model, variables, config = _load_model_and_vars(ckpts[-1])
    assert config.data_parallel == 8
    # scalars were logged and are finite
    import json

    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for ln in f:
            rec = json.loads(ln)
            if rec["tag"] == "train/loss":
                losses.append(rec["value"])
    assert losses and np.isfinite(losses).all()


def test_trainer_dp_matches_sequential_emulation(tmp_path):
    """shard_map DP Trainer == its sequential specification, step for step
    (same loaders, same keys; pmean ↔ mean over the device axis). A
    2-device mesh keeps the emulated (unrolled) jit compile-cheap while
    still proving the shard_map path computes its per-device/mean spec."""
    from imfnet_tpu.data.datasets import make_data_loader
    from imfnet_tpu.parallel.dp import make_emulated_dp_step
    from imfnet_tpu.train.trainer import Trainer

    def run(out_dir, emulate):
        config = _dp_config(out_dir, data_parallel=2, synthetic_length=4)
        loader = make_data_loader(config, "train", config.batch_size)
        trainer = Trainer(config, loader, None)
        assert trainer.n_devices == 2 and trainer.mesh is not None
        if emulate:
            trainer.train_step = make_emulated_dp_step(
                trainer.model, trainer.tx, config, trainer.n_devices)
        trainer.init_state(next(iter(loader)))
        trainer.train()
        return jax.device_get(trainer.state)

    s_mesh = run(str(tmp_path / "a"), emulate=False)
    s_emul = run(str(tmp_path / "b"), emulate=True)
    assert int(s_mesh.step) == int(s_emul.step) == 2  # 4 batches / 2 devices
    flat_m, _ = jax.tree_util.tree_flatten(s_mesh.params)
    flat_e, _ = jax.tree_util.tree_flatten(s_emul.params)
    for m, e in zip(flat_m, flat_e):
        np.testing.assert_allclose(np.asarray(m), np.asarray(e),
                                   rtol=1e-4, atol=1e-6)
    flat_m, _ = jax.tree_util.tree_flatten(s_mesh.batch_stats)
    flat_e, _ = jax.tree_util.tree_flatten(s_emul.batch_stats)
    for m, e in zip(flat_m, flat_e):
        np.testing.assert_allclose(np.asarray(m), np.asarray(e),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_rejects_oversized_mesh(tmp_path):
    from imfnet_tpu.data.datasets import make_data_loader
    from imfnet_tpu.train.trainer import Trainer

    config = _dp_config(str(tmp_path), synthetic_length=4, data_parallel=8)
    loader = make_data_loader(config, "train", config.batch_size)
    # 4 batches/epoch cannot feed an 8-device step
    with pytest.raises(ValueError, match="no optimizer step"):
        Trainer(config, loader, None)
    config = _dp_config(str(tmp_path), data_parallel=16)
    loader = make_data_loader(config, "train", config.batch_size)
    with pytest.raises(ValueError, match="devices are"):
        Trainer(config, loader, None)


def test_trainer_auto_clamps_to_loader(tmp_path):
    """data_parallel=0 (auto) uses every device but never starves the epoch:
    a 4-batch loader on 8 devices clamps to a 4-device mesh."""
    from imfnet_tpu.data.datasets import make_data_loader
    from imfnet_tpu.train.trainer import Trainer

    config = _dp_config(str(tmp_path), synthetic_length=4, data_parallel=0)
    loader = make_data_loader(config, "train", config.batch_size)
    trainer = Trainer(config, loader, None)
    assert trainer.n_devices == 4


def test_pair_loader_shard_partitions_epoch():
    """shard=(rank, world, group) splits batch groups round-robin: the union
    over ranks is exactly the unsharded epoch, in global step order."""
    from imfnet_tpu.data.datasets import make_data_loader

    config = _dp_config("unused", synthetic_length=8, use_random_rotation=False)

    def t_gts(shard):
        loader = make_data_loader(config, "train", 1)
        loader.shard = shard
        return [np.asarray(b.T_gt)[0] for b in loader]

    full = t_gts(None)
    r0 = t_gts((0, 2, 2))
    r1 = t_gts((1, 2, 2))
    assert len(full) == 8 and len(r0) == 4 and len(r1) == 4
    # groups of 2 rotate: full = [r0[0:2], r1[0:2], r0[2:4], r1[2:4]]
    interleaved = r0[0:2] + r1[0:2] + r0[2:4] + r1[2:4]
    for a, b in zip(full, interleaved):
        np.testing.assert_array_equal(a, b)


def test_pair_loader_shard_ragged_tail_is_equalized():
    """A batch total NOT divisible by world*group must yield EQUAL counts on
    every rank (ragged tails would leave one rank alone inside the global
    pmean collective and deadlock the job) — only complete rounds survive."""
    from imfnet_tpu.data.datasets import make_data_loader

    # 10 batches, world=2, group=2 -> 2 complete rounds -> 4 batches/rank
    config = _dp_config("unused", synthetic_length=10,
                        use_random_rotation=False)

    def count(shard):
        loader = make_data_loader(config, "train", 1)
        loader.shard = shard
        n = sum(1 for _ in loader)
        assert n == len(loader)
        return n

    assert count((0, 2, 2)) == count((1, 2, 2)) == 4
