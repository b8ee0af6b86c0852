"""Checkpoint save/resume with embedded config.

Mirrors the reference contract (`lib/trainer.py:183-198`, resume at
`:103-117`; eval-time model reconstruction from checkpoint-embedded config at
`scripts/generate_desc.py:160-173`): full state {epoch, params, batch_stats,
opt_state, config, best_val*} written per epoch and for the best validation
metric, filename embedding the metric value.

Format: a directory containing `state.msgpack` (flax serialization of the
TrainState pytree) and `meta.json` (config + bookkeeping).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from imfnet_tpu.config import Config
from imfnet_tpu.train.state import TrainState


def save_checkpoint(
    directory: str,
    name: str,
    state: TrainState,
    config: Config,
    epoch: int,
    best_val: float,
    best_val_epoch: int,
    best_val_metric: str,
    val_value: Optional[float] = None,
) -> str:
    if val_value is not None:
        name = f"{name}_epoch_{epoch}_{best_val_metric}_{val_value}"
    path = os.path.join(directory, name)
    os.makedirs(path, exist_ok=True)
    state = jax.device_get(state)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = dict(
        epoch=epoch,
        best_val=best_val,
        best_val_epoch=best_val_epoch,
        best_val_metric=best_val_metric,
        config=json.loads(config.to_json()),
        format_version=1,
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_checkpoint(path: str, state_template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Restores state into the template's pytree structure + returns meta."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta


def load_config_from_checkpoint(path: str) -> Config:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return Config.from_json(json.dumps(meta["config"]))
