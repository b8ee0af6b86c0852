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


def migrate_checkpoint_keys(
    path: str,
    out_path: str,
    renames: Dict[str, str],
) -> int:
    """Rename parameter-tree keys in a saved checkpoint (module renames
    between framework versions). The analogue of the reference's checkpoint
    key-migration shim (`lib/Test.py:5-26`, which rewrites
    `perceiver_io.*` → `attention_fusion.*` in a .pth).

    ``renames`` maps old key-path prefixes to new ones, '/'-joined (e.g.
    ``{"params/perceiver_io": "params/attention_fusion"}``). Operates on the
    raw msgpack dict so no model template is needed. Returns the number of
    leaves moved.
    """
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        tree = serialization.msgpack_restore(f.read())

    moved = 0

    def rewrite(node, prefix=""):
        """Rebuild the dict applying full-path renames (handles moves across
        subtree boundaries, not just leaf renames)."""
        nonlocal moved
        flat = {}

        def flatten(n, p):
            for k, v in n.items():
                kp = f"{p}/{k}" if p else k
                if isinstance(v, dict):
                    flatten(v, kp)
                else:
                    flat[kp] = v

        flatten(node, prefix)
        out: Dict[str, Any] = {}
        for kp, v in flat.items():
            new_kp = kp
            for old, new in renames.items():
                if kp == old or kp.startswith(old + "/"):
                    new_kp = new + kp[len(old):]
                    moved += 1
                    break
            cur = out
            parts = new_kp.split("/")
            for part in parts[:-1]:
                cur = cur.setdefault(part, {})
            cur[parts[-1]] = v
        return out

    new_tree = rewrite(tree)
    os.makedirs(out_path, exist_ok=True)
    with open(os.path.join(out_path, "state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(new_tree))
    meta_src = os.path.join(path, "meta.json")
    if os.path.exists(meta_src):
        with open(meta_src) as f:
            meta = json.load(f)
        with open(os.path.join(out_path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return moved
