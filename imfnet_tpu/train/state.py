"""Train state + optimizer construction.

Optimizer mirrors the reference: SGD(momentum=0.8, weight_decay=1e-4) with
per-epoch ExponentialLR(gamma=0.99) (`lib/trainer.py:75-81`,
`config_3dmatch.py:75-87`), expressed as an optax chain with a staircase
exponential schedule.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from imfnet_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=config.lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=config.exp_gamma,
        staircase=True,
    )
    if config.optimizer == "SGD":
        # torch-SGD semantics: grad += wd * param, buf = m*buf + grad, p -= lr*buf
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.trace(decay=config.momentum, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    if config.optimizer == "Adam":
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"optimizer {config.optimizer} not supported")


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
