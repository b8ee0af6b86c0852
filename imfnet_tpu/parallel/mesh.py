"""Device-mesh construction for data-parallel training and sharded eval.

New capability relative to the reference, which is strictly single-GPU,
single-process (SURVEY.md §2.3: no torch.distributed / NCCL anywhere; device
pinned at `train_3DMatch.py:4`). On TPU, scaling is a mesh over the fragment
-pair axis: gradients ride ICI via psum inside shard_map; multi-host setups
extend the same mesh over DCN with `jax.distributed.initialize`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the data-parallel axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (DP_AXIS,))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN). No-op for a single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
