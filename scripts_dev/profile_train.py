#!/usr/bin/env python
"""Training-step timing (2 pairs, 24576-row pads) with fwd/bwd split."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.data.synthetic import synthetic_pair
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
from imfnet_tpu.train.step import (
    PairBatch, forward_pair, make_train_step)
from imfnet_tpu.train.trainer import TrainState, build_model_from_config

ITERS = 5


def timeloop(name, body):
    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, ITERS, lambda i, c: body(c) * jnp.float32(1e-20), jnp.float32(0.0))

    _ = float(run())
    t0 = time.perf_counter()
    _ = float(run())
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    config = threedmatch_config()
    N_PAD = 24576
    rng = np.random.RandomState(0)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)

    sides = []
    n_raw = 1 << 16
    for side in range(2):
        raws, bidx, vmask = [], [], []
        for b in range(2):
            pair = synthetic_pair(rng, n_points=60000, voxel_size=config.voxel_size,
                                  extent=1.2, image_hw=(config.image_H, config.image_W))
            xyz = (pair.xyz0 if side == 0 else pair.xyz1)[:n_raw]
            raw = np.zeros((n_raw, 3), np.float32)
            raw[:len(xyz)] = xyz
            raws.append(raw)
            bidx.append(np.full(n_raw, b, np.int32))
            v = np.zeros(n_raw, bool)
            v[:len(xyz)] = True
            vmask.append(v)
        sv, _, xd = quantize_grid(
            jnp.asarray(np.concatenate(raws)),
            jnp.ones((2 * n_raw, 1), jnp.float32),
            jnp.asarray(np.concatenate(vmask)), config.voxel_size,
            N_PAD, spec, batch_index=jnp.asarray(np.concatenate(bidx)))
        sides.append((sv, xd))

    batch = PairBatch(
        coords0=sides[0][0].coords, feats0=sides[0][0].feats,
        xyz0=sides[0][1], n0=sides[0][0].num_valid,
        coords1=sides[1][0].coords, feats1=sides[1][0].feats,
        xyz1=sides[1][1], n1=sides[1][0].num_valid,
        image0=jnp.asarray(rng.rand(2, config.image_H, config.image_W, 3).astype(np.float32)),
        image1=jnp.asarray(rng.rand(2, config.image_H, config.image_W, 3).astype(np.float32)),
        T_gt=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (2, 4, 4)),
        pairs=None, pair_valid=None,
    )

    model = build_model_from_config(config)
    tx = optax.sgd(0.1, momentum=config.momentum, nesterov=False)
    step = make_train_step(model, tx, config)

    # init
    from imfnet_tpu.sparse.coords import SparseVoxels
    from imfnet_tpu.train.step import make_pyramid_fn
    pyramid_fn = make_pyramid_fn(config, N_PAD, 2)
    sv0 = SparseVoxels(batch.coords0, batch.feats0, batch.n0)
    pyr0 = pyramid_fn(batch.coords0, batch.n0)
    variables = model.init(jax.random.PRNGKey(0), sv0, pyr0, batch.image0, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, step=jnp.int32(0))

    def b_fwd(c):
        f0, f1, _ = forward_pair(model, params, batch_stats,
                                 batch._replace(feats0=batch.feats0 + c),
                                 train=True, config=config)
        return f0[0, 0]

    def b_step(c):
        st, metrics = step(state, batch._replace(feats0=batch.feats0 + c),
                           jax.random.PRNGKey(0))
        return metrics["loss"]

    timeloop("train fwd (2 pairs, train=True)", b_fwd)
    timeloop("full train step (fwd+bwd+opt)", b_step)


if __name__ == "__main__":
    main()
