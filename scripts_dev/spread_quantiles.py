#!/usr/bin/env python
"""Per-block window-spread distribution for every conv of the bench pair —
decides whether a two-tier width partition (p50 pass + overflow pass via
the round-5 liveness mechanism) would pay. CPU-only (the maps are the same
arrays the TPU builds).

For each conv (mode, cin): block spreads at the plan's (B, pack), the
fraction of LIVE blocks fitting W/2 and 0.75W, and the selection-FLOP
saving a two-tier split would give: 1 - (f_half/2 + (1-f_half)) = f_half/2.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_pair


def spreads(nbr, B, pack, kz, union):
    n_out, k = nbr.shape
    nb = -(-n_out // B)
    pad = nb * B - n_out
    if pad:
        nbr = np.concatenate([nbr, np.full((pad, k), -1, np.int32)])
    t = nbr.reshape(nb, B, k).astype(np.int64)
    valid = t >= 0
    if pack > 1:
        t = np.where(valid, t // pack, t)
    if union:
        tv = t.reshape(nb, B * k)
        vv = valid.reshape(nb, B * k)
        tmin = np.where(vv, tv, 1 << 40).min(1)
        tmax = np.where(vv, tv, -1).max(1)
        live = vv.any(1)
        sp = np.where(live, tmax - (tmin & ~7) + 1, 0)
        return sp[live]
    ncol = k // kz
    t = t.reshape(nb, B, ncol, kz)
    valid = valid.reshape(nb, B, ncol, kz)
    tmin = np.where(valid, t, 1 << 40).min(axis=(1, 3))
    tmax = np.where(valid, t, -1).max(axis=(1, 3))
    has = tmin != (1 << 40)
    sp = np.where(has, tmax - (tmin & ~7) + 1, 0)
    live = valid.any(axis=(1, 2, 3))
    return sp.max(axis=1)[live]        # block spread = worst column


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import (DEFAULT_BUCKETS, pad_points_bucketed,
                                         pick_extent)
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.sparse.ops import _BAND_PLANS, _kz_of
    from imfnet_tpu.train.step import make_pyramid_fn

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, im0, im1, _ = load_pair(config)
    xyz0_raw, n0_raw = pad_points_bucketed(xyz0)
    xyz1_raw, n1_raw = pad_points_bucketed(xyz1)
    B0, B1 = len(xyz0_raw), len(xyz1_raw)
    N_CAT = B0 + B1
    ext0 = pick_extent(xyz0_raw, n0_raw, config.voxel_size, config)
    ext1 = pick_extent(xyz1_raw, n1_raw, config.voxel_size, config)
    extent = max(ext0, ext1)
    spec = GridSpec(extent=extent, num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.concatenate(
        [np.zeros(B0, np.int32), np.ones(B1, np.int32)]))
    vm = np.zeros(N_CAT, bool)
    vm[:n0_raw] = True
    vm[B0:B0 + n1_raw] = True
    N_PAD2 = 40960
    pyramid_fn = jax.jit(make_pyramid_fn(config, N_PAD2, num_batches=2,
                                         extent=extent))

    @jax.jit
    def quant(xyz):
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_CAT, 1), jnp.float32),
                                 jnp.asarray(vm), config.voxel_size, N_PAD2,
                                 spec, batch_index=bidx)
        return sv

    sv = quant(xyz_cat)
    pyr = pyramid_fn(sv.coords, sv.num_valid)
    lv = pyr.levels
    # conv walk with (mode, cin) plan keys as ops._apply resolves them
    cases = [
        ("same32-L0 (block1)", np.asarray(lv[0].k3_same), "same", 32),
        ("same64-L0 (block2tr)", np.asarray(lv[0].k3_same), "same", 64),
        ("same64-L1 (block2)", np.asarray(lv[1].k3_same), "same", 64),
        ("same128-L1 (b3tr)", np.asarray(lv[1].k3_same), "same", 128),
        ("same128-L2", np.asarray(lv[2].k3_same), "same", 128),
        ("same256-L3", np.asarray(lv[3].k3_same), "same", 256),
        ("down64-L1", np.asarray(lv[1].down), "down", 32),
        ("down128-L2", np.asarray(lv[2].down), "down", 64),
        ("down256-L3", np.asarray(lv[3].down), "down", 128),
        ("up-L2 (c4tr)", np.asarray(lv[2].up), "up", 256),
        ("up-L1 (c3tr)", np.asarray(lv[1].up), "up", 256),
        ("up-L0 (c2tr)", np.asarray(lv[0].up), "up", 128),
    ]
    print(f"{'conv':22s} {'plan':>16s} {'p50':>5s} {'p90':>5s} {'p100':>5s} "
          f"{'f(W/2)':>7s} {'f(.75W)':>8s} {'sel-save':>8s}")
    for name, nbr, mode, cin in cases:
        pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
        plan = None
        for key in ((mode, cin),):
            if key in _BAND_PLANS:
                plan = _BAND_PLANS[key]
        if plan is None:
            continue
        B, W = plan[0], plan[1]
        kind = plan[3] if len(plan) > 3 else "col"
        kz = _kz_of(nbr.shape[1])
        sp = spreads(nbr, B, pack, kz, union=(kind == "union"))
        if not len(sp):
            continue
        f_half = float((sp <= W // 2).mean())
        f_75 = float((sp <= int(0.75 * W)).mean())
        print(f"{name:22s} {f'{kind} B={B} W={W}':>16s} "
              f"{int(np.percentile(sp, 50)):5d} "
              f"{int(np.percentile(sp, 90)):5d} {int(sp.max()):5d} "
              f"{f_half:7.2f} {f_75:8.2f} {f_half / 2:8.2f}")


if __name__ == "__main__":
    main()
