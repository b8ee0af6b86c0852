#!/usr/bin/env python
"""Capture a jax.profiler device trace of the chained extract program and
print a per-HLO-op time attribution (verdict r2 item 1: WHY doesn't the
fused program overlap map construction with conv compute?)."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from imfnet_tpu.config import threedmatch_config
from imfnet_tpu.eval.extract import pad_points
from imfnet_tpu.models import load_model
from imfnet_tpu.train.step import make_pyramid_fn
from imfnet_tpu.sparse.grid import GridSpec, quantize_grid

ITERS = 10
LOGDIR = "/tmp/jax_trace"


def main():
    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_RAW = 1 << 18
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)
    xyz0, xyz1, im0, im1, _ = B.load_pair(config)
    xyz0_raw, n0_raw = pad_points(xyz0, N_RAW)
    xyz1_raw, n1_raw = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.repeat(np.array([0, 1], np.int32), N_RAW))
    vm = np.zeros(2 * N_RAW, bool)
    vm[:n0_raw] = True
    vm[N_RAW:N_RAW + n1_raw] = True
    vm = jnp.asarray(vm)
    images = jnp.concatenate([jnp.asarray(im0[None]),
                              jnp.asarray(im1[None])], axis=0)
    N_PAD2 = 40960
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2)

    def extract_pair(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(variables, sv, pyr, images, train=False)
        return sv, xyz_down, feats

    @jax.jit
    def init_fn(xyz):
        sv, _, _ = quantize_grid(
            xyz, jnp.ones((2 * N_RAW, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return model.init(jax.random.PRNGKey(0), sv, pyr, images, train=False)

    variables = init_fn(xyz_cat)

    @jax.jit
    def chain(x0):
        def step(i, eps):
            sv, xyz_down, feats = extract_pair(xyz_cat + eps)
            return (jnp.sum(feats).astype(jnp.float32) + jnp.sum(xyz_down)
                    ) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, ITERS, step, x0)

    print("warmup:", float(chain(jnp.float32(0.0))))
    import shutil
    shutil.rmtree(LOGDIR, ignore_errors=True)
    with jax.profiler.trace(LOGDIR):
        v = float(chain(jnp.float32(0.0)))
    print("traced:", v)
    files = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        return
    ev_tot = defaultdict(float)
    ev_cnt = defaultdict(int)
    pids = {}
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    print("processes:", pids)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        ev_tot[name] += e.get("dur", 0)
        ev_cnt[name] += 1
    top = sorted(ev_tot.items(), key=lambda kv: -kv[1])[:60]
    total = sum(ev_tot.values())
    print(f"total device-event us: {total:.0f} over {ITERS} iters")
    for name, us in top:
        print(f"{us/ITERS/1e3:9.3f} ms/iter  x{ev_cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
