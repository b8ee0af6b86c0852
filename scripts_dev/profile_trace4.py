#!/usr/bin/env python
"""One-shot HLO-attributed device trace of the fused extract chain at the
CURRENT bench shapes (extent/shape buckets + dead-block kernels): dump HLO
with source metadata, capture a device trace, aggregate device time by
source file/line (round-5 continuation of profile_trace{,2,3}.py — VERDICT
r4 item 4: account for the full pyramid cost).

Usage: python scripts_dev/profile_trace4.py [--group file|line]
"""
import argparse
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import load_pair  # noqa: E402

ITERS = 10
LOGDIR = "/tmp/jax_trace4"


def build_chain():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import (DEFAULT_BUCKETS, pad_points_bucketed,
                                         pick_extent)
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.train.step import make_pyramid_fn

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    N_PAD_MAX = 1 << 15
    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16,
        conv1_occupancy=True)
    xyz0, xyz1, im0, im1, _ = load_pair(config)
    xyz0_raw, n0_raw = pad_points_bucketed(xyz0)
    xyz1_raw, n1_raw = pad_points_bucketed(xyz1)
    B0, B1 = len(xyz0_raw), len(xyz1_raw)
    N_CAT = B0 + B1
    ext0 = pick_extent(xyz0_raw, n0_raw, config.voxel_size, config)
    ext1 = pick_extent(xyz1_raw, n1_raw, config.voxel_size, config)
    extent = (tuple(config.grid_extent) if ext0 is None or ext1 is None
              else max(ext0, ext1))
    spec = GridSpec(extent=extent, num_batches=2)
    xyz_cat = jnp.asarray(np.concatenate([xyz0_raw, xyz1_raw]))
    bidx = jnp.asarray(np.concatenate(
        [np.zeros(B0, np.int32), np.ones(B1, np.int32)]))
    vm = np.zeros(N_CAT, bool)
    vm[:n0_raw] = True
    vm[B0:B0 + n1_raw] = True
    vm = jnp.asarray(vm)
    images = jnp.concatenate([jnp.asarray(im0[None]),
                              jnp.asarray(im1[None])], 0)

    @jax.jit
    def probe_fn(xyz):
        sv, _, _ = quantize_grid(xyz, jnp.ones((N_CAT, 1), jnp.float32), vm,
                                 config.voxel_size, 2 * N_PAD_MAX, spec,
                                 batch_index=bidx)
        counts = jnp.zeros((3,), jnp.int32).at[
            jnp.clip(sv.coords[:, 0], 0, 2)].add(
            (jnp.arange(2 * N_PAD_MAX) < sv.num_valid).astype(jnp.int32))
        return counts[:2]

    n_vox = int(np.asarray(probe_fn(xyz_cat)).sum())
    N_PAD2 = next((b * 2 for b in DEFAULT_BUCKETS if 2 * b >= n_vox),
                  2 * N_PAD_MAX)
    pyramid_fn = make_pyramid_fn(config, N_PAD2, num_batches=2,
                                 extent=extent)

    def extract_pair(xyz):
        sv, _, xyz_down = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        feats = model.apply(variables, sv, pyr, images, train=False)
        return xyz_down, feats

    @jax.jit
    def init_fn(xyz):
        sv, _, _ = quantize_grid(
            xyz, jnp.ones((N_CAT, 1), jnp.float32), vm,
            config.voxel_size, N_PAD2, spec, batch_index=bidx)
        pyr = pyramid_fn(sv.coords, sv.num_valid)
        return model.init(jax.random.PRNGKey(0), sv, pyr, images,
                          train=False)

    variables = init_fn(xyz_cat)

    @jax.jit
    def chain(x0):
        def step(i, eps):
            xyz_down, feats = extract_pair(xyz_cat + eps)
            return (jnp.sum(feats).astype(jnp.float32) + jnp.sum(xyz_down)
                    ) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, ITERS, step, x0)

    return chain, xyz_cat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", default="line", choices=["file", "line"])
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    chain, xyz_cat = build_chain()
    # chain is already jitted — lower/compile through ITS cache so the
    # warmup call below reuses this same executable
    hlo = chain.lower(jnp.float32(0.0)).compile().as_text()
    with open("/tmp/chain_hlo4.txt", "w") as f:
        f.write(hlo)
    src_of = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        meta = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        op = re.search(r'op_name="([^"]+)"', line)
        if meta:
            src_of[name] = (meta.group(1).split("/")[-1], int(meta.group(2)),
                            (op.group(1) if op else "")[:90])

    t0 = time.perf_counter()
    print("warmup:", float(chain(jnp.float32(0.0))),
          f"({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    _ = float(chain(jnp.float32(0.0)))
    print(f"chain: {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms/iter")
    shutil.rmtree(LOGDIR, ignore_errors=True)
    with jax.profiler.trace(LOGDIR):
        _ = float(chain(jnp.float32(0.0)))

    files = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    pids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n}
    tot = defaultdict(float)
    detail = defaultdict(float)
    unattr = defaultdict(float)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("while", "jit_", "branch_", "body.",
                            "condition")):
            continue
        base = None
        for cand in (name, name.split(".clone")[0]):
            if cand in src_of:
                base = cand
                break
        dur = e.get("dur", 0.0)
        if base is None:
            unattr[name.split(".")[0]] += dur
            continue
        fn, ln, op = src_of[base]
        key = (fn if args.group == "file" else f"{fn}:{ln}")
        tot[key] += dur
        detail[(key, op)] += dur
    total = sum(tot.values()) + sum(unattr.values())
    print(f"\ntotal device time: {total/1e3/ITERS:.2f} ms/iter "
          f"(attributed {sum(tot.values())/1e3/ITERS:.2f})")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v/1e3/ITERS:8.3f} ms  {k}")
    print("\n-- unattributed --")
    for k, v in sorted(unattr.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v/1e3/ITERS:8.3f} ms  {k}")
    print("\n-- top (loc, op) pairs --")
    for (k, op), v in sorted(detail.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/1e3/ITERS:8.3f} ms  {k}  {op}")


if __name__ == "__main__":
    main()
