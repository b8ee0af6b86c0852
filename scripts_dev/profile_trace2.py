#!/usr/bin/env python
"""Map the traced HLO op names to source metadata: compile the same chain,
dump HLO text, print metadata for the top traced ops."""
import os
import re
import sys

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

TOP_OPS = """fusion.1354 cond.5 cond.59 cond.56 cond.2 cond.53 cond.8
cond.44 cond.50 cond.11 cond.47 cond.14 fusion.1506 sort.15 fusion.1375
fusion.1358 fusion.1369 fusion.1365 fusion.1366 fusion.1367 fusion.1368
cond.17 fusion.1377 fusion.1376 fusion.1356 concatenate.189 cond.35
cond.41 cond.23 cond.20 cond.38 cond.26 cond.32 cond.29 fusion.1383
fusion.1380 fusion.1385""".split()


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

    txt = chain.lower(jnp.float32(0.0)).compile().as_text()
    with open("/tmp/chain_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO dumped:", len(txt), "chars")
    # print the defining line (with metadata) of each hot op
    want = {name: None for name in TOP_OPS}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m and m.group(1) in want and want[m.group(1)] is None:
            want[m.group(1)] = line.strip()
    for name in TOP_OPS:
        line = want.get(name)
        if line is None:
            print(f"{name}: NOT FOUND")
            continue
        meta = re.search(r'metadata=\{([^}]*)\}', line)
        shape = line.split("=", 1)[1].strip().split(" ")[0]
        kind = re.search(r'= \S+ (\w+)\(', line)
        print(f"{name}: {shape} {kind.group(1) if kind else '?'}")
        if meta:
            print(f"    {meta.group(1)[:300]}")


if __name__ == "__main__":
    main()
