"""Greedy end-to-end sweep of the packed Pallas conv plan table.

Per-conv standalone timings do not transfer (XLA overlaps consecutive
convs: the conv-sum is ~40 ms while the full forward is ~11), so this
sweep scores each (mode, cin) -> (block, width, sel_t) candidate by the
CHAINED FULL-FORWARD time at real bench shapes, holding every other
group at its current plan. Winners get folded back into
ops._band_plan / _pallas_banded_apply.

Usage: python scripts_dev/sweep_packed_plan.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.extract import pad_points
    from imfnet_tpu.models import load_model
    from imfnet_tpu.sparse import ops
    from imfnet_tpu.sparse.grid import GridSpec, quantize_grid
    from imfnet_tpu.train.step import make_pyramid_fn
    import bench

    config = threedmatch_config(level_capacity_divisors=(1, 3, 8, 20))
    xyz0, xyz1, im0, im1, src = bench.load_pair(config)
    N_RAW = 1 << 18
    xyz0_raw, n0 = pad_points(xyz0, N_RAW)
    xyz1_raw, n1 = pad_points(xyz1, N_RAW)
    spec = GridSpec(extent=tuple(config.grid_extent), num_batches=2)
    xyz_cat = np.concatenate([xyz0_raw, xyz1_raw])
    bidx = np.repeat(np.array([0, 1], np.int32), N_RAW)
    okm = np.zeros(2 * N_RAW, bool)
    okm[:n0] = True
    okm[N_RAW:N_RAW + n1] = True
    sv, _, _ = quantize_grid(jnp.asarray(xyz_cat),
                             jnp.ones((2 * N_RAW, 1), jnp.float32),
                             jnp.asarray(okm), config.voxel_size, 40960, spec,
                             batch_index=jnp.asarray(bidx))
    pyr = make_pyramid_fn(config, 40960, num_batches=2)(sv.coords,
                                                        sv.num_valid)
    images = jnp.concatenate([jnp.asarray(im0[None]), jnp.asarray(im1[None])])
    print(f"# voxels {int(sv.num_valid)}", flush=True)

    model = load_model(config.model)(
        in_channels=1, out_channels=config.model_n_out,
        conv1_kernel_size=config.conv1_kernel_size,
        normalize_feature=config.normalize_feature,
        bn_momentum=config.bn_momentum, compute_dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), sv, pyr, images,
                           train=False)

    def time_forward():
        # fresh closure per call -> fresh jit trace (reads PLAN_OVERRIDES)
        @jax.jit
        def run(feats0):
            def body(i, c):
                svc = sv._replace(feats=feats0 + c)
                out = model.apply(variables, svc, pyr, images, train=False)
                return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-20)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        _ = float(run(sv.feats))
        t0 = time.perf_counter()
        _ = float(run(sv.feats))
        return (time.perf_counter() - t0) / ITERS * 1e3

    base = time_forward()
    print(f"baseline plan                                {base:8.3f} ms",
          flush=True)

    # candidate (block, width-unpacked-equivalent, sel_t) sets per group.
    # width entries are PACKED rows (pack = 128/cin for cin < 128).
    groups = {
        ("same", 32): [(512, 200, True), (512, 200, False), (256, 168, True),
                       (1024, 328, True)],
        ("same", 64): [(512, 392, True), (512, 392, False), (256, 328, True)],
        ("same", 128): [(512, 768, True), (128, 448, True)],
        ("same", 256): [(512, 768, True), (128, 448, True)],
        ("down", 32): [(128, 264, False), (128, 328, True), (256, 392, True),
                       (256, 392, False), (512, 520, True)],
        ("down", 64): [(128, 520, False), (256, 648, True), (512, 776, True)],
        ("down", 128): [(128, 1024, True), (256, 1280, True)],
        ("up", 64): [(512, 200, True), (512, 264, False), (1024, 264, True),
                     (256, 136, True)],
        ("up", 128): [(512, 384, True), (1024, 512, True)],
        ("up", 256): [(512, 384, True), (1024, 512, True)],
    }

    best = {}
    cur = base
    for gk, cands in groups.items():
        for cand in cands:
            ops.PLAN_OVERRIDES.clear()
            ops.PLAN_OVERRIDES.update(best)
            ops.PLAN_OVERRIDES[gk] = cand
            dt = time_forward()
            tag = "*" if dt < cur - 0.03 else " "
            print(f"{gk} {cand}{tag}  {dt:8.3f} ms", flush=True)
            if dt < cur - 0.03:
                cur = dt
                best[gk] = cand
        ops.PLAN_OVERRIDES.clear()
        ops.PLAN_OVERRIDES.update(best)
    print("best:", best, f"-> {cur:.3f} ms (base {base:.3f})", flush=True)


if __name__ == "__main__":
    main()
