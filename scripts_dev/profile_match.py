"""Match-stage attribution at bench shapes: keypoint sampling, NN search,
RANSAC sampling+fit+checkers, subset scoring, finalist validation — each
timed chained (consuming all outputs) to find where the ~5 ms goes.

Usage: python scripts_dev/profile_match.py
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


def timeloop(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(c, *a)
            return jnp.max(out).astype(jnp.float32) * jnp.float32(1e-20)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from imfnet_tpu.config import threedmatch_config
    from imfnet_tpu.eval.registration import (make_keypoint_registration,
                                              sample_keypoints_segment)
    from imfnet_tpu.match.nn import nn_auto
    from imfnet_tpu.match.ransac import ransac_registration

    config = threedmatch_config()
    K = config.num_rand_keypoints
    rng = np.random.RandomState(0)
    # synthetic keypoint clouds + descriptors at bench scale
    kp0 = jnp.asarray(rng.randn(K, 3).astype(np.float32))
    R = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    kp1 = jnp.asarray(np.asarray(kp0) @ R.T + [0.3, -0.2, 0.1])
    kd0 = jnp.asarray(rng.randn(K, 32).astype(np.float32))
    kd1 = kd0 + 0.05 * jnp.asarray(rng.randn(K, 32).astype(np.float32))
    ok = jnp.ones((K,), bool)
    T_gt = jnp.eye(4, dtype=jnp.float32)
    cov = jnp.eye(6, dtype=jnp.float32)

    register_kp = make_keypoint_registration(
        voxel_size=config.voxel_size, ransac_n=config.ransac_n,
        num_hypotheses=config.ransac_max_iteration,
        inlier_thresh=config.inlier_thresh)

    def full(c):
        return register_kp(jax.random.PRNGKey(0), kp0, kd0 + c, ok,
                           kp1, kd1, ok, T_gt, cov)["rte"]

    timeloop("full match (register_kp)", full)

    def nn_only(c):
        i01 = nn_auto(kd0 + c, kd1, ok)[0]
        i10 = nn_auto(kd1 + c, kd0, ok)[0]
        return (i01 + i10).astype(jnp.float32)

    timeloop("NN search (desc, both dirs)", nn_only)

    corr = jax.jit(lambda: nn_auto(kd0, kd1, ok)[0])()
    src = kp0
    dst = jnp.take(kp1, corr, axis=0)
    val = ok

    def ransac_only(c):
        res = ransac_registration(
            jax.random.PRNGKey(0), src + c, dst, val,
            config.voxel_size * 1.5,
            ransac_n=config.ransac_n,
            num_hypotheses=config.ransac_max_iteration)
        return res.transformation

    timeloop("RANSAC total", ransac_only)


if __name__ == "__main__":
    main()
