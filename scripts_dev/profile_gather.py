"""Measure the XLA row-gather cost model used by sparse.ops._apply.

Fits the two constants in imfnet_tpu/sparse/ops.py:

  _GATHER_ROW_NS       — fixed per-row cost floor (narrow rows)
  _GATHER_BYTES_PER_NS — bandwidth term (wide rows)

by timing `jnp.take(table, idx, axis=0)` over a grid of (rows, width)
shapes on the attached TPU chip. Iterations are chained through a data
dependency inside one jitted fori_loop so the axon tunnel's dispatch
overlap cannot hide device time (same discipline as bench.py).

Usage:  python scripts_dev/profile_gather.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_gather(n_table, n_rows, width, dtype=jnp.float32, iters=30):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(n_table, width), dtype)
    idx = jnp.asarray(rng.randint(0, n_table, n_rows), jnp.int32)

    @jax.jit
    def chain(eps):
        def step(i, carry):
            out = jnp.take(table + carry, idx, axis=0)
            return jnp.max(out) * jnp.asarray(1e-12, dtype)

        return jax.lax.fori_loop(0, iters, step, eps)

    _ = jax.block_until_ready(chain(jnp.asarray(0.0, dtype)))
    t0 = time.perf_counter()
    _ = float(chain(jnp.asarray(1e-6, dtype)))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    print(f"# devices: {jax.devices()}")
    bytes_per = {jnp.float32: 4, jnp.bfloat16: 2}
    print(f"{'rows':>9} {'width':>6} {'dtype':>9} {'ms':>8} "
          f"{'ns/row':>8} {'GB/s':>7}")
    for dtype in (jnp.float32, jnp.bfloat16):
        for n_rows in (1 << 18, 1 << 20):
            for width in (1, 8, 32, 64, 128, 256, 512):
                sec = time_gather(1 << 18, n_rows, width, dtype)
                row_bytes = width * bytes_per[dtype]
                ns_row = sec / n_rows * 1e9
                gbs = n_rows * row_bytes / sec / 1e9
                name = np.dtype(dtype).name
                print(f"{n_rows:>9} {width:>6} {name:>9} {sec*1e3:>8.3f} "
                      f"{ns_row:>8.2f} {gbs:>7.1f}")


if __name__ == "__main__":
    main()
