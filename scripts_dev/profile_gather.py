"""Measure XLA row-gather cost on the attached TPU chip.

Sweeps (table_rows, row_width, dtype): the dominant variable is whether the
TABLE fits in VMEM (~16 MB on v5e) — VMEM-resident tables gather at a few
ns/row; HBM-resident tables pay ~15 ns/row latency regardless of width.
This is why the sparse-conv strategy chooser (sparse/ops.py _apply) keys on
channel width: it is a proxy for table residency at bench shapes.

Iterations are chained through a data dependency inside one jitted
fori_loop so the axon tunnel's dispatch overlap cannot hide device time
(same discipline as bench.py). Arrays are passed as ARGUMENTS — a closure
would bake the table into the program as a constant and blow the remote
compiler's request-size limit.

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
    def chain(table, idx, eps):
        def step(i, c):
            out = jnp.take(table + c, idx, axis=0)
            return jnp.max(out) * jnp.asarray(1e-12, dtype)

        return jax.lax.fori_loop(0, iters, step, eps)

    _ = jax.block_until_ready(chain(table, idx, jnp.asarray(0.0, dtype)))
    t0 = time.perf_counter()
    _ = float(chain(table, idx, jnp.asarray(1e-6, dtype)))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    bytes_per = {jnp.float32: 4, jnp.bfloat16: 2}
    print(f"{'table':>8} {'tableMB':>8} {'rows':>9} {'width':>6} {'dtype':>9} "
          f"{'ms':>8} {'ns/row':>8} {'GB/s':>7}", flush=True)
    n_rows = 1 << 20
    for dtype in (jnp.bfloat16, jnp.float32):
        for n_table in (1 << 15, 1 << 17, 1 << 19):
            for width in (8, 32, 64, 128, 192, 256):
                mb = n_table * width * bytes_per[dtype] / 1e6
                if mb > 600:
                    continue
                sec = time_gather(n_table, n_rows, width, dtype)
                row_bytes = width * bytes_per[dtype]
                ns_row = sec / n_rows * 1e9
                gbs = n_rows * row_bytes / sec / 1e9
                name = np.dtype(dtype).name
                print(f"{n_table:>8} {mb:>8.1f} {n_rows:>9} {width:>6} "
                      f"{name:>9} {sec*1e3:>8.3f} {ns_row:>8.2f} {gbs:>7.1f}",
                      flush=True)


if __name__ == "__main__":
    main()
