#!/usr/bin/env python
"""Is the slow-gather cliff a row-count threshold we can duck under by
splitting the table? Times one gather into an n-row table vs two gathers
into its halves + select, at the up-map shapes (L1 packed table, 174k
rows x 4 int32; 369k query rows)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 30


def timeloop(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, c):
            out = fn(c, *a)
            return jnp.max(out).astype(jnp.int32) * 0

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    _ = int(run(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = int(run(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{name:48s} {best:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    n_rows = 9 * 40960
    for n_table in (174_240, 131_072, 1_217_800):
        tab = jnp.asarray(rng.randint(0, 1 << 20, (n_table, 4)), jnp.int32)
        idx = jnp.asarray(rng.randint(0, n_table, n_rows), jnp.int32)
        half = n_table // 2

        def whole(c, tab=tab, idx=idx):
            return jnp.take(tab, jnp.minimum(idx + c, tab.shape[0] - 1),
                            axis=0)

        def split(c, tab=tab, idx=idx, half=half):
            i = jnp.minimum(idx + c, tab.shape[0] - 1)
            a = jnp.take(tab[:half], jnp.minimum(i, half - 1), axis=0)
            b = jnp.take(tab[half:], jnp.clip(i - half, 0,
                                              tab.shape[0] - half - 1), axis=0)
            return jnp.where((i < half)[:, None], a, b)

        def quarter(c, tab=tab, idx=idx):
            q = tab.shape[0] // 4
            i = jnp.minimum(idx + c, tab.shape[0] - 1)
            parts = []
            for s in range(4):
                lo = s * q
                hi = tab.shape[0] if s == 3 else (s + 1) * q
                parts.append(jnp.take(
                    tab[lo:hi], jnp.clip(i - lo, 0, hi - lo - 1), axis=0))
            out = parts[0]
            for s in range(1, 4):
                out = jnp.where((i >= s * q)[:, None], parts[s], out)
            return out

        mb = n_table * 16 / 1e6
        timeloop(f"whole   n={n_table} ({mb:.1f} MB)", whole)
        timeloop(f"split2  n={n_table}", split)
        timeloop(f"split4  n={n_table}", quarter)


if __name__ == "__main__":
    main()
