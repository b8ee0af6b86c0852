"""Pallas flash-style nearest-neighbor kernel.

Replaces the hot matching paths — descriptor NN (`lib/eval.py:18-48`),
mutual-NN FMR matching (`scripts/evaluation_3dmatch.py:207-217`), and the
positive-correspondence radius search (`util/pointcloud.py:56-69`) — with a
single fused kernel in the flash-attention style: the [N, M] distance matrix
is tiled over a (query-tile, ref-tile) grid, each tile is one MXU matmul with
a min/argmin epilogue, and only the running best (distance, index) per query
ever exists — the distance matrix never touches HBM.

Distances: argmin_j ||q_i − r_j||² = argmin_j (|r_j|² − 2 q_i·r_j); the |q|²
term is added back on the final write so intermediate comparisons skip it.
Invalid reference rows carry |r|² = +inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nn_kernel(q_ref, r_ref, rsq_ref, qsq_ref,
               out_i_ref, out_d_ref, best_d, best_i):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    cross = jnp.dot(q_ref[:], r_ref[:].T, preferred_element_type=jnp.float32)
    d2 = rsq_ref[:] - 2.0 * cross                    # [TQ, TR]
    loc = jnp.argmin(d2, axis=1, keepdims=True)      # [TQ, 1]
    loc_d = jnp.min(d2, axis=1, keepdims=True)       # [TQ, 1]
    tr = r_ref.shape[0]
    gidx = (j * tr + loc).astype(jnp.int32)
    better = loc_d < best_d[:]
    best_d[:] = jnp.where(better, loc_d, best_d[:])
    best_i[:] = jnp.where(better, gidx, best_i[:])

    @pl.when(j == nj - 1)
    def _():
        out_i_ref[:] = best_i[:]
        out_d_ref[:] = jnp.maximum(best_d[:] + qsq_ref[:], 0.0)


@functools.partial(
    jax.jit, static_argnames=("tq", "tr", "interpret")
)
def nn_pallas(
    queries: jax.Array,      # [N, D] float32
    refs: jax.Array,         # [M, D] float32
    ref_valid: jax.Array | None = None,   # bool[M]
    *,
    tq: int = 512,    # tuned on-chip: (512, 2048) beats (256, 1024) by ~27%
    tr: int = 2048,
    interpret: bool = False,
):
    """Returns (idx int32[N], d2 float32[N]): nearest valid reference per
    query and its squared distance. Same contract as `nn.blocked_nn`."""
    n, d = queries.shape
    m = refs.shape[0]
    pad_n = pl.cdiv(n, tq) * tq
    pad_m = pl.cdiv(m, tr) * tr
    # pad the contraction dim to sublane alignment only — for xyz inputs
    # (D=3) a 128-lane pad would cost 16x the memory traffic for nothing
    pad_d = max(8, pl.cdiv(d, 8) * 8)

    q = jnp.zeros((pad_n, pad_d), jnp.float32).at[:n, :d].set(
        queries.astype(jnp.float32))
    r = jnp.zeros((pad_m, pad_d), jnp.float32).at[:m, :d].set(
        refs.astype(jnp.float32))
    rsq = jnp.sum(r * r, axis=1)
    invalid = jnp.ones((pad_m,), bool).at[:m].set(
        jnp.zeros((m,), bool) if ref_valid is None else ~ref_valid)
    rsq = jnp.where(invalid, jnp.inf, rsq)
    qsq = jnp.sum(q * q, axis=1, keepdims=True)      # [pad_n, 1]

    grid = (pad_n // tq, pad_m // tr)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, pad_d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, pad_d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pad_n, 1), jnp.int32),
            jax.ShapeDtypeStruct((pad_n, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * pad_n * pad_m * pad_d,
            bytes_accessed=(q.size + r.size) * 4 + pad_n * 8,
            transcendentals=0,
        ),
    )(q, r, rsq.reshape(1, pad_m), qsq)
    return idx[:n, 0], d2[:n, 0]
