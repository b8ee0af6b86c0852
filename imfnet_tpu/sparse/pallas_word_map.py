"""Pallas TPU kernel-map builder: windowed word matching in VMEM.

Kernel maps are built by locating each query's anchor word in a level's
occupancy table (reference semantics: `ME.MinkowskiConvolution` kernel
maps as used at `/root/reference/model/resunet.py:42-158`). The dense
packed table (`grid.packed_offset_map`) pays XLA's slow large-table
gather rate (~13 ns/row into the ~1.2M-word level-0 table) and measured
as the dominant pyramid cost; the XLA banded matcher
(`grid.banded_word_t4`) removes the gathers but serializes ~160 tiny
scan steps, so it only won for 'up' maps.

This kernel is the banded matcher without the scan. The COMPACT sorted
word table (~2.6 MB at bench shapes) stays RESIDENT in VMEM across grid
steps (constant-index BlockSpec → fetched once); one grid step handles a
block of B query rows, and per (dx, dy) column:

    qcol [B,1] = sum_lanes(q_block * onehot(col))   (VPU, exact int32)
    win  [8,W] = table[:, start : start+W]          (VMEM slice, no DMA;
                 queries are rank-monotone in scan order, so a block's
                 keys live in a bounded 128-aligned window)
    oh   [B,W] = (qcol == win[0])                   (VPU, exact int32)
    t8   [8,B] = win_f32 @ oh^T                     (MXU one-hot dot)

The payload dot runs at precision=HIGHEST: Mosaic's default f32 dot
single-pass truncates operands to bf16 (measured: error 256 on
2^17-range integer payloads), HIGHEST is exact for the integer-valued
f32 payloads here (16-bit bit-halves and ranks < 2^24). Key compares
are pure int32, so word keys may span the full int32 range.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

# the table lives in VMEM for the whole kernel: bound its footprint
# (int32 [8, cap_pad]); above this, callers use the XLA scan matcher
MAX_VMEM_TABLE_BYTES = 6 * 1024 * 1024


def table_fits_vmem(cap: int, width: int) -> bool:
    return 8 * _cap_pad(cap, width) * 4 <= MAX_VMEM_TABLE_BYTES


def _kernel(ncol: int, width: int,
            starts_ref, q_ref, tab_ref, out_ref):
    """One grid step = one block of B query rows, all ncol columns.

    starts_ref : SMEM int32[nb, ncol]   128-aligned window starts
    q_ref      : VMEM int32[B, 128]     anchor word keys, column c at lane
                 c (lanes >= ncol are -2 = match nothing); extracted per
                 column by a masked lane reduction because Mosaic lane
                 slices must be 128-aligned
    tab_ref    : VMEM int32[8, cap_pad] row 0 = sorted word keys (pad
                 0x7FFFFFFF), rows 1-6 payload, row 7 zero; constant
                 index map keeps it resident across grid steps
    out_ref    : VMEM f32[1, ncol, 8, B]
    """
    i = pl.program_id(0)
    B = q_ref.shape[0]
    q = q_ref[:]                                         # [B, 128] int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for col in range(ncol):
        qcol = jnp.sum(jnp.where(lane == col, q, 0), axis=1,
                       keepdims=True)                    # [B, 1] exact
        s = pl.multiple_of(starts_ref[i, col], 128)
        win = tab_ref[:, pl.ds(s, width)]                # [8, width]
        oh = (qcol == win[0:1, :]).astype(jnp.float32)   # [B, width]
        out_ref[0, col] = jax.lax.dot_general(           # [8, B]
            win.astype(jnp.float32), oh, (((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32)


def plan_word_windows(wkeys: jax.Array, q: jax.Array, block: int,
                      width: int):
    """Per-block per-column 128-aligned window starts + exactness flag.

    wkeys : int32[cap] sorted word keys (pad = 0x7FFFFFFF)
    q     : int32[N, ncol] anchor keys (< 0 = match nothing)

    Returns (q_pad int32[nb*block, ncol], starts int32[nb, ncol],
    exact bool[]). When exact is False some block's query range is not
    covered by a width-window and the kernel output is WRONG for those
    rows — callers fall back (lax.cond) to an exact matcher.
    """
    n, ncol = q.shape
    cap = wkeys.shape[0]
    B = block
    nb = -(-n // B)
    if nb * B != n:
        q = jnp.concatenate(
            [q, jnp.full((nb * B - n, ncol), -2, jnp.int32)], 0)
    qb = q.reshape(nb, B, ncol)
    qv = qb >= 0
    big = jnp.int32(1 << 30)
    qmin = jnp.min(jnp.where(qv, qb, big), axis=1)       # [nb, ncol]
    qmax = jnp.max(jnp.where(qv, qb, -1), axis=1)
    has = (qmin != big).reshape(-1)
    wk = wkeys
    qminf = qmin.reshape(-1)
    cnt_lo = jnp.sum((wk[None, :] < qminf[:, None]).astype(jnp.int32), 1)
    cnt_hi = jnp.sum((wk[None, :] <= qmax.reshape(-1)[:, None]
                      ).astype(jnp.int32), 1)
    cap_pad = _cap_pad(cap, width)
    starts = jnp.where(
        has, jnp.clip(cnt_lo & ~127, 0, cap_pad - width), 0)
    exact = jnp.all(jnp.where(has, cnt_hi - starts <= width, True))
    return q, starts.reshape(nb, ncol), exact


def _cap_pad(cap: int, width: int) -> int:
    return -(-(cap + width) // 128) * 128


@functools.partial(jax.jit,
                   static_argnames=("block", "width", "interpret"))
def word_match_planned(
    wkeys: jax.Array,       # int32[cap] sorted (pad 0x7FFFFFFF)
    payload: jax.Array,     # f32[cap, 6] integer-valued, < 2^24
    q_pad: jax.Array,       # int32[nb*block, ncol] (from plan_word_windows)
    starts: jax.Array,      # int32[nb, ncol]
    *,
    block: int = 256,
    width: int = 640,
    interpret: bool = False,
) -> jax.Array:
    """Kernel half: returns t6 f32[nb*block, ncol, 6] (rows beyond the
    planner's n are garbage; callers slice). Assumes exact=True."""
    cap = wkeys.shape[0]
    npad, ncol = q_pad.shape
    B = block
    nb = npad // B
    cap_pad = _cap_pad(cap, width)
    tab = jnp.concatenate([
        wkeys[None, :],
        payload.T.astype(jnp.int32),
        jnp.zeros((1, cap), jnp.int32),
    ], axis=0)
    # pad keys must never match a valid query: row 0 pad is 0x7FFFFFFF;
    # payload rows pad with zeros (never selected anyway)
    tab = jnp.pad(tab, ((0, 0), (0, cap_pad - cap)))
    tab = tab.at[0, cap:].set(0x7FFFFFFF)
    q128 = jnp.pad(q_pad, ((0, 0), (0, 128 - ncol)), constant_values=-2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap_pad), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ncol, 8, B), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, ncol, width),
        out_shape=jax.ShapeDtypeStruct((nb, ncol, 8, B), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * ncol * 8 * width * (B + 16) * 6,
            bytes_accessed=8 * cap_pad * 4 + nb * B * 128 * 4,
            transcendentals=0),
        interpret=interpret,
    )(starts, q128, tab)
    # [nb, ncol, 8, B] -> [nb*B, ncol, 6]
    t6 = out.transpose(0, 3, 1, 2).reshape(npad, ncol, 8)[:, :, 1:7]
    return t6
