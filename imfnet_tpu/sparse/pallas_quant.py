"""Pallas TPU kernel: sorted-run compaction for voxel quantization.

`sparse.grid.quantize_grid` dedups voxels by sorting (cell-key, row) and
compacting the first row of every equal-key run into scan-order output
slots. In XLA that compaction tail is marks -> 524k cumsum -> a 524k->41k
scatter — all per-row-rate bound on TPU (the scatter alone is ~2.4 ms at
bench shapes, scripts_dev/profile_quant3.py). This splits the work:

    Pallas (sequential grid, one pass over the sorted stream):
      per block of B rows: run-start marks vs the previous key (carried in
      SMEM across blocks), local inclusive rank via triangular-matmul lane
      cumsums (exact in f32), then a [B_out, B_in] 0/1 one-hot matmul
      compacts the marked rows' payload (original row index) into the
      block's own output slot — a plain blocked write, no scatter.

    XLA (tiny): per-block counts -> exclusive cumsum -> each global output
      slot finds its (block, offset) by comparing against the 256-entry
      base table (broadcast compare, no gather) -> ONE n_out-row gather
      stitches the block-local compactions into the global scan-order
      selection.

Capacity overflow keeps the first `n_out` uniques in scan order (the
`quantize_grid` contract).

MEASURED RESULT (TPU v5e, bench shapes, scripts_dev/profile_quant3.py +
the composition bisect): exact, but ~6 ms vs the XLA scatter tail's
~2.7 ms — 256 sequential grid steps each paying a [B, B] one-hot compare
(N*B total VPU work) plus per-step overhead. quantize_grid therefore keeps
the XLA tail on "auto" and exposes this as compact_impl="pallas" only.
Smaller blocks cut the compare work linearly but multiply step overhead;
neither direction beats the scatter. Revisit only if a future Mosaic
supports vectorized VMEM scatter (which would remove the one-hot).

Exactness: matmul operands are f32 holding integers (rows < 2^24) and the
payload dot pins Precision.HIGHEST — the MXU truncates f32 inputs to bf16
at default precision, which would round row indices past 2^8. One-hot and
0/1 cumsum operands are bf16-exact, so those dots stay at default.

Reference semantics reproduced: first-occurrence-winner voxel dedup of
`ME.utils.sparse_quantize` as used at `/root/reference/util/misc.py:83`
(the stable sort upstream makes the first row of a run the min row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 0x7FFFFFFF


def _kernel(interpret: bool, sh_ref, sr_ref, out_ref, cnt_ref, carry):
    """One grid step = one block of B sorted rows.

    sh_ref : VMEM int32[1, B]  sorted cell keys (invalid = BIG)
    sr_ref : VMEM int32[1, B]  sorted original row indices
    out_ref: VMEM int32[R, C]  block-local compaction (slot -> row index),
             slot j at (j // C, j % C) — (R, C) = (B/128, 128) satisfies
             the (8, 128) block-tiling rules a (1, B) block would violate
    cnt_ref: SMEM int32[nb]    per-block run-start counts (full array)
    carry  : SMEM int32[1]     previous block's last key
    """
    i = pl.program_id(0)
    B = sh_ref.shape[1]
    R, C = B // 128, 128

    @pl.when(i == 0)
    def _init():
        carry[0] = jnp.int32(BIG)

    prev_key = carry[0]

    sh = sh_ref[:, :]                                    # [1, B] int32
    sr = sr_ref[:, :]
    # run-start marks: key differs from predecessor (block-carried) & valid
    if interpret:
        shifted = jnp.roll(sh, 1, axis=1)
    else:
        shifted = pltpu.roll(sh, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    shifted = jnp.where(lane == 0, prev_key, shifted)
    m = (sh != BIG) & (sh != shifted)                    # [1, B] bool

    # local inclusive rank: flat-order cumsum via triangular matmuls.
    # (cast before reshape: reshaping a bool vector crashes the Mosaic
    # backend shipped with jax 0.9.0)
    m2 = m.astype(jnp.float32).reshape(R, C)             # [R, C]
    tri_c = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
             <= jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
             ).astype(jnp.float32)
    row_cum = jax.lax.dot_general(                       # [R, C] inclusive
        m2, tri_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    row_tot = row_cum[:, C - 1:C]                        # [R, 1]
    tri_r = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
             < jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
             ).astype(jnp.float32)                       # strictly lower
    row_off = jax.lax.dot_general(                       # [R, 1] exclusive
        tri_r, row_tot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rank = (row_cum + row_off).reshape(1, B)             # [1, B] inclusive
    total = (row_off[R - 1, 0] + row_tot[R - 1, 0]).astype(jnp.int32)

    # compact marked row indices to block-local slots: one-hot matmul
    slot = jnp.where(m, rank.astype(jnp.int32) - 1, -1)  # [1, B] int32
    oh = (slot ==
          jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
          ).astype(jnp.float32)                          # [B_out, B_in]
    packed = jax.lax.dot_general(                        # [1, B_out]
        sr.astype(jnp.float32), oh, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    out_ref[:, :] = packed.astype(jnp.int32).reshape(R, C)
    cnt_ref[i] = total
    carry[0] = sh[0, B - 1]


@functools.partial(jax.jit, static_argnames=("n_out", "block", "interpret"))
def sorted_compact(sh: jax.Array, sr: jax.Array, n_out: int,
                   block: int = 2048, interpret: bool = False):
    """Compact a sorted (key, row) stream to first-of-run rows in scan order.

    sh : int32[N] sorted cell keys, invalid rows = BIG (sorted last)
    sr : int32[N] original row index per sorted row (< 2^24; the
         stable-sort payload)

    Returns (sel int32[n_out], num_valid int32[]): sel[j] = original row of
    the j-th unique cell in scan order, BIG beyond num_valid. Matches the
    XLA marks/cumsum/scatter tail of quantize_grid exactly.
    """
    n = sh.shape[0]
    B = block
    assert n % B == 0, (n, B)
    nb = n // B

    rowvals, cnt = pl.pallas_call(
        functools.partial(_kernel, interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, i)),
            pl.BlockSpec((1, B), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((B // 128, 128), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * (B // 128), 128), jnp.int32),
            jax.ShapeDtypeStruct((nb,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(sh.reshape(1, n), sr.reshape(1, n))

    counts = cnt                                          # [nb]
    bases = jnp.cumsum(counts) - counts                   # exclusive
    total = bases[nb - 1] + counts[nb - 1]
    num_valid = jnp.minimum(total, jnp.int32(n_out))

    # global slot j lives in the last block whose base <= j, at offset
    # j - base. The base table is tiny (nb entries), so both lookups are
    # broadcast compares/reduces — no per-row gather.
    j = jnp.arange(n_out, dtype=jnp.int32)
    le = bases[None, :] <= j[:, None]                     # [n_out, nb]
    blk_id = jnp.sum(le.astype(jnp.int32), axis=1) - 1
    base_j = jnp.max(jnp.where(le, bases[None, :], -1), axis=1)
    src = blk_id * B + (j - base_j)
    sel = jnp.take(rowvals.reshape(nb * B), src)
    live = j < num_valid
    sel = jnp.where(live, sel, BIG)
    return sel, num_valid
