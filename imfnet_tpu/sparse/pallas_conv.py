"""Pallas TPU sparse-conv kernel: windowed one-hot selection on the MXU.

The sparse-conv wall on TPU is XLA's per-row gather rate (~3.5 ns/row, worse
past 128-element rows) — see STATUS.md. The banded XLA path
(`ops._banded_apply`) replaces gathers with one-hot matmuls but XLA
materializes the one-hot matrices, the z-widened feature table, and every
intermediate through HBM, which is why it only wins at cin<=32.

This kernel keeps the whole selection in VMEM:

    for each block of 256 output rows, for each (dx, dy) kernel column:
      - DMA a contiguous window of input rows  HBM -> VMEM   (maps are
        rank-monotone in scan order: a 256-row output block reads a
        bounded window per column, measured ~450-1200 rows)
      - one-hot = (target_row - window_start == iota)         (VPU, VMEM)
      - selected = one-hot @ window                           (MXU)
      - acc += selected @ W[offset]                           (MXU)

No gathers anywhere, no HBM traffic besides the windows (read ~W/B times
each) and the output. Selection is exact in any dtype (one 1.0 per row).

Reference semantics reproduced: `ME.MinkowskiConvolution` as used at
`/root/reference/model/resunet.py:42-158` — out[i] = sum_k x[nbr[i,k]] @ W[k]
with missing neighbors contributing zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_merged(ncol: int, kz: int, width: int, pack: int, cin: int,
                   starts_ref, live_ref, nbrt_ref, x_any, wf_ref, out_ref,
                   win, selbuf, sem):
    """Variant of _kernel: stage all k selections into one VMEM buffer and
    apply the weights with ONE [B, k*cp] @ [k*cp, cout] matmul instead of k
    accumulated [B, cp] @ [cp, cout] matmuls — k-1 fewer MXU ops per block
    (small-matmul issue overhead dominates at these sizes).

    With ``pack`` = P > 1, the feature table is LANE-PACKED: P consecutive
    input rows (cin lanes each, P*cin == 128) share one 128-lane packed row,
    so the window DMA moves P× fewer bytes and the one-hot selection matmul
    contracts a P× shorter axis — the dominant cost of this kernel for
    cin < 128 (selection FLOPs scale with window rows, not with cin).
    Selecting packed row t>>log2(P) yields all P interleaved sub-rows; a
    per-row lane-group mask (built by a tiny [P,B]×[P,128] one-hot matmul —
    MXU, exact) zeroes the P-1 wrong groups, and the weight matrix is tiled
    P× along its input axis so every group position applies the same
    weights. Packing changes DMA/selection cost only; the math is exact.

    wf_ref : VMEM [k*cp, cout]   weights flattened (pack-tiled) on the host
    selbuf : VMEM [B, k*cp]      staged selections (compute dtype)
    live_ref : SMEM int32[nb]    dead-block skip (see _kernel_union)
    """
    i = pl.program_id(0)
    B = nbrt_ref.shape[1]
    cp = win.shape[2]
    dt = win.dtype
    shift = pack.bit_length() - 1                        # pack is 2**shift

    def dma(slot, col):
        s = pl.multiple_of(starts_ref[i, col], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, width), :], win.at[slot], sem.at[slot])

    @pl.when(live_ref[i] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_ref[i] != 0)
    def _():
        dma(0, 0).start()
        iota = jax.lax.broadcasted_iota(jnp.int32, (width, B), 0)
        if pack > 1:
            # E[p,l] = 1 iff lane l belongs to group p (constant, hoisted)
            lane_grp = (jax.lax.broadcasted_iota(jnp.int32, (pack, 128), 1)
                        // cin)
            grp_iota = jax.lax.broadcasted_iota(jnp.int32, (pack, 128), 0)
            E = (lane_grp == grp_iota).astype(dt)        # [P, 128]
            grp_rows = jax.lax.broadcasted_iota(jnp.int32, (pack, B), 0)
        for col in range(ncol):
            slot = col % 2
            if col + 1 < ncol:
                dma(slot ^ 1, col + 1).start()
            dma(slot, col).wait()
            start = starts_ref[i, col]
            for d in range(kz):
                j = col * kz + d
                t = nbrt_ref[j:j + 1, :]                 # [1,B]; -1 if none
                if pack > 1:
                    tp = jax.lax.shift_right_arithmetic(t, shift)
                    loc = tp - start                     # packed-row offset
                else:
                    loc = t - start
                oh = (iota == loc).astype(dt)            # [width, B]
                sel = jax.lax.dot_general(               # [B, cp]
                    oh, win[slot], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if pack > 1:
                    # mask lanes to this row's group: (-1 rows select
                    # nothing already — their one-hot column is all zero)
                    ohg = (grp_rows == (t & (pack - 1))).astype(dt)  # [P,B]
                    m = jax.lax.dot_general(             # [B, 128]
                        ohg, E, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    sel = sel * m
                selbuf[:, j * cp:(j + 1) * cp] = sel.astype(dt)
        out_ref[:] = jax.lax.dot_general(                # [B, cout]
            selbuf[:, :], wf_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _kernel_merged_t(ncol: int, kz: int, width: int, pack: int, cin: int,
                     starts_ref, live_ref, nbrt_ref, x_any, wf_ref, out_ref,
                     win, selbuf, sem):
    """Transposed-selection variant of _kernel_merged for pack > 1: the
    selection matmul contracts into [cp, B] (features on sublanes, rows on
    lanes), so the per-row lane-group mask is a pure VPU compare of a
    sublane iota against the [1, B] group row — no transpose, no mask
    matmul (the K=pack mask matmul wastes a full MXU pass per offset in
    _kernel_merged; measured +70% on the L0 32ch conv).

    GROUP-SUM COMPRESSION (round 4): after masking, each selected [cp, B]
    tile has exactly one nonzero lane-group of ``cin`` sublanes per row, so
    summing the P groups (P-1 static-slice VPU adds) compresses it to
    [cin, B] losslessly. selbuf is [k*cin, B] — P× smaller — and the final
    weight GEMM contracts k*cin instead of k*128: P× fewer weight FLOPs
    and no pack-tiled weight matrix.

    A column-batched variant (one [width, kz*B] one-hot per column, kz×
    fewer MXU issues) was measured SLOWER (L0 32ch 2.18 → 2.49 ms, pack=1
    64ch 2.98 → 4.46): the [cp, kz*B] f32 selection intermediate spills —
    per-offset [cp, B] tiles stay register-resident.
    """
    i = pl.program_id(0)
    B = nbrt_ref.shape[1]
    cp = win.shape[2]
    dt = win.dtype
    shift = pack.bit_length() - 1

    def dma(slot, col):
        s = pl.multiple_of(starts_ref[i, col], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, width), :], win.at[slot], sem.at[slot])

    @pl.when(live_ref[i] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_ref[i] != 0)
    def _():
        dma(0, 0).start()
        iota = jax.lax.broadcasted_iota(jnp.int32, (width, B), 0)
        # lane-group of each sublane position, broadcast over B lanes
        sub_grp = jax.lax.broadcasted_iota(jnp.int32, (cp, B), 0) // cin
        for col in range(ncol):
            slot = col % 2
            if col + 1 < ncol:
                dma(slot ^ 1, col + 1).start()
            dma(slot, col).wait()
            start = starts_ref[i, col]
            for d in range(kz):
                j = col * kz + d
                t = nbrt_ref[j:j + 1, :]                 # [1,B]; -1 if none
                tp = jax.lax.shift_right_arithmetic(t, shift)
                loc = tp - start
                oh = (iota == loc).astype(dt)            # [width, B]
                sel = jax.lax.dot_general(               # [cp, B]
                    win[slot], oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = (sub_grp == (t & (pack - 1))).astype(jnp.float32)
                sm = sel * m
                acc = sm[0:cin, :]
                for p in range(1, pack):
                    acc = acc + sm[p * cin:(p + 1) * cin, :]
                selbuf[j * cin:(j + 1) * cin, :] = acc.astype(dt)
        out_ref[:] = jax.lax.dot_general(                # [B, cout]
            selbuf[:, :], wf_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _kernel_union(k: int, width: int, pack: int, cin: int,
                  starts_ref, live_ref, nbrt_ref, x_any, wf_ref, out_ref,
                  win, selbuf, sem):
    """UNION-window variant: ONE DMA per output block covering the union of
    all kernel columns' windows, double-buffered ACROSS grid steps (block
    i's compute overlaps block i+1's window fetch). The per-column kernels
    (_kernel_merged*) issue ncol=9 serialized window DMAs per block and the
    round-4 sweep showed they are DMA/issue bound, not FLOP bound — the
    union window trades a ~2× wider one-hot (idle MXU headroom) for 9×
    fewer DMA issues and ~4× fewer window bytes.

    DEAD-BLOCK SKIP (round 5): ``live_ref`` int32[nb] marks blocks with any
    valid target. Valid rows are a compacted prefix of the padded table
    (sparse/coords.py), so the trailing capacity blocks are all-dead — the
    grid still visits them, but a dead block issues no DMA, waits on
    nothing, and writes zeros (at bench shapes ~40% of L0 blocks are dead;
    their one-hot+GEMM work was pure padding overhead). DMA bookkeeping
    stays exact: block j's window DMA is started (at step j-1, or j==0)
    and waited (at step j) iff live[j].

    Layouts: pack > 1 uses the transposed selection + group-sum compression
    of _kernel_merged_t (selbuf [k*cin, B]); pack == 1 uses the
    _kernel_merged layout (selbuf [B, k*cp]).
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    B = nbrt_ref.shape[1]
    cp = win.shape[2]
    dt = win.dtype
    shift = pack.bit_length() - 1

    def dma(slot, blk):
        s = pl.multiple_of(starts_ref[blk], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, width), :], win.at[slot], sem.at[slot])

    @pl.when((i == 0) & (live_ref[0] != 0))
    def _():
        dma(0, 0).start()

    nxt = jnp.minimum(i + 1, nb - 1)

    @pl.when((i + 1 < nb) & (live_ref[nxt] != 0))
    def _():
        dma((i + 1) % 2, i + 1).start()

    @pl.when(live_ref[i] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_ref[i] != 0)
    def _():
        slot = i % 2
        dma(slot, i).wait()
        start = starts_ref[i]
        iota = jax.lax.broadcasted_iota(jnp.int32, (width, B), 0)
        if pack > 1:
            sub_grp = jax.lax.broadcasted_iota(jnp.int32, (cp, B), 0) // cin
        for j in range(k):
            t = nbrt_ref[j:j + 1, :]                     # [1,B]; -1 if none
            if pack > 1:
                tp = jax.lax.shift_right_arithmetic(t, shift)
                loc = tp - start
            else:
                loc = t - start
            oh = (iota == loc).astype(dt)                # [width, B]
            if pack > 1:
                sel = jax.lax.dot_general(               # [cp, B]
                    win[slot], oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = (sub_grp == (t & (pack - 1))).astype(jnp.float32)
                sm = sel * m
                acc = sm[0:cin, :]
                for p in range(1, pack):
                    acc = acc + sm[p * cin:(p + 1) * cin, :]
                selbuf[j * cin:(j + 1) * cin, :] = acc.astype(dt)
            else:
                sel = jax.lax.dot_general(               # [B, cp]
                    oh, win[slot], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                selbuf[:, j * cp:(j + 1) * cp] = sel.astype(dt)
        if pack > 1:
            out_ref[:] = jax.lax.dot_general(            # [B, cout]
                selbuf[:, :], wf_ref[:, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            out_ref[:] = jax.lax.dot_general(            # [B, cout]
                selbuf[:, :], wf_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def block_live(nbr: jax.Array, block: int) -> jax.Array:
    """int32[nb]: 1 where a block of ``block`` output rows has ANY valid
    kernel target. Valid rows are a compacted prefix of the padded table
    (sparse/coords.py quantize), so dead blocks are the trailing capacity
    padding — the kernels skip their DMA + compute entirely and write zeros
    (identical to the all-(-1) one-hot result, at none of the cost)."""
    n_out, k = nbr.shape
    nb = -(-n_out // block)
    if nb * block != n_out:
        nbr = jnp.concatenate(
            [nbr, jnp.full((nb * block - n_out, k), -1, jnp.int32)], 0)
    return jnp.any(nbr.reshape(nb, block * k) >= 0, axis=1).astype(jnp.int32)


def plan_windows_union(nbr: jax.Array, width: int, n_in: int,
                       block: int = 256, pack: int = 1):
    """Per-block UNION window starts (over all k offsets) + in-graph
    exactness check — the planning half of _kernel_union. Returns
    (nbr_padded int32[nb*block, k], starts int32[nb], exact bool[])."""
    n_out, k = nbr.shape
    B = block
    nb = -(-n_out // B)
    if nb * B != n_out:
        nbr = jnp.concatenate(
            [nbr, jnp.full((nb * B - n_out, k), -1, jnp.int32)], 0)
    t = nbr.reshape(nb, B * k)
    valid = t >= 0
    if pack > 1:
        t = jnp.where(valid, t // pack, t)
        n_hi = -(-n_in // pack)
    else:
        n_hi = n_in
    big = jnp.int32(1 << 30)
    tmin = jnp.min(jnp.where(valid, t, big), axis=1)             # [nb]
    tmax = jnp.max(jnp.where(valid, t, -1), axis=1)
    has = tmin != big
    starts = jnp.where(has, jnp.clip(tmin & ~7, 0, n_hi), 0)
    exact = jnp.all(jnp.where(has, tmax - starts < width, True))
    return nbr, starts, exact


def banded_conv_pallas_union(
    x: jax.Array,           # [n_in, cin] compute dtype
    nbr: jax.Array,         # int32[nb*block, k] (from plan_windows_union)
    starts: jax.Array,      # int32[nb]          (from plan_windows_union)
    w: jax.Array,           # [k, cin, cout] compute dtype
    n_out: int,
    *,
    block: int = 256,
    width: int = 512,
    pack: int = 1,
    live: jax.Array | None = None,   # int32[nb] from block_live; None = all
    interpret: bool = False,
) -> jax.Array:
    """Union-window kernel invocation (assumes plan_windows_union said
    exact=True; callers guard with lax.cond). ``width`` is in packed rows
    when pack > 1."""
    n_in, cin = x.shape
    k = nbr.shape[1]
    cout = w.shape[2]
    B = block
    nb = nbr.shape[0] // B
    if live is None:
        live = jnp.ones((nb,), jnp.int32)

    if pack > 1:
        assert pack & (pack - 1) == 0 and pack * cin == 128, (pack, cin)
        n_p = -(-n_in // pack) * pack
        if n_p != n_in:
            x = jnp.pad(x, ((0, n_p - n_in), (0, 0)))
        x = x.reshape(n_p // pack, 128)
        cp = 128
        w_in = w.reshape(k * cin, cout)
        selbuf = pltpu.VMEM((k * cin, B), x.dtype)
    else:
        cp = -(-cin // 128) * 128
        if cp != cin:
            x = jnp.pad(x, ((0, 0), (0, cp - cin)))
            w = jnp.pad(w, ((0, 0), (0, cp - cin), (0, 0)))
        w_in = w.reshape(k * cp, cout)
        selbuf = pltpu.VMEM((B, k * cp), x.dtype)
    x_pad = jnp.concatenate([x, jnp.zeros((width, cp), x.dtype)], 0)

    kern = functools.partial(_kernel_union, k, width, pack, cin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k, B), lambda i, s, l: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, cout), lambda i, s, l: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, width, cp), x.dtype),
            selbuf,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    cw = cin if pack > 1 else cp
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nb * B, cout), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * B * k * (cp * width + cw * cout),
            bytes_accessed=nb * width * cp * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(starts, live, nbr.T, x_pad, w_in)
    return out[:n_out]


def _kernel(ncol: int, kz: int, width: int,
            starts_ref, live_ref, nbrt_ref, x_any, w_ref, out_ref, win, sem):
    """One grid step = one block of B output rows, all k = ncol*kz offsets.

    starts_ref : SMEM int32[nb, ncol]  per-block per-column window starts
    nbrt_ref   : VMEM int32[k, B]      target input row per offset (-1 none);
                 TRANSPOSED so per-offset reads are static sublane slices
                 (lane slices at offset j violate Mosaic's 128-lane tiling)
    x_any      : ANY  [n_pad, cp]      feature table, lanes padded to 128s
                 (HBM window DMAs must be 128-aligned on the lane axis)
    w_ref      : VMEM [k, cp, cout]    weights (compute dtype, cin lane-pad)
    out_ref    : VMEM f32[B, cout]
    win        : VMEM [2, width, cp]   double-buffered window scratch
    sem        : DMA semaphores (2,)
    """
    i = pl.program_id(0)
    B = nbrt_ref.shape[1]
    cout = w_ref.shape[2]
    dt = win.dtype

    def dma(slot, col):
        s = pl.multiple_of(starts_ref[i, col], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s, width), :], win.at[slot], sem.at[slot])

    @pl.when(live_ref[i] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(live_ref[i] != 0)
    def _():
        dma(0, 0).start()
        iota = jax.lax.broadcasted_iota(jnp.int32, (width, B), 0)
        acc = jnp.zeros((B, cout), jnp.float32)
        for col in range(ncol):
            slot = col % 2
            if col + 1 < ncol:
                dma(slot ^ 1, col + 1).start()
            dma(slot, col).wait()
            start = starts_ref[i, col]
            for d in range(kz):
                j = col * kz + d
                loc = nbrt_ref[j:j + 1, :] - start       # [1,B]; <0 if none
                oh = (iota == loc).astype(dt)            # [width, B]
                # one 1.0 per oh column → selection is exact in any dtype
                sel = jax.lax.dot_general(               # [B, cp]
                    oh, win[slot], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot_general(         # [B, cout]
                    sel.astype(dt), w_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out_ref[:] = acc


def plan_windows(nbr: jax.Array, kz: int, width: int, n_in: int,
                 block: int = 256, pack: int = 1):
    """Per-block per-column window starts + in-graph exactness check.

    Returns (nbr_padded int32[nb*block, k], starts int32[nb, ncol],
    exact bool[]). ``exact`` is False when some block's per-column window
    spread exceeds ``width`` — the kernel's output would be WRONG for those
    rows, so callers run it under ``lax.cond(exact, ...)`` with a gather
    fallback (ops._apply). Window starts are 8-row aligned for DMA
    friendliness, so the effective spread budget is width - 7.

    With ``pack`` = P > 1, starts/width/exact are all in PACKED rows
    (P input rows per 128-lane table row — see _kernel_merged): one packed
    width row covers P original rows, so the spread budget is ~(width-8)*P.
    """
    n_out, k = nbr.shape
    ncol = k // kz
    assert ncol * kz == k, (k, kz)
    B = block
    nb = -(-n_out // B)
    if nb * B != n_out:
        nbr = jnp.concatenate(
            [nbr, jnp.full((nb * B - n_out, k), -1, jnp.int32)], 0)
    t = nbr.reshape(nb, B, ncol, kz)
    valid = t >= 0
    if pack > 1:
        t = jnp.where(valid, t // pack, t)
        n_hi = -(-n_in // pack)
    else:
        n_hi = n_in
    big = jnp.int32(1 << 30)
    tmin = jnp.min(jnp.where(valid, t, big), axis=(1, 3))        # [nb, ncol]
    tmax = jnp.max(jnp.where(valid, t, -1), axis=(1, 3))
    has = tmin != big
    starts = jnp.where(has, jnp.clip(tmin & ~7, 0, n_hi), 0)
    exact = jnp.all(jnp.where(has, tmax - starts < width, True))
    return nbr, starts, exact


def banded_conv_pallas_planned(
    x: jax.Array,           # [n_in, cin] compute dtype
    nbr: jax.Array,         # int32[nb*block, k] (from plan_windows)
    starts: jax.Array,      # int32[nb, ncol]   (from plan_windows)
    w: jax.Array,           # [k, cin, cout] compute dtype
    n_out: int,
    *,
    kz: int = 3,
    block: int = 256,
    width: int = 512,
    pack: int = 1,
    sel_t: bool = True,
    merged: bool = True,
    live: jax.Array | None = None,   # int32[nb] from block_live; None = all
    interpret: bool = False,
) -> jax.Array:
    """The kernel invocation half of banded_conv_pallas: assumes
    plan_windows said exact=True (callers guard with lax.cond).

    ``pack`` = P > 1 (requires P a power of two, P*cin == 128, merged=True,
    and plan_windows called with the same pack): lane-pack P input rows per
    128-lane table row — P× less window DMA and P× fewer selection FLOPs
    (see _kernel_merged). ``width`` is then in packed rows.
    """
    n_in, cin = x.shape
    k = nbr.shape[1]
    cout = w.shape[2]
    ncol = k // kz
    B = block
    nb = nbr.shape[0] // B
    if live is None:
        live = jnp.ones((nb,), jnp.int32)

    if pack > 1:
        assert merged and pack & (pack - 1) == 0 and pack * cin == 128, \
            (pack, cin)
        # lane-pack: P consecutive rows share one 128-lane row
        n_p = -(-n_in // pack) * pack
        if n_p != n_in:
            x = jnp.pad(x, ((0, n_p - n_in), (0, 0)))
        x = x.reshape(n_p // pack, 128)
        cp = 128
    else:
        # lane-pad cin to a multiple of 128: HBM window DMAs must be
        # 128-aligned on the lane axis, and the MXU charges N=128 per matmul
        # tile anyway — padding costs only window-DMA bytes, never MXU time.
        # Zero feature lanes x zero weight rows contribute zero.
        cp = -(-cin // 128) * 128
        if cp != cin:
            x = jnp.pad(x, ((0, 0), (0, cp - cin)))
            w = jnp.pad(w, ((0, 0), (0, cp - cin), (0, 0)))
    # window DMAs may run past the table end: back it with `width` zero rows
    x_pad = jnp.concatenate([x, jnp.zeros((width, cp), x.dtype)], 0)

    scratch = [
        pltpu.VMEM((2, width, cp), x.dtype),
    ]
    nbr_t = nbr.T                                        # [k, nb*B]
    nbr_block = (k, B)
    if merged:
        if pack > 1 and sel_t:
            # group-sum compression: selbuf holds [k*cin, B] and the weight
            # matrix needs no pack-tiling (see _kernel_merged_t)
            scratch.append(pltpu.VMEM((k * cin, B), x.dtype))
            kern = functools.partial(_kernel_merged_t, ncol, kz, width,
                                     pack, cin)
            w_in = w.reshape(k * cin, cout)
        else:
            scratch.append(pltpu.VMEM((B, k * cp), x.dtype))
            kern = functools.partial(_kernel_merged, ncol, kz, width,
                                     pack, cin)
            # pack-tile the weights along cin so every lane group applies
            # the same W (wrong groups are zero-masked in the kernel)
            w_in = (jnp.tile(w, (1, pack, 1)) if pack > 1 else w).reshape(
                k * cp, cout)
    else:
        assert pack == 1
        kern = functools.partial(_kernel, ncol, kz, width)
        w_in = w
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(nbr_block, lambda i, s, l: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, cout), lambda i, s, l: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    cw = cin if (pack > 1 and sel_t and merged) else cp
    flops = 2 * nb * B * k * (cp * width + cw * cout)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nb * B, cout), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nb * ncol * width * cp * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(starts, live, nbr_t, x_pad, w_in)
    return out[:n_out]


@functools.partial(jax.jit, static_argnames=("kz", "block", "width", "pack",
                                             "sel_t", "merged", "interpret"))
def banded_conv_pallas(
    x: jax.Array,           # [n_in, cin] compute dtype
    nbr: jax.Array,         # int32[n_out, k], -1 = missing
    w: jax.Array,           # [k, cin, cout] compute dtype
    *,
    kz: int = 3,
    block: int = 256,
    width: int = 512,
    pack: int = 1,
    sel_t: bool = True,
    merged: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """plan_windows + kernel in one call. Returns (out f32[n_out, cout],
    exact bool[]); out is garbage for overflowing blocks when exact is
    False — production callers go through ops._apply, which plans first and
    only runs the kernel under lax.cond(exact). ``width`` is in packed rows
    when pack > 1."""
    n_out = nbr.shape[0]
    nbr_p, starts, exact = plan_windows(nbr, kz, width, x.shape[0],
                                        block=block, pack=pack)
    out = banded_conv_pallas_planned(x, nbr_p, starts, w, n_out, kz=kz,
                                     block=block, width=width, pack=pack,
                                     sel_t=sel_t, merged=merged,
                                     live=block_live(nbr, block),
                                     interpret=interpret)
    return out, exact
