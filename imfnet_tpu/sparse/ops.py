"""Sparse-tensor compute ops: gather-GEMM convolution, masked norms, concat.

The compute half of the MinkowskiEngine replacement. A convolution with kernel
map ``nbr[N,K]`` and weight ``W[K,Cin,Cout]`` is computed as

    out[n] = Σ_k  feats[nbr[n,k]] @ W[k]        (missing neighbors → 0)

i.e. K gather + MXU-matmul steps under ``lax.scan`` — every FLOP lands on the
MXU with static shapes. Accumulation is float32 regardless of compute dtype.

Reference semantics being reproduced: `ME.MinkowskiConvolution` /
`MinkowskiConvolutionTranspose` (`model/resunet.py:42-158`),
`ME.MinkowskiBatchNorm` (`model/common.py:4-10`), `ME.cat`
(`model/resunet.py:197`), `MEF.relu` (`model/resunet.py:171`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.pallas_conv import (banded_conv_pallas_planned,
                                           banded_conv_pallas_union,
                                           block_live,
                                           plan_windows, plan_windows_union)


def row_mask(n_padded: int, num_valid: jax.Array) -> jax.Array:
    return jnp.arange(n_padded, dtype=jnp.int32) < num_valid


def _flat_apply(x: jax.Array, nbr: jax.Array, w: jax.Array) -> jax.Array:
    """gather-all-offsets + one GEMM. Missing neighbors (-1) index a zero row
    appended to the feature table — cheaper than masking the [N,K,C] gather
    output (profiled ~40 ms/step of pure mask multiply)."""
    n_in, cin = x.shape
    n_out, k = nbr.shape
    cout = w.shape[2]
    x_ext = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], axis=0)
    idx = jnp.where(nbr >= 0, nbr, n_in)
    g = jnp.take(x_ext, idx, axis=0)                         # [N,K,Cin]
    return jax.lax.dot_general(
        g.reshape(n_out, k * cin), w.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mul_first_apply(x: jax.Array, nbr: jax.Array, w: jax.Array) -> jax.Array:
    """One GEMM producing every offset's contribution, THEN K narrow gathers:

        out[i] = Σ_k (X @ W[k])[nbr[i, k]]

    Gathers are the sparse-conv wall (fixed per-row cost + bytes), so when
    Cout < Cin gathering Cout-wide product rows instead of Cin-wide input
    rows cuts gather bytes by Cin/Cout — the decoder's 256→64 convs gather
    4x less. The extra FLOPs (N_in·K·Cin·Cout vs N_out·K·Cin·Cout) are
    MXU-cheap, and up-convs have N_in < N_out anyway.

    Numerics: each per-offset GEMM accumulates in f32 but its output is
    stored back at the compute dtype before the K-way f32 sum. With f32
    compute this matches _flat_apply exactly up to addition order; with bf16
    compute each partial is rounded once more than _flat_apply's single
    K·Cin-deep contraction — a bounded extra error of K rounding steps
    (tested at bf16 tolerance in test_sparse_core.py
    ::test_mul_first_matches_flat_bf16)."""
    n_in, cin = x.shape
    n_out, k = nbr.shape
    cout = w.shape[2]
    # [N_in, Cin] @ [Cin, K*Cout] → per-offset products
    # f32 accumulation in the GEMM, stored back at compute dtype (the convert
    # fuses into the GEMM epilogue) so the gathers below move narrow rows;
    # with f32 compute this path is exact
    y = jax.lax.dot_general(
        x, w.transpose(1, 0, 2).reshape(cin, k * cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(n_in, k, cout)
    # contiguous per-offset tables so each narrow gather reads dense rows
    y_ext = jnp.concatenate(
        [y, jnp.zeros((1, k, cout), y.dtype)], axis=0).transpose(1, 0, 2)
    acc = jnp.zeros((n_out, cout), jnp.float32)
    for kk in range(k):
        idx = jnp.where(nbr[:, kk] >= 0, nbr[:, kk], n_in)
        acc = acc + jnp.take(y_ext[kk], idx, axis=0)
    return acc


def _zwin_gather(x: jax.Array, nbr: jax.Array, kz: int) -> jax.Array:
    """The z-window gather shared by forward and dW: one ``kz``-row-wide
    gather per (dx, dy) column, existence-routed to dz slots. Returns the
    same [N_out, K, Cin] block _flat_apply's gather produces.

    Valid ONLY for kernel maps with the z-adjacency property: tables are in
    scan (key) order, so the existing members of a column's consecutive-z
    target set occupy CONSECUTIVE rows, and the kernel offsets enumerate dz
    fastest (itertools.product order). The gather wall is per-row cost (see
    STATUS), so k² wide gathers beat k³ narrow ones ~2x.

    Per column: anchor = first existing target row; target dz=d sits at
    window position (number of existing targets above it), selected by a
    where-chain before the GEMM.
    """
    n_in, cin = x.shape
    n_out, k = nbr.shape
    ncol = k // kz
    # window table: xw[j] = [x[j], ..., x[j+kz-1]], tail-padded with zeros;
    # one extra all-zero row is the no-targets sentinel
    xp = jnp.concatenate([x, jnp.zeros((kz - 1, cin), x.dtype)], axis=0)
    xw = jnp.concatenate([xp[j:n_in + j] for j in range(kz)], axis=1)
    xw_ext = jnp.concatenate([xw, jnp.zeros((1, kz * cin), x.dtype)], axis=0)

    nbrw = nbr.reshape(n_out, ncol, kz)
    exists = nbrw >= 0                                     # [N, ncol, kz]
    anchor = jnp.full(nbrw.shape[:2], n_in, jnp.int32)
    for d in range(kz - 1, -1, -1):
        anchor = jnp.where(exists[..., d], nbrw[..., d], anchor)
    g = jnp.take(xw_ext, anchor, axis=0).reshape(n_out, ncol, kz, cin)

    # window position of dz slot d = count of existing targets above it
    pos = jnp.cumsum(exists.astype(jnp.int32), axis=-1) - exists.astype(jnp.int32)
    zero = jnp.zeros_like(g[:, :, 0, :])
    slots = []
    for d in range(kz):
        v = g[:, :, 0, :]
        for p in range(1, kz):
            v = jnp.where((pos[..., d] == p)[..., None], g[:, :, p, :], v)
        slots.append(jnp.where(exists[..., d, None], v, zero))
    return jnp.stack(slots, axis=2).reshape(n_out, k, cin)


def _z3_apply(x: jax.Array, nbr: jax.Array, w: jax.Array, kz: int = 3) -> jax.Array:
    """z-window gather + one GEMM (see _zwin_gather)."""
    n_out, k = nbr.shape
    cin = x.shape[1]
    cout = w.shape[2]
    sel = _zwin_gather(x, nbr, kz)
    return jax.lax.dot_general(
        sel.reshape(n_out, k * cin), w.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kz_of(k: int) -> int:
    """Kernel z-extent for cubic kernel volumes (27 → 3, 125 → 5)."""
    kz = round(k ** (1 / 3))
    return kz if kz ** 3 == k else 0


def _band_plan(n_out: int, n_in: int, k: int) -> tuple[int, int]:
    """Static (block, width) for the banded convs, from measured per-block
    rank spreads AND kernel timings on real 3DMatch fragments
    (scripts_dev/profile_band.py spreads; proto_pallas_sweep.py timings):
    stride-1 k3 spread p100 ~450 @B=256, k5 ~600; up maps ~210 @B=512;
    down maps ~720 @B=128 (1170 @B=256). Down wins at B=128/W=1024
    (2.82 vs 2.96 ms), up at B=512/W=384 (2.88 vs 3.03). A too-small width
    only costs speed (in-graph fallback), never correctness."""
    if n_out > n_in:
        return 512, 384               # transpose up: coarse targets
    if n_out < n_in:
        return 128, 1024              # down: fine targets spread ~3x wider
    return 256, (512 if k <= 27 else 640)    # stride-1


def _banded_apply(x, nbr, w, kz: int, block: int | None = None,
                  width: int | None = None):
    """Banded one-hot GEMM convolution — gather-free selection on the MXU.

    Voxel rows are in scan (key) order, so each kernel column's targets are
    rank-monotone: a block of B output rows reads a CONTIGUOUS window of
    ≲512 input rows per (dx, dy) column (measured: profile_band.py). Per
    block, one dynamic-slice per column fetches the kz-widened window and a
    0/1 matrix (anchor rank one-hot) selects rows via a single batched
    matmul — replacing XLA's per-row gathers (the sparse-conv wall, slow
    and tile-width-sensitive) with MXU work. Selection is EXACT in any
    dtype (one nonzero per one-hot row).

    If any block's window overflows the static width (fragment denser than
    the measured envelope), an in-graph lax.cond falls back to _flat_apply
    for the whole conv — a speed penalty, never a correctness one.
    """
    n_in, cin = x.shape
    n_out, k = nbr.shape
    ncol = k // kz
    cout = w.shape[2]
    plan_b, plan_w = _band_plan(n_out, n_in, k)
    W = plan_w if width is None else width
    B = plan_b if block is None else block
    nb = -(-n_out // B)
    if nb * B != n_out:
        nbr_p = jnp.concatenate(
            [nbr, jnp.full((nb * B - n_out, k), -1, jnp.int32)], 0)
    else:
        nbr_p = nbr

    nbrw = nbr_p.reshape(-1, ncol, kz)
    exists = nbrw >= 0
    anchor = jnp.full(nbrw.shape[:2], n_in, jnp.int32)
    for d in range(kz - 1, -1, -1):
        anchor = jnp.where(exists[..., d], nbrw[..., d], anchor)
    has = anchor < n_in
    pos = jnp.cumsum(exists.astype(jnp.int32), -1) - exists.astype(jnp.int32)

    anc = anchor.reshape(nb, B, ncol)
    hasb = has.reshape(nb, B, ncol)
    big = jnp.int32(1 << 30)
    am = jnp.where(hasb, anc, big)
    starts = jnp.min(am, axis=1)                            # [nb, ncol]
    starts = jnp.where(starts == big, 0, starts)
    hi = jnp.max(jnp.where(hasb, anc, -1), axis=1)
    exact = jnp.all(hi - starts < W)

    local = anc - starts[:, None, :]
    exb = exists.reshape(nb, B, ncol, kz)
    pob = pos.reshape(nb, B, ncol, kz)

    def banded():
        xp = jnp.concatenate([x, jnp.zeros((kz - 1, cin), x.dtype)], 0)
        xw = jnp.concatenate([xp[j:n_in + j] for j in range(kz)], 1)
        xe = jnp.concatenate([xw, jnp.zeros((W, kz * cin), x.dtype)], 0)

        def step(c, inp):
            st, loc, hs, ex, po = inp
            wins = jnp.stack([
                jax.lax.dynamic_slice(xe, (st[i], 0), (W, kz * cin))
                for i in range(ncol)])                      # [ncol,W,kz*cin]
            iota = jnp.arange(W, dtype=jnp.int32)
            oh = ((loc[..., None] == iota) & hs[..., None]).astype(x.dtype)
            g = jax.lax.dot_general(                        # [ncol,B,kz*cin]
                oh.transpose(1, 0, 2), wins, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(x.dtype)
            g = g.transpose(1, 0, 2).reshape(B, ncol, kz, cin)
            zero = jnp.zeros_like(g[:, :, 0, :])
            slots = []
            for d in range(kz):
                v = g[:, :, 0, :]
                for p in range(1, kz):
                    v = jnp.where((po[..., d] == p)[..., None],
                                  g[:, :, p, :], v)
                slots.append(jnp.where(ex[..., d, None], v, zero))
            sel = jnp.stack(slots, 2).reshape(B, k * cin)
            out = jax.lax.dot_general(
                sel, w.reshape(k * cin, cout), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return c, out

        _, outs = jax.lax.scan(step, 0, (starts, local, hasb, exb, pob))
        return outs.reshape(nb * B, cout)[:n_out]

    return jax.lax.cond(exact, banded, lambda: _flat_apply(x, nbr, w))


# Per-conv plan overrides for the Pallas banded conv, keyed by
# (mode, cin) with mode in {"same", "down", "up"} → (block, width, sel_t).
# width is in PACKED rows when a pack factor applies. Empty by default —
# _band_plan's measured plan rules; scripts_dev/sweep_packed_plan.py sets
# entries while searching, and measured winners get folded back into
# _band_plan.
#
# JIT-CACHE CAVEAT: this is process-global state read at TRACE time.
# Entries added (or changed) after a jitted pipeline has already traced
# have NO effect on the cached executable — a sweep that mutates this dict
# must either build a fresh jitted function per entry (what
# sweep_packed_plan.py does) or call jax.clear_caches() after each
# mutation, or its timings silently measure the stale plan.
PLAN_OVERRIDES: dict[tuple, tuple[int, int, bool]] = {}


# Measured plan table for the Pallas banded conv: (mode, cin[, cout]) →
# (block, packed_width, sel_t). Widths are in PACKED rows (P = 128/cin
# rows per 128-lane table row when cin divides 128). Entries are the
# WINNERS of the on-TPU per-case sweep (scripts_dev/sweep_plan_r4.py) over
# every conv shape the ResUNet hits on the reference sample pair — NOT the
# narrowest exact width: the sweep showed the kernel is issue/overhead
# bound, not selection-FLOP bound (cutting width 2-4× moves wall-clock
# <10%), and LARGER blocks win for the big L0 convs because the inherent
# per-column slab spread amortizes over more output rows. The 3-part key
# disambiguates convs sharing (mode, cin) but different table sizes
# (conv4_tr vs conv3_tr are both up-256). A fragment denser than the plan
# first retries at 2× width in-graph (tier 2), then falls back to
# _flat_apply — speed penalties, never correctness ones.
_BAND_PLANS: dict[tuple, tuple] = {
    ("same", 32): (512, 240, True),
    ("same", 64): (512, 464, True),
    ("same", 128): (128, 304, True, "union"),
    ("same", 256): (128, 224, True),
    ("down", 32): (128, 336, True, "union"),
    ("down", 64): (128, 384, True),
    ("down", 128): (128, 720, True),
    ("up", 128): (512, 352, True, "union"),
    ("up", 256, 64): (256, 192, True, "union"),
    ("up", 256, 128): (128, 112, True, "union"),
}


def _band_plan_packed(mode: str, cin: int, cout: int, pack: int,
                      n_out: int, n_in: int, k: int):
    """(block, packed_width, sel_t) for a conv: the measured table when the
    (mode, cin[, cout]) shape is known, else the generic _band_plan rule
    converted to packed rows. PLAN_OVERRIDES wins over both (sweep hook)."""
    for key in ((mode, cin, cout), (mode, cin)):
        if key in PLAN_OVERRIDES:
            return PLAN_OVERRIDES[key]
    for key in ((mode, cin, cout), (mode, cin)):
        if key in _BAND_PLANS:
            return _BAND_PLANS[key]
    B, W = _band_plan(n_out, n_in, k)
    Wp = max(W // pack + 8, 32) if pack > 1 else W
    return B, Wp, True


def _pallas_banded_apply(x, nbr, w, kz: int):
    """Windowed one-hot selection fully inside a Pallas kernel
    (sparse/pallas_conv.py): per output block, per (dx, dy) column, DMA one
    contiguous input window HBM→VMEM and select rows with one-hot matmuls on
    the MXU — no gathers, no HBM intermediates (the XLA banded path's cost).
    Measured at bench shapes (proto_pallas_conv.py, TPU v5e, bf16): 32ch
    6.2→3.1 ms, 64ch 5.1→3.1, 128ch 1.78→1.69, 256ch 1.84→1.77, down
    3.1→2.6, up 5.0→2.6 vs the previous best XLA strategy; round-4 plan
    tightening (width from measured spreads, B=128) cuts the selection
    FLOPs — the forward's dominant cost — by ~2× again.

    Safety contract: if any block's per-column window spread exceeds the
    static width, an in-graph lax.cond retries the SAME kernel at 2× width
    (tier 2), and only past that falls back to _flat_apply — speed
    penalties, never correctness ones. The tier-2 branch is what lets the
    tier-1 widths sit close to the measured p100 spread.
    """
    n_in, cin = x.shape
    n_out, k = nbr.shape
    # lane-pack P = 128/cin input rows per table row when cin divides 128:
    # the selection matmul and window DMA shrink P× (see _kernel_merged).
    pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
    mode = "same" if n_out == n_in else ("down" if n_out < n_in else "up")
    plan = _band_plan_packed(mode, cin, w.shape[2], pack, n_out, n_in, k)
    B, W, sel_t = plan[:3]
    # optional 4th element: "union" routes to the one-DMA-per-block kernel
    # (W is then the UNION width over all kernel columns)
    kind = plan[3] if len(plan) > 3 else "col"

    # dead-block skip: trailing capacity-padding blocks (valid rows are a
    # compacted prefix) issue no DMA and no selection work in the kernel
    live = block_live(nbr, B)
    if kind == "union":
        nbr_p, starts, exact = plan_windows_union(nbr, W, n_in,
                                                  block=B, pack=pack)
        _, _, exact2 = plan_windows_union(nbr, W * 2, n_in,
                                          block=B, pack=pack)

        def tier(width):
            return lambda: banded_conv_pallas_union(
                x, nbr_p, starts, w, n_out, block=B, width=width, pack=pack,
                live=live)
    else:
        nbr_p, starts, exact = plan_windows(nbr, kz, W, n_in,
                                            block=B, pack=pack)
        _, _, exact2 = plan_windows(nbr, kz, W * 2, n_in, block=B, pack=pack)

        def tier(width):
            return lambda: banded_conv_pallas_planned(
                x, nbr_p, starts, w, n_out, kz=kz, block=B, width=width,
                pack=pack, sel_t=sel_t, live=live)

    return jax.lax.cond(
        exact, tier(W),
        lambda: jax.lax.cond(exact2, tier(W * 2),
                             lambda: _flat_apply(x, nbr, w)))


def _apply(x, nbr, w, z_adjacent: bool = False):
    """Pick the strategy from the measured decision table
    (scripts_dev/proto_banded.py + proto_pallas_conv.py timings at bench
    shapes on TPU v5e, bf16):

    - cin == 1 (training conv1): z-window — tiny-row gathers win outright
    - z-adjacent on TPU: Pallas windowed one-hot conv (gather-free selection
      in VMEM; beats every XLA strategy at every ResUNet shape — see
      _pallas_banded_apply)
    - cin <= 32 and z-adjacent (CPU/interpret): banded one-hot GEMM in XLA
    - cout < cin: mul-first (one GEMM then Cout-narrow gathers)
    - else: flat. Wide z-window gathers (kz*cin > 128 lanes) hit an XLA
      multi-tile slow path (measured 26 ms vs flat 6.8 at 64ch) — never
      chosen anymore except via the cin==1 rule.
    """
    cin, cout = w.shape[1], w.shape[2]
    kz = _kz_of(nbr.shape[1])
    if z_adjacent and kz >= 3:
        if cin == 1:
            return _z3_apply(x, nbr, w, kz)
        if jax.default_backend() == "tpu":
            return _pallas_banded_apply(x, nbr, w, kz)
        if cin <= 32:
            return _banded_apply(x, nbr, w, kz)
    if cout < cin:
        return _mul_first_apply(x, nbr, w)
    return _flat_apply(x, nbr, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_with_transpose_bwd(compute_dtype, z_adjacent, feats, nbr, nbr_inv,
                             weight):
    return _apply(feats.astype(compute_dtype), nbr,
                  weight.astype(compute_dtype), z_adjacent=z_adjacent)


def _conv_tb_fwd(compute_dtype, z_adjacent, feats, nbr, nbr_inv, weight):
    out = _conv_with_transpose_bwd(compute_dtype, z_adjacent, feats, nbr,
                                   nbr_inv, weight)
    return out, (feats, nbr, nbr_inv, weight)


def _conv_tb_bwd(compute_dtype, z_adjacent, res, dy):
    """Scatter-free backward: the cotangent w.r.t. the input features is
    ANOTHER gather-GEMM through the map's exact inverse (`nbr_inv`; for a
    stride-1 map the map itself, for down/up convs the sibling up/down map of
    the pyramid), with offset-flipped transposed weights:

        dX[m] = Σ_k'  dY[nbr_inv[m,k']] @ W[K-1-k']ᵀ

    Autodiff would instead emit a scatter-add of the [N,K,Cin] gather — the
    single most expensive op of the whole training step (~190 ms of 287).
    dW needs no scatter either: one contraction over rows.
    """
    feats, nbr, nbr_inv, weight = res
    dt = compute_dtype
    dyc = dy.astype(dt)
    # dW[k] = gathered(feats)[.,k,:]^T @ dY  — contraction over output rows;
    # the gather reuses the z-window trick when the map allows it
    n_in, cin = feats.shape
    n_out, k = nbr.shape
    kz = _kz_of(k)
    if z_adjacent and kz >= 3 and cin == 1:
        # wide z-window gathers (kz*cin > 1 lane tile) hit the XLA
        # multi-tile slow path — only the cin==1 case wins (see _apply)
        g = _zwin_gather(feats.astype(dt), nbr, kz)          # [N,K,Cin]
    else:
        x_ext = jnp.concatenate(
            [feats.astype(dt), jnp.zeros((1, cin), dt)], axis=0)
        idx = jnp.where(nbr >= 0, nbr, n_in)
        g = jnp.take(x_ext, idx, axis=0)                     # [N,K,Cin]
    dw = jax.lax.dot_general(
        g, dyc,
        dimension_numbers=(((0,), (0,)), ((), ())),          # [K,Cin,Cout]
        preferred_element_type=jnp.float32,
    )
    # dX via the inverse map. All pyramid maps (stride-1, down, AND up —
    # the existing targets of an up column are consecutive coarse rows)
    # satisfy the z-adjacency invariant, so the inverse map inherits the
    # conv's flag and the chooser can pick the z-window there too.
    w_flip_t = jnp.flip(weight.astype(dt), axis=0).transpose(0, 2, 1)
    dx = _apply(dyc, nbr_inv, w_flip_t, z_adjacent=z_adjacent)
    return dx.astype(feats.dtype), None, None, dw.astype(weight.dtype)


_conv_with_transpose_bwd.defvjp(_conv_tb_fwd, _conv_tb_bwd)


def sparse_conv(
    feats: jax.Array,        # [N_in, Cin]
    nbr: jax.Array,          # int32[N_out, K] input row per offset, -1 = none
    weight: jax.Array,       # [K, Cin, Cout]
    *,
    bias: Optional[jax.Array] = None,  # [Cout]
    out_mask: Optional[jax.Array] = None,  # bool[N_out]; required if bias given
    compute_dtype=jnp.bfloat16,
    impl: str = "flat",      # 'flat' (one gather + one GEMM) | 'scan'
    nbr_inv: Optional[jax.Array] = None,  # int32[N_in, K] exact inverse map
    z_adjacent: bool = False,  # map guarantees the z-window property (_z3_apply)
) -> jax.Array:
    """Sparse convolution. Returns [N_out, Cout] float32. Padding/missing
    neighbors contribute zero, so rows with no valid neighbor come out
    exactly zero (before bias).

    impl='flat' gathers all K neighbors at once and runs ONE MXU matmul with
    contraction dim K*Cin — profiled ~2.5x faster than the K-step scan, whose
    27 sequential tiny matmuls are loop-latency-bound on TPU. 'scan' trades
    that speed for K-fold less transient memory ([N,K,Cin] never materializes).

    When ``nbr_inv`` is given (the map's exact inverse: the map itself for
    stride-1 convs, the sibling up/down map for strided ones), the backward
    pass is a gather-GEMM through it instead of autodiff's scatter-add — the
    dominant cost of training otherwise.
    """
    k = nbr.shape[1]
    n_out = nbr.shape[0]
    cin = weight.shape[1]
    cout = weight.shape[2]
    w = weight.astype(compute_dtype)
    x = feats.astype(compute_dtype)

    if impl == "flat" and nbr_inv is not None:
        acc = _conv_with_transpose_bwd(compute_dtype, z_adjacent, feats, nbr,
                                       nbr_inv, weight)
    elif impl == "flat":
        acc = _apply(x, nbr, w, z_adjacent=z_adjacent)
    else:
        def step(acc, inputs):
            nbr_k, w_k = inputs
            ok = nbr_k >= 0
            g = jnp.take(x, jnp.maximum(nbr_k, 0), axis=0)
            g = jnp.where(ok[:, None], g, 0)
            acc = acc + jnp.dot(g, w_k, preferred_element_type=jnp.float32)
            return acc, None

        acc0 = jnp.zeros((n_out, cout), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (nbr.T, w))
    if bias is not None:
        assert out_mask is not None
        acc = jnp.where(out_mask[:, None], acc + bias.astype(jnp.float32), 0.0)
    return acc


def masked_batchnorm_stats(
    feats: jax.Array, mask: jax.Array, num_valid: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(mean, biased var) over valid rows only — the sparse-tensor analogue of
    `ME.MinkowskiBatchNorm` batch statistics."""
    denom = jnp.maximum(num_valid.astype(jnp.float32), 1.0)
    f = feats.astype(jnp.float32) * mask[:, None]
    mean = jnp.sum(f, axis=0) / denom
    sq = jnp.sum(f * f, axis=0) / denom
    var = jnp.maximum(sq - mean * mean, 0.0)
    return mean, var


def masked_instancenorm(
    feats: jax.Array,
    batch_ids: jax.Array,   # int32[N] batch index per row (padding → max_batch)
    mask: jax.Array,
    max_batch: int,
    eps: float = 1e-5,
) -> jax.Array:
    """Per-sample (per batch segment) feature normalization — the analogue of
    `ME.MinkowskiInstanceNorm` (`model/common.py:7-8`), used by the IN model
    variants (`model/resunet.py:304-326`)."""
    b = jnp.where(mask, batch_ids, max_batch)
    f = feats.astype(jnp.float32) * mask[:, None]
    cnt = jnp.zeros((max_batch + 1, 1), jnp.float32).at[b].add(1.0)
    s = jnp.zeros((max_batch + 1, feats.shape[1]), jnp.float32).at[b].add(f)
    mean = s / jnp.maximum(cnt, 1.0)
    centered = f - jnp.take(mean, b, axis=0) * mask[:, None]
    sq = jnp.zeros((max_batch + 1, feats.shape[1]), jnp.float32).at[b].add(centered * centered)
    var = sq / jnp.maximum(cnt, 1.0)
    inv = jax.lax.rsqrt(jnp.take(var, b, axis=0) + eps)
    return centered * inv * mask[:, None]


def sparse_cat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Feature concat of two sparse tensors sharing a coordinate table
    (`ME.cat`, `model/resunet.py:197-219`). Rows must be aligned — guaranteed
    because decoder levels reuse the encoder coordinate tables."""
    return jnp.concatenate([a, b], axis=1)
