"""HBM-traffic model for the sparse-conv forward: the roofline denominator.

VERDICT r4 item 3: the "DMA-bound" claim needs a number — bytes the conv
stack actually moves through HBM per forward, so bench.py can report
achieved HBM GB/s against the v5e peak (819 GB/s). If the achieved fraction
is high, the forward is honestly bandwidth-bound; if low, the bound is
issue/pipelining and the fix is fewer/longer DMAs, not fewer bytes.

The byte model mirrors the EXECUTED tier-1 kernel path per conv
(ops._apply → _pallas_banded_apply plan table), with static padded shapes —
the Pallas grid runs every padded block regardless of row validity:

  per conv (Pallas banded, plan (B, W, kind)):
    windows:  nb·W·cp·itemsize      (kind='union': ONE union window/block)
              nb·ncol·W·cp·itemsize (kind='col': one window per (dx,dy))
    nbr:      nb·B·k·4              (int32 target table, VMEM-blocked)
    output:   nb·B·cout·4           (f32 accumulator write)
    epilogue: nb·B·cout·(4+itemsize) (norm/ReLU read-f32 → write-bf16 table
              consumed by the next conv's windows)
    weights:  k·cin·cout·itemsize   (read once per call)

  1×1 convs (plain GEMM): read N·cin + write N·cout + epilogue.
  conv1 occupancy path (cin=1): nbr table + output only (no feature reads).

Simplifications (all UNDER-count, so hbm_bw_util is a lower bound and
"not bandwidth-bound" conclusions stay safe): the z-widened conv1 table
build, skip-concat copies, and BN stat reductions are ignored.
"""
from __future__ import annotations

from imfnet_tpu.sparse.ops import _band_plan_packed, _kz_of


def conv_traffic_bytes(n_out: int, n_in: int, k: int, cin: int, cout: int,
                       *, itemsize: int = 2, occupancy: bool = False) -> int:
    """Bytes one sparse conv moves through HBM on the executed tier-1 path
    (static padded shapes; see module docstring)."""
    w_bytes = k * cin * cout * itemsize
    epilogue = n_out * cout * (4 + itemsize)
    if k == 1:
        return n_in * cin * itemsize + n_out * cout * 4 + epilogue + w_bytes
    kz = _kz_of(k)
    ncol = k // kz if kz else k
    if occupancy or cin == 1:
        # occupancy conv1 / z-window gather path: the feature table is 1-wide
        nbr_b = n_out * k * 4
        return nbr_b + n_out * cout * 4 + epilogue + w_bytes

    pack = 128 // cin if cin < 128 and 128 % cin == 0 and cin > 1 else 1
    mode = "same" if n_out == n_in else ("down" if n_out < n_in else "up")
    # the EXECUTED plan, from the same resolver ops._apply uses (measured
    # table + PLAN_OVERRIDES + generic fallback) — a hand-copied lookup
    # here would silently desynchronize from the kernel path
    plan = _band_plan_packed(mode, cin, cout, pack, n_out, n_in, k)
    B, W = plan[0], plan[1]
    kind = plan[3] if len(plan) > 3 else "col"
    cp = 128 if pack > 1 else -(-cin // 128) * 128
    nb = -(-n_out // B)
    if kind == "union":
        win_b = nb * W * cp * itemsize
    else:
        win_b = nb * ncol * W * cp * itemsize
    nbr_b = nb * B * k * 4
    out_b = nb * B * cout * 4
    return win_b + nbr_b + out_b + epilogue + w_bytes


def forward_hbm_bytes(model, pyr, *, itemsize: int = 2,
                      dense_bytes: float = 0.0) -> float:
    """Total conv-stack HBM bytes for one ResUNet forward over ``pyr``
    (walk mirrors models/resunet.py::ResUNetIMF.__call__ and bench.py::
    model_forward_flops; reference `model/resunet.py:163-235`).
    ``dense_bytes`` adds an externally-measured image-trunk + fusion
    figure (e.g. XLA cost analysis 'bytes accessed')."""
    lv = pyr.levels
    ch, tr = model.channels, model.tr_channels
    n = [int(l.coords.shape[0]) for l in lv]

    def k_of(m):
        return int(m.shape[1])

    total = 0
    # conv1 (k5, occupancy fast path in eval) + block1
    total += conv_traffic_bytes(n[0], n[0], k_of(pyr.k5_l0),
                                model.in_channels, ch[0], itemsize=itemsize,
                                occupancy=True)
    total += 2 * conv_traffic_bytes(n[0], n[0], k_of(lv[0].k3_same),
                                    ch[0], ch[0], itemsize=itemsize)
    # encoder downs + blocks
    for i in (1, 2, 3):
        total += conv_traffic_bytes(n[i], n[i - 1], k_of(lv[i].down),
                                    ch[i - 1], ch[i], itemsize=itemsize)
        total += 2 * conv_traffic_bytes(n[i], n[i], k_of(lv[i].k3_same),
                                        ch[i], ch[i], itemsize=itemsize)
    # decoder ups + blocks (skip-concat widens cin)
    total += conv_traffic_bytes(n[2], n[3], k_of(lv[2].up), ch[3], tr[3],
                                itemsize=itemsize)
    total += 2 * conv_traffic_bytes(n[2], n[2], k_of(lv[2].k3_same),
                                    tr[3], tr[3], itemsize=itemsize)
    total += conv_traffic_bytes(n[1], n[2], k_of(lv[1].up), ch[2] + tr[3],
                                tr[2], itemsize=itemsize)
    total += 2 * conv_traffic_bytes(n[1], n[1], k_of(lv[1].k3_same),
                                    tr[2], tr[2], itemsize=itemsize)
    total += conv_traffic_bytes(n[0], n[1], k_of(lv[0].up), ch[1] + tr[2],
                                tr[1], itemsize=itemsize)
    total += 2 * conv_traffic_bytes(n[0], n[0], k_of(lv[0].k3_same),
                                    tr[1], tr[1], itemsize=itemsize)
    # 1x1 head
    total += conv_traffic_bytes(n[0], n[0], 1, ch[0] + tr[1], tr[0],
                                itemsize=itemsize)
    total += conv_traffic_bytes(n[0], n[0], 1, tr[0], model.out_channels,
                                itemsize=itemsize)
    return float(total) + float(dense_bytes)
