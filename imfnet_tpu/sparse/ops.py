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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def row_mask(n_padded: int, num_valid: jax.Array) -> jax.Array:
    return jnp.arange(n_padded, dtype=jnp.int32) < num_valid


def sparse_conv(
    feats: jax.Array,        # [N_in, Cin]
    nbr: jax.Array,          # int32[N_out, K] input row per offset, -1 = none
    weight: jax.Array,       # [K, Cin, Cout]
    *,
    bias: Optional[jax.Array] = None,  # [Cout]
    out_mask: Optional[jax.Array] = None,  # bool[N_out]; required if bias given
    compute_dtype=jnp.bfloat16,
    impl: str = "flat",      # 'flat' (one gather + one GEMM) | 'scan'
) -> jax.Array:
    """Sparse convolution. Returns [N_out, Cout] float32. Padding/missing
    neighbors contribute zero, so rows with no valid neighbor come out
    exactly zero (before bias).

    impl='flat' gathers all K neighbors at once and runs ONE MXU matmul with
    contraction dim K*Cin — profiled ~2.5x faster than the K-step scan, whose
    27 sequential tiny matmuls are loop-latency-bound on TPU. 'scan' trades
    that speed for K-fold less transient memory ([N,K,Cin] never materializes).
    """
    k = nbr.shape[1]
    n_out = nbr.shape[0]
    cin = weight.shape[1]
    cout = weight.shape[2]
    w = weight.astype(compute_dtype)
    x = feats.astype(compute_dtype)

    if impl == "flat":
        ok = nbr >= 0
        g = jnp.take(x, jnp.maximum(nbr, 0), axis=0)         # [N,K,Cin]
        g = jnp.where(ok[:, :, None], g, 0)
        acc = jax.lax.dot_general(
            g.reshape(n_out, k * cin), w.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
