"""Attention fusion (Perceiver-style cross-attention at the UNet bottleneck).

Reference: `model/attention_fusion.py` — one PreNorm cross-attention block
(queries = bottleneck point features, context = flattened image tokens) +
GEGLU FeedForward with residual adds, then `depth` self-attention layers
(depth=0 in the shipped IMFNet).

TPU-first redesign: the reference loops over batch samples in Python
(`model/resunet.py:237-273`), running B separate attentions over ragged
point counts. Here the flat sparse rows are scattered into a padded
[B, M, C] tensor once, a single batched dense attention runs on the MXU
(context is only ~300 tokens, so flash-style streaming is unnecessary —
the score matrix is small), and results are gathered back to flat rows.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class CrossAttention(nn.Module):
    """Single cross-attention: queries [B,M,Dq], context [B,T,Dc].
    heads=1, dim_head=128 in IMFNet (`model/resunet.py:91-99`)."""

    query_dim: int
    context_dim: int
    heads: int = 1
    dim_head: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, key_mask: Optional[jax.Array] = None):
        dt = self.compute_dtype
        h, d = self.heads, self.dim_head
        inner = h * d
        q = nn.Dense(inner, use_bias=False, dtype=dt, name="to_q")(x.astype(dt))
        kv = nn.Dense(inner * 2, use_bias=False, dtype=dt, name="to_kv")(context.astype(dt))
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):  # [B,N,h*d] -> [B,h,N,d]
            b, n, _ = t.shape
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        sim = sim * (d ** -0.5)
        if key_mask is not None:
            sim = jnp.where(key_mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(dt), v,
                         preferred_element_type=jnp.float32)
        b, _, m, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, m, inner)
        return nn.Dense(self.query_dim, dtype=jnp.float32, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """Linear(dim→2*mult*dim) → x*gelu(gates) → Linear(mult*dim→dim)
    (`model/attention_fusion.py:48-63`)."""

    dim: int
    mult: int = 4
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        xg = nn.Dense(self.dim * self.mult * 2, dtype=dt, name="wi")(x.astype(dt))
        x1, gates = jnp.split(xg, 2, axis=-1)
        hidden = x1 * nn.gelu(gates, approximate=False)  # exact erf, as torch F.gelu
        return nn.Dense(self.dim, dtype=jnp.float32, name="wo")(hidden)


class AttentionFusion(nn.Module):
    """PreNorm cross-attn + residual, PreNorm GEGLU FF + residual, then
    `depth` PreNorm self-attention+FF layers (`model/attention_fusion.py:98-154`)."""

    dim: int = 128            # image/context channels
    latent_dim: int = 256     # point-feature channels
    depth: int = 0
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 128
    latent_dim_head: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, context, queries, query_mask: Optional[jax.Array] = None):
        """context [B,T,dim], queries [B,M,latent_dim] → [B,M,latent_dim]."""
        xn = nn.LayerNorm(dtype=jnp.float32, name="cross_norm_q")(queries)
        cn = nn.LayerNorm(dtype=jnp.float32, name="cross_norm_ctx")(context)
        x = CrossAttention(
            self.latent_dim, self.dim, self.cross_heads, self.cross_dim_head,
            self.compute_dtype, name="cross_attn",
        )(xn, cn) + queries
        x = GEGLUFeedForward(self.latent_dim, 4, self.compute_dtype, name="cross_ff")(
            nn.LayerNorm(dtype=jnp.float32, name="cross_ff_norm")(x)
        ) + x
        for i in range(self.depth):
            xn = nn.LayerNorm(dtype=jnp.float32, name=f"self_norm_{i}")(x)
            x = CrossAttention(
                self.latent_dim, self.latent_dim, self.latent_heads,
                self.latent_dim_head, self.compute_dtype, name=f"self_attn_{i}",
            )(xn, xn, key_mask=query_mask) + x
            x = GEGLUFeedForward(self.latent_dim, 4, self.compute_dtype,
                                 name=f"self_ff_{i}")(
                nn.LayerNorm(dtype=jnp.float32, name=f"self_ff_norm_{i}")(x)
            ) + x
        return x


def scatter_to_padded(feats, batch_ids, ranks, valid, num_batches: int, m_pad: int):
    """Flat sparse rows [N,C] → padded [B, m_pad, C] by (batch, rank)."""
    n, c = feats.shape
    flat_idx = jnp.where(
        valid & (ranks < m_pad), batch_ids * m_pad + ranks, num_batches * m_pad
    )
    out = jnp.zeros((num_batches * m_pad + 1, c), feats.dtype)
    out = out.at[flat_idx].set(feats, mode="drop")
    return out[:-1].reshape(num_batches, m_pad, c)


def gather_from_padded(padded, batch_ids, ranks, valid):
    """Inverse of scatter_to_padded: padded [B,m_pad,C] → flat [N,C]."""
    b, m_pad, c = padded.shape
    flat = padded.reshape(b * m_pad, c)
    idx = jnp.clip(batch_ids * m_pad + ranks, 0, b * m_pad - 1)
    out = jnp.take(flat, idx, axis=0)
    return out * valid[:, None]
