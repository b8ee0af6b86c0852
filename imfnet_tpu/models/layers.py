"""Flax modules for sparse-voxel networks: conv layers, masked norms, blocks.

These correspond to `ME.MinkowskiConvolution` + `get_norm`
(`model/common.py:4-10`) + `BasicBlockBase` (`model/residual_block.py:9-53`)
but operate on padded static-shape feature matrices with precomputed kernel
maps (see imfnet_tpu.sparse). All params float32, compute dtype configurable.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.ops import masked_batchnorm_stats, masked_instancenorm, sparse_conv


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed kernel map (kernel volume K is
    the map's second dim; k=1 convs pass ``nbr=None`` and reduce to a dense
    matmul on features)."""

    in_channels: int
    out_channels: int
    kernel_volume: int = 27
    use_bias: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, nbr=None, out_mask=None, occupancy=False,
                 nbr_inv=None, z_adjacent=False):
        if occupancy and self.in_channels == 1:
            # occupancy-1 inputs: conv = (neighbor-exists) @ W, one MXU matmul
            w = self.param(
                "kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (self.kernel_volume, self.in_channels, self.out_channels),
                jnp.float32,
            )
            exists = (nbr >= 0).astype(self.compute_dtype)
            return jnp.dot(exists, w[:, 0, :].astype(self.compute_dtype),
                           preferred_element_type=jnp.float32)
        if nbr is None:  # 1x1x1 convolution
            w = self.param(
                "kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (self.in_channels, self.out_channels),
                jnp.float32,
            )
            out = jnp.dot(
                feats.astype(self.compute_dtype),
                w.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
                assert out_mask is not None, "bias needs an output mask to keep padding zero"
                out = jnp.where(out_mask[:, None], out + b, 0.0)
            return out

        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, self.in_channels, self.out_channels),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if self.use_bias
            else None
        )
        return sparse_conv(
            feats, nbr, w, bias=b, out_mask=out_mask,
            compute_dtype=self.compute_dtype, nbr_inv=nbr_inv,
            z_adjacent=z_adjacent,
        )


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid sparse rows (`ME.MinkowskiBatchNorm` semantics,
    torch-style momentum: running = (1-m)*running + m*batch)."""

    features: int
    momentum: float = 0.05
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, mask, num_valid, *, train: bool):
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if train:
            mean, var = masked_batchnorm_stats(feats, mask, num_valid)
            if not self.is_initializing():
                n = jnp.maximum(num_valid.astype(jnp.float32), 2.0)
                unbiased = var * n / (n - 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (feats.astype(jnp.float32) - mean) * inv + bias
        return out * mask[:, None]


class SparseNorm(nn.Module):
    """Norm factory: 'BN' or 'IN' (`model/common.py:4-10`)."""

    norm_type: str
    features: int
    momentum: float = 0.05

    @nn.compact
    def __call__(self, feats, mask, num_valid, batch_ids, max_batch, *, train: bool):
        if self.norm_type == "BN":
            return MaskedBatchNorm(self.features, self.momentum)(
                feats, mask, num_valid, train=train
            )
        elif self.norm_type == "IN":
            return masked_instancenorm(feats, batch_ids, mask, max_batch)
        raise ValueError(f"norm type {self.norm_type} not defined")


class SparseBasicBlock(nn.Module):
    """Residual block: 2x(k3 conv + norm), identity skip, ReLU
    (`model/residual_block.py:37-53`)."""

    channels: int
    norm_type: str = "BN"
    bn_momentum: float = 0.05
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, nbr, mask, num_valid, batch_ids, max_batch, *, train: bool):
        residual = feats
        # a stride-1 map is its own exact inverse (up to the offset flip the
        # conv backward applies), enabling the scatter-free backward
        out = SparseConv(self.channels, self.channels, 27, compute_dtype=self.compute_dtype)(
            feats, nbr, nbr_inv=nbr, z_adjacent=True
        )
        out = SparseNorm(self.norm_type, self.channels, self.bn_momentum)(
            out, mask, num_valid, batch_ids, max_batch, train=train
        )
        out = nn.relu(out)
        out = SparseConv(self.channels, self.channels, 27, compute_dtype=self.compute_dtype)(
            out, nbr, nbr_inv=nbr, z_adjacent=True
        )
        out = SparseNorm(self.norm_type, self.channels, self.bn_momentum)(
            out, mask, num_valid, batch_ids, max_batch, train=train
        )
        return nn.relu(out + residual)
