"""IMFNet backbone: sparse 3D ResUNet with attention fusion at the bottleneck.

Reference architecture: `model/resunet.py:25-273` (ResUNet2 and variants).
4 encoder stages (conv1 k=conv1_kernel_size s1; conv2..4 k3 s2) with residual
blocks, Perceiver-style image fusion at stride 8, 3 transpose-conv decoder
stages with skip concats, 1x1 convs to the 32-d descriptor, optional row-wise
L2 normalization.

TPU-first differences from the reference:
- all coordinates/kernel maps are precomputed (`CoordinatePyramid`) so the
  whole forward is one statically-shaped XLA program;
- the fusion runs batched over padded per-sample queries instead of a Python
  loop over batch segments (`model/resunet.py:237-273`);
- the image trunk is NHWC on the MXU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.coords import SparseVoxels, batch_segments
from imfnet_tpu.sparse.kernel_map import CoordinatePyramid
from imfnet_tpu.sparse.ops import row_mask, sparse_cat
from imfnet_tpu.models.layers import SparseBasicBlock, SparseConv, SparseNorm
from imfnet_tpu.models.fusion import (
    AttentionFusion,
    gather_from_padded,
    scatter_to_padded,
)
from imfnet_tpu.models.resnet import ResNetTrunk


class ResUNetIMF(nn.Module):
    """ResUNet2 family. Channel plans follow `model/resunet.py:276-326`."""

    in_channels: int = 1
    out_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (64, 64, 64, 128)
    norm_type: str = "BN"
    block_norm_type: str = "BN"
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 5
    normalize_feature: bool = True
    fusion_depth: int = 0
    image_channels: int = 128
    with_image: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Inference fast path: with occupancy-1 input features (the 3DMatch/KITTI
    # configuration, `util/misc.py:76-77`), conv1 reduces to
    # (neighbor-exists matrix) @ W — one MXU matmul instead of a K-step
    # gather scan. Invalid when input features are jittered (training).
    conv1_occupancy: bool = False

    @nn.compact
    def __call__(
        self,
        sv: SparseVoxels,
        pyramid: CoordinatePyramid,
        image: Optional[jax.Array],
        *,
        train: bool,
    ) -> jax.Array:
        ch, tr = self.channels, self.tr_channels
        dt = self.compute_dtype
        lv = pyramid.levels
        num_batches = image.shape[0] if image is not None else 1

        masks, bids = [], []
        for l in lv:
            m = row_mask(l.coords.shape[0], l.num_valid)
            masks.append(m)
            bids.append(jnp.where(m, l.coords[:, 0], num_batches))

        def norm(x, i, feat, name):
            return SparseNorm(self.norm_type, feat, self.bn_momentum, name=name)(
                x, masks[i], lv[i].num_valid, bids[i], num_batches, train=train
            )

        def block(x, i, feat, name):
            return SparseBasicBlock(
                feat, self.block_norm_type, self.bn_momentum, dt, name=name
            )(x, lv[i].k3_same, masks[i], lv[i].num_valid, bids[i], num_batches,
              train=train)

        # ---- encoder (model/resunet.py:168-186) ----
        k5_vol = self.conv1_kernel_size ** 3
        out = SparseConv(self.in_channels, ch[0], k5_vol, compute_dtype=dt,
                         name="conv1")(
            sv.feats, pyramid.k5_l0,
            occupancy=self.conv1_occupancy and self.in_channels == 1,
            nbr_inv=pyramid.k5_l0, z_adjacent=True)
        out = norm(out, 0, ch[0], "norm1")
        out_s1 = block(out, 0, ch[0], "block1")

        out = SparseConv(ch[0], ch[1], 27, compute_dtype=dt, name="conv2")(
            out_s1, lv[1].down, nbr_inv=lv[0].up, z_adjacent=True)
        out = norm(out, 1, ch[1], "norm2")
        out_s2 = block(out, 1, ch[1], "block2")

        out = SparseConv(ch[1], ch[2], 27, compute_dtype=dt, name="conv3")(
            out_s2, lv[2].down, nbr_inv=lv[1].up, z_adjacent=True)
        out = norm(out, 2, ch[2], "norm3")
        out_s4 = block(out, 2, ch[2], "block3")

        out = SparseConv(ch[2], ch[3], 27, compute_dtype=dt, name="conv4")(
            out_s4, lv[3].down, nbr_inv=lv[2].up, z_adjacent=True)
        out = norm(out, 3, ch[3], "norm4")
        out = block(out, 3, ch[3], "block4")

        # ---- bottleneck fusion (model/resunet.py:189, 237-273) ----
        if self.with_image and image is not None:
            img = ResNetTrunk(compute_dtype=dt, name="img_encoder")(image, train=train)
            b, h, w, c = img.shape
            tokens = img.reshape(b, h * w, c).astype(jnp.float32)
            starts, _ = batch_segments(lv[3].coords, masks[3], num_batches)
            safe_b = jnp.minimum(bids[3], num_batches - 1)
            ranks = jnp.arange(lv[3].coords.shape[0], dtype=jnp.int32) - jnp.take(
                starts, safe_b)
            m_pad = lv[3].coords.shape[0]
            padded_q = scatter_to_padded(
                out, safe_b, ranks, masks[3], num_batches, m_pad)
            fused = AttentionFusion(
                dim=self.image_channels,
                latent_dim=ch[3],
                depth=self.fusion_depth,
                cross_heads=1,
                latent_heads=8,
                cross_dim_head=ch[3] // 2,
                latent_dim_head=ch[3] // 2,
                compute_dtype=dt,
                name="attention_fusion",
            )(tokens, padded_q)
            out = gather_from_padded(fused, safe_b, ranks, masks[3])

        # ---- decoder (model/resunet.py:191-226) ----
        # up maps are z-adjacent too: a column's existing targets (z±t,
        # consecutive coarse-lattice steps) occupy consecutive coarse rows
        out = SparseConv(ch[3], tr[3], 27, compute_dtype=dt, name="conv4_tr")(
            out, lv[2].up, nbr_inv=lv[3].down, z_adjacent=True)
        out = norm(out, 2, tr[3], "norm4_tr")
        out = block(out, 2, tr[3], "block4_tr")
        out = sparse_cat(out, out_s4)

        out = SparseConv(ch[2] + tr[3], tr[2], 27, compute_dtype=dt, name="conv3_tr")(
            out, lv[1].up, nbr_inv=lv[2].down, z_adjacent=True)
        out = norm(out, 1, tr[2], "norm3_tr")
        out = block(out, 1, tr[2], "block3_tr")
        out = sparse_cat(out, out_s2)

        out = SparseConv(ch[1] + tr[2], tr[1], 27, compute_dtype=dt, name="conv2_tr")(
            out, lv[0].up, nbr_inv=lv[1].down, z_adjacent=True)
        out = norm(out, 0, tr[1], "norm2_tr")
        out = block(out, 0, tr[1], "block2_tr")
        out = sparse_cat(out, out_s1)

        out = SparseConv(ch[0] + tr[1], tr[0], compute_dtype=dt, name="conv1_tr")(out)
        out = nn.relu(out)
        out = SparseConv(tr[0], self.out_channels, use_bias=True, compute_dtype=dt,
                         name="final")(out, None, masks[0])

        if self.normalize_feature:
            nrm = jnp.linalg.norm(out, axis=1, keepdims=True)
            out = out / jnp.maximum(nrm, 1e-12) * masks[0][:, None]
        return out
