"""FCGF-style ablation UNets without the image branch
(reference `model/simpleunet.py:8-541`: SimpleNet / SimpleNet2 / SimpleNet3
and their BN/IN/B/C/D/E variants).

One generic module covers all depths: per level conv(+norm), decoder with
transpose convs and skip concats of the *pre-relu* encoder tensors (the
reference cats `out_sN`, which are norm outputs before the functional relu).
SimpleNet/SimpleNet2 end with a k3 conv1_tr + norm + relu + 1x1 `final`
(bias); SimpleNet3 ends at a 1x1-equivalent conv1_tr with no final conv.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from imfnet_tpu.sparse.coords import SparseVoxels
from imfnet_tpu.sparse.kernel_map import CoordinatePyramid
from imfnet_tpu.sparse.ops import row_mask, sparse_cat
from imfnet_tpu.models.layers import SparseConv, SparseNorm


class SimpleUNetBase(nn.Module):
    in_channels: int = 1
    out_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128)
    tr_channels: Tuple[int, ...] = (32, 32, 64)
    norm_type: str = "BN"
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 5
    normalize_feature: bool = True
    has_final: bool = True  # False for SimpleNet3 (`model/simpleunet.py:480-505`)
    final_tr_is_k3: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        sv: SparseVoxels,
        pyramid: CoordinatePyramid,
        image: Optional[jax.Array] = None,
        *,
        train: bool,
    ) -> jax.Array:
        del image  # no image branch in the ablation nets
        ch, tr = self.channels, self.tr_channels
        depth = len(ch)
        dt = self.compute_dtype
        lv = pyramid.levels
        assert len(lv) >= depth, "pyramid too shallow for this model"

        masks, bids = [], []
        for l in lv[:depth]:
            m = row_mask(l.coords.shape[0], l.num_valid)
            masks.append(m)
            bids.append(jnp.where(m, l.coords[:, 0], 1 << 15))

        def norm(x, i, feat, name):
            return SparseNorm(self.norm_type, feat, self.bn_momentum, name=name)(
                x, masks[i], lv[i].num_valid, bids[i], int(1 << 4), train=train
            )

        # encoder: conv1 k5 s1, then k3 s2 per level; skips are pre-relu.
        skips = []
        out = SparseConv(self.in_channels, ch[0], self.conv1_kernel_size ** 3,
                         compute_dtype=dt, name="conv1")(
            sv.feats, pyramid.k5_l0, nbr_inv=pyramid.k5_l0, z_adjacent=True)
        out = norm(out, 0, ch[0], "norm1")
        skips.append(out)
        out = nn.relu(out)
        for i in range(1, depth):
            out = SparseConv(ch[i - 1], ch[i], 27, compute_dtype=dt,
                             name=f"conv{i + 1}")(out, lv[i].down,
                                                  nbr_inv=lv[i - 1].up,
                                                  z_adjacent=True)
            out = norm(out, i, ch[i], f"norm{i + 1}")
            skips.append(out)
            out = nn.relu(out)

        # decoder: transpose conv + norm + relu, cat with pre-relu skip.
        for i in range(depth - 1, 0, -1):
            cin = ch[i] + (tr[i + 1] if i < depth - 1 else 0)
            out = SparseConv(cin, tr[i], 27, compute_dtype=dt,
                             name=f"conv{i + 1}_tr")(out, lv[i - 1].up,
                                                     nbr_inv=lv[i].down,
                                                     z_adjacent=True)
            out = norm(out, i - 1, tr[i], f"norm{i + 1}_tr")
            out = nn.relu(out)
            out = sparse_cat(out, skips[i - 1])

        if self.has_final:
            out = SparseConv(ch[0] + tr[1], tr[0], 27, compute_dtype=dt,
                             name="conv1_tr")(out, lv[0].k3_same,
                                              nbr_inv=lv[0].k3_same,
                                              z_adjacent=True)
            out = norm(out, 0, tr[0], "norm1_tr")
            out = nn.relu(out)
            out = SparseConv(tr[0], self.out_channels, use_bias=True,
                             compute_dtype=dt, name="final")(out, None, masks[0])
        else:
            out = SparseConv(ch[0] + tr[1], self.out_channels, 27,
                             compute_dtype=dt, name="conv1_tr")(
                out, lv[0].k3_same, nbr_inv=lv[0].k3_same, z_adjacent=True)

        if self.normalize_feature:
            nrm = jnp.linalg.norm(out, axis=1, keepdims=True)
            out = out / jnp.maximum(nrm, 1e-12) * masks[0][:, None]
        return out


# Depth presets (`model/simpleunet.py:10-11,154-155,332-333`).
class SimpleNet(SimpleUNetBase):
    pass


class SimpleNet2(SimpleUNetBase):
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    tr_channels: Tuple[int, ...] = (32, 32, 64, 64)


class SimpleNet3(SimpleUNetBase):
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    tr_channels: Tuple[int, ...] = (32, 32, 64, 64, 128)
    has_final: bool = False
