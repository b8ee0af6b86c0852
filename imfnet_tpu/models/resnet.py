"""ResNet image trunk (NHWC, XLA-native convs).

The image branch of IMFNet: a ResNet-34 truncated after layer2, returning
128-channel features at 1/8 resolution (reference `model/resnet.py:195-216`,
`model/Img_Encoder.py:9-18`; 120x160 input → 15x20x128 tokens). Weights can be
initialized from converted torchvision checkpoints via
`imfnet_tpu.utils.torch_weights` when available; otherwise trained from scratch.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=dt, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=dt, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=dt, name="down_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=jnp.float32, name="down_bn")(identity)
        return nn.relu(out + identity.astype(out.dtype))


class ResNetTrunk(nn.Module):
    """conv1 → maxpool → layer1 → layer2 (truncation point of the reference's
    image encoder). stage_sizes=(3,4) is ResNet-34's layer1/layer2."""

    stage_sizes: Sequence[int] = (3, 4)
    widths: Sequence[int] = (64, 128)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        """x: [B, H, W, 3] float in [0,1] (the reference feeds un-normalized
        matplotlib-read images, `lib/data_loaders.py:259-266`)."""
        dt = self.compute_dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x.astype(jnp.float32), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))).astype(dt)
        for i, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                downsample = j == 0 and (i > 0 or width != 64)
                x = BasicBlock2D(width, stride, downsample, dt,
                                 name=f"layer{i + 1}_block{j}")(x, train=train)
        return x  # [B, H/8, W/8, widths[-1]]
