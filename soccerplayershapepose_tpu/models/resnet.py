"""ResNet backbone (18/50) with configurable input channels.

Role of the reference's torchvision-derived encoder
(``/root/reference/Python/Soccer/PlayerReconstruction/models/resnet.py``):
conv7x7/2 → BN → ReLU → maxpool3/2 → 4 stages → global average pool, returning
a pooled 512-d (r18) / 2048-d (r50) feature, with ``in_channels`` set by the
proxy representation (18 = sil+17 heatmaps, 20 = heatmaps+IUV, 21 = all).

TPU-first choices: NHWC layout (XLA-native conv layout), bf16-friendly conv
kernels with f32 batch-norm statistics, `use_running_average` switched by a
`train` flag. Weight import from torch checkpoints is supported by
``soccerplayershapepose_tpu.io.torch_import``.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.features, (3, 3), (self.strides, self.strides),
                 padding=[(1, 1), (1, 1)])(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = norm()(y)
        if self.downsample:
            residual = conv(self.features, (1, 1),
                            (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.features, (1, 1))(x)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), (self.strides, self.strides),
                 padding=[(1, 1), (1, 1)])(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.features * self.expansion, (1, 1))(y)
        y = norm()(y)
        if self.downsample:
            residual = conv(self.features * self.expansion, (1, 1),
                            (self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """NHWC ResNet returning the pooled feature vector (no classifier head)."""

    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                expansion = getattr(self.block, "expansion", 1)
                needs_ds = strides != 1 or (
                    i == 0 and x.shape[-1] != features * expansion)
                x = self.block(features, strides=strides, downsample=needs_ds,
                               dtype=self.dtype)(x, train=train)

        return jnp.mean(x, axis=(1, 2))    # global average pool → (B, C)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), dtype=dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), dtype=dtype)
