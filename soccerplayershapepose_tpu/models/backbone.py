"""Dense-prediction backbone: ResNet feature pyramid for the perception nets.

Role: the trunk of the reference's detectron2-family predictors — KP-RCNN /
PointRend / DensePose all run an R50-FPN backbone
(``/root/reference/Python/Soccer/PlayerReconstruction/predict/predict_3D.py:35-64``)
and the player detector a torchvision Faster-RCNN R50-FPN
(``/root/reference/Python/Soccer/PlayerDetection/player_detection.py:86-87``).
This rebuild keeps the *role* (multi-scale features feeding keypoint / mask /
IUV / detection heads), not the two-stage RCNN architecture: TPU-first heads
are single-stage and fully convolutional so the whole image batch stays one
static-shape XLA program (no per-proposal dynamic shapes, which would defeat
MXU tiling).

Layout is NHWC throughout; convs run in the model dtype (bf16-friendly) with
f32 batch-norm statistics, mirroring ``models/resnet.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from soccerplayershapepose_tpu.models.resnet import BasicBlock, Bottleneck


class ResNetFeatures(nn.Module):
    """NHWC ResNet trunk returning the four stage feature maps (C2..C5).

    Strides 4/8/16/32 relative to the input. Identical block structure to
    ``models/resnet.ResNet`` so torch-weight import logic transfers.
    """

    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    in_stride: int = 4
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                expansion = getattr(self.block, "expansion", 1)
                needs_ds = strides != 1 or (
                    i == 0 and x.shape[-1] != features * expansion)
                x = self.block(features, strides=strides, downsample=needs_ds,
                               dtype=self.dtype)(x, train=train)
            feats.append(x)
        return feats            # [C2 (/4), C3 (/8), C4 (/16), C5 (/32)]


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (static-shape broadcast; XLA fuses it)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Top-down feature pyramid over the trunk features.

    1x1 lateral projections + nearest-2x top-down sum + 3x3 smoothing,
    emitting one ``channels``-wide map per level (P2..P5). The detectron2
    FPN role; a plain sum pyramid is all the heads need.
    """

    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = partial(nn.Conv, self.channels, dtype=self.dtype)
        laterals = [conv((1, 1), name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            outs.append(lat + upsample2x(outs[-1]))
        outs = outs[::-1]       # back to fine→coarse order
        return [conv((3, 3), padding=[(1, 1), (1, 1)], name=f"smooth{i}")(o)
                for i, o in enumerate(outs)]


class FPNTrunk(nn.Module):
    """Trunk + FPN returning the stride-4 map (heads' working resolution)
    plus the full pyramid."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: Type[nn.Module] = BasicBlock
    channels: int = 128
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetFeatures(block=self.block, stage_sizes=self.stage_sizes,
                               width=self.width, dtype=self.dtype,
                               name="trunk")(x, train=train)
        pyramid = FPN(channels=self.channels, dtype=self.dtype,
                      name="fpn")(feats)
        return pyramid[0], pyramid


def fpn_trunk_r18(channels: int = 128, width: int = 64,
                  dtype=jnp.float32) -> FPNTrunk:
    return FPNTrunk(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                    channels=channels, width=width, dtype=dtype)


def fpn_trunk_r50(channels: int = 256, width: int = 64,
                  dtype=jnp.float32) -> FPNTrunk:
    return FPNTrunk(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                    channels=channels, width=width, dtype=dtype)
