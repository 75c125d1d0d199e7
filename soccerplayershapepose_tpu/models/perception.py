"""ProxyNet: on-device 2D proxy extraction (keypoints + silhouette + IUV).

Role parity with the reference's three detectron2 predictors over a player
crop (``/root/reference/Python/Soccer/PlayerReconstruction/predict/``):

* ``predict_joints2D.py:33-61`` — Keypoint-RCNN giving (17, 3) COCO keypoints
  ``[x, y, score]`` in crop pixel space,
* ``predict_silhouette_pointrend.py:42-63`` — PointRend giving a binary
  (wh, wh) person mask,
* ``predict_densepose.py:122-158`` — DensePose giving a 3-channel IUV image
  (I: part index 0..24, U/V: 0..255).

TPU-first redesign: instead of two-stage RCNNs with per-proposal dynamic
shapes, one fully-convolutional multi-head network over the whole crop —
a shared FPN trunk with dense stride-4 heads. Player crops are centred on one
person by construction (player_detection.py:83-147), so instance selection
reduces to the host-side largest-centred-component pick that the reference
already applies to its mask output (predict_silhouette_pointrend.py:7-40).
Everything is static-shape: a (B, 512, 512, 3) crop batch is one XLA program.

Trained on the synthetic SMPL render factory (``train/synth.py``) — the
rasterizer generates unlimited (image, keypoints, mask, IUV) tuples, a
self-supervised data source the reference (which needs COCO-pretrained
weights) never had.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu.models.backbone import (
    FPNTrunk, fpn_trunk_r18, upsample2x)

NUM_KEYPOINTS = 17
NUM_PARTS = 24          # DensePose part count (structures.py I channel)
STRIDE = 4


class ProxyNetOutput(NamedTuple):
    kp_logits: jnp.ndarray        # (B, H/4, W/4, 17) keypoint heatmap logits
    mask_logits: jnp.ndarray      # (B, H, W) full-res silhouette logits
    part_logits: Optional[jnp.ndarray]   # (B, H/4, W/4, 25) bg + 24 parts
    uv: Optional[jnp.ndarray]            # (B, H/4, W/4, 48) per-part U,V


class ConvTower(nn.Module):
    channels: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class ProxyNet(nn.Module):
    """Shared-trunk dense predictor for keypoints, silhouette and IUV."""

    with_iuv: bool = True
    channels: int = 128
    dtype: jnp.dtype = jnp.float32
    trunk: Optional[FPNTrunk] = None

    @nn.compact
    def __call__(self, images, train: bool = False) -> ProxyNetOutput:
        """images: (B, H, W, 3) float in [0, 1]."""
        trunk = self.trunk or fpn_trunk_r18(self.channels, dtype=self.dtype)
        p2, _ = trunk(images * 2.0 - 1.0, train=train)

        kp = ConvTower(self.channels, dtype=self.dtype, name="kp_tower")(p2)
        kp_logits = nn.Conv(NUM_KEYPOINTS, (1, 1), name="kp_out")(kp)

        # Learned 4x upsampling to full resolution for the mask: the
        # PointRend role (boundary sharpening) without per-point sampling —
        # dense convs at increasing resolution keep shapes static.
        m = ConvTower(self.channels, dtype=self.dtype, name="mask_tower")(p2)
        m = upsample2x(m)
        m = nn.relu(nn.Conv(self.channels // 2, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="mask_up1")(m))
        m = upsample2x(m)
        m = nn.relu(nn.Conv(self.channels // 4, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="mask_up2")(m))
        mask_logits = nn.Conv(1, (1, 1), name="mask_out")(m)[..., 0]

        part_logits = uv = None
        if self.with_iuv:
            iuv = ConvTower(self.channels, dtype=self.dtype,
                            name="iuv_tower")(p2)
            part_logits = nn.Conv(NUM_PARTS + 1, (1, 1), name="part_out")(iuv)
            uv = nn.Conv(2 * NUM_PARTS, (1, 1), name="uv_out")(iuv)
        return ProxyNetOutput(kp_logits.astype(jnp.float32),
                              mask_logits.astype(jnp.float32),
                              None if part_logits is None
                              else part_logits.astype(jnp.float32),
                              None if uv is None else uv.astype(jnp.float32))


def decode_keypoints(kp_logits: jnp.ndarray,
                     stride: int = STRIDE) -> jnp.ndarray:
    """Heatmap logits → (B, 17, 3) ``[x, y, score]`` in input pixel space.

    Argmax peak + per-axis 3-point parabola vertex on the log-probability
    (DARK-style sub-pixel refinement: the training target is a Gaussian, so
    log p is locally quadratic and the parabola vertex recovers the
    continuous peak — replaces the ±quarter-cell sign heuristic, whose
    stride-4 quantization floor dominated keypoint error). Matches the
    KP-RCNN output contract consumed at predict_joints2D.py:48-51.
    """
    b, h, w, k = kp_logits.shape
    hm = kp_logits.reshape(b, h * w, k)
    idx = jnp.argmax(hm, axis=1)                            # (B, K)
    peak = jax.nn.sigmoid(jnp.take_along_axis(
        hm, idx[:, None, :], axis=1)[:, 0, :])              # (B, K)
    py = idx // w
    px = idx % w

    def logp(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        logits = jnp.take_along_axis(hm, (yy * w + xx)[:, None, :],
                                     axis=1)[:, 0, :]
        return -jax.nn.softplus(-logits)                    # log sigmoid

    def vertex(lo, c, hi):
        denom = lo - 2.0 * c + hi
        off = 0.5 * (lo - hi) / jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
        # Parabola only valid around a true local max; clamp to the cell and
        # fall back to 0 when the argmax sits on a plateau/edge artifact.
        off = jnp.where(jnp.abs(denom) < 1e-6, 0.0, off)
        return jnp.clip(off, -0.5, 0.5)

    c = logp(0, 0)
    dx = vertex(logp(0, -1), c, logp(0, 1))
    dy = vertex(logp(-1, 0), c, logp(1, 0))
    # Keep coordinates inside the image: a border-cell argmax plus +0.5
    # vertex offset would otherwise land exactly on W (one past the last
    # pixel in the reference's convention).
    x = jnp.clip((px.astype(jnp.float32) + dx + 0.5) * stride,
                 0.0, w * stride - 1.0)
    y = jnp.clip((py.astype(jnp.float32) + dy + 0.5) * stride,
                 0.0, h * stride - 1.0)
    return jnp.stack([x, y, peak], axis=-1)


def decode_silhouette(mask_logits: jnp.ndarray,
                      threshold: float = 0.0) -> jnp.ndarray:
    """Full-res logits → binary uint8-style {0,1} mask (B, H, W)."""
    return (mask_logits > threshold).astype(jnp.float32)


def decode_iuv(part_logits: jnp.ndarray, uv: jnp.ndarray,
               out_wh: Optional[int] = None) -> jnp.ndarray:
    """Part logits + per-part UV → (B, H, W, 3) IUV in image convention.

    Channel 0: part index (0 = background, 1..24); channels 1-2: U, V scaled
    to [0, 255] — byte-compatible with the reference's decoded DensePose
    result (densepose/structures.py:438; predict_densepose.py:122-158).

    With ``out_wh`` set, the stride-4 head outputs are bilinearly upsampled
    BEFORE the argmax/selection, so the decoded part labels have per-pixel
    boundaries at crop resolution — matching the reference's full-res decode
    (predict_densepose.py:122-158) rather than 4-px nearest blocks.
    """
    b, h, w, _ = part_logits.shape
    if out_wh is not None and out_wh != h:
        part_logits = jax.image.resize(
            part_logits, (b, out_wh, out_wh, part_logits.shape[-1]),
            "bilinear")
        uv = jax.image.resize(uv, (b, out_wh, out_wh, uv.shape[-1]),
                              "bilinear")
        h = w = out_wh
    part = jnp.argmax(part_logits, axis=-1)                 # (B,h,w) 0..24
    uv = jax.nn.sigmoid(uv.reshape(b, h, w, NUM_PARTS, 2))
    sel = jnp.clip(part - 1, 0, NUM_PARTS - 1)
    uv_sel = jnp.take_along_axis(
        uv, sel[..., None, None].astype(jnp.int32), axis=3)[..., 0, :]
    fg = (part > 0).astype(jnp.float32)
    return jnp.stack([part.astype(jnp.float32),
                      uv_sel[..., 0] * 255.0 * fg,
                      uv_sel[..., 1] * 255.0 * fg], axis=-1)
