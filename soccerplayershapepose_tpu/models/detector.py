"""PlayerDetector: anchor-free single-stage person detector (CenterNet-style).

Role parity with the reference's torchvision Faster-RCNN R50-FPN player
detector (``/root/reference/Python/Soccer/PlayerDetection/player_detection.py:16-37,
83-250``): find all people in a frame, emit scored boxes that drive the crop
pipelines and ``boxes.xml``.

TPU-first redesign: a two-stage RCNN needs proposal-conditional dynamic
shapes; a center-point detector is one dense static-shape program — FPN trunk
→ stride-4 heads (center heatmap, box size, sub-pixel offset), decoded with a
3x3 max-pool peak NMS and a static top-K. Soccer frames hold ≤ 22 players so
K=48 covers every real case with margin; thresholding happens on the host
(score ≥ 0.7 like the reference, player_detection.py:28).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu.models.backbone import FPNTrunk, fpn_trunk_r18
from soccerplayershapepose_tpu.models.perception import ConvTower

STRIDE = 4


class DetectorOutput(NamedTuple):
    center_logits: jnp.ndarray   # (B, H/4, W/4, 1)
    size: jnp.ndarray            # (B, H/4, W/4, 2) box (w, h) / stride
    offset: jnp.ndarray          # (B, H/4, W/4, 2) sub-cell (dx, dy)


class Detections(NamedTuple):
    boxes: jnp.ndarray           # (B, K, 4) [x1, y1, x2, y2] pixels
    scores: jnp.ndarray          # (B, K) descending


class PlayerDetector(nn.Module):
    channels: int = 128
    dtype: jnp.dtype = jnp.float32
    trunk: Optional[FPNTrunk] = None

    @nn.compact
    def __call__(self, images, train: bool = False) -> DetectorOutput:
        """images: (B, H, W, 3) float in [0, 1]; H, W divisible by 32."""
        trunk = self.trunk or fpn_trunk_r18(self.channels, dtype=self.dtype)
        p2, _ = trunk(images * 2.0 - 1.0, train=train)
        tower = ConvTower(self.channels, dtype=self.dtype, name="det_tower")(p2)
        center = nn.Conv(1, (1, 1), name="center_out")(tower)
        size = nn.Conv(2, (1, 1), name="size_out")(tower)
        offset = nn.Conv(2, (1, 1), name="offset_out")(tower)
        return DetectorOutput(center.astype(jnp.float32),
                              jax.nn.softplus(size.astype(jnp.float32)),
                              offset.astype(jnp.float32))


def apply_flip_tta(model: PlayerDetector, variables: dict,
                   images: jnp.ndarray) -> DetectorOutput:
    """Horizontal-flip ensemble forward: one 2B-batch apply, the flipped
    half's maps unflipped along W and averaged with the plain half.

    The mirror of center ``cx = (px + 0.5 + dx)·stride`` in a W-wide frame
    lands at cell ``w-1-px`` with sub-cell offset ``-dx`` (dy and box size
    are mirror-invariant), so merging = flip W + negate the dx channel.
    """
    both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
    out = model.apply(variables, both, train=False)
    b = images.shape[0]
    center = 0.5 * (out.center_logits[:b]
                    + out.center_logits[b:, :, ::-1])
    size = 0.5 * (out.size[:b] + out.size[b:, :, ::-1])
    off_sign = jnp.array([-1.0, 1.0], out.offset.dtype)
    offset = 0.5 * (out.offset[:b] + out.offset[b:, :, ::-1] * off_sign)
    return DetectorOutput(center, size, offset)


def decode_detections(out: DetectorOutput, top_k: int = 48,
                      stride: int = STRIDE,
                      box_nms_iou: Optional[float] = 0.7) -> Detections:
    """Peak-NMS + static top-K decode → pixel-space scored boxes.

    Static shapes end to end: the (B, K, 5) result is masked by score
    downstream instead of being dynamically sized.

    ``box_nms_iou`` additionally runs greedy box-IoU NMS (ops/nms.py,
    static shapes) over the decoded boxes, zeroing suppressed scores: the
    3×3 heatmap peak NMS leaves near-duplicate boxes when one body fires
    two peaks ≥2 cells apart — the role RCNN box NMS plays for the
    reference (player_detection.py:16-37). 0.7 suppresses only same-body
    duplicates; genuinely crowded distinct players overlap less. None
    disables.
    """
    b, h, w, _ = out.center_logits.shape
    heat = jax.nn.sigmoid(out.center_logits[..., 0])        # (B, h, w)
    # 3x3 max-pool peak NMS: keep only local maxima.
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])
    peaks = jnp.where(heat >= pooled, heat, 0.0).reshape(b, h * w)

    scores, idx = jax.lax.top_k(peaks, top_k)               # (B, K)
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)

    flat = lambda t: t.reshape(b, h * w, t.shape[-1])
    take = lambda t: jnp.take_along_axis(flat(t), idx[..., None], axis=1)
    wh = take(out.size) * stride                            # (B, K, 2) pixels
    off = jnp.clip(take(out.offset), -1.0, 2.0)

    cx = (px + 0.5 + off[..., 0]) * stride
    cy = (py + 0.5 + off[..., 1]) * stride
    boxes = jnp.stack([cx - wh[..., 0] / 2, cy - wh[..., 1] / 2,
                       cx + wh[..., 0] / 2, cy + wh[..., 1] / 2], axis=-1)
    if box_nms_iou is not None:
        from soccerplayershapepose_tpu.ops.nms import nms

        def keep_mask(bx, sc):
            idx, valid = nms(bx, sc, box_nms_iou)
            return jnp.zeros_like(sc, bool).at[idx].max(valid)

        kept = jax.vmap(keep_mask)(boxes, scores)
        scores = jnp.where(kept, scores, 0.0)
    return Detections(boxes=boxes, scores=scores)


def center_targets(boxes: jnp.ndarray, mask: jnp.ndarray,
                   hw: tuple, stride: int = STRIDE):
    """Ground-truth maps for training from (B, N, 4) pixel boxes + (B, N)
    validity mask.

    Returns dict: ``heat`` (B, h, w) Gaussian-splatted centers, ``size`` /
    ``offset`` (B, N, 2) regression targets, ``cell`` (B, N) flat center-cell
    indices (regression losses gather at these cells).
    """
    h, w = hw[0] // stride, hw[1] // stride
    cx = (boxes[..., 0] + boxes[..., 2]) / 2 / stride
    cy = (boxes[..., 1] + boxes[..., 3]) / 2 / stride
    bw = (boxes[..., 2] - boxes[..., 0]) / stride
    bh = (boxes[..., 3] - boxes[..., 1]) / stride
    # Boxes whose center falls outside the frame can't be detected (and
    # would produce unbounded offset targets after clipping) — mask them.
    inside = ((cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)).astype(jnp.float32)
    mask = mask * inside
    ix = jnp.clip(jnp.floor(cx), 0, w - 1)
    iy = jnp.clip(jnp.floor(cy), 0, h - 1)

    # Gaussian radius ~ 1/3 of the (clamped) box extent in cells.
    radius = jnp.clip(jnp.minimum(bw, bh) / 3.0, 1.0, 8.0)   # (B, N)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    d2 = ((ys[None, None] - iy[..., None, None]) ** 2
          + (xs[None, None] - ix[..., None, None]) ** 2)     # (B, N, h, w)
    g = jnp.exp(-d2 / (2.0 * (radius[..., None, None] / 1.5) ** 2))
    g = g * mask[..., None, None]
    heat = jnp.max(g, axis=1)                                # (B, h, w)

    return {"heat": heat,
            "size": jnp.stack([bw, bh], axis=-1),
            "offset": jnp.stack([cx - ix - 0.5, cy - iy - 0.5], axis=-1),
            "cell": (iy * w + ix).astype(jnp.int32),
            "mask": mask}


def detector_loss(out: DetectorOutput, targets: dict, mask: jnp.ndarray):
    """CenterNet focal loss on the heatmap + L1 size/offset at GT cells."""
    mask = mask * targets["mask"]        # drop out-of-frame boxes
    b, h, w, _ = out.center_logits.shape
    heat_t = targets["heat"]
    p = jax.nn.sigmoid(out.center_logits[..., 0])
    pos = (heat_t >= 0.999).astype(jnp.float32)
    neg = 1.0 - pos
    eps = 1e-6
    pos_loss = -jnp.log(p + eps) * (1 - p) ** 2 * pos
    neg_loss = -jnp.log(1 - p + eps) * p ** 2 * (1 - heat_t) ** 4 * neg
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    heat_loss = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos

    flat = lambda t: t.reshape(b, h * w, t.shape[-1])
    take = lambda t: jnp.take_along_axis(flat(t), targets["cell"][..., None],
                                         axis=1)
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(mask), 1.0)
    size_loss = jnp.sum(jnp.abs(take(out.size) - targets["size"]) * m) / n
    off_loss = jnp.sum(jnp.abs(take(out.offset) - targets["offset"]) * m) / n
    total = heat_loss + 0.1 * size_loss + off_loss
    return total, {"heat": heat_loss, "size": size_loss, "offset": off_loss}
