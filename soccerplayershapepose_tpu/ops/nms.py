"""Non-maximum suppression and box ops as pure XLA (static shapes).

TPU-native replacement for the CUDA NMS inside torchvision Faster-RCNN and
detectron2 (SURVEY.md §2.12). The greedy NMS runs as a ``lax.fori_loop`` over
a fixed detection budget — O(N) iterations of vectorized IoU suppression, no
dynamic shapes, jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: (..., N, 4), b: (..., M, 4) → (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1]))[..., :, None]
    area_b = ((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))[..., None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5,
        max_outputs: int | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output size.

    Args:
      boxes: (N, 4) [x1, y1, x2, y2].
      scores: (N,).
      max_outputs: kept detections (default N).

    Returns:
      (indices (K,), valid (K,) bool) — indices into the input, score-ordered;
      invalid slots padded with 0.
    """
    n = boxes.shape[0]
    k = max_outputs or n
    iou = box_iou(boxes, boxes)

    def body(i, state):
        alive, keep_idx, keep_valid = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        keep_idx = keep_idx.at[i].set(jnp.where(valid, best, 0))
        keep_valid = keep_valid.at[i].set(valid)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & valid
        alive = alive.at[best].set(False)
        return alive, keep_idx, keep_valid

    state = (jnp.ones((n,), bool), jnp.zeros((k,), jnp.int32),
             jnp.zeros((k,), bool))
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, k, body, state)
    return keep_idx, keep_valid


def filter_person_detections(boxes: jnp.ndarray, scores: jnp.ndarray,
                             labels: jnp.ndarray,
                             score_thresh: float = 0.7,
                             person_label: int = 1,
                             max_outputs: int = 32):
    """Person-class thresholded detections with static padding — the role of
    the reference's ``predict`` post-processing
    (player_detection.py:16-37: threshold 0.7, person class only)."""
    ok = (scores >= score_thresh) & (labels == person_label)
    masked_scores = jnp.where(ok, scores, -jnp.inf)
    order = jnp.argsort(-masked_scores)[:max_outputs]
    valid = masked_scores[order] > -jnp.inf
    return boxes[order] * valid[:, None], valid
