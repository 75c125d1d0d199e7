"""Silhouette / segmentation label ops and pixel metrics.

Matches
``/root/reference/Python/Soccer/PlayerReconstruction/metrics/silhouettes_joints_metrics.py``
and ``utils/label_conversions.py``:
* confusion-based silhouette metrics round inputs to booleans first; IoU uses
  the exact ``tp / (tp + fp + fn)`` division (no epsilon), precision/recall/f1
  use a 1e-9 epsilon,
* DensePose 24-part → 6-part LSP label map.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# DensePose part id (1..24) → LSP 6-part id (label_conversions.py:8-36); index
# 0 stays background. Host constant: a module-level DEVICE array would
# initialize the backend at import time (and hang the process when the
# remote TPU worker is down); jnp ops device-put it at trace time.
_DP_TO_LSP = np.array(
    [0, 6, 6, 2, 1, 4, 5, 5, 4, 5, 4, 5, 4, 5, 4, 1, 2, 1, 2, 1, 2, 1, 2, 3, 3],
    dtype=np.int32)


def densepose_to_6part_lsp(densepose_seg: jnp.ndarray) -> jnp.ndarray:
    """Map 24-part DensePose labels to the 6-part LSP convention."""
    return jnp.asarray(_DP_TO_LSP)[densepose_seg.astype(jnp.int32)]


def multiclass_to_binary(labels: jnp.ndarray) -> jnp.ndarray:
    """Multiclass segmentation → binary mask (non-zero → 1), same dtype."""
    return (labels != 0).astype(labels.dtype)


def silhouette_confusion_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> dict:
    """Global-accuracy / IoU / precision / recall / F1 between silhouettes.

    Args:
      pred, target: (..., H, W) float or bool silhouettes; floats are rounded.

    Returns:
      dict of per-batch scalars, each shaped like the leading batch dims
      (scalar when inputs are unbatched). Reductions run on device — no host
      round trip, unlike the reference's per-iteration numpy conversion
      (player_recon.py:1231-1233).
    """
    p = jnp.round(pred.astype(jnp.float32)) > 0.5
    t = jnp.round(target.astype(jnp.float32)) > 0.5
    axes = (-2, -1)
    tp = jnp.sum(p & t, axis=axes).astype(jnp.float32)
    fp = jnp.sum(p & ~t, axis=axes).astype(jnp.float32)
    tn = jnp.sum(~p & ~t, axis=axes).astype(jnp.float32)
    fn = jnp.sum(~p & t, axis=axes).astype(jnp.float32)

    global_acc = (tp + tn) / (tp + tn + fp + fn)
    iou = tp / (tp + fp + fn)
    precision = tp / (tp + fp + 1e-9)
    recall = tp / (tp + fn + 1e-9)
    f1 = (2.0 * precision * recall) / (precision + recall + 1e-9)
    return {"global_acc": global_acc, "iou": iou, "f1": f1,
            "precision": precision, "recall": recall}


def joints2d_l2_error(pred: jnp.ndarray, target: jnp.ndarray,
                      mean_axes=None) -> jnp.ndarray:
    """Mean L2 pixel error of 2D joints.

    Args:
      pred, target: (..., N, 2).
      mean_axes: axes to average over; defaults to all (scalar output),
        matching ``compute_j2d_mean_l2_pixel_error``.
    """
    err = jnp.linalg.norm(pred - target, axis=-1)
    if mean_axes is None:
        return jnp.mean(err)
    return jnp.mean(err, axis=mean_axes)
