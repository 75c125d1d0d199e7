"""Homoscedastic-uncertainty weighted multi-task loss (Kendall et al.).

Role of the reference criterion
(``/root/reference/Python/Soccer/PlayerReconstruction/losses/multi_task_loss.py:8-146``),
reproduced as a pure function over a pytree of learned log-variances:

* per task: ``total += mse(task) · exp(-log_var) + log_var`` with
  ``reduction='mean'`` MSE,
* joints2D: BOTH pred and label are normalised ``2j/REGRESSOR_IMG_WH - 1``
  before the MSE — note the reference normalises by the 256 regressor size
  even when the joints live in 512-proxy space (multi_task_loss.py:110-112);
  the quirk is kept for parity. Optional per-joint visibility mask restricts
  the mean to visible joints (multi_task_loss.py:103-107),
* silhouette: the reference computes
  ``Σ pred·log(target+1e-6) + (1-pred)·log(1-target+1e-6)`` — pred/target in
  swapped BCE roles — and adds ``-that·exp(-log_var) + log_var``
  (multi_task_loss.py:139-141). Reproduced verbatim, documented as a quirk.

Initial log-variances come from ``-log(w + 1e-6)`` of the configured initial
loss weights (multi_task_loss.py:36-47); the fitting loops use
``{'joints2D': 1.0, 'silhouette': 1e6}`` (player_recon.py:851).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from soccerplayershapepose_tpu import config as cfg

ALL_TASKS = ("verts", "joints2D", "joints3D", "pose_params", "shape_params",
             "silhouette")


@dataclasses.dataclass(frozen=True)
class MultiTaskLossConfig:
    losses_on: Sequence[str] = ("joints2D",)
    img_wh: int = cfg.REGRESSOR_IMG_WH


def init_loss_state(losses_on: Sequence[str],
                    init_loss_weights: Optional[dict] = None,
                    eps: float = 1e-6) -> dict:
    """Learned log-variance pytree (one scalar per active task)."""
    state = {}
    for task in losses_on:
        if init_loss_weights and task in init_loss_weights:
            lv = -np.log(init_loss_weights[task] + eps)
        else:
            lv = 0.0
        state[task] = jnp.asarray(lv, jnp.float32)
    return state


def _masked_mse(pred, target, mask=None):
    se = (pred - target) ** 2
    if mask is None:
        return jnp.mean(se)
    m = jnp.broadcast_to(mask[..., None], se.shape).astype(se.dtype)
    return jnp.sum(se * m) / jnp.maximum(jnp.sum(m), 1.0)


def multi_task_loss(log_vars: dict,
                    outputs: dict,
                    labels: dict,
                    config: MultiTaskLossConfig,
                    task_scales: Optional[dict] = None
                    ) -> tuple[jnp.ndarray, dict]:
    """Compute the weighted total loss and the per-task loss dict.

    Args:
      log_vars: pytree from :func:`init_loss_state` (differentiable).
      outputs/labels: dicts with any of
        'verts' (B,V,3), 'joints2D' (B,J,2) px, 'joints3D' (B,J,3),
        'pose_params_rot_matrices' (B,24,3,3) [labels may be (B,23,3,3)],
        'shape_params' (B,10), 'silhouette' (B,H,W);
        labels may carry 'vis' (B,J) joint visibility — bool mask or float
        per-joint confidence weights (the weighted mean normalizes by the
        weight sum either way).
      task_scales: optional {task: scalar} multiplier on the raw task loss
        before uncertainty weighting (e.g. a silhouette warm-up schedule).
        None = reference parity.

    Returns:
      (total scalar, {task: weighted task loss}).
    """
    total = 0.0
    loss_dict = {}

    def add(task, raw, negate=False):
        nonlocal total
        if task_scales is not None and task in task_scales:
            raw = raw * task_scales[task]
        lv = log_vars[task]
        weighted = raw * jnp.exp(-lv)
        total_term = (-weighted if negate else weighted) + lv
        loss_dict[task] = raw * jnp.exp(-lv)
        return total_term

    losses_on = config.losses_on
    if "verts" in losses_on:
        total += add("verts", _masked_mse(outputs["verts"], labels["verts"]))

    if "joints2D" in losses_on:
        pred = (2.0 * outputs["joints2D"]) / config.img_wh - 1.0
        label = (2.0 * labels["joints2D"]) / config.img_wh - 1.0
        vis = labels.get("vis")
        total += add("joints2D", _masked_mse(pred, label, vis))

    if "joints3D" in losses_on:
        total += add("joints3D", _masked_mse(outputs["joints3D"], labels["joints3D"]))

    if "shape_params" in losses_on:
        total += add("shape_params",
                     _masked_mse(outputs["shape_params"], labels["shape_params"]))

    if "pose_params" in losses_on:
        total += add("pose_params",
                     _masked_mse(outputs["pose_params_rot_matrices"],
                                 labels["pose_params_rot_matrices"]))

    if "silhouette" in losses_on:
        p = outputs["silhouette"]
        t = labels["silhouette"]
        raw = jnp.sum(p * jnp.log(t + 1e-6) + (1.0 - p) * jnp.log(1.0 - t + 1e-6))
        total += add("silhouette", raw, negate=True)

    return total, loss_dict
