"""Scene-batched self-supervised distillation trainer.

Role of the reference ``train_regressor``
(``/root/reference/Python/Soccer/PlayerReconstruction/PyTorch3DTest.py:831-1184``):
broadcast-view-optimized SMPL parameters act as pseudo ground truth; per scene
batch of players the regressor is trained with the homoscedastic multi-task
loss on verts + shape + pose-rotmats + joints2D (projected KP-RCNN joints in
512-proxy px vs proxy keypoints) + joints3D (COCO joint subset), Adam lr 1e-4
(PyTorch3DTest.py:1104-1106), criterion log-variances trained jointly.

TPU-first: one jitted train step over a player batch, gradients computed over
(regressor params, loss log-vars) together; scales over the ``data`` mesh axis
with sharding constraints (GSPMD adds the gradient psums). Padded players are
masked out of every loss term.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.losses.multi_task import (
    MultiTaskLossConfig, init_loss_state, multi_task_loss)
from soccerplayershapepose_tpu.models.ief import default_initial_params
from soccerplayershapepose_tpu.models.regressor import SingleInputRegressor
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation)
from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward, smpl_shape_only

DISTILL_TASKS = ("verts", "joints2D", "joints3D", "pose_params", "shape_params")


class TrainState(NamedTuple):
    params: dict          # regressor trainable params
    batch_stats: dict     # BN running statistics
    log_vars: dict        # criterion learned log-variances
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_state(regressor: SingleInputRegressor,
                     rng: jax.Array,
                     losses_on: Sequence[str] = DISTILL_TASKS,
                     learning_rate: float = cfg.REGRESSOR_TRAIN_LR,
                     init_loss_weights: Optional[dict] = None,
                     tx: Optional[optax.GradientTransformation] = None):
    """Initialise model/criterion/optimizer state."""
    dummy = jnp.zeros((1, cfg.REGRESSOR_IMG_WH, cfg.REGRESSOR_IMG_WH,
                       regressor.in_channels), jnp.float32)
    variables = regressor.init(rng, dummy, jnp.zeros((157,), jnp.float32),
                               train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    log_vars = init_loss_state(losses_on, init_loss_weights)
    tx = tx or optax.adam(learning_rate)
    opt_state = tx.init((params, log_vars))
    return TrainState(params, batch_stats, log_vars, opt_state,
                      jnp.zeros((), jnp.int32)), tx


def _forward_losses(regressor, assets, params, batch_stats, log_vars, batch,
                    loss_cfg, train: bool):
    """Shared forward: proxy → regressor → SMPL → loss dicts."""
    variables = {"params": params, "batch_stats": batch_stats}
    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)

    if train:
        (cam_wp, pose6d, betas), mutated = regressor.apply(
            variables, batch["proxy"], init, train=True,
            mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        cam_wp, pose6d, betas = regressor.apply(variables, batch["proxy"], init)
        new_batch_stats = batch_stats

    rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
    pred = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
    target = smpl_forward(assets, batch["target_betas"],
                          batch["target_pose"][:, 1:],
                          batch["target_pose"][:, :1])

    coco = jnp.asarray(cfg.ALL_JOINTS_TO_COCO_MAP)
    kprcnn = jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)
    j2d = undo_keypoint_normalisation(
        orthographic_project(pred.joints, cam_wp)[:, kprcnn],
        cfg.PROXY_REP_INPUT_WH)

    outputs = {"verts": pred.vertices,
               "joints2D": j2d,
               "joints3D": pred.joints[:, coco],
               "pose_params_rot_matrices": rotmats,
               "shape_params": betas}
    labels = {"verts": target.vertices,
              "joints2D": batch["joints2d"][..., :2],
              "joints3D": target.joints[:, coco],
              "pose_params_rot_matrices": batch["target_pose"],
              "shape_params": batch["target_betas"]}
    if "mask" in batch:
        # Padded players: zero both sides so every MSE term ignores them.
        m = batch["mask"].astype(jnp.float32)
        for key in ("verts", "joints2D", "joints3D",
                    "pose_params_rot_matrices", "shape_params"):
            shape_mask = m.reshape(m.shape + (1,) * (outputs[key].ndim - 1))
            outputs[key] = outputs[key] * shape_mask
            labels[key] = labels[key] * shape_mask

    total, task_losses = multi_task_loss(log_vars, outputs, labels, loss_cfg)
    aux = {"task_losses": task_losses,
           "pred": {"verts": pred.vertices, "joints3D": pred.joints,
                    "betas": betas, "pose_rotmats": rotmats, "cam_wp": cam_wp,
                    "reposed_verts": smpl_shape_only(assets, betas)},
           "target": {"verts": target.vertices, "joints3D": target.joints,
                      "betas": batch["target_betas"],
                      "pose_rotmats": batch["target_pose"],
                      "reposed_verts": smpl_shape_only(assets, batch["target_betas"])},
           "batch_stats": new_batch_stats}
    return total, aux


def make_train_step(regressor: SingleInputRegressor,
                    tx: optax.GradientTransformation,
                    losses_on: Sequence[str] = DISTILL_TASKS):
    """Build the jittable train step: (state, assets, batch) → (state, metrics).

    batch: {'proxy' (B,256,256,C), 'joints2d' (B,17,2|3) px@512,
            'target_pose' (B,24,3,3), 'target_betas' (B,10), 'mask' (B,)?}.
    """
    loss_cfg = MultiTaskLossConfig(losses_on=tuple(losses_on))

    def step(state: TrainState, assets: SMPLAssets, batch: dict):
        def loss_fn(trainables):
            params, log_vars = trainables
            total, aux = _forward_losses(regressor, assets, params,
                                         state.batch_stats, log_vars, batch,
                                         loss_cfg, train=True)
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.log_vars))
        updates, opt_state = tx.update(grads, state.opt_state,
                                       (state.params, state.log_vars))
        params, log_vars = optax.apply_updates(
            (state.params, state.log_vars), updates)
        new_state = TrainState(params, aux["batch_stats"], log_vars,
                               opt_state, state.step + 1)
        metrics = {"loss": total, **{f"loss/{k}": v
                                     for k, v in aux["task_losses"].items()}}
        return new_state, metrics, aux

    return step


def make_eval_step(regressor: SingleInputRegressor,
                   losses_on: Sequence[str] = DISTILL_TASKS):
    """Validation forward (no optimizer/batch-stat updates)."""
    loss_cfg = MultiTaskLossConfig(losses_on=tuple(losses_on))

    def step(state: TrainState, assets: SMPLAssets, batch: dict):
        total, aux = _forward_losses(regressor, assets, state.params,
                                     state.batch_stats, state.log_vars, batch,
                                     loss_cfg, train=False)
        metrics = {"loss": total, **{f"loss/{k}": v
                                     for k, v in aux["task_losses"].items()}}
        return metrics, aux

    return step
