"""Self-supervised 2D regressor fine-tuning (proxy-only training).

Role of the reference ``player_recon.train_regressor``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:489-838``):
fine-tune the regressor on proxies alone by differentiating through the full
prediction path — proxy → regressor → SMPL → weak-persp joint projection and
differentiable silhouette render — with the homoscedastic loss on:

* ``item='pose'`` → joints2D only;
* ``item='shape'`` → silhouette only;
* ``item='both'`` → both (mode switch :495-509, init weights {1.0, 1.0}),

Adam lr 0.001 over regressor parameters AND criterion log-variances
(:759-760), best-epoch selection by the all-val-metrics-improve rule.

The reference renders with pytorch3d's SoftSilhouetteShader (σ=γ=1e-4,
:700-719); here the same role is played by the XLA soft rasterizer.
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
    orthographic_project, undo_keypoint_normalisation,
    weak_perspective_to_translation)
from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
from soccerplayershapepose_tpu.ops.segmentation import silhouette_confusion_metrics
from soccerplayershapepose_tpu.render.softras import render_silhouette
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward
from soccerplayershapepose_tpu.train.distill import TrainState


def losses_for_item(item: str) -> Sequence[str]:
    if item == "pose":
        return ("joints2D",)
    if item == "shape":
        return ("silhouette",)
    return ("joints2D", "silhouette")


def make_selfsup_state(regressor: SingleInputRegressor, rng,
                       item: str = "pose",
                       learning_rate: float = cfg.FITTING_LR):
    losses_on = losses_for_item(item)
    dummy = jnp.zeros((1, cfg.REGRESSOR_IMG_WH, cfg.REGRESSOR_IMG_WH,
                       regressor.in_channels), jnp.float32)
    variables = regressor.init(rng, dummy, jnp.zeros((157,), jnp.float32))
    log_vars = init_loss_state(losses_on, {"joints2D": 1.0, "silhouette": 1.0})
    tx = optax.adam(learning_rate)
    params = variables["params"]
    opt_state = tx.init((params, log_vars))
    return TrainState(params, variables.get("batch_stats", {}), log_vars,
                      opt_state, jnp.zeros((), jnp.int32)), tx


def make_selfsup_step(regressor: SingleInputRegressor,
                      tx: optax.GradientTransformation,
                      item: str = "pose",
                      render_wh: int = cfg.PROXY_REP_INPUT_WH,
                      sigma: float = 1e-4,
                      train: bool = True):
    """Build the jittable self-sup step.

    batch: {'proxy' (B,256,256,C), 'silhouette' (B,512,512),
            'joints2d' (B,17,2|3), 'mask' (B,)?}.
    Returns (state, metrics{loss, joints2D_l2e, silh_iou}, aux).
    """
    losses_on = losses_for_item(item)
    loss_cfg = MultiTaskLossConfig(losses_on=losses_on)
    use_sil = "silhouette" in losses_on

    def forward(params, batch_stats, log_vars, assets: SMPLAssets, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        init = default_initial_params(assets.mean_pose_rot6d,
                                      assets.mean_shape)
        if train:
            (cam_wp, pose6d, betas), mutated = regressor.apply(
                variables, batch["proxy"], init, train=True,
                mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            cam_wp, pose6d, betas = regressor.apply(variables, batch["proxy"],
                                                    init)
            new_stats = batch_stats

        rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        out = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
        j2d = undo_keypoint_normalisation(
            orthographic_project(out.joints, cam_wp)[
                :, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)],
            cfg.PROXY_REP_INPUT_WH)

        mask = batch.get("mask")
        b = j2d.shape[0]
        if mask is None:
            mask = jnp.ones((b,), jnp.float32)

        outputs = {"joints2D": j2d * mask[:, None, None]}
        labels = {"joints2D": batch["joints2d"][..., :2] * mask[:, None, None]}
        pred_sil = None
        target_sil = None
        if use_sil:
            translation = weak_perspective_to_translation(
                cam_wp, cfg.FOCAL_LENGTH, cfg.PROXY_REP_INPUT_WH)
            pred_sil = render_silhouette(
                out.vertices, translation, assets.faces,
                cfg.PROXY_REP_INPUT_WH, cfg.FOCAL_LENGTH, sigma=sigma,
                render_wh=render_wh)
            target_sil = batch["silhouette"]
            if render_wh != target_sil.shape[-1]:
                step = target_sil.shape[-1] // render_wh
                target_sil = target_sil[..., ::step, ::step]
            outputs["silhouette"] = pred_sil * mask[:, None, None]
            labels["silhouette"] = target_sil * mask[:, None, None]

        total, task_losses = multi_task_loss(log_vars, outputs, labels,
                                             loss_cfg)
        j2d_l2e = jnp.mean(jnp.linalg.norm(
            j2d - batch["joints2d"][..., :2], axis=-1))
        iou = jnp.mean(silhouette_confusion_metrics(
            pred_sil, target_sil)["iou"]) if use_sil else jnp.zeros(())
        aux = {"task_losses": task_losses, "batch_stats": new_stats,
               "j2d_l2e": j2d_l2e, "silh_iou": iou, "pred_j2d": j2d}
        return total, aux

    if not train:
        def eval_step(state: TrainState, assets, batch):
            total, aux = forward(state.params, state.batch_stats,
                                 state.log_vars, assets, batch)
            return {"loss": total, "joints2D_l2e": aux["j2d_l2e"],
                    "silh_iou": aux["silh_iou"]}, aux
        return eval_step

    def step(state: TrainState, assets, batch):
        def loss_fn(trainables):
            params, log_vars = trainables
            return forward(params, state.batch_stats, log_vars, assets, batch)

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.log_vars))
        updates, opt_state = tx.update(grads, state.opt_state,
                                       (state.params, state.log_vars))
        params, log_vars = optax.apply_updates(
            (state.params, state.log_vars), updates)
        new_state = TrainState(params, aux["batch_stats"], log_vars,
                               opt_state, state.step + 1)
        metrics = {"loss": total, "joints2D_l2e": aux["j2d_l2e"],
                   "silh_iou": aux["silh_iou"]}
        return new_state, metrics, aux

    return step
