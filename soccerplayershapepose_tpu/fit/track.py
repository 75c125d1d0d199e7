"""Temporal track fitting: shared shape across a broadcast clip.

BASELINE.md config 5 ("multi-frame temporal batching, streaming preprocessing
+ shape consistency"): a tracked player appears in T consecutive broadcast
frames; betas are one physical quantity while pose and camera vary per frame.
The reference approximates this with its multi-view machinery (shared betas
across the 4 synthetic views, player_recon.py:1691-1694); here the clip case
is first-class: one compiled loop optimizing per-frame [pose, orient, cam] +
one shared betas per player, batched over players, with a per-frame validity
mask for variable-length tracks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit.engine import (
    FitConfig, evaluate_fit, make_loss_state)
from soccerplayershapepose_tpu.fit.single_view import splice_body_pose, _TRAIN
from soccerplayershapepose_tpu.losses.multi_task import (
    MultiTaskLossConfig, multi_task_loss)
from soccerplayershapepose_tpu.ops.camera import weak_perspective_to_translation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets


class TrackInit(NamedTuple):
    body_pose: jnp.ndarray      # (B, T, 23, 3, 3) per-frame regressor init
    global_orient: jnp.ndarray  # (B, T, 1, 3, 3)
    betas: jnp.ndarray          # (B, T, 10) — averaged for the shared init
    cam_wp: jnp.ndarray         # (B, T, 3)


class TrackResult(NamedTuple):
    body_pose: jnp.ndarray      # (B, T, 23, 3, 3)
    global_orient: jnp.ndarray  # (B, T, 1, 3, 3)
    betas: jnp.ndarray          # (B, 10) shared
    cam_wp: jnp.ndarray         # (B, T, 3)
    translation: jnp.ndarray    # (B, T, 3)
    silh_iou: jnp.ndarray       # (B,) masked mean over frames
    joint_err: jnp.ndarray      # (B,)


def track_fit(assets: SMPLAssets,
              init: TrackInit,
              silhouettes: jnp.ndarray,      # (B, T, wh, wh)
              joints2d: jnp.ndarray,         # (B, T, 17, 2|3)
              fit_cfg: Optional[FitConfig] = None,
              frame_mask: Optional[jnp.ndarray] = None) -> TrackResult:
    """Jointly optimize a clip per player with one shared shape."""
    fit_cfg = fit_cfg or FitConfig(iters=cfg.SINGLE_VIEW_ITERS)
    b, t = init.cam_wp.shape[:2]
    if frame_mask is None:
        frame_mask = jnp.ones((b, t), jnp.float32)
    flat_mask = frame_mask.reshape(b * t)

    losses_on, log_vars = make_loss_state(fit_cfg.use_silhouette)
    loss_cfg = MultiTaskLossConfig(losses_on=losses_on)

    sil_flat = silhouettes.reshape((b * t,) + silhouettes.shape[2:])
    j2d_flat = joints2d.reshape((b * t,) + joints2d.shape[2:])

    trainable = {
        "pose_sub": init.body_pose[:, :, _TRAIN],             # (B,T,19,3,3)
        "orient": init.global_orient,
        "cam": init.cam_wp,
        "betas": jnp.sum(init.betas * frame_mask[..., None], axis=1)
        / jnp.maximum(jnp.sum(frame_mask, axis=1, keepdims=True), 1.0),
    }
    pose_init_flat = init.body_pose.reshape(b * t, 23, 3, 3)

    tx = optax.adam(fit_cfg.lr)
    opt_state = tx.init(trainable)

    def assemble(tr):
        pose = splice_body_pose(tr["pose_sub"].reshape(b * t, 19, 3, 3),
                                pose_init_flat)
        betas = jnp.repeat(tr["betas"], t, axis=0)
        return (pose, tr["orient"].reshape(b * t, 1, 3, 3), betas,
                tr["cam"].reshape(b * t, 3))

    def loss_fn(tr):
        pose, orient, betas, cam = assemble(tr)
        ev = evaluate_fit(assets, pose, orient, betas, cam,
                          sil_flat, j2d_flat, fit_cfg)
        outputs = {"joints2D": ev["pred_j2d"] * flat_mask[:, None, None]}
        labels = {"joints2D": j2d_flat[..., :2] * flat_mask[:, None, None]}
        if fit_cfg.use_silhouette:
            outputs["silhouette"] = ev["pred_sil"] * flat_mask[:, None, None]
            labels["silhouette"] = ev["target_sil"] * flat_mask[:, None, None]
        total, _ = multi_task_loss(log_vars, outputs, labels, loss_cfg)
        return total, ev

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def per_player(ev):
        j2d_l2 = jnp.mean(jnp.linalg.norm(
            ev["pred_j2d"] - j2d_flat[..., :2], axis=-1), axis=-1)
        def masked_mean(x):
            x = x.reshape(b, t) * frame_mask
            return jnp.sum(x, axis=1) / jnp.maximum(
                jnp.sum(frame_mask, axis=1), 1.0)
        return (masked_mean(j2d_l2), masked_mean(ev["bce_score"]),
                masked_mean(ev["iou"]), masked_mean(ev["joint_err"]))

    def step(carry, _):
        tr, opt_state, best = carry
        (_, ev), grads = grad_fn(tr)
        m0, m1, iou, jerr = per_player(ev)
        improve = (m0 <= best["m0"]) & (m1 <= best["m1"])

        def select(new, old):
            shape = (b,) + (1,) * (new.ndim - 1)
            return jnp.where(improve.reshape(shape), new, old)

        new_best = {"m0": jnp.where(improve, m0, best["m0"]),
                    "m1": jnp.where(improve, m1, best["m1"]),
                    "iou": jnp.where(improve, iou, best["iou"]),
                    "joint_err": jnp.where(improve, jerr, best["joint_err"]),
                    "params": jax.tree_util.tree_map(select, tr,
                                                     best["params"])}
        updates, new_opt = tx.update(grads, opt_state, tr)
        return (optax.apply_updates(tr, updates), new_opt, new_best), None

    inf = jnp.full((b,), jnp.inf)
    best0 = {"m0": inf, "m1": inf, "iou": jnp.zeros((b,)),
             "joint_err": jnp.zeros((b,)), "params": trainable}
    (_, _, best), _ = jax.lax.scan(step, (trainable, opt_state, best0),
                                   None, length=fit_cfg.iters)

    tr = best["params"]
    body_pose = splice_body_pose(
        tr["pose_sub"].reshape(b * t, 19, 3, 3),
        pose_init_flat).reshape(b, t, 23, 3, 3)
    translation = weak_perspective_to_translation(
        tr["cam"], fit_cfg.focal_length, fit_cfg.proxy_wh)
    return TrackResult(body_pose=body_pose, global_orient=tr["orient"],
                       betas=tr["betas"], cam_wp=tr["cam"],
                       translation=translation,
                       silh_iou=best["iou"], joint_err=best["joint_err"])
