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

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit.engine import FitConfig, run_fit_loop
from soccerplayershapepose_tpu.fit.single_view import splice_body_pose, _TRAIN
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


def _assemble_track(tr, f):
    """Module-level assemble (identity keys the engine's compile cache):
    per-frame [pose, orient, cam] + one shared betas per player."""
    b, t = tr["cam"].shape[:2]
    pose = splice_body_pose(tr["pose_sub"].reshape(b * t, 19, 3, 3),
                            f["pose_init_flat"])
    return (pose, tr["orient"].reshape(b * t, 1, 3, 3),
            jnp.repeat(tr["betas"], t, axis=0), tr["cam"].reshape(b * t, 3))


def track_fit(assets: SMPLAssets,
              init: TrackInit,
              silhouettes: jnp.ndarray,      # (B, T, wh, wh)
              joints2d: jnp.ndarray,         # (B, T, 17, 2|3)
              fit_cfg: Optional[FitConfig] = None,
              frame_mask: Optional[jnp.ndarray] = None,
              mesh=None) -> TrackResult:
    """Jointly optimize a clip per player with one shared shape."""
    fit_cfg = fit_cfg or FitConfig(iters=cfg.SINGLE_VIEW_ITERS)
    b, t = init.cam_wp.shape[:2]
    if frame_mask is None:
        frame_mask = jnp.ones((b, t), jnp.float32)
    flat_mask = frame_mask.reshape(b * t)

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

    tr, best = run_fit_loop(assets, trainable,
                            {"pose_init_flat": pose_init_flat},
                            _assemble_track, sil_flat, j2d_flat, fit_cfg,
                            mask=flat_mask, group_size=t,
                            metric_weights=flat_mask, mesh=mesh)

    body_pose = splice_body_pose(
        tr["pose_sub"].reshape(b * t, 19, 3, 3),
        pose_init_flat).reshape(b, t, 23, 3, 3)
    translation = weak_perspective_to_translation(
        tr["cam"], fit_cfg.focal_length, fit_cfg.proxy_wh)
    return TrackResult(body_pose=body_pose, global_orient=tr["orient"],
                       betas=tr["betas"], cam_wp=tr["cam"],
                       translation=translation,
                       silh_iou=best["iou"], joint_err=best["joint_err"])
