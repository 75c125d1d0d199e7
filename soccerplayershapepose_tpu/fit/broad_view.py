"""Broadcast-view transfer optimization, batched over players.

Role of ``broad_view_optimization``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:2003-2262``):
body_pose and betas stay FIXED at the multi-view result
(player_recon.py:2095-2099); the regressor re-estimates global_orient and
cam_wp on the broadcast-crop proxy (player_recon.py:2107-2117); then Adam
(lr 0.01, 100 iters — global_var.py:83-84) optimizes only
[cam_wp, global_orient] with the joints2D(+silhouette) loss, keeping the best
iterate; outputs {body_pose, global_orient, betas, translation} + metrics.xml.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit.engine import (
    FitConfig, FitResult, run_fit_loop)
from soccerplayershapepose_tpu.ops.camera import weak_perspective_to_translation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets


def _assemble_broad(t, f):
    """Module-level assemble (identity keys the engine's compile cache)."""
    return f["body_pose"], t["global_orient"], f["betas"], t["cam_wp"]


def broad_view_fit(assets: SMPLAssets,
                   body_pose: jnp.ndarray,       # (B, 23, 3, 3) fixed
                   betas: jnp.ndarray,           # (B, 10) fixed
                   orient_init: jnp.ndarray,     # (B, 1, 3, 3) regressor init
                   cam_init: jnp.ndarray,        # (B, 3) regressor init
                   silhouette: jnp.ndarray,      # (B, wh, wh)
                   joints2d: jnp.ndarray,        # (B, 17, 2|3)
                   fit_cfg: Optional[FitConfig] = None,
                   mask: Optional[jnp.ndarray] = None,
                   mesh=None) -> FitResult:
    fit_cfg = fit_cfg or FitConfig(iters=cfg.BROAD_VIEW_ITERS,
                                   lr=cfg.BROAD_VIEW_LR)

    trainable = {"global_orient": orient_init, "cam_wp": cam_init}
    frozen = {"body_pose": body_pose, "betas": betas}

    best_params, best = run_fit_loop(assets, trainable, frozen,
                                     _assemble_broad,
                                     silhouette, joints2d, fit_cfg, mask,
                                     mesh=mesh)

    translation = weak_perspective_to_translation(
        best_params["cam_wp"], fit_cfg.focal_length, fit_cfg.proxy_wh)
    return FitResult(
        body_pose=body_pose,
        global_orient=best_params["global_orient"],
        betas=betas,
        cam_wp=best_params["cam_wp"],
        translation=translation,
        silh_iou=best["iou"],
        joint_err=best["joint_err"],
        init_silh_iou=best["init_iou"],
        init_joint_err=best["init_joint_err"],
        best_iter=best["iter"],
    )
