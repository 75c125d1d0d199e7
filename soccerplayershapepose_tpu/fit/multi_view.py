"""Multi-view alternating optimization with shared pose/shape, batched.

Role of ``multi_view_optimization``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:1568-1999``):
per player with V=4 synthetic views, initialise from the single-view results
(shared body_pose/betas = mean over views, player_recon.py:1691-1694 — the
rotmat mean is taken verbatim, off-manifold, like the reference), then run 3
alternating rounds (global_var.py:79):

* phase A (50 iters): optimize per-view [cam_wp, global_orient], shared
  pose/betas frozen (player_recon.py:1734-1847);
* phase B (50 iters): optimize [pose-minus-hands/feet, betas], cameras frozen
  (player_recon.py:1862-1967).

Outputs shared {body_pose, betas} + per-view {global_orient, translation} +
per-player [silh_iou, joint_err] (metrics.xml, player_recon.py:1976-1986).

TPU re-design: the reference steps Adam once per view in shuffled order
(4·50 sequential steps/phase); here each phase step evaluates ALL views of ALL
players in one batch and takes one Adam step on the joint objective (same
optimum, one compiled program, no view-order randomness). Best-iterate
selection for shared parameters is judged on per-player metrics averaged over
views (the reference tracks a global mean across everything it has seen —
per-player aggregation is the faithful batched analogue).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit.engine import (
    FitConfig, evaluate_fit, run_fit_loop)
from soccerplayershapepose_tpu.fit.single_view import splice_body_pose, _TRAIN
from soccerplayershapepose_tpu.ops.camera import weak_perspective_to_translation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets


class MultiViewInit(NamedTuple):
    """Per-view single-view results for each player."""
    body_pose: jnp.ndarray      # (B, V, 23, 3, 3)
    global_orient: jnp.ndarray  # (B, V, 1, 3, 3)
    betas: jnp.ndarray          # (B, V, 10)
    cam_wp: jnp.ndarray         # (B, V, 3)


class MultiViewResult(NamedTuple):
    body_pose: jnp.ndarray      # (B, 23, 3, 3) shared
    betas: jnp.ndarray          # (B, 10) shared
    global_orient: jnp.ndarray  # (B, V, 1, 3, 3)
    cam_wp: jnp.ndarray         # (B, V, 3)
    translation: jnp.ndarray    # (B, V, 3)
    silh_iou: jnp.ndarray       # (B,) mean over views, final params
    joint_err: jnp.ndarray      # (B,)


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _assemble_mv_a(t, f):
    """Phase A: per-view [orient, cam] trainable; shared pose/betas frozen.
    Module-level (identity keys the engine's compile cache)."""
    b, v = t["orient"].shape[:2]
    pose = splice_body_pose(f["pose_sub"], f["pose_init"])        # (B,23,3,3)
    return (jnp.repeat(pose, v, axis=0),
            t["orient"].reshape(b * v, 1, 3, 3),
            jnp.repeat(f["betas"], v, axis=0),
            t["cam"].reshape(b * v, 3))


def _assemble_mv_b(t, f):
    """Phase B: shared [pose_sub, betas] trainable; cameras frozen."""
    b, v = f["orient"].shape[:2]
    pose = splice_body_pose(t["pose_sub"], f["pose_init"])
    return (jnp.repeat(pose, v, axis=0),
            f["orient"].reshape(b * v, 1, 3, 3),
            jnp.repeat(t["betas"], v, axis=0),
            f["cam"].reshape(b * v, 3))


def multi_view_fit(assets: SMPLAssets,
                   init: MultiViewInit,
                   silhouettes: jnp.ndarray,     # (B, V, wh, wh)
                   joints2d: jnp.ndarray,        # (B, V, 17, 2|3)
                   fit_cfg: Optional[FitConfig] = None,
                   rounds: int = cfg.MULTI_VIEW_ROUNDS,
                   iters_per_phase: int = cfg.MULTI_VIEW_ITERS,
                   mask: Optional[jnp.ndarray] = None,
                   mesh=None) -> MultiViewResult:
    fit_cfg = fit_cfg or FitConfig(iters=iters_per_phase)
    phase_cfg = dataclasses.replace(fit_cfg, iters=iters_per_phase)
    b, v = init.cam_wp.shape[:2]
    if mask is None:
        mask = jnp.ones((b,), jnp.float32)
    view_mask = jnp.repeat(mask, v)

    sil_flat = _flat(silhouettes)
    j2d_flat = _flat(joints2d)

    # Shared init: mean over views (rotmat mean kept verbatim — see docstring).
    shared_pose = jnp.mean(init.body_pose, axis=1)         # (B, 23, 3, 3)
    shared_betas = jnp.mean(init.betas, axis=1)            # (B, 10)
    orient = init.global_orient                            # (B, V, 1, 3, 3)
    cam_wp = init.cam_wp                                   # (B, V, 3)

    pose_sub = shared_pose[:, _TRAIN]
    for _ in range(rounds):
        # Phase A: per-view cameras + global orientations.
        a_params, _ = run_fit_loop(
            assets, {"orient": orient, "cam": cam_wp},
            {"pose_sub": pose_sub, "betas": shared_betas,
             "pose_init": shared_pose},
            _assemble_mv_a, sil_flat, j2d_flat, phase_cfg,
            mask=view_mask, group_size=v, mesh=mesh)
        orient, cam_wp = a_params["orient"], a_params["cam"]

        # Phase B: shared pose + betas.
        b_params, _ = run_fit_loop(
            assets, {"pose_sub": pose_sub, "betas": shared_betas},
            {"orient": orient, "cam": cam_wp, "pose_init": shared_pose},
            _assemble_mv_b, sil_flat, j2d_flat, phase_cfg,
            mask=view_mask, group_size=v, mesh=mesh)
        pose_sub, shared_betas = b_params["pose_sub"], b_params["betas"]

    body_pose = splice_body_pose(pose_sub, shared_pose)

    # Final per-player metrics (mean over views) — metrics.xml content.
    ev = evaluate_fit(assets, jnp.repeat(body_pose, v, axis=0), _flat(orient),
                      jnp.repeat(shared_betas, v, axis=0), _flat(cam_wp),
                      sil_flat, j2d_flat, fit_cfg)
    silh_iou = jnp.mean(ev["iou"].reshape(b, v), axis=1)
    joint_err = jnp.mean(ev["joint_err"].reshape(b, v), axis=1)

    translation = weak_perspective_to_translation(
        cam_wp, fit_cfg.focal_length, fit_cfg.proxy_wh)
    return MultiViewResult(body_pose=body_pose, betas=shared_betas,
                           global_orient=orient, cam_wp=cam_wp,
                           translation=translation,
                           silh_iou=silh_iou, joint_err=joint_err)
