"""Baseline-model evaluation harness (HMR / SPIN / PARE).

Role of the reference ``hmr.py``
(``/root/reference/Python/Soccer/PlayerReconstruction/hmr.py``): load external
models' per-player predictions (HMR ``.npy`` [cam|pose72|shape10], SPIN/PARE
``.npz`` {pred_rotmat, pred_betas, pred_camera} — format branches :198-231),
run the SAME camera+global-orient optimization the pipeline applies to its own
regressor output (``evaluate_model_2d`` :99-356), with multi-view variants
with/without single-view init (``multi_view_optimization_multi`` :1333+),
single-view-only (:1874+) and cross-view (:2097+) evaluations, and aggregate
per-player ``metrics.xml`` (``calc_result`` :813).

Here each variant is a thin composition over the batched fitting engine —
the baseline import decides the FitInit, everything downstream is shared.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit import FitConfig, broad_view_fit
from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.ops.rotations import batch_rodrigues
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets


def load_baseline_prediction(path: str) -> dict:
    """Dispatch on extension: HMR .npy or SPIN/PARE .npz → canonical dict
    {pose_rotmats (1,24,3,3), betas (1,10), cam_wp (1,3)}."""
    if path.endswith(".npy"):
        raw = io.read_hmr_prediction(path)
        rotmats = np.asarray(batch_rodrigues(
            jnp.asarray(raw["pose_axis_angle"].astype(np.float32))))
        return {"pose_rotmats": rotmats, "betas": raw["betas"],
                "cam_wp": raw["cam_wp"]}
    return io.read_spin_prediction(path)


def evaluate_baseline_2d(assets: SMPLAssets,
                         predictions: List[dict],
                         silhouettes: np.ndarray,
                         joints2d: np.ndarray,
                         fit_cfg: Optional[FitConfig] = None,
                         optimize: bool = True) -> dict:
    """Evaluate (and optionally cam/orient-optimize) baseline predictions
    against proxy ground truth — the core of ``evaluate_model_2d``.

    Args:
      predictions: per-player canonical dicts (see load_baseline_prediction).
      silhouettes: (B, wh, wh); joints2d: (B, 17, 2|3).

    Returns:
      {'init_iou', 'init_err', 'opt_iou', 'opt_err'} means + per-player lists.
    """
    fit_cfg = fit_cfg or FitConfig(iters=cfg.BROAD_VIEW_ITERS,
                                   lr=cfg.BROAD_VIEW_LR)
    pose = jnp.asarray(np.concatenate([p["pose_rotmats"] for p in predictions])
                       .astype(np.float32))
    betas = jnp.asarray(np.concatenate([p["betas"] for p in predictions])
                        .astype(np.float32))
    cam = jnp.asarray(np.concatenate([p["cam_wp"] for p in predictions])
                      .astype(np.float32))

    if optimize:
        res = broad_view_fit(assets, pose[:, 1:], betas, pose[:, :1], cam,
                             jnp.asarray(silhouettes), jnp.asarray(joints2d),
                             fit_cfg)
        return {"init_iou": np.asarray(res.init_silh_iou),
                "init_err": np.asarray(res.init_joint_err),
                "opt_iou": np.asarray(res.silh_iou),
                "opt_err": np.asarray(res.joint_err),
                "result": res}
    from soccerplayershapepose_tpu.fit.engine import FitInit, fit_metrics
    m = fit_metrics(assets,
                    FitInit(body_pose=pose[:, 1:], global_orient=pose[:, :1],
                            betas=betas, cam_wp=cam),
                    jnp.asarray(silhouettes), jnp.asarray(joints2d), fit_cfg)
    return {"init_iou": np.asarray(m["silh_iou"]),
            "init_err": np.asarray(m["joint_err"]),
            "opt_iou": np.asarray(m["silh_iou"]),
            "opt_err": np.asarray(m["joint_err"])}


def calc_result(result_root: str) -> Tuple[float, float, int]:
    """Aggregate metrics.xml over a result tree (hmr.py calc_result :813)."""
    agg = io.calc_metrics(result_root)
    return agg["mean_silh_iou"], agg["mean_joint_err"], agg["num_players"]


def evaluate_baseline_oneview(assets: SMPLAssets, predictions: List[dict],
                              silhouettes: np.ndarray, joints2d: np.ndarray,
                              fit_cfg: Optional[FitConfig] = None) -> dict:
    """Single-view-only evaluation (``evaluate_model_2d_oneview``,
    hmr.py:1874+): optimize cam+orient per view independently — identical to
    :func:`evaluate_baseline_2d` but kept as a named variant for parity."""
    return evaluate_baseline_2d(assets, predictions, silhouettes, joints2d,
                                fit_cfg=fit_cfg, optimize=True)


def evaluate_baseline_cross(assets: SMPLAssets, predictions: List[dict],
                            silhouettes: np.ndarray, joints2d: np.ndarray,
                            fit_view: int, eval_view: int,
                            n_views: int,
                            fit_cfg: Optional[FitConfig] = None) -> dict:
    """Cross-view evaluation (``evaluate_model_2d_cross``, hmr.py:2097+):
    optimize cam+orient against ``fit_view``'s proxies, then measure the
    metrics against ``eval_view``'s proxies with the fitted parameters.

    Args:
      predictions: per-player dicts (one per player; shared across views).
      silhouettes: (P, V, wh, wh); joints2d: (P, V, 17, 2|3).
    """
    from soccerplayershapepose_tpu.fit.engine import FitInit, fit_metrics
    fit_cfg = fit_cfg or FitConfig(iters=cfg.BROAD_VIEW_ITERS,
                                   lr=cfg.BROAD_VIEW_LR)
    assert fit_view < n_views and eval_view < n_views
    fitted = evaluate_baseline_2d(
        assets, predictions, silhouettes[:, fit_view],
        joints2d[:, fit_view], fit_cfg=fit_cfg, optimize=True)
    res = fitted["result"]
    m = fit_metrics(
        assets,
        FitInit(body_pose=res.body_pose, global_orient=res.global_orient,
                betas=res.betas, cam_wp=res.cam_wp),
        jnp.asarray(silhouettes[:, eval_view]),
        jnp.asarray(joints2d[:, eval_view]), fit_cfg)
    return {"fit_view": fit_view, "eval_view": eval_view,
            "silh_iou": np.asarray(m["silh_iou"]),
            "joint_err": np.asarray(m["joint_err"])}


def multi_view_optimization_multi(assets: SMPLAssets,
                                  predictions: List[dict],
                                  silhouettes: np.ndarray,
                                  joints2d: np.ndarray,
                                  single_view_init: bool = True,
                                  fit_cfg: Optional[FitConfig] = None,
                                  rounds: int = cfg.MULTI_VIEW_ROUNDS,
                                  iters_per_phase: int = cfg.MULTI_VIEW_ITERS
                                  ) -> dict:
    """Multi-view fitting of baseline predictions
    (``multi_view_optimization_multi``, hmr.py:1333+): with
    ``single_view_init`` each view is first optimized independently
    (cam+orient) before the shared-pose alternation; without it the raw
    baseline prediction seeds every view directly.

    Args:
      predictions: one canonical dict per player (pose shared across views).
      silhouettes: (P, V, wh, wh); joints2d: (P, V, 17, 2|3).
    """
    from soccerplayershapepose_tpu.fit.multi_view import (
        MultiViewInit, multi_view_fit)
    fit_cfg = fit_cfg or FitConfig(iters=iters_per_phase)
    p, v = silhouettes.shape[:2]

    pose = np.concatenate([d["pose_rotmats"] for d in predictions]) \
        .astype(np.float32)                                  # (P, 24, 3, 3)
    betas = np.concatenate([d["betas"] for d in predictions]).astype(np.float32)
    cam = np.concatenate([d["cam_wp"] for d in predictions]).astype(np.float32)

    body = np.repeat(pose[:, None, 1:], v, axis=1)
    orient = np.repeat(pose[:, None, :1], v, axis=1)
    betas_v = np.repeat(betas[:, None], v, axis=1)
    cam_v = np.repeat(cam[:, None], v, axis=1)

    if single_view_init:
        flat_pred = [{"pose_rotmats": pose[i:i + 1], "betas": betas[i:i + 1],
                      "cam_wp": cam[i:i + 1]}
                     for i in range(p) for _ in range(v)]
        sv = evaluate_baseline_2d(
            assets, flat_pred,
            silhouettes.reshape(p * v, *silhouettes.shape[2:]),
            joints2d.reshape(p * v, *joints2d.shape[2:]),
            fit_cfg=FitConfig(iters=cfg.BROAD_VIEW_ITERS,
                              lr=cfg.BROAD_VIEW_LR,
                              use_silhouette=fit_cfg.use_silhouette,
                              render_wh=fit_cfg.render_wh,
                              silhouette_metrics=fit_cfg.silhouette_metrics),
            optimize=True)
        res = sv["result"]
        orient = np.asarray(res.global_orient).reshape(p, v, 1, 3, 3)
        cam_v = np.asarray(res.cam_wp).reshape(p, v, 3)

    init = MultiViewInit(body_pose=jnp.asarray(body),
                         global_orient=jnp.asarray(orient),
                         betas=jnp.asarray(betas_v),
                         cam_wp=jnp.asarray(cam_v))
    res = multi_view_fit(assets, init, jnp.asarray(silhouettes),
                         jnp.asarray(joints2d), fit_cfg,
                         rounds=rounds, iters_per_phase=iters_per_phase)
    return {"result": res,
            "silh_iou": np.asarray(res.silh_iou),
            "joint_err": np.asarray(res.joint_err)}
