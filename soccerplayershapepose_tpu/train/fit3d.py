"""GT-3D benchmarks of MULTI-VIEW and TRACK fitting.

The round-4 finding (docs/QUALITY.md): single-view fitting improves
aligned 3D (MPJPE-PA/SC) but leaves RAW MPJPE/PVE flat — one 2D view
cannot constrain depth-axis pose. The reference's own answer is its
multi-view alternation (``player_recon.py:1568-1999``: per-view cameras,
shared pose/shape across 3 FIFA capture cameras) and clip-level shared
shape. These cells measure, against the synth factory's real generating
parameters, whether those mechanisms actually move raw 3D error — the
measurement the reference could never make (it has no 3D GT,
player_recon.py:1305-1307 prints 2D metrics only).

Three arms on identical players:
  init         regressor one-shot per view (no fitting)
  single-view  100-iter fit on view 0 only (the r4 benchmark condition)
  multi-view   the alternating shared-pose fit across all V views
and for tracks: init vs shared-betas track fit over T frames.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.ief import default_initial_params
from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
from soccerplayershapepose_tpu.pipeline.proxy import (
    create_proxy_representation)
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.train.scenes import (
    synth_scene_views, synth_track_views)
from soccerplayershapepose_tpu.train.straps import (
    corrupt_proxy_inputs, rotmat_metrics)


def _flat2(x):
    return x.reshape((-1,) + x.shape[2:])


def evaluate_fit_3d_multiview(regressor, params, batch_stats,
                              assets: SMPLAssets,
                              n_batches: int = 2, batch: int = 8,
                              n_views: int = 3, wh: int = 512,
                              corrupt: bool = True, fit_cfg=None,
                              rounds: int = cfg.MULTI_VIEW_ROUNDS,
                              iters_per_phase: int = cfg.MULTI_VIEW_ITERS,
                              seed: int = 30_000_000) -> dict:
    """GT-3D: init vs single-view(view0) vs multi-view on the same bodies.

    Per-view metrics are averaged over B·V rows (multi-view's shared pose
    is repeated across views; raw MPJPE sees each view's own GT orient).
    """
    from soccerplayershapepose_tpu.fit.engine import FitConfig, FitInit
    from soccerplayershapepose_tpu.fit.multi_view import (
        MultiViewInit, multi_view_fit)
    from soccerplayershapepose_tpu.fit.single_view import single_view_fit

    fit_cfg = fit_cfg or FitConfig(proxy_wh=wh, render_wh=min(wh, 256))
    init_params = default_initial_params(assets.mean_pose_rot6d,
                                         assets.mean_shape)
    variables = {"params": params, "batch_stats": batch_stats}
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)

    @jax.jit
    def infer(proxy):
        cam_wp, pose6d, betas = regressor.apply(variables, proxy,
                                                init_params)
        rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        return cam_wp, rotmats, betas

    metric_fwd = jax.jit(rotmat_metrics)

    sums: Optional[dict] = None
    for i in range(n_batches):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        data = synth_scene_views(assets, rng, n_players=batch,
                                 n_views=n_views, wh=wh, with_image=False,
                                 broad=False)
        scene = data["scene"]
        # Stack views: (B, V, ...) observations + per-view GT.
        sil = jnp.stack([v["silhouette"] for v in data["views"]], axis=1)
        j2d_clean = jnp.stack([v["joints2d"] for v in data["views"]], axis=1)
        gt_orient = jnp.stack([v["global_orient"] for v in data["views"]],
                              axis=1)                        # (B,V,1,3,3)
        if corrupt:
            s_f, j_f, sc_f = corrupt_proxy_inputs(
                jax.random.fold_in(rng, 7), _flat2(sil), _flat2(j2d_clean),
                drop_p=0.0, return_scores=True)
            sil = s_f.reshape(sil.shape)
            j2d_fit = jnp.concatenate([j_f, sc_f[..., None]], axis=-1) \
                .reshape(j2d_clean.shape[:-1] + (3,))
        else:
            j2d_fit = jnp.concatenate(
                [j2d_clean, jnp.ones(j2d_clean.shape[:-1] + (1,))], axis=-1)

        b, v = batch, n_views
        gt_pose_fv = jnp.concatenate(
            [gt_orient, jnp.broadcast_to(
                scene["body_pose"][:, None],
                (b, v, 23, 3, 3))], axis=2)                  # (B,V,24,3,3)
        gt_betas_fv = jnp.broadcast_to(scene["betas"][:, None], (b, v, 10))
        gt_j2d_fv = j2d_clean * scale

        proxy = create_proxy_representation(
            _flat2(sil), _flat2(j2d_fit)[..., :2], in_wh=wh)
        cam_f, rot_f, betas_f = infer(proxy)                 # (B*V, ...)

        def flat_metrics(cam, rot, betas):
            return {k: float(x) for k, x in metric_fwd(
                assets, cam, rot, betas, _flat2(gt_pose_fv),
                _flat2(gt_betas_fv), _flat2(gt_j2d_fv)).items()}

        m_init = flat_metrics(cam_f, rot_f, betas_f)

        # Arm 2: single-view fit on view 0 only.
        res_sv = single_view_fit(
            assets,
            FitInit(body_pose=rot_f.reshape(b, v, 24, 3, 3)[:, 0, 1:],
                    global_orient=rot_f.reshape(b, v, 24, 3, 3)[:, 0, :1],
                    betas=betas_f.reshape(b, v, 10)[:, 0],
                    cam_wp=cam_f.reshape(b, v, 3)[:, 0]),
            sil[:, 0], j2d_fit[:, 0], fit_cfg)
        m_sv = {k: float(x) for k, x in metric_fwd(
            assets, res_sv.cam_wp,
            jnp.concatenate([res_sv.global_orient, res_sv.body_pose],
                            axis=1),
            res_sv.betas, gt_pose_fv[:, 0], gt_betas_fv[:, 0],
            gt_j2d_fv[:, 0]).items()}

        # Arm 3: multi-view alternation across all V views.
        mv_init = MultiViewInit(
            body_pose=rot_f.reshape(b, v, 24, 3, 3)[:, :, 1:],
            global_orient=rot_f.reshape(b, v, 24, 3, 3)[:, :, :1],
            betas=betas_f.reshape(b, v, 10),
            cam_wp=cam_f.reshape(b, v, 3))
        res_mv = multi_view_fit(assets, mv_init, sil, j2d_fit, fit_cfg,
                                rounds=rounds,
                                iters_per_phase=iters_per_phase)
        mv_pose = jnp.concatenate(
            [_flat2(res_mv.global_orient),
             _flat2(jnp.broadcast_to(res_mv.body_pose[:, None],
                                     (b, v, 23, 3, 3)))], axis=1)
        m_mv = flat_metrics(_flat2(res_mv.cam_wp), mv_pose,
                            jnp.repeat(res_mv.betas, v, axis=0))

        m = {**{f"init_{k}": x for k, x in m_init.items()},
             **{f"sv_{k}": x for k, x in m_sv.items()},
             **{f"mv_{k}": x for k, x in m_mv.items()},
             "mv_silh_iou": float(jnp.mean(res_mv.silh_iou)),
             "sv_silh_iou": float(jnp.mean(res_sv.silh_iou))}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}

    out = {k: x / n_batches for k, x in sums.items()}
    out.update(n_players=n_batches * batch, n_views=n_views, eval_wh=wh,
               corrupt_eval=bool(corrupt), rounds=rounds,
               iters_per_phase=iters_per_phase,
               note=("init/sv metrics: per-view one-shot and view-0 "
                     "100-iter fit; mv: shared pose+betas across views "
                     "with per-view cam/orient (player_recon.py:1568-1999)"))
    return out


def evaluate_fit_3d_track(regressor, params, batch_stats,
                          assets: SMPLAssets,
                          n_batches: int = 2, batch: int = 4,
                          n_frames: int = 8, wh: int = 512,
                          corrupt: bool = True, fit_cfg=None,
                          seed: int = 40_000_000) -> dict:
    """GT-3D: per-frame init vs shared-betas track fit over a clip.

    Reports the 3D metric family over all B·T frames plus the shape
    consistency the track parameterisation enforces (PVE-T vs the fixed
    per-player GT betas).
    """
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    from soccerplayershapepose_tpu.fit.track import TrackInit, track_fit

    fit_cfg = fit_cfg or FitConfig(proxy_wh=wh, render_wh=min(wh, 256))
    init_params = default_initial_params(assets.mean_pose_rot6d,
                                         assets.mean_shape)
    variables = {"params": params, "batch_stats": batch_stats}
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)

    @jax.jit
    def infer(proxy):
        cam_wp, pose6d, betas = regressor.apply(variables, proxy,
                                                init_params)
        rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        return cam_wp, rotmats, betas

    metric_fwd = jax.jit(rotmat_metrics)
    sums: Optional[dict] = None
    for i in range(n_batches):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        data = synth_track_views(assets, rng, n_players=batch,
                                 n_frames=n_frames, wh=wh)
        b, t = batch, n_frames
        sil, j2d_clean = data["silhouette"], data["joints2d"]
        if corrupt:
            s_f, j_f, sc_f = corrupt_proxy_inputs(
                jax.random.fold_in(rng, 7), _flat2(sil), _flat2(j2d_clean),
                drop_p=0.0, return_scores=True)
            sil = s_f.reshape(sil.shape)
            j2d_fit = jnp.concatenate([j_f, sc_f[..., None]], axis=-1) \
                .reshape(j2d_clean.shape[:-1] + (3,))
        else:
            j2d_fit = jnp.concatenate(
                [j2d_clean, jnp.ones(j2d_clean.shape[:-1] + (1,))], axis=-1)

        gt_pose = jnp.concatenate([data["global_orient"],
                                   data["body_pose"]], axis=2)  # (B,T,24,..)
        gt_betas = jnp.broadcast_to(data["betas"][:, None], (b, t, 10))
        gt_j2d = j2d_clean * scale

        proxy = create_proxy_representation(
            _flat2(sil), _flat2(j2d_fit)[..., :2], in_wh=wh)
        cam_f, rot_f, betas_f = infer(proxy)

        m_init = {k: float(x) for k, x in metric_fwd(
            assets, cam_f, rot_f, betas_f, _flat2(gt_pose),
            _flat2(gt_betas), _flat2(gt_j2d)).items()}

        res = track_fit(
            assets,
            TrackInit(body_pose=rot_f.reshape(b, t, 24, 3, 3)[:, :, 1:],
                      global_orient=rot_f.reshape(b, t, 24, 3, 3)[:, :, :1],
                      betas=betas_f.reshape(b, t, 10),
                      cam_wp=cam_f.reshape(b, t, 3)),
            sil, j2d_fit, fit_cfg)
        fit_pose = jnp.concatenate([_flat2(res.global_orient),
                                    _flat2(res.body_pose)], axis=1)
        m_fit = {k: float(x) for k, x in metric_fwd(
            assets, _flat2(res.cam_wp), fit_pose,
            jnp.repeat(res.betas, t, axis=0), _flat2(gt_pose),
            _flat2(gt_betas), _flat2(gt_j2d)).items()}

        m = {**{f"init_{k}": x for k, x in m_init.items()},
             **{f"fit_{k}": x for k, x in m_fit.items()},
             "fit_silh_iou": float(jnp.mean(res.silh_iou))}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}

    out = {k: x / n_batches for k, x in sums.items()}
    out.update(n_players=n_batches * batch, n_frames=n_frames, eval_wh=wh,
               corrupt_eval=bool(corrupt), fit_iters=fit_cfg.iters,
               note=("track fit: one shared betas per player over the "
                     "clip, per-frame pose/orient/cam (fit/track.py; "
                     "reference predict_3D clip fitting)"))
    return out
