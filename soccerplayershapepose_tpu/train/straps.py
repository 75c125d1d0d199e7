"""STRAPS-style synthetic-proxy training for the SMPL regressor.

The reference never trains its ``SingleInputRegressor`` in-repo: ``predict``
loads the external ``straps_model_checkpoint.tar``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:133-140``)
— a checkpoint produced by the STRAPS recipe (synthetic proxy
representations rendered on the fly from SMPL samples, corrupted to match
real-detector noise, supervised by the generating parameters). That
checkpoint is not in the snapshot, so the rebuild supplies the training
capability itself, TPU-first:

* the synth factory (:mod:`train.synth`) samples GT (pose, shape, cam),
  renders the occlusion-aware silhouette with the Pallas z-buffer kernel and
  projects the KP-RCNN-17 joints — one jitted program per batch;
* proxies are built by the SAME builder deployment uses
  (:func:`pipeline.proxy.create_proxy_representation`), so train/serve skew
  is zero by construction;
* corruption augmentation emulates detector noise: joint jitter + dropout,
  silhouette cut-out occlusion (on top of the factory's real second-body
  occluders);
* the training step is :func:`train.distill.make_train_step` — the exact
  multi-task homoscedastic loss the reference fine-tunes with
  (PyTorch3DTest.py:831-1184) — with GT params as the targets instead of
  broad-view pseudo-labels.

Evaluation reports the reference's metric family
(train_loss_and_metrics_tracker.py:23-35): PVE / PVE-SC / PVE-PA, PVE-T
(reposed), MPJPE / MPJPE-SC / MPJPE-PA in mm, plus 2D joint pixel error in
the 512² proxy frame.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.ief import default_initial_params
from soccerplayershapepose_tpu.ops.alignment import (
    procrustes_align, scale_and_translation_align)
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation)
from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
from soccerplayershapepose_tpu.pipeline.proxy import create_proxy_representation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward, smpl_shape_only
from soccerplayershapepose_tpu.train.synth import synth_crop_batch

# Far enough off-frame that a truncated Gaussian window (±2σ, σ=4 px,
# heatmaps.py) can never intersect the image: the joint's heatmap is zero.
_DROPPED_JOINT = -1.0e4


def corrupt_proxy_inputs(rng: jax.Array,
                         silhouette: jnp.ndarray,
                         joints2d: jnp.ndarray,
                         jitter_frac: float = 0.02,
                         drop_p: float = 0.08,
                         max_cutouts: int = 2,
                         cutout_p: float = 0.5,
                         cutout_frac: float = 0.35,
                         return_scores: bool = False,
                         score_noise: float = 0.75):
    """Detector-noise augmentation on clean GT proxy inputs.

    STRAPS-style corruption: per-joint Gaussian jitter (σ =
    ``jitter_frac``·wh — ~2% of the crop, matching the trained ProxyNet's
    held-out median error), per-joint dropout (missed detections → zero
    heatmap), and up to ``max_cutouts`` random rectangles zeroed out of the
    silhouette (inter-player occlusion / mask-head failure modes the
    reference inherits from PointRend confidence filtering,
    predict_silhouette_pointrend.py:42-63).

    Args:
      silhouette: (B, wh, wh) {0,1}.
      joints2d: (B, 17, 2) pixels in the silhouette's frame.

    When ``return_scores`` is set, a third value — per-joint confidence
    scores (B, 17) in (0, 1) — is returned, modeled as a NOISY correlate of
    the actual injected error (``score_noise`` std-normal units on the
    normalized-error logit; 0.75 calibrates the score↔error rank-AUC to
    ≈0.73, the trained ProxyNet's measured held-out rank-AUC,
    QUALITY_r03.json) — deliberately not an oracle. Dropped joints score 0.

    Returns:
      (silhouette', joints2d'[, scores]) with the same leading shapes.
    """
    b, wh = silhouette.shape[0], silhouette.shape[-1]
    k_jit, k_drop, k_cut, k_score = jax.random.split(rng, 4)

    jit_px = jax.random.normal(k_jit, joints2d.shape) * (jitter_frac * wh)
    joints = joints2d + jit_px
    dropped = jax.random.bernoulli(k_drop, drop_p, joints2d.shape[:2])
    joints = jnp.where(dropped[..., None], _DROPPED_JOINT, joints)
    scores = None
    if return_scores:
        err_norm = jnp.linalg.norm(jit_px, axis=-1) \
            / jnp.maximum(jitter_frac * wh, 1e-6)
        noise = jax.random.normal(k_score, err_norm.shape) * score_noise
        scores = jax.nn.sigmoid(2.0 - err_norm + noise)
        scores = jnp.where(dropped, 0.0, scores)

    ys = jax.lax.broadcasted_iota(jnp.float32, (1, wh, wh), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, wh, wh), 2)
    sil = silhouette
    for c in range(max_cutouts):
        kc = jax.random.fold_in(k_cut, c)
        k1, k2, k3 = jax.random.split(kc, 3)
        active = jax.random.bernoulli(k1, cutout_p, (b, 1, 1))
        centre = jax.random.uniform(k2, (b, 2), minval=0.0, maxval=wh)
        half = jax.random.uniform(k3, (b, 2), minval=0.03 * wh,
                                  maxval=0.5 * cutout_frac * wh)
        inside = ((jnp.abs(xs - centre[:, 0, None, None]) < half[:, 0, None, None])
                  & (jnp.abs(ys - centre[:, 1, None, None]) < half[:, 1, None, None]))
        sil = jnp.where(active & inside, 0.0, sil)
    if return_scores:
        return sil, joints, scores
    return sil, joints


def gt_iuv_image(part: jnp.ndarray, uv: jnp.ndarray, wh: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stride-4 GT part/uv maps → (B, wh, wh, 3) IUV image in [0, 1].

    Byte-parity with the deployment convention: the reference loads its
    stored DensePose png and divides by 255 (player_iuv_sp.py:263-285), so
    channel 0 is part-index/255 (0..24/255) and channels 1-2 are U,V/255.
    Part labels upsample nearest (labels don't interpolate), UV bilinear
    (decode_iuv upsamples continuous channels bilinearly). ``mask``
    multiplies the image (corrupted-silhouette cutouts hit the IUV too —
    mask-head failure modes are shared)."""
    b = part.shape[0]
    part_f = jax.image.resize(part.astype(jnp.float32)[..., None],
                              (b, wh, wh, 1), "nearest")[..., 0]
    uv_f = jax.image.resize(uv, (b, wh, wh, 2), "bilinear")
    fg = (part_f > 0).astype(jnp.float32)
    iuv = jnp.stack([part_f, uv_f[..., 0] * 255.0 * fg,
                     uv_f[..., 1] * 255.0 * fg], axis=-1) / 255.0
    if mask is not None:
        iuv = iuv * mask[..., None]
    return iuv


def _build_proxy(sil, joints, wh, proxy_channels, iuv=None):
    """18/20/21-channel proxy dispatch (PyTorch3DTest.py:2092-2116: 21ch =
    [sil, heatmaps, IUV]; 20ch drops the silhouette channel)."""
    if proxy_channels == 18:
        return create_proxy_representation(sil, joints, in_wh=wh)
    return create_proxy_representation(
        sil, joints, in_wh=wh, iuv=iuv,
        include_silhouette=(proxy_channels == 21))


def synth_regressor_batch(assets: SMPLAssets, rng: jax.Array, b: int = 16,
                          wh: int = 512, corrupt: bool = True,
                          occluders: bool = True,
                          jitter_frac: float = 0.02,
                          drop_p: float = 0.08,
                          proxy_channels: int = 18) -> dict:
    """One STRAPS training batch for :func:`train.distill.make_train_step`.

    ``wh`` is the silhouette render resolution (512 = deployment proxy
    resolution, PROXY_REP_INPUT_WH; smaller for CPU smoke tests). Joint
    targets are always returned in the 512² proxy frame the distill loss
    normalizes by (cfg.PROXY_REP_INPUT_WH), regardless of ``wh``.

    ``proxy_channels`` selects the reference's IUV input variants
    (player_iuv_sp.py:61-427): 18 = [sil, heatmaps]; 21 appends the GT
    IUV image; 20 = [heatmaps, IUV] without the silhouette channel.

    Returns {proxy (B,256,256,C), joints2d (B,17,2) @512px,
    target_pose (B,24,3,3), target_betas (B,10), gt_cam_wp (B,3)}.
    """
    k_synth, k_corrupt = jax.random.split(rng)
    data = synth_crop_batch(assets, k_synth, b=b, wh=wh,
                            occluders=occluders, with_image=False,
                            return_params=True)
    sil, joints = data["silhouette"], data["joints2d"]
    if corrupt:
        sil, joints = corrupt_proxy_inputs(k_corrupt, sil, joints,
                                           jitter_frac=jitter_frac,
                                           drop_p=drop_p)
    iuv = None
    if proxy_channels != 18:
        # Cutout-corrupted silhouette also masks the IUV (shared failure).
        iuv = gt_iuv_image(data["part"], data["uv"], wh,
                           mask=sil if corrupt else None)
    proxy = _build_proxy(sil, joints, wh, proxy_channels, iuv)
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)
    return {"proxy": proxy,
            "joints2d": data["joints2d"] * scale,      # clean supervision
            "target_pose": jnp.concatenate(
                [data["global_orient"], data["body_pose"]], axis=1),
            "target_betas": data["betas"],
            "gt_cam_wp": data["cam_wp"]}


# ---------------------------------------------------------------------------
# Held-out evaluation (reference metric family)
# ---------------------------------------------------------------------------

def regressor_metrics(assets: SMPLAssets, cam_wp: jnp.ndarray,
                      pose6d: jnp.ndarray, betas: jnp.ndarray,
                      target_pose: jnp.ndarray, target_betas: jnp.ndarray,
                      target_joints2d: jnp.ndarray) -> dict:
    """PVE/MPJPE-family metrics for one predicted batch (jittable).

    Same definitions as the reference tracker
    (train_loss_and_metrics_tracker.py:23-35, eval_utils.py:7-85): -SC =
    scale+translation aligned, -PA = Procrustes aligned, PVE-T = reposed
    (T-pose) vertex error. 3D in mm; joints2D L2 in 512-proxy pixels.
    """
    rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
    return rotmat_metrics(assets, cam_wp, rotmats, betas, target_pose,
                          target_betas, target_joints2d)


def rotmat_metrics(assets: SMPLAssets, cam_wp: jnp.ndarray,
                   rotmats: jnp.ndarray, betas: jnp.ndarray,
                   target_pose: jnp.ndarray, target_betas: jnp.ndarray,
                   target_joints2d: jnp.ndarray) -> dict:
    """As :func:`regressor_metrics` but on (B, 24, 3, 3) rotmats directly
    (fit outputs are rotmats, regressor outputs are 6D)."""
    pred = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
    gt = smpl_forward(assets, target_betas, target_pose[:, 1:],
                      target_pose[:, :1])

    coco = jnp.asarray(cfg.ALL_JOINTS_TO_COCO_MAP)
    kprcnn = jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)

    def _mm(a, b_):
        return jnp.linalg.norm(a - b_, axis=-1).mean() * 1000.0

    pv, gv = pred.vertices, gt.vertices
    pj, gj = pred.joints[:, coco], gt.joints[:, coco]
    pvt = smpl_shape_only(assets, betas)
    gvt = smpl_shape_only(assets, target_betas)

    j2d = undo_keypoint_normalisation(
        orthographic_project(pred.joints, cam_wp)[:, kprcnn],
        cfg.PROXY_REP_INPUT_WH)

    return {
        "pve_mm": _mm(pv, gv),
        "pve_sc_mm": _mm(scale_and_translation_align(pv, gv), gv),
        "pve_pa_mm": _mm(procrustes_align(pv, gv), gv),
        "pve_t_mm": _mm(pvt, gvt),
        "pve_t_sc_mm": _mm(scale_and_translation_align(pvt, gvt), gvt),
        "mpjpe_mm": _mm(pj, gj),
        "mpjpe_sc_mm": _mm(scale_and_translation_align(pj, gj), gj),
        "mpjpe_pa_mm": _mm(procrustes_align(pj, gj), gj),
        "joints2d_l2_px": jnp.linalg.norm(
            j2d - target_joints2d, axis=-1).mean(),
    }


def evaluate_regressor(regressor, params, batch_stats, assets: SMPLAssets,
                       n_batches: int = 4, batch: int = 16, wh: int = 512,
                       corrupt: bool = False, seed: int = 10_000_000,
                       proxy_fn=None, proxy_channels: int = 18) -> dict:
    """Held-out synthetic eval of a trained regressor.

    ``corrupt=True`` evaluates under the training-noise model (the harder,
    deployment-shaped cell); default is the clean-proxy cell. ``proxy_fn``
    optionally replaces the GT proxy with an extracted one (full-pipeline
    eval through a trained ProxyNet): it maps the synth batch dict → proxy
    array.
    """
    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def cell(rng):
        b = synth_regressor_batch(assets, rng, b=batch, wh=wh,
                                  corrupt=corrupt,
                                  proxy_channels=proxy_channels)
        proxy = b["proxy"] if proxy_fn is None else proxy_fn(b)
        cam_wp, pose6d, betas = regressor.apply(variables, proxy, init)
        return regressor_metrics(assets, cam_wp, pose6d, betas,
                                 b["target_pose"], b["target_betas"],
                                 b["joints2d"])

    sums: Optional[dict] = None
    for i in range(n_batches):
        m = cell(jax.random.fold_in(jax.random.PRNGKey(seed), i))
        m = {k: float(v) for k, v in m.items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
    out = {k: v / n_batches for k, v in sums.items()}
    out.update(n_images=n_batches * batch, eval_wh=wh,
               corrupt_eval=bool(corrupt))
    return out


def extracted_regressor_batch(assets: SMPLAssets, extractor, rng: jax.Array,
                              b: int = 16, wh: int = 256,
                              jitter_frac: float = 0.02,
                              drop_p: float = 0.08,
                              proxy_channels: int = 18,
                              return_raw: bool = False) -> dict:
    """One regressor batch whose proxies come from the REAL perception path.

    Replaces :func:`corrupt_proxy_inputs`'s hand-modeled detector noise with
    the thing itself: domain-randomized synth RGB crops are run through the
    trained ProxyNet extractor (the deployment create_proxy chain,
    player_recon.py:61-124) and the EXTRACTED silhouette/keypoints build
    the training proxy, while supervision stays the generating GT SMPL
    parameters. Fine-tuning the regressor on these batches closes the
    train/deploy input gap measured in ``regressor_18ch_e2e.json`` (clean
    173 mm → extracted 288 mm MPJPE at round 3).

    Rows whose extraction fails (no instance found) fall back to the
    corrupted GT proxy, so the batch shape stays static for jit.

    ``return_raw=True`` skips the proxy assembly and returns numpy-only
    pre-proxy tensors (extracted sil/kps[/iuv] + supervision) sized for an
    on-disk cache — the extraction is by far the expensive part (ProxyNet
    forward + per-image host post on a 1-core host), so the e2e fine-tune
    drive extracts each batch once and replays it across epochs/segments
    (:func:`assemble_extracted_batch`).
    """
    import numpy as np
    k_synth, k_corrupt = jax.random.split(rng)
    data = synth_crop_batch(assets, k_synth, b=b, wh=wh, occluders=True,
                            domain_rand=True, return_params=True,
                            with_image=True)
    images_u8 = np.asarray(
        jnp.clip(data["image"] * 255.0, 0, 255)).astype(np.uint8)
    # Fallback for failed rows: the hand-modeled corruption (same noise
    # family the base trainer used).
    fb_sil, fb_joints = corrupt_proxy_inputs(
        k_corrupt, data["silhouette"], data["joints2d"],
        jitter_frac=jitter_frac, drop_p=drop_p)
    fb_sil, fb_joints = np.asarray(fb_sil), np.asarray(fb_joints)
    fb_iuv = None
    if proxy_channels != 18:
        fb_iuv = np.asarray(gt_iuv_image(data["part"], data["uv"], wh,
                                         mask=jnp.asarray(fb_sil)))
    sils, kps, iuvs = [], [], []
    for j, (kp, sil, iuv) in enumerate(extractor(images_u8)):
        if kp is None:
            sils.append(fb_sil[j])
            kps.append(fb_joints[j])
            if proxy_channels != 18:
                iuvs.append(fb_iuv[j])
        else:
            sils.append(sil.astype(np.float32))
            kps.append(kp[:, :2].astype(np.float32))
            if proxy_channels != 18:
                iuvs.append((iuv.astype(np.float32) / 255.0)
                            if iuv is not None
                            else fb_iuv[j])
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)
    if return_raw:
        raw = {"sil": np.stack(sils).astype(np.uint8),
               "kps": np.stack(kps).astype(np.float32),
               "joints2d": np.asarray(data["joints2d"] * scale, np.float32),
               "target_pose": np.asarray(jnp.concatenate(
                   [data["global_orient"], data["body_pose"]], axis=1),
                   np.float32),
               "target_betas": np.asarray(data["betas"], np.float32),
               "gt_cam_wp": np.asarray(data["cam_wp"], np.float32)}
        if iuvs:
            raw["iuv"] = (np.stack(iuvs) * 255.0).astype(np.uint8)
        return raw
    proxy = _build_proxy(
        jnp.asarray(np.stack(sils)), jnp.asarray(np.stack(kps)), wh,
        proxy_channels, jnp.asarray(np.stack(iuvs)) if iuvs else None)
    return {"proxy": proxy,
            "joints2d": data["joints2d"] * scale,      # clean supervision
            "target_pose": jnp.concatenate(
                [data["global_orient"], data["body_pose"]], axis=1),
            "target_betas": data["betas"],
            "gt_cam_wp": data["cam_wp"]}


def assemble_extracted_batch(raw, wh: int, proxy_channels: int = 18) -> dict:
    """Cached :func:`extracted_regressor_batch` raw npz → training batch.

    The proxy is rebuilt on device (one fused heatmap-synthesis program,
    pipeline/proxy.py) — cheap compared to re-running extraction.
    """
    iuv = None
    if proxy_channels != 18:
        iuv = jnp.asarray(raw["iuv"], jnp.float32) / 255.0
    proxy = _build_proxy(jnp.asarray(raw["sil"], jnp.float32),
                         jnp.asarray(raw["kps"]), wh, proxy_channels, iuv)
    return {"proxy": proxy,
            "joints2d": jnp.asarray(raw["joints2d"]),
            "target_pose": jnp.asarray(raw["target_pose"]),
            "target_betas": jnp.asarray(raw["target_betas"]),
            "gt_cam_wp": jnp.asarray(raw["gt_cam_wp"])}


def synth_fit_batch(assets: SMPLAssets, rng: jax.Array, b: int = 8,
                    wh: int = 512, corrupt: bool = True,
                    jitter_frac: float = 0.02) -> dict:
    """Held-out batch for the GT-3D fitting benchmark.

    Like :func:`synth_regressor_batch` but additionally returns the
    (corrupted) silhouette + keypoints as FIT targets in the render frame —
    the same observations that built the proxy, exactly as deployment feeds
    ``single_view_fit`` the proxies ``create_proxy`` wrote
    (player_recon.py:1107-1130). Corruption uses jitter + cut-outs but NO
    joint dropout: the fit loss consumes raw coordinates without confidence
    gating (engine.py loss), as the reference does. The fit targets carry a
    score channel ((B,17,3), noisy error correlate — see
    :func:`corrupt_proxy_inputs`) so confidence-weighted fitting
    (FitConfig.joint_conf_weighting) can be measured; clean batches score 1.
    """
    k_synth, k_corrupt = jax.random.split(rng)
    data = synth_crop_batch(assets, k_synth, b=b, wh=wh, occluders=True,
                            with_image=False, return_params=True)
    sil, joints = data["silhouette"], data["joints2d"]
    scores = jnp.ones(joints.shape[:2], joints.dtype)
    if corrupt:
        sil, joints, scores = corrupt_proxy_inputs(
            k_corrupt, sil, joints, jitter_frac=jitter_frac, drop_p=0.0,
            return_scores=True)
    proxy = create_proxy_representation(sil, joints, in_wh=wh)
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)
    return {"proxy": proxy,
            "silhouette": sil,                     # fit target (wh²)
            "joints2d_fit": jnp.concatenate(       # fit target (wh px, +score)
                [joints, scores[..., None]], axis=-1),
            "joints2d": data["joints2d"] * scale,  # clean GT (512 px)
            "target_pose": jnp.concatenate(
                [data["global_orient"], data["body_pose"]], axis=1),
            "target_betas": data["betas"],
            "gt_cam_wp": data["cam_wp"]}


def evaluate_fit_3d(regressor, params, batch_stats, assets: SMPLAssets,
                    n_batches: int = 1, batch: int = 8, wh: int = 512,
                    corrupt: bool = True, fit_cfg=None,
                    seed: int = 20_000_000) -> dict:
    """Ground-truth 3D benchmark of the render-and-compare fitting stage.

    The reference can only measure fitting against its own 2D proxies
    (silhouette IoU + joint px error, player_recon.py:1305-1307) — it has
    no 3D ground truth. The synth factory knows the generating SMPL
    parameters, so this cell reports what fitting actually does to the 3D
    error: PVE/MPJPE families for the regressor INIT vs the FIT result,
    plus the 2D diagnostics the reference prints.
    """
    from soccerplayershapepose_tpu.fit.engine import FitConfig, FitInit
    from soccerplayershapepose_tpu.fit.single_view import single_view_fit

    fit_cfg = fit_cfg or FitConfig(proxy_wh=wh, render_wh=min(wh, 256))
    init_params = default_initial_params(assets.mean_pose_rot6d,
                                         assets.mean_shape)
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def infer(proxy):
        cam_wp, pose6d, betas = regressor.apply(variables, proxy,
                                                init_params)
        rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        return cam_wp, rotmats, betas

    metric_fwd = jax.jit(rotmat_metrics)

    sums: Optional[dict] = None
    for i in range(n_batches):
        b = synth_fit_batch(assets, jax.random.fold_in(
            jax.random.PRNGKey(seed), i), b=batch, wh=wh, corrupt=corrupt)
        cam_wp, rotmats, betas = infer(b["proxy"])
        m_init = metric_fwd(assets, cam_wp, rotmats, betas,
                            b["target_pose"], b["target_betas"],
                            b["joints2d"])

        res = single_view_fit(
            assets,
            FitInit(body_pose=rotmats[:, 1:], global_orient=rotmats[:, :1],
                    betas=betas, cam_wp=cam_wp),
            b["silhouette"], b["joints2d_fit"], fit_cfg)
        fit_rm = jnp.concatenate([res.global_orient, res.body_pose], axis=1)
        m_fit = metric_fwd(assets, res.cam_wp, fit_rm, res.betas,
                           b["target_pose"], b["target_betas"],
                           b["joints2d"])

        m = {**{f"init_{k}": float(v) for k, v in m_init.items()},
             **{f"fit_{k}": float(v) for k, v in m_fit.items()},
             "fit_silh_iou": float(jnp.mean(res.silh_iou)),
             "init_silh_iou": float(jnp.mean(res.init_silh_iou)),
             "fit_joint_err_px": float(jnp.mean(res.joint_err)),
             "init_joint_err_px": float(jnp.mean(res.init_joint_err))}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
    out = {k: v / n_batches for k, v in sums.items()}
    out.update(n_images=n_batches * batch, eval_wh=wh,
               corrupt_eval=bool(corrupt), fit_iters=fit_cfg.iters)
    return out


def evaluate_regressor_e2e(regressor, params, batch_stats, extractor,
                           assets: SMPLAssets, n_batches: int = 4,
                           batch: int = 16, wh: int = 256,
                           seed: int = 10_000_000,
                           proxy_channels: int = 18) -> dict:
    """Full-pipeline held-out eval: RGB crop → extracted proxy → regressor.

    The deployment-condition number: synth RGB crops (domain-randomized,
    occluders) go through the trained ProxyNet extractor (instance gating,
    optional flip TTA — the create_proxy role, player_recon.py:61-124) and
    the resulting proxies through the regressor (the predict role,
    player_recon.py:133-250); 3D error is measured against the generating
    SMPL parameters. Images whose extraction fails (no person found) are
    excluded and counted, mirroring the reference's delete-player
    semantics.
    """
    import numpy as np
    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    variables = {"params": params, "batch_stats": batch_stats}

    def metric_fwd(proxy, target_pose, target_betas, target_j2d):
        cam_wp, pose6d, betas = regressor.apply(variables, proxy, init)
        return regressor_metrics(assets, cam_wp, pose6d, betas,
                                 target_pose, target_betas, target_j2d)

    metric_fwd = jax.jit(metric_fwd)
    scale = cfg.PROXY_REP_INPUT_WH / float(wh)

    sums: Optional[dict] = None
    n_ok = n_fail = 0
    for i in range(n_batches):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        data = synth_crop_batch(assets, rng, b=batch, wh=wh,
                                occluders=True, domain_rand=True,
                                return_params=True)
        images_u8 = np.asarray(
            jnp.clip(data["image"] * 255.0, 0, 255)).astype(np.uint8)
        keep, sils, kps, iuvs = [], [], [], []
        for j, (kp, sil, iuv) in enumerate(extractor(images_u8)):
            if kp is None:
                n_fail += 1
                continue
            keep.append(j)
            sils.append(sil.astype(np.float32))
            kps.append(kp[:, :2])
            if proxy_channels != 18:
                # Extractor IUV follows decode_iuv: part 0..24, U/V 0..255;
                # /255 matches the reference's loaded-png scaling
                # (player_iuv_sp.py:285).
                iuvs.append((iuv.astype(np.float32) / 255.0)
                            if iuv is not None
                            else np.zeros((wh, wh, 3), np.float32))
        if not keep:
            continue
        n_ok += len(keep)
        idx = jnp.asarray(keep)
        proxy = _build_proxy(
            jnp.asarray(np.stack(sils)), jnp.asarray(np.stack(kps)), wh,
            proxy_channels,
            jnp.asarray(np.stack(iuvs)) if iuvs else None)
        target_pose = jnp.concatenate(
            [data["global_orient"], data["body_pose"]], axis=1)
        m = metric_fwd(proxy, target_pose[idx], data["betas"][idx],
                       data["joints2d"][idx] * scale)
        m = {k: float(v) * len(keep) for k, v in m.items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
    if sums is None:
        return {"extraction_failures": n_fail, "n_images": 0, "eval_wh": wh}
    out = {k: v / n_ok for k, v in sums.items()}
    out.update(n_images=n_ok, extraction_failures=n_fail, eval_wh=wh,
               via="proxynet_extractor")
    return out


def expand_regressor_channels(src_path: str, dst_path: str,
                              proxy_channels: int) -> None:
    """18-ch regressor weights → 20/21-ch warm start (IUV variants).

    Only the stem conv consumes the proxy channels; every other parameter
    transfers verbatim. New IUV input channels get ZERO kernel slices, so
    the 21-ch net is function-identical to the 18-ch net at init (IUV
    initially ignored; fine-tuning learns to use it). The 20-ch variant
    drops the silhouette channel: kernel slice [1:18] maps onto heatmap
    positions [0:17] and IUV gets zeros — c.f. player_iuv_sp.py:61-427,
    which trains its IUV regressors from the base checkpoint too
    (load_checkpoint=True, :428).
    """
    import numpy as np
    flat = dict(np.load(src_path))
    key = "params/ResNet_0/Conv_0/kernel"
    k = flat[key]                                       # (7,7,18,64)
    assert k.shape[2] == 18, k.shape
    new = np.zeros(k.shape[:2] + (proxy_channels, k.shape[3]), k.dtype)
    if proxy_channels == 21:        # [sil, 17 heatmaps, IUV]
        new[:, :, :18] = k
    elif proxy_channels == 20:      # [17 heatmaps, IUV]
        new[:, :, :17] = k[:, :, 1:18]
    else:
        raise ValueError(proxy_channels)
    flat[key] = new
    np.savez(dst_path, **flat)


# ---------------------------------------------------------------------------
# Inference-weight artifacts (pair with scripts/pack_weights.py)
# ---------------------------------------------------------------------------

def save_regressor_weights(path: str, state, dtype=None,
                           compress: bool = False) -> None:
    """Save regressor inference weights (params + BN stats) as flat .npz."""
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _flatten
    flat = _flatten({"params": state.params,
                     "batch_stats": state.batch_stats})
    if dtype is not None:
        flat = {k: v.astype(dtype) if v.dtype == np.float32 else v
                for k, v in flat.items()}
    (np.savez_compressed if compress else np.savez)(path, **flat)


def load_regressor_weights(path: str, regressor, assets: SMPLAssets) -> dict:
    """Load :func:`save_regressor_weights` output → flax variables dict."""
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _unflatten_like
    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    dummy = jnp.zeros((1, cfg.REGRESSOR_IMG_WH, cfg.REGRESSOR_IMG_WH,
                       regressor.in_channels), jnp.float32)
    template = regressor.init(jax.random.PRNGKey(0), dummy, init,
                              train=False)
    template = {"params": template["params"],
                "batch_stats": template.get("batch_stats", {})}
    flat = dict(np.load(path))
    return _unflatten_like(template, flat)
