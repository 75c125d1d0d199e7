"""Shared machinery for the render-and-compare fitting loops.

The reference fitting stages
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:1046-2262``)
share one inner loop: SMPL forward → weak-persp joint projection →
NMR silhouette render → homoscedastic joints2D(+silhouette) loss → Adam step →
CPU-numpy metric computation → best-iterate bookkeeping. Quirks preserved:

* rotation matrices are optimized as FREE 3×3 tensors (no re-orthonormalization
  during the loop — player_recon.py:1197-1206),
* the loss log-variances stay FIXED at their init (criterion parameters are
  excluded from the optimizer — player_recon.py:1197),
* joints2D in the loss are normalized by REGRESSOR_IMG_WH=256 although they
  live in 512-proxy space (multi_task_loss.py:110-112),
* best-iterate selection: an iterate is kept iff EVERY tracked metric is ≤ the
  best so far (train_loss_and_metrics_tracker.py:291-298); tracked metrics are
  the mean-per-joint 2D L2 error and the silhouette BCE-style score
  (init_loss_and_metric, player_recon.py:842-872),
* the reported joint error casts predicted keypoints to int32 first
  (player_recon.py:1231-1233).

TPU re-design: the whole loop (including metrics and best-iterate tracking)
runs inside ONE ``lax.scan`` per stage, batched over players — no host round
trips (the reference crosses the device boundary twice per iteration).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.losses.multi_task import (
    MultiTaskLossConfig, init_loss_state, multi_task_loss)
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation,
    weak_perspective_to_translation)
from soccerplayershapepose_tpu.ops.segmentation import (
    silhouette_confusion_metrics)
from soccerplayershapepose_tpu.render.softras import render_silhouette
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward
from soccerplayershapepose_tpu.utils.precision import default_platform


@dataclasses.dataclass(frozen=True)
class FitConfig:
    iters: int = cfg.SINGLE_VIEW_ITERS
    lr: float = cfg.FITTING_LR
    use_silhouette: bool = True
    proxy_wh: int = cfg.PROXY_REP_INPUT_WH
    render_wh: int = cfg.PROXY_REP_INPUT_WH   # lower for speed
    sigma: float = 1e-5
    focal_length: float = cfg.FOCAL_LENGTH
    # The reference computes silhouette metrics every iteration even when the
    # silhouette loss is off; set False to skip the render entirely
    # (joints-only fitting — large speedup, metrics report 0).
    silhouette_metrics: bool = True
    # Pallas fwd+bwd rasterizer kernels. None = auto: on for TPU backends,
    # off on CPU (the kernels require the real compiler; tests run the XLA
    # path). Measured on v5e: 8.3x forward, 4.35x full fitting loop.
    use_pallas: Optional[bool] = None
    # Split the fitting loop into host-driven segments of this many
    # iterations (None = single compiled program). Same numerics. Long /
    # large silhouette-fitting executions crash this TPU backend's remote
    # worker (isolated via scripts/probe_tpu.py: fit30 ok, fit100 faults,
    # fit100 segmented@10 ok; large batches need small segments AND small
    # face chunks), so conservative segmentation is the default.
    iters_per_call: Optional[int] = 10
    # Rasterizer faces per scan step: bounds the (B, chunk, pixels) loss-path
    # intermediates (backward memory scales with it).
    faces_per_chunk: int = 16
    # Pallas kernels' face-chunk size (band pruning granularity; distinct
    # knob from faces_per_chunk, which batches the XLA path's scan).
    # None = SMEM-safe auto (pallas_raster.auto_pallas_chunk): 8 — the
    # long-shipped, tuned value — up to 22 rows, doubling as the batch
    # grows so the kernels' scalar-prefetch arrays fit the ~1 MB SMEM
    # (the 44-row track workload OOM'd at a fixed 8).
    pallas_chunk: Optional[int] = None
    # Drop back faces before rasterizing. Closed-mesh silhouettes come from
    # front faces alone (the reference NMR is z-buffered, so back faces never
    # contributed there either); composes with the Pallas kernels via the
    # degenerate-sentinel band skip. Measured v5e 256² b22: 3.8x fwd / 2.1x
    # grad over no-cull, 99.99% hard-pixel agreement.
    backface_cull: bool = True
    # --- 3D-regularization knobs (TPU-rebuild additions; all off by default
    # = reference parity). The reference's free-rotmat, 2D-only fit improves
    # silhouette IoU while leaving 3D error flat (measured: GT-3D cell,
    # weights/fit3d_benchmark.json): 2D gains can come from non-rotation
    # shear in the free 3x3s and from depth-ambiguous pose drift. These
    # priors keep the iterate on/near the rotation manifold and near the
    # regressor init so 2D refinement translates into 3D gains.
    #
    # SCALE CALIBRATION (measured, r4): the reference-parity loss weights
    # put the silhouette term at exp(-lv)=1e6 TIMES a raw pixel-SUM BCE
    # (FITTING_INIT_LOSS_WEIGHTS quirk) — total ~1e9 — so any
    # absolutely-weighted prior (and the joints2D term itself, ~O(1)) is
    # numerically DEAD: its per-step effect on the parameters lands below
    # f32 ulp and the trajectory is bit-identical to the unregularized fit
    # (verified: betas_prior=1e-3 and conf weighting produced
    # bit-identical 100-iter GT-3D cells). The priors are therefore
    # RELATIVE weights: each prior term is multiplied by
    # stop_gradient(|total before priors|), so betas_prior=0.01 means "a
    # unit of mean Σβ² costs 1% of the current main loss" at every
    # iterate, independent of the 1e6 quirk.
    #
    # Weight the joints2D loss per joint by the keypoint score channel
    # (targets (B,17,3); scores exist in every deployment proxy,
    # *_j2d.xml (17,3) — the reference drops them, player_recon.py:1217).
    # NOTE: with the silhouette loss on at reference weights this only
    # matters together with joints2d_scale (see above).
    joint_conf_weighting: bool = False
    # w_rel * |total| * mean(sum(betas^2)): betas are N(0,1) in SMPL's PCA
    # space.
    betas_prior: float = 0.0
    # w_rel * |total| * mean((body_pose - frozen["pose_prior_ref"])^2).
    pose_prior: float = 0.0
    # w_rel * |total| * mean(||R^T R - I||_F^2) over assembled rotmats.
    rot_ortho_prior: float = 0.0
    # Multiplier on the raw joints2D task loss (task_scales path), BEFORE
    # uncertainty weighting. 1.0 = reference parity (joints numerically
    # irrelevant next to the 1e6-weighted silhouette SUM); ~1e6 puts joint
    # evidence on equal footing with the silhouette so keypoints (and
    # conf weighting) can steer the fit toward 3D-consistent poses.
    joints2d_scale: float = 1.0
    # Linear warm-up of the silhouette loss over this many iterations
    # (joints establish pose/cam before the dense term bites).
    silh_warmup_iters: int = 0
    # single_view_optimization_test parity (player_recon.py:1309-1567):
    # save_every updates the kept iterate EVERY iteration (bypasses the
    # all-metrics-improve rule); snapshot_every=K additionally returns the
    # parameter trajectory sampled every K iterations (run_fit_loop's best
    # dict gains a "snapshots" pytree stacked on a leading time axis).
    save_every: bool = False
    snapshot_every: Optional[int] = None


class FitInit(NamedTuple):
    """Initial SMPL state per player (from the regressor or a prior stage)."""
    body_pose: jnp.ndarray      # (B, 23, 3, 3)
    global_orient: jnp.ndarray  # (B, 1, 3, 3)
    betas: jnp.ndarray          # (B, 10)
    cam_wp: jnp.ndarray         # (B, 3)


class FitResult(NamedTuple):
    body_pose: jnp.ndarray      # (B, 23, 3, 3) best iterate
    global_orient: jnp.ndarray  # (B, 1, 3, 3)
    betas: jnp.ndarray          # (B, 10)
    cam_wp: jnp.ndarray         # (B, 3)
    translation: jnp.ndarray    # (B, 3)
    silh_iou: jnp.ndarray       # (B,) best-iterate silhouette IoU
    joint_err: jnp.ndarray      # (B,) best-iterate joint px error (int-cast)
    init_silh_iou: jnp.ndarray  # (B,) metrics at iteration 1
    init_joint_err: jnp.ndarray
    best_iter: jnp.ndarray      # (B,) 1-based iteration index of best
    # Parameter trajectory (leading time axis) when
    # FitConfig.snapshot_every is set; None otherwise.
    snapshots: Optional[dict] = None


def make_loss_state(use_silhouette: bool):
    losses_on = ["joints2D"] + (["silhouette"] if use_silhouette else [])
    return tuple(losses_on), init_loss_state(
        losses_on, cfg.FITTING_INIT_LOSS_WEIGHTS)


def evaluate_fit(assets: SMPLAssets, body_pose, global_orient, betas, cam_wp,
                 target_silhouette, target_joints2d, fit_cfg: FitConfig):
    """One forward evaluation: loss inputs + on-device metrics.

    Returns dict with pred_j2d (float px), pred_sil (render_wh²), iou,
    joint_err (int-cast parity), bce_score (the tracker's 'silhouette_iou').
    """
    out = smpl_forward(assets, betas, body_pose, global_orient)
    j2d = orthographic_project(out.joints, cam_wp)
    j2d = j2d[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)]
    j2d = undo_keypoint_normalisation(j2d, fit_cfg.proxy_wh)

    translation = weak_perspective_to_translation(
        cam_wp, fit_cfg.focal_length, fit_cfg.proxy_wh)

    need_sil = fit_cfg.use_silhouette or fit_cfg.silhouette_metrics
    if need_sil:
        use_pallas = fit_cfg.use_pallas
        if use_pallas is None:
            use_pallas = default_platform() not in ("cpu",)
        pred_sil = render_silhouette(out.vertices, translation, assets.faces,
                                     fit_cfg.proxy_wh, fit_cfg.focal_length,
                                     sigma=fit_cfg.sigma,
                                     render_wh=fit_cfg.render_wh,
                                     use_pallas=use_pallas,
                                     backface_cull=fit_cfg.backface_cull,
                                     faces_per_chunk=fit_cfg.faces_per_chunk,
                                     pallas_chunk=fit_cfg.pallas_chunk)
        target_sil = target_silhouette
        if fit_cfg.render_wh != target_silhouette.shape[-1]:
            # Area-average (box filter) downsample of the binary target, NOT
            # strided subsampling: strides drop 1-2px structures (arms) at
            # 128² entirely, whereas fractional coverage matches the soft
            # rasterizer's own semantics. The reference compares at full 512²
            # (player_recon.py:1226-1233); render_wh < proxy_wh is this
            # framework's speed knob and must stay consistent across scales.
            full = target_silhouette.shape[-1]
            if full % fit_cfg.render_wh != 0:
                raise ValueError(
                    f"render_wh={fit_cfg.render_wh} must divide the target "
                    f"silhouette size {full}")
            step = full // fit_cfg.render_wh
            b = target_silhouette.shape[:-2]
            target_sil = target_silhouette.reshape(
                *b, fit_cfg.render_wh, step, fit_cfg.render_wh, step
            ).mean(axis=(-3, -1))
        iou = silhouette_confusion_metrics(pred_sil, target_sil)["iou"]
        bce = -jnp.sum(
            pred_sil * jnp.log(target_sil + 1e-6)
            + (1.0 - pred_sil) * jnp.log(1.0 - target_sil + 1e-6),
            axis=(-2, -1))
    else:
        b = target_joints2d.shape[0]
        pred_sil = target_sil = jnp.zeros((b, 1, 1))
        iou = jnp.zeros((b,))
        bce = jnp.zeros((b,))

    # Reference parity: keypoints cast to int32 before the error
    # (player_recon.py:1231-1233).
    joint_err = jnp.mean(jnp.linalg.norm(
        jnp.trunc(j2d) - target_joints2d[..., :2], axis=-1), axis=-1)
    return {"pred_j2d": j2d, "pred_sil": pred_sil, "target_sil": target_sil,
            "iou": iou, "joint_err": joint_err, "bce_score": bce,
            "translation": translation, "vertices": out.vertices}


# Compiled-segment cache. Keyed on (assemble function identity, fit_cfg,
# group_size): every array the loop touches is a jit ARGUMENT, never a
# closure constant. Closing over device arrays would (a) re-trace and
# re-compile on EVERY stage call because fresh target arrays become fresh
# constants (measured: 10.9 s per 25-iter joints-only segment vs 0.4 s
# compute), and (b) risk FAILED_PRECONDITION constant-folding on this TPU
# backend (.claude/skills/verify/SKILL.md). Stage assemble fns must be
# module-level so their identity is stable across calls.
_RUNNER_CACHE: dict = {}


def _segment_runner(assemble, fit_cfg: FitConfig, group_size: int):
    key = (assemble, fit_cfg, group_size)
    runner = _RUNNER_CACHE.get(key)
    if runner is not None:
        return runner

    losses_on, _ = make_loss_state(fit_cfg.use_silhouette)
    loss_cfg = MultiTaskLossConfig(losses_on=losses_on)
    tx = optax.adam(fit_cfg.lr)

    def step(assets, frozen, target_silhouette, target_joints2d, row_mask,
             metric_w, log_vars, carry, it):
        trainable, opt_state, best = carry
        rows = target_joints2d.shape[0]
        groups = rows // group_size

        def loss_fn(trainable):
            body_pose, global_orient, betas, cam_wp = assemble(trainable,
                                                               frozen)
            ev = evaluate_fit(assets, body_pose, global_orient, betas,
                              cam_wp, target_silhouette, target_joints2d,
                              fit_cfg)
            outputs = {"joints2D": ev["pred_j2d"] * row_mask[:, None, None]}
            labels = {"joints2D":
                      target_joints2d[..., :2] * row_mask[:, None, None]}
            if fit_cfg.joint_conf_weighting \
                    and target_joints2d.shape[-1] >= 3:
                labels["vis"] = target_joints2d[..., 2] * row_mask[:, None]
            if fit_cfg.use_silhouette:
                outputs["silhouette"] = ev["pred_sil"] * row_mask[:, None, None]
                labels["silhouette"] = ev["target_sil"] * row_mask[:, None, None]
            task_scales = {}
            if fit_cfg.silh_warmup_iters and fit_cfg.use_silhouette:
                task_scales["silhouette"] = jnp.minimum(
                    (it + 1.0) / fit_cfg.silh_warmup_iters, 1.0)
            if fit_cfg.joints2d_scale != 1.0:
                task_scales["joints2D"] = fit_cfg.joints2d_scale
            total, _ = multi_task_loss(log_vars, outputs, labels, loss_cfg,
                                       task_scales or None)
            # Self-calibrating prior scale (see FitConfig): the reference-
            # parity loss magnitude is ~1e9, so absolute prior weights
            # vanish below f32 update resolution; anchor them to the
            # current main-loss magnitude instead.
            if fit_cfg.betas_prior or fit_cfg.rot_ortho_prior or (
                    fit_cfg.pose_prior and "pose_prior_ref" in frozen):
                mag = jax.lax.stop_gradient(jnp.abs(total)) + 1e-8
                if fit_cfg.betas_prior:
                    total = total + fit_cfg.betas_prior * mag * jnp.mean(
                        jnp.sum(betas ** 2, axis=-1) * row_mask)
                if fit_cfg.pose_prior and "pose_prior_ref" in frozen:
                    dev = (body_pose - frozen["pose_prior_ref"]) ** 2
                    total = total + fit_cfg.pose_prior * mag * jnp.mean(
                        jnp.sum(dev, axis=(-3, -2, -1)) * row_mask)
                if fit_cfg.rot_ortho_prior:
                    rots = jnp.concatenate([global_orient, body_pose],
                                           axis=1)
                    rtr = jnp.einsum("bjki,bjkl->bjil", rots, rots)
                    dev = (rtr - jnp.eye(3, dtype=rots.dtype)) ** 2
                    total = total + fit_cfg.rot_ortho_prior * mag * jnp.mean(
                        jnp.sum(dev, axis=(-2, -1)).mean(axis=-1) * row_mask)
            return total, ev

        (_, ev), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

        def reduce_groups(x):
            """(rows,) → (groups,) weighted mean (views/frames per player)."""
            if group_size == 1:
                return x
            xw = (x * metric_w).reshape(groups, group_size)
            w = metric_w.reshape(groups, group_size)
            return jnp.sum(xw, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)

        # Tracked save metrics (reference init_loss_and_metric): per-sample
        # mean-per-joint 2D L2 (float pred) + silhouette BCE score.
        j2d_l2 = reduce_groups(jnp.mean(jnp.linalg.norm(
            ev["pred_j2d"] - target_joints2d[..., :2], axis=-1), axis=-1))
        bce = reduce_groups(ev["bce_score"]) if fit_cfg.use_silhouette \
            else jnp.zeros_like(j2d_l2)
        iou = reduce_groups(ev["iou"])
        jerr = reduce_groups(ev["joint_err"])

        improve = (j2d_l2 <= best["m0"]) & (bce <= best["m1"])
        if fit_cfg.save_every:
            improve = jnp.ones_like(improve)

        def select(new, old):
            shape = (groups,) + (1,) * (new.ndim - 1)
            return jnp.where(improve.reshape(shape), new, old)

        new_best = {
            "m0": jnp.where(improve, j2d_l2, best["m0"]),
            "m1": jnp.where(improve, bce, best["m1"]),
            "iou": jnp.where(improve, iou, best["iou"]),
            "joint_err": jnp.where(improve, jerr, best["joint_err"]),
            "iter": jnp.where(improve, it + 1, best["iter"]),
            "params": jax.tree_util.tree_map(select, trainable,
                                             best["params"]),
            "init_iou": jnp.where(it == 0, iou, best["init_iou"]),
            "init_joint_err": jnp.where(it == 0, jerr,
                                        best["init_joint_err"]),
        }
        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        snap = trainable if fit_cfg.snapshot_every else None
        return (new_trainable, new_opt, new_best), snap

    @jax.jit
    def runner(assets, carry, its, frozen, target_silhouette,
               target_joints2d, row_mask, metric_w, log_vars):
        def body(c, it):
            return step(assets, frozen, target_silhouette, target_joints2d,
                        row_mask, metric_w, log_vars, c, it)
        return jax.lax.scan(body, carry, its)

    _RUNNER_CACHE[key] = runner
    return runner


def run_fit_loop(assets: SMPLAssets,
                 trainable: dict,
                 frozen: dict,
                 assemble,
                 target_silhouette: jnp.ndarray,
                 target_joints2d: jnp.ndarray,
                 fit_cfg: FitConfig,
                 mask: Optional[jnp.ndarray] = None,
                 group_size: int = 1,
                 metric_weights: Optional[jnp.ndarray] = None,
                 mesh=None):
    """Generic fitting loop: compiled scan segments from a process-wide cache.

    Args:
      trainable: pytree of optimized tensors (leading axis = player groups).
      frozen: pytree of constants the assembler needs (jit arguments).
      assemble: MODULE-LEVEL fn(trainable, frozen) → (body_pose,
        global_orient, betas, cam_wp) over the flat row batch — its identity
        keys the compile cache, so per-call closures would defeat it.
      mask: (rows,) 1.0 for real rows; padded rows contribute no loss.
      group_size: rows per player (views/frames); metrics and best-iterate
        selection are reduced per group.
      metric_weights: (rows,) weights for the per-group metric mean
        (e.g. frame masks); defaults to 1.
      mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — the player
        row axis of every batch-shaped input (and the optimizer state built
        from it) is sharded over it; SMPL assets and loss state replicate.
        Scene fitting is embarrassingly parallel over players, so GSPMD
        runs each shard's scan locally with no per-iteration collectives
        (the reference fits players serially on one GPU; SURVEY §5.8).
        Rows must be padded to a multiple of the data-axis size (use
        ``mask`` for the padding).

    Returns:
      (best trainable pytree, FitResult-style dict of best metrics, with
      (groups,) metric shapes).
    """
    rows = target_joints2d.shape[0]
    groups = rows // group_size
    if mask is None:
        mask = jnp.ones((rows,), jnp.float32)
    if metric_weights is None:
        metric_weights = jnp.ones((rows,), jnp.float32)

    if mesh is not None:
        from soccerplayershapepose_tpu.parallel.mesh import (
            data_sharding, replicate)
        n_data = mesh.shape["data"]
        if rows % n_data or (groups % n_data if group_size > 1 else False):
            raise ValueError(
                f"rows={rows} (groups={groups}) must be a multiple of the "
                f"data axis ({n_data}); pad the scene batch")

        def shard_rows(tree, lead):
            def put(x):
                if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 \
                        and x.shape[0] == lead:
                    return jax.device_put(x, data_sharding(mesh, x.ndim))
                return x
            return jax.tree_util.tree_map(put, tree)

        trainable = shard_rows(trainable, groups)
        frozen = shard_rows(frozen, rows)
        target_silhouette = shard_rows(target_silhouette, rows)
        target_joints2d = shard_rows(target_joints2d, rows)
        mask = shard_rows(mask, rows)
        metric_weights = shard_rows(metric_weights, rows)
        assets = replicate(assets, mesh)

    _, log_vars = make_loss_state(fit_cfg.use_silhouette)
    tx = optax.adam(fit_cfg.lr)
    opt_state = tx.init(trainable)

    inf = jnp.full((groups,), jnp.inf)
    best0 = {"m0": inf, "m1": inf, "iou": jnp.zeros((groups,)),
             "joint_err": jnp.zeros((groups,)),
             "iter": jnp.zeros((groups,), jnp.int32),
             "params": trainable, "init_iou": jnp.zeros((groups,)),
             "init_joint_err": jnp.zeros((groups,))}

    runner = _segment_runner(assemble, fit_cfg, group_size)
    carry = (trainable, opt_state, best0)
    # Segmented execution: one compiled scan per `iters_per_call` iterations,
    # carry resident on device. Identical numerics; bounds single-program
    # runtime (the remote TPU worker tolerates short executions better).
    seg = fit_cfg.iters_per_call or fit_cfg.iters
    snaps = []
    done = 0
    while done < fit_cfg.iters:
        n = min(seg, fit_cfg.iters - done)
        carry, ys = runner(assets, carry, jnp.arange(done, done + n), frozen,
                           target_silhouette, target_joints2d, mask,
                           metric_weights, log_vars)
        if ys is not None:
            snaps.append(ys)
        done += n
    _, _, best = carry
    if fit_cfg.snapshot_every:
        traj = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *snaps)
        best = dict(best, snapshots=jax.tree_util.tree_map(
            lambda x: x[::fit_cfg.snapshot_every], traj))
    return best["params"], best


def fit_metrics(assets: SMPLAssets, init: FitInit, silhouette, joints2d,
                fit_cfg: FitConfig):
    """Standalone metric evaluation of a parameter set (the reference's
    ``eval_metrics`` / ``calc_initial_metrics``, player_recon.py:253-485,
    2264-2389): mean silhouette IoU + int-cast joint px error."""
    ev = evaluate_fit(assets, init.body_pose, init.global_orient, init.betas,
                      init.cam_wp, silhouette, joints2d, fit_cfg)
    return {"silh_iou": ev["iou"], "joint_err": ev["joint_err"]}
