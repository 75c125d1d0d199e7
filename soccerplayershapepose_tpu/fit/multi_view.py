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


def multi_view_fit(assets: SMPLAssets,
                   init: MultiViewInit,
                   silhouettes: jnp.ndarray,     # (B, V, wh, wh)
                   joints2d: jnp.ndarray,        # (B, V, 17, 2|3)
                   fit_cfg: Optional[FitConfig] = None,
                   rounds: int = cfg.MULTI_VIEW_ROUNDS,
                   iters_per_phase: int = cfg.MULTI_VIEW_ITERS,
                   mask: Optional[jnp.ndarray] = None) -> MultiViewResult:
    fit_cfg = fit_cfg or FitConfig(iters=iters_per_phase)
    b, v = init.cam_wp.shape[:2]
    if mask is None:
        mask = jnp.ones((b,), jnp.float32)
    view_mask = jnp.repeat(mask, v)

    losses_on, log_vars = make_loss_state(fit_cfg.use_silhouette)
    loss_cfg = MultiTaskLossConfig(losses_on=losses_on)

    sil_flat = _flat(silhouettes)
    j2d_flat = _flat(joints2d)

    # Shared init: mean over views (rotmat mean kept verbatim — see docstring).
    shared_pose = jnp.mean(init.body_pose, axis=1)         # (B, 23, 3, 3)
    shared_betas = jnp.mean(init.betas, axis=1)            # (B, 10)
    orient = init.global_orient                            # (B, V, 1, 3, 3)
    cam_wp = init.cam_wp                                   # (B, V, 3)

    def view_expand(x):
        """(B, ...) → (B·V, ...) by repeating each player for its views."""
        return jnp.repeat(x, v, axis=0)

    def total_loss(body_pose_b, betas_b, orient_bv, cam_bv):
        ev = evaluate_fit(assets, view_expand(body_pose_b),
                          _flat(orient_bv), view_expand(betas_b),
                          _flat(cam_bv), sil_flat, j2d_flat, fit_cfg)
        outputs = {"joints2D": ev["pred_j2d"] * view_mask[:, None, None]}
        labels = {"joints2D": j2d_flat[..., :2] * view_mask[:, None, None]}
        if fit_cfg.use_silhouette:
            outputs["silhouette"] = ev["pred_sil"] * view_mask[:, None, None]
            labels["silhouette"] = ev["target_sil"] * view_mask[:, None, None]
        total, _ = multi_task_loss(log_vars, outputs, labels, loss_cfg)
        return total, ev

    def per_player_metrics(ev):
        j2d_l2 = jnp.mean(jnp.linalg.norm(
            ev["pred_j2d"] - j2d_flat[..., :2], axis=-1), axis=-1)
        m0 = jnp.mean(j2d_l2.reshape(b, v), axis=1)
        m1 = jnp.mean(ev["bce_score"].reshape(b, v), axis=1)
        return m0, m1

    def run_phase(trainable, others, assemble, n_iters):
        """Generic phase: optimize `trainable`, keep per-player best."""
        tx = optax.adam(fit_cfg.lr)
        opt_state = tx.init(trainable)

        def loss_fn(t):
            return total_loss(*assemble(t, others))

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, _):
            t, opt_state, best = carry
            (_, ev), grads = grad_fn(t)
            m0, m1 = per_player_metrics(ev)
            improve = (m0 <= best["m0"]) & (m1 <= best["m1"])

            def select(new, old):
                shape = (b,) + (1,) * (new.ndim - 1)
                return jnp.where(improve.reshape(shape), new, old)

            new_best = {"m0": jnp.where(improve, m0, best["m0"]),
                        "m1": jnp.where(improve, m1, best["m1"]),
                        "params": jax.tree_util.tree_map(
                            lambda n, o: select(n, o),
                            t, best["params"])}
            updates, new_opt = tx.update(grads, opt_state, t)
            return (optax.apply_updates(t, updates), new_opt, new_best), None

        inf = jnp.full((b,), jnp.inf)
        best0 = {"m0": inf, "m1": inf, "params": trainable}
        (_, _, best), _ = jax.lax.scan(
            step, (trainable, opt_state, best0), None, length=n_iters)
        return best["params"]

    pose_sub = shared_pose[:, _TRAIN]
    for _ in range(rounds):
        # Phase A: per-view cameras + global orientations.
        a_best = run_phase(
            {"orient": orient, "cam": cam_wp},
            {"pose_sub": pose_sub, "betas": shared_betas,
             "pose_init": shared_pose},
            lambda t, o: (splice_body_pose(o["pose_sub"], o["pose_init"]),
                          o["betas"], t["orient"], t["cam"]),
            iters_per_phase)
        orient, cam_wp = a_best["orient"], a_best["cam"]

        # Phase B: shared pose + betas.
        b_best = run_phase(
            {"pose_sub": pose_sub, "betas": shared_betas},
            {"orient": orient, "cam": cam_wp, "pose_init": shared_pose},
            lambda t, o: (splice_body_pose(t["pose_sub"], o["pose_init"]),
                          t["betas"], o["orient"], o["cam"]),
            iters_per_phase)
        pose_sub, shared_betas = b_best["pose_sub"], b_best["betas"]

    body_pose = splice_body_pose(pose_sub, shared_pose)

    # Final per-player metrics (mean over views) — metrics.xml content.
    ev = evaluate_fit(assets, view_expand(body_pose), _flat(orient),
                      view_expand(shared_betas), _flat(cam_wp),
                      sil_flat, j2d_flat, fit_cfg)
    silh_iou = jnp.mean(ev["iou"].reshape(b, v), axis=1)
    joint_err = jnp.mean(ev["joint_err"].reshape(b, v), axis=1)

    translation = weak_perspective_to_translation(
        cam_wp, fit_cfg.focal_length, fit_cfg.proxy_wh)
    return MultiViewResult(body_pose=body_pose, betas=shared_betas,
                           global_orient=orient, cam_wp=cam_wp,
                           translation=translation,
                           silh_iou=silh_iou, joint_err=joint_err)
