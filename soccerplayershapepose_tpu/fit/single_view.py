"""Single-view render-and-compare optimization, batched over players.

Role of ``single_view_optimization``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:1046-1307``):
starting from the regressor estimate, Adam (lr 0.001, global_var.py:74) over
[global_orient, body_pose minus hands/feet, cam_wp, betas] for 100 iterations
with the joints2D(+silhouette) homoscedastic loss; the hands/feet joints
{6,7,21,22} stay frozen via concat-splice (player_recon.py:1175-1206); keep
the best iterate under the all-metrics-improve rule; output
{body_pose, global_orient, betas, translation} (player_recon.py:1293-1294).

TPU re-design: the reference runs one player-view at a time with per-iteration
CPU metric round-trips; here the whole loop is one compiled ``lax.scan`` over a
(B,) batch of player-views.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit.engine import (
    FitConfig, FitInit, FitResult, run_fit_loop)
from soccerplayershapepose_tpu.ops.camera import weak_perspective_to_translation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets

# Host constant (np, not jnp): a module-level device array would initialize
# the backend at import time — hangs the process when the TPU worker is down.
_TRAIN = np.asarray(cfg.FITTING_TRAINABLE_BODY_JOINTS)


def splice_body_pose(pose_sub: jnp.ndarray, full_init: jnp.ndarray) -> jnp.ndarray:
    """Recombine the 19 trainable body joints with the 4 frozen ones.

    Equivalent to the reference's concat splice (player_recon.py:1202-1206):
    [sub[:6], init[6:8], sub[6:19], init[21:23]].
    """
    return jnp.concatenate([
        pose_sub[:, :6],
        full_init[:, 6:8],
        pose_sub[:, 6:19],
        full_init[:, 21:23],
    ], axis=1)


def _assemble_single(t, f):
    """Module-level assemble (identity keys the engine's compile cache)."""
    body_pose = splice_body_pose(t["pose_sub"], f["body_pose_init"])
    return body_pose, t["global_orient"], t["betas"], t["cam_wp"]


def single_view_fit(assets: SMPLAssets,
                    init: FitInit,
                    silhouette: jnp.ndarray,
                    joints2d: jnp.ndarray,
                    fit_cfg: Optional[FitConfig] = None,
                    mask: Optional[jnp.ndarray] = None,
                    mesh=None) -> FitResult:
    """Optimize each player-view independently (batched).

    Args:
      init: regressor estimates (see pipeline.predict).
      silhouette: (B, proxy_wh, proxy_wh) target masks.
      joints2d: (B, 17, 2|3) target keypoints (px).
      mask: (B,) validity for padded slots.
      mesh: optional (data, model) mesh — shards the player axis over
        ``data`` (see run_fit_loop; pad B to a multiple of the axis).
    """
    fit_cfg = fit_cfg or FitConfig()

    trainable = {
        "global_orient": init.global_orient,
        "pose_sub": init.body_pose[:, _TRAIN],
        "cam_wp": init.cam_wp,
        "betas": init.betas,
    }
    frozen = {"body_pose_init": init.body_pose}
    if fit_cfg.pose_prior:
        # Deviation-from-init prior reference (engine loss; assembled pose
        # rows match init rows 1:1 in this stage).
        frozen["pose_prior_ref"] = init.body_pose

    best_params, best = run_fit_loop(assets, trainable, frozen,
                                     _assemble_single,
                                     silhouette, joints2d, fit_cfg, mask,
                                     mesh=mesh)

    body_pose = splice_body_pose(best_params["pose_sub"],
                                 init.body_pose)
    translation = weak_perspective_to_translation(
        best_params["cam_wp"], fit_cfg.focal_length, fit_cfg.proxy_wh)
    snapshots = None
    if best.get("snapshots") is not None:
        snap = best["snapshots"]   # trainable pytree stacked on (T, B, ...)
        snapshots = {
            "body_pose": jax.vmap(splice_body_pose, in_axes=(0, None))(
                snap["pose_sub"], init.body_pose),
            "global_orient": snap["global_orient"],
            "betas": snap["betas"],
            "cam_wp": snap["cam_wp"],
            "translation": weak_perspective_to_translation(
                snap["cam_wp"], fit_cfg.focal_length, fit_cfg.proxy_wh),
        }
    return FitResult(
        body_pose=body_pose,
        global_orient=best_params["global_orient"],
        betas=best_params["betas"],
        cam_wp=best_params["cam_wp"],
        translation=translation,
        silh_iou=best["iou"],
        joint_err=best["joint_err"],
        init_silh_iou=best["init_iou"],
        init_joint_err=best["init_joint_err"],
        best_iter=best["iter"],
        snapshots=snapshots,
    )
