"""Crop → SMPL mesh prediction slice (the framework's core inference path).

Role of the reference ``predict()`` flow
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:133-250``
and ``predict/predict_3D.py:84-183``): proxy representation → regressor (IEF)
→ rot6d→rotmat → SMPL forward → weak-perspective joint projection →
camera-translation conversion; plus reposed (T-pose) vertices from betas.

Here the whole slice is ONE jitted program over a (B,) batch of players —
the reference runs it one crop at a time on folder trees. This function is
the BASELINE north-star path (≥500 crops/sec/chip at batch 128).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.ief import default_initial_params
from soccerplayershapepose_tpu.models.regressor import SingleInputRegressor
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation,
    weak_perspective_to_translation)
from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
from soccerplayershapepose_tpu.pipeline.proxy import create_proxy_representation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward, smpl_shape_only


class PredictOutput(NamedTuple):
    vertices: jnp.ndarray        # (B, 6890, 3)
    joints: jnp.ndarray          # (B, 90, 3)
    joints2d_kprcnn: jnp.ndarray # (B, 17, 2) projected KP-RCNN joints, px
    cam_wp: jnp.ndarray          # (B, 3)
    translation: jnp.ndarray     # (B, 3) perspective-camera translation
    pose_rotmats: jnp.ndarray    # (B, 24, 3, 3)
    betas: jnp.ndarray           # (B, 10)
    reposed_vertices: jnp.ndarray  # (B, 6890, 3) T-pose from betas


def predict_smpl(regressor: SingleInputRegressor,
                 params,
                 assets: SMPLAssets,
                 silhouette: jnp.ndarray,
                 joints2d: jnp.ndarray,
                 iuv: jnp.ndarray | None = None,
                 proxy_wh: int = cfg.PROXY_REP_INPUT_WH) -> PredictOutput:
    """Batched crop→mesh forward pass (see module docstring).

    Args:
      regressor: the flax module (static).
      params: its variables ({'params': ..., 'batch_stats': ...}).
      assets: SMPL model pytree.
      silhouette: (B, proxy_wh, proxy_wh).
      joints2d: (B, 17, 2|3) keypoints in proxy_wh space.
    """
    # The encoder's first conv computes in regressor.dtype, so building the
    # proxy at that dtype is value-identical to building f32 and casting —
    # but XLA emits the (B, 256, 256, 18) tensor in bf16 straight out of the
    # heatmap fusion, in channels-last layout, halving the HBM round-trip
    # that dominates the proxy-build slice.
    proxy = create_proxy_representation(
        silhouette, joints2d, in_wh=proxy_wh, out_wh=cfg.REGRESSOR_IMG_WH,
        iuv=iuv, include_silhouette=regressor.in_channels != 20,
        dtype=regressor.dtype)

    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    cam_wp, pose6d, betas = regressor.apply(params, proxy, init)

    rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
    out = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])

    j2d = orthographic_project(out.joints, cam_wp)
    j2d = j2d[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)]
    j2d = undo_keypoint_normalisation(j2d, proxy_wh)

    translation = weak_perspective_to_translation(
        cam_wp, cfg.FOCAL_LENGTH, proxy_wh)

    return PredictOutput(
        vertices=out.vertices, joints=out.joints, joints2d_kprcnn=j2d,
        cam_wp=cam_wp, translation=translation, pose_rotmats=rotmats,
        betas=betas, reposed_vertices=smpl_shape_only(assets, betas))


def build_predictor(in_channels: int = 18, resnet_layers: int = 18,
                    ief_iters: int = 3, seed: int = 0,
                    proxy_wh: int = cfg.PROXY_REP_INPUT_WH,
                    dtype: str = "float32"):
    """Construct (regressor, params, jitted_fn).

    The jitted fn signature is ``fn(params, assets, silhouette, joints2d)``
    → PredictOutput; assets/params flow as arguments (never closed over —
    required on this TPU backend, see .claude/skills/verify/SKILL.md).
    """
    import jax.numpy as _jnp
    regressor = SingleInputRegressor(in_channels=in_channels,
                                     resnet_layers=resnet_layers,
                                     ief_iters=ief_iters,
                                     dtype=getattr(_jnp, dtype))
    rng = jax.random.PRNGKey(seed)
    dummy_proxy = jnp.zeros((1, cfg.REGRESSOR_IMG_WH, cfg.REGRESSOR_IMG_WH,
                             in_channels), jnp.float32)
    dummy_init = jnp.zeros((157,), jnp.float32)
    params = regressor.init(rng, dummy_proxy, dummy_init)

    @jax.jit
    def fn(params, assets, silhouette, joints2d):
        return predict_smpl(regressor, params, assets, silhouette, joints2d,
                            proxy_wh=proxy_wh)

    return regressor, params, fn
