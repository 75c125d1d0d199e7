"""Full-frame pipeline: frames → detections → crops → proxies → SMPL meshes.

BASELINE config 3 ("full frame: detection boxes → crop/resize/normalize →
22-player batched regression") as ONE jitted XLA program per frame batch —
the TPU-native collapse of the reference's four folder-walking stages
(``player_detection.py:152-250`` detection/crop, ``player_recon.py:61-124``
proxy extraction, ``player_recon.py:133-250`` regression), which run one
player at a time through separate processes and the filesystem.

Stages inside the program (all static shapes, players padded to
``max_players`` with a validity mask):
1. PlayerDetector forward + static top-K decode (models/detector.py),
2. square crop + resize via bilinear ROI sampling (ops/roi_align.py) —
   the ``crop_image`` geometry (global_utils.py:257-290) with edge-clamp
   instead of green padding for off-frame regions,
3. ProxyNet forward → keypoint decode + silhouette (models/perception.py),
4. proxy representation → ResNet+IEF regressor → fused SMPL LBS
   (pipeline/predict.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.detector import decode_detections
from soccerplayershapepose_tpu.models.perception import (
    decode_keypoints, decode_silhouette)
from soccerplayershapepose_tpu.ops.roi_align import roi_align
from soccerplayershapepose_tpu.pipeline.predict import predict_smpl


class FramePipelineOutput(NamedTuple):
    vertices: jnp.ndarray      # (F, K, 6890, 3)
    joints2d: jnp.ndarray      # (F, K, 17, 2) in crop pixel space
    pose_rotmats: jnp.ndarray  # (F, K, 24, 3, 3)
    betas: jnp.ndarray         # (F, K, 10)
    cam_wp: jnp.ndarray        # (F, K, 3)
    boxes: jnp.ndarray         # (F, K, 4) square crop boxes, frame px
    scores: jnp.ndarray        # (F, K) detector scores
    valid: jnp.ndarray         # (F, K) score ≥ thresh


def _square_boxes(boxes: jnp.ndarray, border: float) -> jnp.ndarray:
    """Grow by border, square on the longer side (crop_image geometry)."""
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    side = jnp.maximum(boxes[..., 2] - boxes[..., 0],
                       boxes[..., 3] - boxes[..., 1]) + 2 * border
    side = jnp.maximum(side, 8.0)
    return jnp.stack([cx - side / 2, cy - side / 2,
                      cx + side / 2, cy + side / 2], axis=-1)


def build_frame_pipeline(detector, det_vars, proxynet, proxy_vars,
                         regressor, reg_params,
                         max_players: int = 22,
                         crop_wh: int = cfg.PROXY_REP_INPUT_WH,
                         score_thresh: float = cfg.DETECTION_SCORE_THRESH,
                         border: float = cfg.PLAYER_CROP_BORDER):
    """Returns ``fn(assets, frames) -> FramePipelineOutput`` (jitted).

    ``frames``: (F, H, W, 3) float in [0, 1], H/W divisible by 32.
    The K=``max_players`` axis is static; invalid slots still compute (XLA
    prefers the dense batch) and are masked via ``valid``.
    """

    def fn(assets, frames):
        f = frames.shape[0]
        det_out = detector.apply(det_vars, frames, train=False)
        dets = decode_detections(det_out, top_k=max_players)
        sq = _square_boxes(dets.boxes, border)                  # (F, K, 4)

        crops = jax.vmap(
            lambda img, bx: roi_align(img, bx, output_size=crop_wh,
                                      sampling_ratio=1)
        )(frames, sq)                                           # (F,K,c,c,3)
        crops = crops.reshape((f * max_players, crop_wh, crop_wh, 3))

        p_out = proxynet.apply(proxy_vars, crops, train=False)
        sil = decode_silhouette(p_out.mask_logits)              # (FK, c, c)
        kps = decode_keypoints(p_out.kp_logits,
                               stride=crop_wh // p_out.kp_logits.shape[1])

        pred = predict_smpl(regressor, reg_params, assets, sil, kps,
                            proxy_wh=crop_wh)

        k = max_players
        return FramePipelineOutput(
            vertices=pred.vertices.reshape(f, k, -1, 3),
            joints2d=pred.joints2d_kprcnn.reshape(f, k, 17, 2),
            pose_rotmats=pred.pose_rotmats.reshape(f, k, 24, 3, 3),
            betas=pred.betas.reshape(f, k, 10),
            cam_wp=pred.cam_wp.reshape(f, k, 3),
            boxes=sq, scores=dets.scores,
            valid=dets.scores >= score_thresh)

    return jax.jit(fn)
