"""Player detection + crop drivers.

Role of the reference detection stage
(``/root/reference/Python/Soccer/PlayerDetection/player_detection.py``):
torchvision Faster-RCNN R50-FPN (score ≥ 0.7, person class) finds players;
per-view crops take the centre-most detection, grow it by a border, square it
with green padding and resize to 512² (:83-147); broadcast frames keep ALL
player boxes in ``boxes.xml`` and crop each to its own 512² image
(:152-250). Keypoint extraction for proxies is KP-RCNN (predict_joints2D)
picking the largest roughly-centred person box (predict_joints2D.py:5-30).

Design here: the PRODUCTION detector is the JAX/Flax CenterNet-style net
(models/detector.py) running fully on device with trained weights committed
under ``weights/detector_256x448_f16.npz`` — ``pipeline/extract.py``'s
``PlayerDetectorRunner`` + the crop stage drivers are the path the CLI uses.
All post-processing (NMS, box filtering, crop batching) is XLA (ops/nms.py).
The ``TorchPersonDetector`` below is OPTIONAL interop only — it mirrors the
reference's torchvision Faster-RCNN host path for users who bring their own
torchvision weights; torchvision is absent in this image, so it exists for
API-compatibility, not as the supported path. Pipelines can also interop with
precomputed boxes/proxies (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.pipeline.preprocess import (
    get_centre_object, square_crop_padded)


class TorchPersonDetector:
    """Faster-RCNN person detector on host CPU (lazy torch import).

    Loads torchvision's fasterrcnn_resnet50_fpn with weights from
    ``weights_path`` (state dict) — pretrained download is unavailable
    offline; without weights the detector still runs (random init) which is
    only useful for shape tests.
    """

    def __init__(self, weights_path: Optional[str] = None,
                 score_thresh: float = cfg.DETECTION_SCORE_THRESH,
                 keypoints: bool = False):
        import torch
        try:
            import torchvision
        except ImportError as e:   # torchvision absent in this image
            raise ImportError(
                "TorchPersonDetector needs torchvision; use precomputed "
                "boxes/proxies interop (drivers.stages) instead") from e
        self._torch = torch
        if keypoints:
            self.model = torchvision.models.detection.keypointrcnn_resnet50_fpn(
                weights=None, weights_backbone=None)
        else:
            self.model = torchvision.models.detection.fasterrcnn_resnet50_fpn(
                weights=None, weights_backbone=None)
        if weights_path and os.path.exists(weights_path):
            state = torch.load(weights_path, map_location="cpu")
            self.model.load_state_dict(state)
        self.model.eval()
        self.score_thresh = score_thresh
        self.keypoints = keypoints

    def __call__(self, image_rgb: np.ndarray) -> dict:
        """(H, W, 3) uint8 → {'boxes' (N,4), 'scores' (N,), 'keypoints'?}."""
        torch = self._torch
        with torch.no_grad():
            tensor = torch.from_numpy(
                image_rgb.astype(np.float32).transpose(2, 0, 1) / 255.0)
            out = self.model([tensor])[0]
        person = (out["labels"] == 1) & (out["scores"] >= self.score_thresh)
        result = {"boxes": out["boxes"][person].numpy(),
                  "scores": out["scores"][person].numpy()}
        if self.keypoints:
            result["keypoints"] = out["keypoints"][person].numpy()
        return result


def select_centre_player(boxes: np.ndarray,
                         frame_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """The centre-most detection (crop_player semantics,
    player_detection.py:123 + global_utils.py:120-135)."""
    if len(boxes) == 0:
        return None
    return boxes[get_centre_object(boxes, frame_hw)]


def largest_centred_box(boxes: np.ndarray, frame_hw: Tuple[int, int],
                        centre_tolerance: float = 0.25) -> Optional[int]:
    """Largest box whose centre lies within ``centre_tolerance`` of the frame
    centre — KP-RCNN person pick (predict_joints2D.py:5-30)."""
    if len(boxes) == 0:
        return None
    h, w = frame_hw
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    centred = (np.abs(cx - w / 2) < w * centre_tolerance) & \
              (np.abs(cy - h / 2) < h * centre_tolerance)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    areas = np.where(centred, areas, -1.0)
    if areas.max() < 0:   # fall back to globally largest
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return int(np.argmax(areas))


def crop_player_view(image_rgb: np.ndarray, boxes: np.ndarray,
                     border: int = cfg.PLAYER_CROP_BORDER) -> Optional[np.ndarray]:
    """Per-view crop: centre-most player → green-padded 512² crop."""
    box = select_centre_player(boxes, image_rgb.shape[:2])
    if box is None:
        return None
    return square_crop_padded(image_rgb, box, border=border)


def crop_broadcast_players(image_rgb: np.ndarray, boxes: np.ndarray,
                           border: int = cfg.PLAYER_CROP_BORDER_BROAD
                           ) -> List[np.ndarray]:
    """Broadcast frame: one 512² green-padded crop per player box
    (crop_broad_player_images, player_detection.py:213-250)."""
    return [square_crop_padded(image_rgb, box, border=border)
            for box in boxes]
