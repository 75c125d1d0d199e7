"""On-device proxy extraction + player detection stage drivers.

``create_proxy_stage`` is the reference ``create_proxy``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:61-124``)
with the two detectron2 predictors replaced by one batched ProxyNet forward:
for every player crop it writes ``<view>_j2d.xml`` (JSON (17, 3) keypoints),
``<view>_sil.npy`` (binary silhouette) and a ``<view>_silhouette.png`` overlay
vis, deleting the player when extraction fails (player_recon.py:118-121).
Instead of two RCNN forwards per view, whole view batches run as one XLA
program on the TPU.

``detect_players_stage`` / ``crop_player_stage`` / ``crop_broad_player_stage``
replace the torchvision Faster-RCNN drivers
(``PlayerDetection/player_detection.py:16-37, 83-250``) with the CenterNet-style
JAX detector: frames are batched on device, boxes are thresholded on host and
written to ``boxes.xml``; crops use the same green-padded square-crop helpers
as the reference.

Instance selection parity: ProxyNet emits a whole-crop mask, so the
largest-roughly-centred pick the reference applies to RCNN instances
(predict_silhouette_pointrend.py:7-40) becomes a connected-component pick on
the host, with the same centre-tolerance windows.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.models.detector import (
    PlayerDetector, decode_detections)
from soccerplayershapepose_tpu.models.perception import (
    ProxyNet, decode_iuv, decode_keypoints, decode_silhouette)
from soccerplayershapepose_tpu.pipeline.detection import (
    crop_broadcast_players, crop_player_view)


def read_image(path: str, wh: Optional[int] = None) -> np.ndarray:
    """PNG/JPEG → (H, W, 3) uint8 RGB, optionally bilinear-resized to wh²
    (the reference's cv2 INTER_LINEAR resize, player_recon.py:99)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if wh is not None and img.size != (wh, wh):
        img = img.resize((wh, wh), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def largest_centred_component(mask: np.ndarray) -> Optional[np.ndarray]:
    """Largest roughly-centred connected component of a binary mask.

    Mirrors ``get_largest_centred_mask`` (predict_silhouette_pointrend.py:7-40):
    components sorted by area; the first whose bbox centre lies within w/4
    rows and w/6 columns of the image centre wins; fallback = largest.
    Returns the selected component as a binary mask, or None if empty.
    """
    from scipy import ndimage
    labels, n = ndimage.label(mask > 0.5)
    if n == 0:
        return None
    h, w = mask.shape
    areas = ndimage.sum_labels(np.ones_like(mask), labels, range(1, n + 1))
    order = np.argsort(areas)[::-1]
    objects = ndimage.find_objects(labels)
    for idx in order:
        sl = objects[idx]
        cy = (sl[0].start + sl[0].stop - 1) / 2.0
        cx = (sl[1].start + sl[1].stop - 1) / 2.0
        if abs(cy - h / 2.0) < w / 4.0 and abs(cx - w / 2.0) < w / 6.0:
            return (labels == idx + 1).astype(np.float32)
    return (labels == order[0] + 1).astype(np.float32)


class ProxyExtractor:
    """Batched crop → (keypoints, silhouette[, IUV]) extractor."""

    def __init__(self, model: ProxyNet, variables: dict,
                 wh: int = cfg.PROXY_REP_INPUT_WH):
        self.model = model
        self.variables = variables
        self.wh = wh

        def forward(variables, images):
            out = model.apply(variables, images, train=False)
            sil = decode_silhouette(out.mask_logits)
            iuv = (decode_iuv(out.part_logits, out.uv, out_wh=images.shape[1])
                   if model.with_iuv else None)
            return out.kp_logits, sil, iuv

        self._forward = jax.jit(forward)

    def __call__(self, images_u8: np.ndarray):
        """images: (B, wh, wh, 3) uint8 → host-side per-view results.

        Returns list of (keypoints (17,3) | None, sil (wh,wh) | None,
        iuv (wh,wh,3) | None) — None on extraction failure (no person found),
        triggering the reference's delete-player semantics.
        """
        images = jnp.asarray(images_u8, jnp.float32) / 255.0
        kp_logits, sil, iuv = self._forward(self.variables, images)
        kp_logits = np.asarray(kp_logits)
        sil = np.asarray(sil)
        iuv = None if iuv is None else np.asarray(iuv, np.float32)

        results = []
        stride = self.wh // kp_logits.shape[1]
        for i in range(len(images_u8)):
            comp = largest_centred_component(sil[i])
            if comp is None:
                results.append((None, None, None))
                continue
            # Restrict keypoint peaks to the selected instance: zero the
            # heatmap logits outside the component's (expanded) bbox.
            ys, xs = np.nonzero(comp)
            pad = 2
            y0 = max(ys.min() // stride - pad, 0)
            y1 = min(-(-ys.max() // stride) + pad, kp_logits.shape[1])
            x0 = max(xs.min() // stride - pad, 0)
            x1 = min(-(-xs.max() // stride) + pad, kp_logits.shape[2])
            boxed = np.full_like(kp_logits[i], -1e9)
            boxed[y0:y1, x0:x1] = kp_logits[i, y0:y1, x0:x1]
            kp = np.asarray(decode_keypoints(boxed[None], stride=stride))[0]
            results.append((kp, comp,
                            None if iuv is None else iuv[i]))
        return results


def _proxy_vis(image: np.ndarray, sil: np.ndarray,
               keypoints: np.ndarray) -> np.ndarray:
    """Overlay vis: 0.7·image + 0.3·mask, keypoints as green squares
    (player_recon.py:110-113 role, sans cv2)."""
    vis = (image.astype(np.float32) * 0.7
           + sil[..., None] * 128.0 * 0.3).astype(np.uint8)
    h, w = sil.shape
    for x, y, _ in keypoints:
        x0, y0 = int(x), int(y)
        vis[max(y0 - 3, 0):min(y0 + 4, h),
            max(x0 - 3, 0):min(x0 + 4, w)] = (0, 255, 0)
    return vis


def create_proxy_stage(extractor: ProxyExtractor, image_root: str,
                       proxy_root: str, vis_root: Optional[str] = None,
                       ignore_first: bool = True, batch_size: int = 8,
                       write_iuv: bool = False,
                       skip_existing: bool = True) -> dict:
    """Folder-tree proxy extraction from raw crops (player_recon.py:61-124).

    Returns {'written': n_views, 'failed_players': [paths]}.
    """
    jobs: List[Tuple[io.PlayerTree, str]] = []
    for node in io.walk_player_tree(image_root):
        if ignore_first and node.player == "1":
            continue
        for view in node.views:
            stem = os.path.join(proxy_root, node.game, node.scene,
                                node.player, os.path.splitext(view)[0])
            if skip_existing and os.path.exists(stem + "_sil.npy") \
                    and os.path.exists(stem + "_j2d.xml"):
                continue
            jobs.append((node, view))

    written = 0
    failed: List[str] = []
    for start in range(0, len(jobs), batch_size):
        chunk = jobs[start:start + batch_size]
        images = np.stack([
            read_image(os.path.join(n.path, v), extractor.wh)
            for n, v in chunk])
        pad = batch_size - len(chunk)
        if pad:
            images = np.concatenate([images,
                                     np.repeat(images[-1:], pad, axis=0)])
        results = extractor(images)
        for (node, view), (kp, sil, iuv), img in zip(chunk, results, images):
            player_dst = os.path.join(proxy_root, node.game, node.scene,
                                      node.player)
            if kp is None:
                # Reference deletes the player on predictor failure
                # (player_recon.py:118-121).
                if os.path.isdir(player_dst):
                    shutil.rmtree(player_dst)
                failed.append(os.path.join(node.game, node.scene, node.player))
                continue
            os.makedirs(player_dst, exist_ok=True)
            stem = os.path.join(player_dst, os.path.splitext(view)[0])
            io.write_joints2d(stem + "_j2d.xml", kp)
            np.save(stem + "_sil.npy", sil.astype(np.uint8))
            if write_iuv and iuv is not None:
                np.save(stem + "_iuv.npy", iuv.astype(np.float32))
            if vis_root is not None:
                vis_dir = os.path.join(vis_root, node.game, node.scene,
                                       node.player)
                os.makedirs(vis_dir, exist_ok=True)
                io.write_png(os.path.join(
                    vis_dir, os.path.splitext(view)[0] + "_silhouette.png"),
                    _proxy_vis(img, sil, kp))
            written += 1
    return {"written": written, "failed_players": failed}


class PlayerDetectorRunner:
    """Batched frame → scored person boxes (host-thresholded)."""

    def __init__(self, model: PlayerDetector, variables: dict,
                 hw: Tuple[int, int],
                 score_thresh: float = cfg.DETECTION_SCORE_THRESH):
        self.model = model
        self.variables = variables
        self.hw = hw
        self.score_thresh = score_thresh

        def forward(variables, images):
            out = model.apply(variables, images, train=False)
            return decode_detections(out)

        self._forward = jax.jit(forward)

    def __call__(self, frames_u8: np.ndarray) -> List[np.ndarray]:
        """(B, H, W, 3) uint8 frames → per-frame (N_i, 4) box arrays."""
        images = jnp.asarray(frames_u8, jnp.float32) / 255.0
        dets = self._forward(self.variables, images)
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        out = []
        for b, s in zip(boxes, scores):
            keep = s >= self.score_thresh
            out.append(b[keep])
        return out


def detect_players_stage(runner: PlayerDetectorRunner, frame_root: str,
                         out_root: str, batch_size: int = 4,
                         broadcast: bool = True) -> dict:
    """Detection + crop over a frame tree.

    For each ``<game>/<scene>`` folder containing frame images: detect
    players, write ``boxes.xml`` (JSON [[x1,y1,x2,y2], ...],
    player_detection.py:206-207) and one green-padded 512² crop per player
    (``<out>/<game>/<scene>/<idx>/player.png``, crop_broad_player_images
    :213-250) — or, with ``broadcast=False``, one centre-player crop per
    frame (crop_player, :83-147).
    """
    jobs = []
    for game in sorted(os.listdir(frame_root)):
        gdir = os.path.join(frame_root, game)
        if not os.path.isdir(gdir):
            continue
        for scene in sorted(os.listdir(gdir)):
            sdir = os.path.join(gdir, scene)
            if not os.path.isdir(sdir):
                continue
            frames = sorted(f for f in os.listdir(sdir)
                            if f.endswith((".png", ".jpg")))
            if frames:
                jobs.append((game, scene, os.path.join(sdir, frames[0])))

    n_boxes = 0
    h, w = runner.hw
    for start in range(0, len(jobs), batch_size):
        chunk = jobs[start:start + batch_size]
        raw = [read_image(path) for _, _, path in chunk]
        frames = np.stack([_resize_frame(r, (h, w)) for r in raw])
        per_frame = runner(frames)
        for (game, scene, path), boxes, orig in zip(chunk, per_frame, raw):
            scene_out = os.path.join(out_root, game, scene)
            os.makedirs(scene_out, exist_ok=True)
            # Boxes back in original-frame pixel space.
            sy = orig.shape[0] / h
            sx = orig.shape[1] / w
            boxes = boxes * np.array([sx, sy, sx, sy])
            io.write_boxes(os.path.join(scene_out, "boxes.xml"), boxes)
            n_boxes += len(boxes)
            if broadcast:
                for i, crop in enumerate(crop_broadcast_players(orig, boxes)):
                    pdir = os.path.join(scene_out, str(i + 1))
                    os.makedirs(pdir, exist_ok=True)
                    io.write_png(os.path.join(pdir, "player.png"), crop)
            else:
                crop = crop_player_view(orig, boxes)
                if crop is not None:
                    io.write_png(os.path.join(scene_out, "player.png"), crop)
    return {"scenes": len(jobs), "boxes": n_boxes}


def _resize_frame(image: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(image).resize(
        (hw[1], hw[0]), Image.BILINEAR), np.uint8)
