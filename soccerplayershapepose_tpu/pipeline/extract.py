"""On-device proxy extraction + player detection stage drivers.

``create_proxy_stage`` is the reference ``create_proxy``
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:61-124``)
with the two detectron2 predictors replaced by one batched ProxyNet forward:
for every player crop it writes ``<view>_j2d.xml`` (JSON (17, 3) keypoints),
``<view>_sil.npy`` (binary silhouette) and a ``<view>_silhouette.png`` overlay
vis, deleting the player when extraction fails (player_recon.py:118-121).
Instead of two RCNN forwards per view, whole view batches run as one XLA
program on the TPU.

``crop_player_stage`` / ``crop_broad_player_stage`` /
``crop_broad_player_images_stage`` replace the torchvision Faster-RCNN drivers
(``PlayerDetection/player_detection.py:16-37, 83-250``) with the CenterNet-style
JAX detector: frames are batched on device, boxes are thresholded on host and
written to ``boxes.xml``; crops use the same green-padded square-crop helpers
as the reference. ``crop_player_stage`` walks the per-view
``<game>/<scene>/<player>/<view>.png`` tree and writes one 512² crop back per
VIEW (crop_player, :83-147); the broad stages write per-scene ``boxes.xml`` +
box-overlay vis (crop_broad_player, :152-208) and the indexed
``<player>/player.png`` crop tree (crop_broad_player_images, :213-250).
``detect_players_stage`` fuses the two broad stages for every frame image in a
scene (the reference's canonical layout has exactly one ``broad.png``).

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
    crop_broadcast_players, crop_player_view, select_centre_player)
from soccerplayershapepose_tpu.pipeline.preprocess import square_crop_padded


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


# COCO-17 keypoint left/right swap (SMPL_TO_KPRCNN_MAP places each
# (left, right) joint pair adjacently: eyes, ears, shoulders, elbows,
# wrists, hips, knees, ankles; nose fixed).
_KP_FLIP_PERM = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15)

# SMPL joint left/right swap (part id = dominant LBS joint,
# train/synth.py:vertex_parts): pelvis/spines/neck/head fixed, the nine
# (left, right) limb pairs exchanged.
_SMPL_FLIP_PERM = (0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15,
                   17, 16, 19, 18, 21, 20, 23, 22)
# Part-logit channels are [bg] + 24 parts; UV channels are (u_p, v_p) pairs.
_PART_FLIP_PERM = (0,) + tuple(1 + j for j in _SMPL_FLIP_PERM)
_UV_FLIP_PERM = tuple(c for j in _SMPL_FLIP_PERM for c in (2 * j, 2 * j + 1))


def _flip_iuv_maps(part_logits, uv):
    """Un-mirror stride-4 IUV head outputs of a flipped crop: flip W, swap
    left/right part channels, and negate the U logit — the template
    pseudo-UV (synth.py:vertex_uv) is the normalized template x/y, which a
    body mirror maps to (1-u, v), i.e. sigmoid(-u_logit)."""
    part_f = part_logits[:, :, ::-1, :][..., _PART_FLIP_PERM]
    uv_f = uv[:, :, ::-1, :][..., _UV_FLIP_PERM]
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], uv.dtype), uv.shape[-1] // 2)
    return part_f, uv_f * sign


class ProxyExtractor:
    """Batched crop → (keypoints, silhouette[, IUV]) extractor.

    ``flip_tta=True`` additionally runs the horizontally-flipped crops
    (concatenated into the same XLA program, so it is one forward at 2B)
    and averages the un-flipped-back mask and IUV logits — exact on the
    grid (cell centres mirror onto cell centres because W = w·stride);
    part chirality is handled by the SMPL left/right channel swap and the
    template pseudo-UV mirror (see :func:`_flip_iuv_maps`).

    Keypoints are merged at the COORDINATE level, not the heatmap level:
    averaging mirrored heatmap logits measurably hurts localization
    (paired held-out 256² hard set: PCK@0.1 0.706 → 0.664, mean err
    20.6 → 28.7 px) — under left/right ambiguity the two passes peak at
    different joints and the average grows ghost modes. Instead both
    passes are decoded independently and, per joint, averaged only when
    they AGREE within ``kp_tta_tau`` pixels (score-weighted mean, scores
    averaged); on disagreement the primary pass wins unchanged, so the
    merge cannot introduce ghost-mode errors by construction. Measured on
    a 32-image paired held-out hard set (982 visible joints, cached
    decodes, tau sweep 0.02-0.12): PCK@0.10 0.721 → 0.729, score
    rank-AUC 0.701 → 0.718, median err 9.06 → 8.82 px at tau=0.08;
    gains are monotone-ish in tau and plateau past 0.08. A <1
    disagreement score penalty consistently LOWERED rank-AUC (pass
    disagreement is not predictive of bad localization here), so the
    default keeps scores unpenalized."""

    def __init__(self, model: ProxyNet, variables: dict,
                 wh: int = cfg.PROXY_REP_INPUT_WH, flip_tta: bool = False,
                 kp_tta_tau: float = 0.08, kp_disagree_penalty: float = 1.0):
        self.model = model
        self.variables = variables
        self.wh = wh
        self.flip_tta = flip_tta
        # Agreement radius as a fraction of crop size (0.08 → 20.5 px at
        # 256²); disagreement score multiplier < 1 would down-weight joints
        # the two passes place differently (measured: hurts rank-AUC).
        self.kp_tta_tau = kp_tta_tau
        self.kp_disagree_penalty = kp_disagree_penalty

        def forward(variables, images):
            if flip_tta:
                both = jnp.concatenate([images, images[:, :, ::-1, :]], 0)
                out = model.apply(variables, both, train=False)
                b = images.shape[0]
                kp_logits = out.kp_logits[:b]
                kp_logits_flip = out.kp_logits[b:, :, ::-1, :][
                    ..., jnp.asarray(_KP_FLIP_PERM)]
                mask_logits = 0.5 * (out.mask_logits[:b]
                                     + out.mask_logits[b:, :, ::-1])
                if out.part_logits is None:
                    part_logits = uv = None
                else:
                    part_f, uv_f = _flip_iuv_maps(out.part_logits[b:],
                                                  out.uv[b:])
                    part_logits = 0.5 * (out.part_logits[:b] + part_f)
                    uv = 0.5 * (out.uv[:b] + uv_f)
            else:
                out = model.apply(variables, images, train=False)
                kp_logits, mask_logits = out.kp_logits, out.mask_logits
                part_logits, uv = out.part_logits, out.uv
                kp_logits_flip = None
            sil = decode_silhouette(mask_logits)
            iuv = (decode_iuv(part_logits, uv, out_wh=images.shape[1])
                   if model.with_iuv else None)
            return kp_logits, kp_logits_flip, sil, iuv

        self._forward = jax.jit(forward)

    def _merge_kp(self, kp: np.ndarray, kpf: np.ndarray,
                  crop_wh: int) -> np.ndarray:
        """Agreement-gated coordinate merge of primary/flipped decodes."""
        tau = self.kp_tta_tau * crop_wh
        d = np.hypot(kp[:, 0] - kpf[:, 0], kp[:, 1] - kpf[:, 1])
        agree = d <= tau
        w1, w2 = kp[:, 2], kpf[:, 2]
        wsum = w1 + w2 + 1e-8
        merged = np.stack([(w1 * kp[:, 0] + w2 * kpf[:, 0]) / wsum,
                           (w1 * kp[:, 1] + w2 * kpf[:, 1]) / wsum,
                           0.5 * (w1 + w2)], axis=-1)
        fallback = kp.copy()
        fallback[:, 2] *= self.kp_disagree_penalty
        return np.where(agree[:, None], merged, fallback)

    def __call__(self, images_u8: np.ndarray):
        """images: (B, wh, wh, 3) uint8 → host-side per-view results.

        Returns list of (keypoints (17,3) | None, sil (wh,wh) | None,
        iuv (wh,wh,3) | None) — None on extraction failure (no person found),
        triggering the reference's delete-player semantics.
        """
        images = jnp.asarray(images_u8, jnp.float32) / 255.0
        kp_logits, kp_logits_flip, sil, iuv = self._forward(
            self.variables, images)
        kp_logits = np.asarray(kp_logits)
        kp_logits_flip = (None if kp_logits_flip is None
                          else np.asarray(kp_logits_flip))
        sil = np.asarray(sil)
        iuv = None if iuv is None else np.asarray(iuv, np.float32)

        results = []
        # Stride from the batch actually given, not the configured wh: the
        # net is fully convolutional, so callers may feed any crop size and
        # keypoints must come back in THAT pixel space (the eval harness
        # passes wh explicitly; the CLI feeds whatever the tree contains).
        stride = images_u8.shape[1] // kp_logits.shape[1]
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
            if kp_logits_flip is not None:
                boxed_f = np.full_like(kp_logits_flip[i], -1e9)
                boxed_f[y0:y1, x0:x1] = kp_logits_flip[i, y0:y1, x0:x1]
                kpf = np.asarray(
                    decode_keypoints(boxed_f[None], stride=stride))[0]
                kp = self._merge_kp(kp, kpf, images_u8.shape[1])
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
    failed_set = set()   # player keys — keeps the delete atomic per player
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
            key = os.path.join(node.game, node.scene, node.player)
            if key in failed_set:
                # A sibling view already failed: the player was deleted
                # atomically (player_recon.py:118-121); never resurrect it
                # with a partial proxy set from a later view job.
                continue
            player_dst = os.path.join(proxy_root, node.game, node.scene,
                                      node.player)
            if kp is None:
                # Reference deletes the player on predictor failure
                # (player_recon.py:118-121).
                if os.path.isdir(player_dst):
                    shutil.rmtree(player_dst)
                failed.append(key)
                failed_set.add(key)
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
                 score_thresh: float = cfg.DETECTION_SCORE_THRESH,
                 flip_tta: bool = False):
        self.model = model
        self.variables = variables
        self.hw = hw
        self.score_thresh = score_thresh
        self.flip_tta = flip_tta

        def forward(variables, images):
            if flip_tta:
                from soccerplayershapepose_tpu.models.detector import \
                    apply_flip_tta
                out = apply_flip_tta(model, variables, images)
            else:
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


def _scene_frames(frame_root: str) -> List[Tuple[str, str, List[str]]]:
    """[(game, scene, [frame filenames])] — every image in every scene dir."""
    scenes = []
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
                scenes.append((game, scene, frames))
    return scenes


def _run_detector_batched(runner: PlayerDetectorRunner, jobs: Sequence[str],
                          batch_size: int):
    """Detect over a list of image paths; yields (path, orig, boxes) with
    boxes rescaled back to original-image pixel space."""
    h, w = runner.hw
    for start in range(0, len(jobs), batch_size):
        chunk = jobs[start:start + batch_size]
        raw = [read_image(path) for path in chunk]
        frames = np.stack([_resize_frame(r, (h, w)) for r in raw])
        per_frame = runner(frames)
        for path, boxes, orig in zip(chunk, per_frame, raw):
            sy = orig.shape[0] / h
            sx = orig.shape[1] / w
            yield path, orig, boxes * np.array([sx, sy, sx, sy])


def _draw_boxes(image: np.ndarray, boxes: np.ndarray,
                color=(255, 0, 0), thickness: int = 2) -> np.ndarray:
    """Box-rectangle overlay vis (cv2.rectangle role,
    player_detection.py:183-188)."""
    vis = image.copy()
    h, w = vis.shape[:2]
    for x1, y1, x2, y2 in np.asarray(boxes, np.int64):
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        for d in range(thickness):
            vis[max(y1 - d, 0), x1:x2 + 1] = color
            vis[min(y2 + d, h - 1), x1:x2 + 1] = color
            vis[y1:y2 + 1, max(x1 - d, 0)] = color
            vis[y1:y2 + 1, min(x2 + d, w - 1)] = color
    return vis


def crop_player_stage(runner: PlayerDetectorRunner, image_root: str,
                      out_root: str, batch_size: int = 8,
                      skip_player_one: bool = True,
                      skip_if_present_root: Optional[str] = None,
                      border: int = cfg.PLAYER_CROP_BORDER,
                      out_size: int = cfg.PLAYER_CROP_SIZE[0],
                      save_mid: bool = False) -> dict:
    """Per-view crop driver: the reference ``crop_player``
    (player_detection.py:83-147).

    Walks ``<root>/<game>/<scene>/<player>/<view>.png``, detects the
    centre-most player in EVERY view, and writes the bordered green-padded
    square crop (resized to ``out_size``²) back as
    ``<out>/<game>/<scene>/<player>/<view>`` — the input layout every
    downstream stage consumes. ``skip_player_one`` mirrors ``check_index``
    (player ``'1'`` is the reference/broad slot, :109-111);
    ``skip_if_present_root`` mirrors ``check_board`` (skip players already in
    the broadcast tree, :112-114). ``save_mid`` writes a ``*_rect.png`` box
    overlay next to each crop (:132-135).

    Returns {'written', 'skipped', 'missed': [view paths with no detection]}.
    """
    jobs: List[Tuple[io.PlayerTree, str]] = []
    skipped = 0
    for node in io.walk_player_tree(image_root):
        if skip_player_one and node.player == "1":
            skipped += len(node.views)
            continue
        if skip_if_present_root is not None and os.path.exists(
                os.path.join(skip_if_present_root, node.game, node.scene,
                             node.player)):
            skipped += len(node.views)
            continue
        for view in node.views:
            jobs.append((node, view))

    written = 0
    missed: List[str] = []
    paths = [os.path.join(n.path, v) for n, v in jobs]
    for (node, view), (path, orig, boxes) in zip(
            jobs, _run_detector_batched(runner, paths, batch_size)):
        crop = crop_player_view(orig, boxes, border=border)
        if crop is None:
            missed.append(os.path.join(node.game, node.scene, node.player,
                                       view))
            continue
        if crop.shape[0] != out_size:
            crop = _resize_frame(crop, (out_size, out_size))
        player_dst = os.path.join(out_root, node.game, node.scene,
                                  node.player)
        os.makedirs(player_dst, exist_ok=True)
        io.write_png(os.path.join(player_dst, view), crop)
        if save_mid:
            centre = select_centre_player(boxes, orig.shape[:2])
            io.write_png(
                os.path.join(player_dst,
                             os.path.splitext(view)[0] + "_rect.png"),
                _draw_boxes(orig, centre[None]))
        written += 1
    return {"written": written, "skipped": skipped, "missed": missed}


def crop_broad_player_stage(runner: PlayerDetectorRunner, frame_root: str,
                            box_root: str, vis_root: Optional[str] = None,
                            batch_size: int = 4) -> dict:
    """Broadcast detection driver: the reference ``crop_broad_player``
    (player_detection.py:152-208).

    For EVERY frame image in each ``<game>/<scene>`` dir: detect all
    players, write the box list as JSON ``boxes.xml``
    (player_detection.py:206-207) and a rectangle-overlay vis. The canonical
    scene holds exactly one ``broad.png`` whose boxes become the scene-level
    ``boxes.xml``; additional frames get ``<stem>_boxes.xml`` so nothing is
    silently dropped.

    Returns {'scenes', 'frames', 'boxes'}.
    """
    scenes = _scene_frames(frame_root)
    jobs = [(g, s, f, len(frames) > 1)
            for g, s, frames in scenes for f in frames]

    n_boxes = 0
    paths = [os.path.join(frame_root, g, s, f) for g, s, f, _ in jobs]
    for (game, scene, fname, multi), (path, orig, boxes) in zip(
            jobs, _run_detector_batched(runner, paths, batch_size)):
        scene_out = os.path.join(box_root, game, scene)
        os.makedirs(scene_out, exist_ok=True)
        stem = os.path.splitext(fname)[0]
        box_name = (stem + "_boxes.xml") if multi and stem != "broad" \
            else "boxes.xml"
        io.write_boxes(os.path.join(scene_out, box_name), boxes)
        n_boxes += len(boxes)
        if vis_root is not None:
            vis_dir = os.path.join(vis_root, game, scene)
            os.makedirs(vis_dir, exist_ok=True)
            io.write_png(os.path.join(vis_dir, fname),
                         _draw_boxes(orig, boxes))
    return {"scenes": len(scenes), "frames": len(jobs), "boxes": n_boxes}


def crop_broad_player_images_stage(box_root: str, frame_root: str,
                                   image_root: str,
                                   frame_name: str = "broad.png",
                                   out_size: int = cfg.PLAYER_CROP_SIZE[0]
                                   ) -> dict:
    """Indexed broadcast crop driver: the reference
    ``crop_broad_player_images`` (player_detection.py:213-250).

    Reads each scene's ``boxes.xml`` + optional ``index.xml`` (player ids
    assigned in the annotation GUI; defaults to ``2..len(boxes)+1`` — :238),
    crops every box from the broadcast frame with border 0, and writes
    ``<image_root>/<game>/<scene>/<index>/player.png``.

    Returns {'scenes', 'crops'}.
    """
    n_scenes = n_crops = 0
    for game, scene, frames in _scene_frames(frame_root):
        sdir = os.path.join(box_root, game, scene)
        boxes_path = os.path.join(sdir, "boxes.xml")
        fname = frame_name if frame_name in frames else frames[0]
        if not os.path.exists(boxes_path):
            continue
        boxes = io.read_boxes(boxes_path)
        index_path = os.path.join(sdir, "index.xml")
        indexes = io.read_index(index_path) if os.path.exists(index_path) \
            else list(range(2, len(boxes) + 2))
        image = read_image(os.path.join(frame_root, game, scene, fname))
        n_scenes += 1
        for box, index in zip(boxes, indexes):
            crop = square_crop_padded(image, box, border=0,
                                      out_size=out_size)
            pdir = os.path.join(image_root, game, scene, str(index))
            os.makedirs(pdir, exist_ok=True)
            io.write_png(os.path.join(pdir, "player.png"), crop)
            n_crops += 1
    return {"scenes": n_scenes, "crops": n_crops}


def detect_players_stage(runner: PlayerDetectorRunner, frame_root: str,
                         out_root: str, batch_size: int = 4,
                         broadcast: bool = True) -> dict:
    """Fused broadcast driver: boxes + indexed crops in one pass.

    Every frame image in each ``<game>/<scene>`` is processed. With
    ``broadcast=True``: per-frame ``boxes.xml`` (crop_broad_player role) plus
    one green-padded 512² crop per player
    (``<out>/<game>/<scene>[/<frame stem>]/<idx>/player.png`` — the frame-stem
    level appears only when a scene holds more than one frame, so the
    canonical single-``broad.png`` layout matches crop_broad_player_images
    exactly). With ``broadcast=False``: one centre-player crop per frame
    (crop_player single-frame role).
    """
    scenes = _scene_frames(frame_root)
    jobs = [(g, s, f, len(frames) > 1)
            for g, s, frames in scenes for f in frames]
    n_boxes = 0
    paths = [os.path.join(frame_root, g, s, f) for g, s, f, _ in jobs]
    for (game, scene, fname, multi), (path, orig, boxes) in zip(
            jobs, _run_detector_batched(runner, paths, batch_size)):
        scene_out = os.path.join(out_root, game, scene)
        os.makedirs(scene_out, exist_ok=True)
        stem = os.path.splitext(fname)[0]
        box_name = (stem + "_boxes.xml") if multi and stem != "broad" \
            else "boxes.xml"
        io.write_boxes(os.path.join(scene_out, box_name), boxes)
        n_boxes += len(boxes)
        if broadcast:
            base = os.path.join(scene_out, stem) if multi else scene_out
            for i, crop in enumerate(crop_broadcast_players(orig, boxes)):
                pdir = os.path.join(base, str(i + 1))
                os.makedirs(pdir, exist_ok=True)
                io.write_png(os.path.join(pdir, "player.png"), crop)
        else:
            crop = crop_player_view(orig, boxes)
            if crop is not None:
                name = (stem + "_player.png") if multi else "player.png"
                io.write_png(os.path.join(scene_out, name), crop)
    return {"scenes": len(scenes), "boxes": n_boxes}


def _resize_frame(image: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(image).resize(
        (hw[1], hw[0]), Image.BILINEAR), np.uint8)
