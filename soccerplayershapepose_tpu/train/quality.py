"""Held-out quality evaluation for the perception nets.

The reference inherits COCO-grade accuracy from downloaded detectron2 /
torchvision weights and never measures it in-repo
(``/root/reference/Python/Soccer/PlayerReconstruction/predict/predict_3D.py:35-64``).
Here the nets are trained on the synth factory, so quality must be
demonstrated: this module evaluates trained weights on HELD-OUT synthetic
batches (seeds disjoint from training) through the same host path deployment
uses (``pipeline.extract.ProxyExtractor`` — including instance gating), and
emits the committed-metric record (``QUALITY_r*.json``).

Metrics:
* keypoints — median pixel error + PCK@0.05/0.1 of the GT bbox extent over
  VISIBLE joints (the KP-RCNN role, predict_joints2D.py:33-61),
* score reliability — rank-AUC of predicted joint score separating good
  (err ≤ 0.1·bbox) from bad localizations, plus mean scores per class — the
  calibration check for visibility gating (utils/joints2d_utils.py:23-33),
* silhouette — mean mask IoU (the PointRend role,
  predict_silhouette_pointrend.py:42-63),
* IUV — part accuracy on GT-foreground cells + per-part UV L1 (the DensePose
  role, predict_densepose.py:122-158),
* detector — AP@0.5, recall/precision at the reference operating point
  (score ≥ 0.7, player_detection.py:28) with IoU 0.5, mean matched IoU.
"""

from __future__ import annotations


import jax
import numpy as np

# Held-out seed base: training uses sequential folds of small seeds; eval
# seeds live far away so the streams never overlap.
EVAL_SEED_BASE = 10_000_000


def _bbox_extent(sil: np.ndarray) -> float:
    ys, xs = np.nonzero(sil > 0.5)
    if len(ys) == 0:
        return 1.0
    return float(max(ys.max() - ys.min(), xs.max() - xs.min(), 1))


def _rank_auc(scores_pos: np.ndarray, scores_neg: np.ndarray) -> float:
    """P(score_pos > score_neg) for random pos/neg pair (ties = 0.5)."""
    if len(scores_pos) == 0 or len(scores_neg) == 0:
        return float("nan")
    order = np.concatenate([scores_pos, scores_neg])
    ranks = np.empty(len(order))
    sort = np.argsort(order, kind="stable")
    # average ranks for ties
    sorted_vals = order[sort]
    ranks[sort] = np.arange(1, len(order) + 1)
    for v in np.unique(sorted_vals):
        m = order == v
        ranks[m] = ranks[m].mean()
    r_pos = ranks[:len(scores_pos)].sum()
    n_p, n_n = len(scores_pos), len(scores_neg)
    return float((r_pos - n_p * (n_p + 1) / 2) / (n_p * n_n))


def evaluate_proxynet(extractor, assets, n_batches: int = 8, batch: int = 8,
                      wh: int = 256, seed: int = 0,
                      occluders: bool = True,
                      domain_rand: bool = True) -> dict:
    """Run the deployment extraction path on held-out synth batches.

    ``extractor``: a ``pipeline.extract.ProxyExtractor`` (its ``wh`` must
    equal ``wh``). Returns the metric dict described in the module docstring.
    """
    from soccerplayershapepose_tpu.train.synth import synth_crop_batch

    kp_errs, kp_scores, kp_good = [], [], []
    pck05 = pck10 = n_vis = 0
    ious = []
    part_correct = part_total = 0
    uv_l1 = []
    failures = 0
    n_images = 0

    for bi in range(n_batches):
        rng = jax.random.PRNGKey(EVAL_SEED_BASE + seed * 100_000 + bi)
        data = synth_crop_batch(assets, rng, b=batch, wh=wh,
                                occluders=occluders,
                                domain_rand=domain_rand)
        images = np.asarray(data["image"] * 255.0, np.uint8)
        gt_j2d = np.asarray(data["joints2d"])
        gt_vis = np.asarray(data["kp_visible"]) > 0.5
        gt_sil = np.asarray(data["silhouette"])
        gt_part = np.asarray(data["part"])
        gt_uv = np.asarray(data["uv"])
        results = extractor(images)
        for i, (kp, sil, iuv) in enumerate(results):
            n_images += 1
            if kp is None:
                failures += 1
                continue
            ext = _bbox_extent(gt_sil[i])
            err = np.linalg.norm(kp[:, :2] - gt_j2d[i], axis=-1)
            good = err <= 0.1 * ext
            vis = gt_vis[i]
            kp_errs.append(err[vis])
            kp_scores.append(kp[:, 2])
            kp_good.append(good)
            pck05 += int((err[vis] <= 0.05 * ext).sum())
            pck10 += int((err[vis] <= 0.10 * ext).sum())
            n_vis += int(vis.sum())

            inter = float(np.sum((sil > 0.5) & (gt_sil[i] > 0.5)))
            union = float(np.sum((sil > 0.5) | (gt_sil[i] > 0.5)))
            ious.append(inter / union if union else 1.0)

            if iuv is not None:
                s = wh // gt_part.shape[1]
                pred_part = iuv[s // 2::s, s // 2::s, 0].astype(np.int32)
                fg = gt_part[i] > 0
                part_correct += int((pred_part[fg] == gt_part[i][fg]).sum())
                part_total += int(fg.sum())
                match = fg & (pred_part == gt_part[i])
                if match.any():
                    pred_uv = iuv[s // 2::s, s // 2::s, 1:] / 255.0
                    uv_l1.append(
                        float(np.abs(pred_uv[match]
                                     - gt_uv[i][match]).mean()))

    errs = np.concatenate(kp_errs) if kp_errs else np.array([np.nan])
    scores = np.concatenate(kp_scores) if kp_scores else np.array([])
    goods = np.concatenate(kp_good) if kp_good else np.array([], bool)
    auc = _rank_auc(scores[goods], scores[~goods]) if len(scores) else \
        float("nan")
    out = {
        "eval_wh": wh,
        "n_images": n_images,
        "extraction_failures": failures,
        "occluders": bool(occluders),
        "domain_rand": bool(domain_rand),
        "kp_median_px_err": float(np.median(errs)),
        "kp_mean_px_err": float(np.mean(errs)),
        "kp_pck@0.05bbox": pck05 / max(n_vis, 1),
        "kp_pck@0.10bbox": pck10 / max(n_vis, 1),
        "kp_score_rank_auc": auc,
        "kp_score_mean_good": float(scores[goods].mean())
        if goods.any() else float("nan"),
        "kp_score_mean_bad": float(scores[~goods].mean())
        if (~goods).any() else float("nan"),
        "mask_mean_iou": float(np.mean(ious)) if ious else float("nan"),
        "iuv_part_acc": part_correct / part_total if part_total else None,
        "iuv_uv_l1": float(np.mean(uv_l1)) if uv_l1 else None,
    }
    return out


def _box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, M) IoU between two corner-format box sets."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def evaluate_detector(model, variables, assets, n_batches: int = 8,
                      batch: int = 4, hw: tuple = (256, 448),
                      n_players: int = 8, seed: int = 0,
                      iou_thresh: float = 0.5,
                      score_thresh: float = 0.7,
                      flip_tta: bool = False,
                      ignore_below_fill: float = 0.12) -> dict:
    """AP@IoU plus precision/recall at the reference operating point.

    ``ignore_below_fill``: COCO-style ignore handling for heavily occluded
    players — GT boxes whose visible fill (synth_frame_batch.visible_fill;
    full visibility ≈ 0.35-0.45) is below this are excluded from the GT set,
    AND detections matching them (IoU ≥ ``iou_thresh``) are dropped from
    scoring rather than counted as false positives. The reference detector's
    role is finding VISIBLE people (player_detection.py:16-37); a z-buffered
    synthetic player 90% hidden behind another has no counterpart in that
    task. 0 restores the legacy all-GT accounting.
    """
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.models.detector import (
        apply_flip_tta, decode_detections)
    from soccerplayershapepose_tpu.train.synth import synth_frame_batch

    @jax.jit
    def forward(images):
        out = (apply_flip_tta(model, variables, images) if flip_tta
               else model.apply(variables, images, train=False))
        return decode_detections(out)

    records = []      # (score, is_tp)
    n_gt = 0
    n_ignored_gt = 0
    matched_ious = []
    tp_at_op = fp_at_op = 0

    for bi in range(n_batches):
        rng = jax.random.PRNGKey(EVAL_SEED_BASE + 500_000 + seed * 100_000
                                 + bi)
        data = synth_frame_batch(assets, rng, b=batch, n_players=n_players,
                                 hw=hw)
        dets = forward(jnp.asarray(data["image"]))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        gt_boxes = np.asarray(data["boxes"])
        gt_mask = np.asarray(data["mask"]) > 0.5
        fill = np.asarray(data["visible_fill"])
        for i in range(len(boxes)):
            visible = gt_mask[i] & (fill[i] >= ignore_below_fill)
            ignored = gt_mask[i] & ~visible
            gt = gt_boxes[i][visible]
            gt_ign = gt_boxes[i][ignored]
            n_gt += len(gt)
            n_ignored_gt += len(gt_ign)
            iou = _box_iou_matrix(boxes[i], gt)
            iou_ign = _box_iou_matrix(boxes[i], gt_ign)
            taken = np.zeros(len(gt), bool)
            for k in np.argsort(-scores[i]):         # descending score
                if scores[i][k] <= 1e-4:
                    continue
                tp = False
                if len(gt):
                    j = int(np.argmax(np.where(taken, -1.0, iou[k])))
                    if not taken[j] and iou[k, j] >= iou_thresh:
                        taken[j] = True
                        tp = True
                        matched_ious.append(float(iou[k, j]))
                if not tp and len(gt_ign) \
                        and iou_ign[k].max() >= iou_thresh:
                    continue          # matches an ignored (occluded) GT
                records.append((float(scores[i][k]), tp))
                if scores[i][k] >= score_thresh:
                    tp_at_op += int(tp)
                    fp_at_op += int(not tp)

    records.sort(key=lambda r: -r[0])
    tps = np.cumsum([r[1] for r in records]) if records else np.array([0])
    fps = np.cumsum([not r[1] for r in records]) if records else np.array([0])
    recall = tps / max(n_gt, 1)
    precision = tps / np.maximum(tps + fps, 1)
    # all-point interpolated AP
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, np.maximum.accumulate(precision[::-1])[::-1]):
        ap += (r - prev_r) * p
        prev_r = r
    # Best-F1 operating point along the PR curve: the score threshold a
    # deployment should use if the net's confidence calibration differs
    # from the reference RCNN's (player_detection.py:28 assumes 0.7).
    f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-9)
    bi = int(np.argmax(f1)) if records else 0
    return {
        "eval_hw": list(hw),
        "n_gt_boxes": n_gt,
        "n_ignored_gt_boxes": n_ignored_gt,
        "ignore_below_fill": ignore_below_fill,
        f"ap@{iou_thresh}": float(ap),
        f"recall@score{score_thresh}": tp_at_op / max(n_gt, 1),
        f"precision@score{score_thresh}":
            tp_at_op / max(tp_at_op + fp_at_op, 1),
        "mean_matched_iou": float(np.mean(matched_ious))
        if matched_ious else float("nan"),
        "best_f1": float(f1[bi]) if records else 0.0,
        "best_f1_score_thresh": float(records[bi][0]) if records else 0.0,
        "best_f1_precision": float(precision[bi]) if records else 0.0,
        "best_f1_recall": float(recall[bi]) if records else 0.0,
    }
