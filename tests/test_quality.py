"""Quality-eval harness: metric plumbing validated with a cheating oracle
extractor (returns ground truth), so perfect inputs must yield perfect
scores; detector eval checked structurally + on a degenerate perfect case.

Model: the committed-quality-numbers requirement (VERDICT r2 #1) — these
tests pin the metric definitions the QUALITY record relies on.
"""

import jax
import numpy as np
import pytest

from soccerplayershapepose_tpu.smpl import load_assets
from soccerplayershapepose_tpu.train.quality import (
    EVAL_SEED_BASE, _rank_auc, evaluate_detector, evaluate_proxynet)
from soccerplayershapepose_tpu.train.synth import synth_crop_batch


@pytest.fixture(scope="module")
def assets():
    return load_assets()


def test_rank_auc():
    assert _rank_auc(np.array([0.9, 0.8]), np.array([0.1, 0.2])) == 1.0
    assert _rank_auc(np.array([0.1]), np.array([0.9])) == 0.0
    assert _rank_auc(np.array([0.5, 0.5]), np.array([0.5])) == 0.5
    assert np.isnan(_rank_auc(np.array([]), np.array([0.5])))


class CheatingExtractor:
    """Returns ground truth for eval images (keyed by image checksum):
    validates the metric plumbing end to end."""

    def __init__(self, assets, n_batches, batch, wh, occluders, seed=0):
        self.wh = wh
        self.lut = {}
        for bi in range(n_batches):
            rng = jax.random.PRNGKey(EVAL_SEED_BASE + seed * 100_000 + bi)
            d = synth_crop_batch(assets, rng, b=batch, wh=wh,
                                 occluders=occluders)
            imgs = np.asarray(d["image"] * 255.0, np.uint8)
            for i in range(batch):
                kp = np.concatenate(
                    [np.asarray(d["joints2d"][i]),
                     np.where(np.asarray(d["kp_visible"][i:i + 1].T) > 0,
                              0.95, 0.05)], axis=-1)
                sil = np.asarray(d["silhouette"][i])
                s = wh // d["part"].shape[1]
                part = np.asarray(d["part"][i]).repeat(s, 0).repeat(s, 1)
                uv = np.asarray(d["uv"][i]).repeat(s, 0).repeat(s, 1)
                iuv = np.concatenate([part[..., None].astype(np.float32),
                                      uv * 255.0], axis=-1)
                self.lut[imgs[i].sum()] = (kp, sil, iuv)

    def __call__(self, images):
        return [self.lut[img.sum()] for img in images]


@pytest.mark.slow
def test_evaluate_proxynet_perfect(assets):
    # Slow-marked (~80 s: synth + eval path compiles); the degraded-extractor
    # variant below keeps fast-tier coverage of evaluate_proxynet.
    wh, nb, b = 64, 2, 2
    ex = CheatingExtractor(assets, nb, b, wh, occluders=True)
    out = evaluate_proxynet(ex, assets, n_batches=nb, batch=b, wh=wh,
                            occluders=True)
    assert out["n_images"] == nb * b
    assert out["extraction_failures"] == 0
    assert out["kp_median_px_err"] < 1e-3
    assert out["kp_pck@0.05bbox"] == 1.0
    assert out["kp_pck@0.10bbox"] == 1.0
    assert out["mask_mean_iou"] == 1.0
    assert out["iuv_part_acc"] == 1.0
    assert out["iuv_uv_l1"] < 1e-6
    # Perfect localization → no bad class → good-score mean mixes the
    # injected 0.95 (visible) / 0.05 (invisible) scores, mostly visible.
    assert out["kp_score_mean_good"] > 0.5


def test_evaluate_proxynet_degraded(assets):
    """Shifted keypoints + eroded mask must degrade the metrics sensibly,
    and high scores on bad joints must tank the rank-AUC."""
    wh, nb, b = 64, 1, 2

    class Shifted(CheatingExtractor):
        def __call__(self, images):
            out = []
            for kp, sil, iuv in super().__call__(images):
                kp = kp.copy()
                kp[:8, :2] += 25.0      # half the joints far off
                kp[:8, 2] = 0.99        # ...with confident scores
                out.append((kp, sil, iuv))
            return out

    ex = Shifted(assets, nb, b, wh, occluders=False)
    out = evaluate_proxynet(ex, assets, n_batches=nb, batch=b, wh=wh,
                            occluders=False)
    assert out["kp_pck@0.10bbox"] < 1.0
    assert out["kp_mean_px_err"] > 1.0
    # Bad joints scored higher than good ones → AUC below 0.5.
    assert out["kp_score_rank_auc"] < 0.5


def test_evaluate_detector_structural(assets):
    from soccerplayershapepose_tpu.models.detector import PlayerDetector
    model = PlayerDetector(channels=16)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 96, 3), np.float32))
    out = evaluate_detector(model, variables, assets, n_batches=1, batch=1,
                            hw=(64, 96), n_players=3)
    assert out["n_gt_boxes"] > 0
    assert 0.0 <= out["ap@0.5"] <= 1.0
    assert 0.0 <= out["recall@score0.7"] <= 1.0
    assert 0.0 <= out["best_f1"] <= 1.0
    if out["best_f1"] > 0:
        p, r = out["best_f1_precision"], out["best_f1_recall"]
        assert out["best_f1"] == pytest.approx(2 * p * r / (p + r), rel=1e-6)
