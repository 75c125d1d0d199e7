"""Tests for segmentation label ops and silhouette metrics."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops import (
    silhouette_confusion_metrics, joints2d_l2_error, multiclass_to_binary,
    densepose_to_6part_lsp)


def test_silhouette_metrics_match_reference_formulas():
    rng = np.random.RandomState(0)
    pred = (rng.rand(64, 64) > 0.5).astype(np.float32)
    target = (rng.rand(64, 64) > 0.5).astype(np.float32)
    got = {k: float(v) for k, v in
           silhouette_confusion_metrics(jnp.asarray(pred), jnp.asarray(target)).items()}

    p, t = pred.astype(bool), target.astype(bool)
    tp = int(np.sum(p & t)); fp = int(np.sum(p & ~t))
    tn = int(np.sum(~p & ~t)); fn = int(np.sum(~p & t))
    assert abs(got["global_acc"] - (tp + tn) / (tp + tn + fp + fn)) < 1e-6
    assert abs(got["iou"] - tp / (tp + fp + fn)) < 1e-6
    prec = tp / (tp + fp + 1e-9); rec = tp / (tp + fn + 1e-9)
    assert abs(got["precision"] - prec) < 1e-6
    assert abs(got["recall"] - rec) < 1e-6
    assert abs(got["f1"] - (2 * prec * rec) / (prec + rec + 1e-9)) < 1e-6


def test_silhouette_metrics_batched():
    pred = jnp.stack([jnp.ones((8, 8)), jnp.zeros((8, 8))])
    target = jnp.ones((2, 8, 8))
    m = silhouette_confusion_metrics(pred, target)
    np.testing.assert_allclose(np.asarray(m["iou"]), [1.0, 0.0])


def test_j2d_error():
    pred = jnp.array([[[0.0, 0.0], [3.0, 4.0]]])
    target = jnp.zeros((1, 2, 2))
    assert float(joints2d_l2_error(pred, target)) == 2.5


def test_multiclass_to_binary():
    x = jnp.array([[0, 3], [7, 0]])
    np.testing.assert_array_equal(np.asarray(multiclass_to_binary(x)), [[0, 1], [1, 0]])


def test_densepose_map_spotchecks():
    # label_conversions.py:8-36: 1,2→6 (torso); 4→1; 23,24→3 (head)
    seg = jnp.array([0, 1, 2, 3, 4, 23, 24])
    got = np.asarray(densepose_to_6part_lsp(seg))
    np.testing.assert_array_equal(got, [0, 6, 6, 2, 1, 3, 3])
