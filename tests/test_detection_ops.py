"""Tests for XLA NMS / ROIAlign and host-side crop/box utilities."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops.nms import box_iou, nms, filter_person_detections
from soccerplayershapepose_tpu.ops.roi_align import roi_align
from soccerplayershapepose_tpu.pipeline.preprocess import (
    get_centre_object, square_crop_padded, pad_to_square,
    corners_to_centre_size, centre_size_to_corners)
from soccerplayershapepose_tpu.pipeline.detection import largest_centred_box


def test_box_iou():
    a = jnp.array([[0, 0, 10, 10.0]])
    b = jnp.array([[0, 0, 10, 10.0], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_greedy_suppression():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = nms(boxes, scores, iou_threshold=0.5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert list(idx[valid]) == [0, 2]   # box 1 suppressed by box 0


def test_filter_person_detections():
    boxes = jnp.array([[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 5, 5.0]])
    scores = jnp.array([0.9, 0.95, 0.6])
    labels = jnp.array([1, 2, 1])     # only idx 0 is person above thresh
    out, valid = filter_person_detections(boxes, scores, labels,
                                          score_thresh=0.7, max_outputs=2)
    valid = np.asarray(valid)
    assert valid.tolist() == [True, False]
    np.testing.assert_array_equal(np.asarray(out)[0], [0, 0, 1, 1])


def test_roi_align_constant_field():
    fmap = jnp.ones((16, 16, 3)) * 5.0
    rois = jnp.array([[2.0, 2.0, 10.0, 10.0]])
    out = np.asarray(roi_align(fmap, rois, output_size=4))
    np.testing.assert_allclose(out, 5.0, atol=1e-6)


def test_roi_align_linear_ramp():
    # feature = x coordinate → pooled cells must increase along x
    xs = jnp.broadcast_to(jnp.arange(32.0)[None, :, None], (32, 32, 1))
    out = np.asarray(roi_align(xs, jnp.array([[4.0, 4.0, 28.0, 28.0]]),
                               output_size=4))[0, ..., 0]
    assert np.all(np.diff(out, axis=1) > 0)
    assert np.allclose(out[0], out[-1])   # constant along y


def test_crop_and_box_utils():
    img = np.zeros((100, 200, 3), np.uint8)
    img[40:60, 90:110] = 255
    boxes = np.array([[10, 10, 20, 20], [95, 45, 105, 55], [150, 80, 160, 90]])
    assert get_centre_object(boxes, img.shape[:2]) == 1

    crop = square_crop_padded(img, boxes[1], border=10, out_size=64)
    assert crop.shape == (64, 64, 3)
    assert crop[32, 32, 0] == 255          # object centred

    # green padding fills off-frame area for an edge box
    crop2 = square_crop_padded(img, np.array([0, 0, 10, 10]), border=20,
                               out_size=64)
    assert tuple(crop2[0, 0]) == (53, 88, 83)

    sq = pad_to_square(img)
    assert sq.shape[0] == sq.shape[1] == 200

    cs = corners_to_centre_size(boxes)
    np.testing.assert_allclose(centre_size_to_corners(cs), boxes)

    assert largest_centred_box(boxes.astype(float), img.shape[:2]) == 1
