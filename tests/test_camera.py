"""Tests for camera projection ops."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops import (
    orthographic_project, perspective_project, weak_perspective_to_translation,
    translation_to_weak_perspective, get_intrinsics_matrix,
    undo_keypoint_normalisation, check_joints2d_visibility)


def test_orthographic_translation_before_scale():
    pts = jnp.array([[[1.0, 2.0, 5.0]]])
    cam = jnp.array([[2.0, 0.5, -1.0]])
    got = np.asarray(orthographic_project(pts, cam))
    # u = s*(x+tx), v = s*(y+ty)  (cam_utils.py:5-26)
    np.testing.assert_allclose(got, [[[2 * 1.5, 2 * 1.0]]], atol=1e-6)


def test_weak_perspective_translation_roundtrip():
    cam = jnp.array([[0.9, 0.1, -0.2], [1.5, 0.0, 0.3]])
    t = weak_perspective_to_translation(cam, 5000.0, 512)
    np.testing.assert_allclose(
        np.asarray(t[:, 2]), 2 * 5000.0 / (512 * np.array([0.9, 1.5]) + 1e-9), rtol=1e-6)
    cam_back = translation_to_weak_perspective(t, 5000.0, 512)
    np.testing.assert_allclose(np.asarray(cam_back), np.asarray(cam), rtol=1e-5)


def test_perspective_project_matches_manual():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 7, 3).astype(np.float32)
    pts[..., 2] += 10.0
    t = np.array([[0.1, -0.2, 5.0], [0.0, 0.0, 8.0]], dtype=np.float32)
    got = np.asarray(perspective_project(
        jnp.asarray(pts), None, jnp.asarray(t), focal_length=5000.0, img_wh=512))
    k = np.asarray(get_intrinsics_matrix(512, 512, 5000.0))
    shifted = pts + t[:, None, :]
    proj = shifted / shifted[..., 2:3]
    want = np.einsum("ij,bkj->bki", k, proj)[..., :2]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_undo_keypoint_normalisation():
    kp = jnp.array([[-1.0, 1.0], [0.0, 0.5]])
    got = np.asarray(undo_keypoint_normalisation(kp, 512))
    np.testing.assert_allclose(got, [[0.0, 512.0], [256.0, 384.0]])


def test_visibility():
    j = jnp.array([[[10.0, 20.0], [-1.0, 5.0], [5.0, 600.0], [512.0, 512.0]]])
    vis = np.asarray(check_joints2d_visibility(j, 512))
    np.testing.assert_array_equal(vis[0], [True, False, False, True])
