"""Golden tests for rotation ops against independent numpy/scipy references."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops import (
    rot6d_to_rotmat, rotmat_to_rot6d, batch_rodrigues, rotate_translate_points)
from soccerplayershapepose_tpu.ops.rotations import rotmat_to_axis_angle


def _np_rot6d_to_rotmat(x):
    """Reference semantics (rigid_transform_utils.py:27-41) in plain numpy."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]

    def normalize(v):
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, 1e-12)

    b1 = normalize(a1)
    b2 = normalize(a2 - np.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = np.cross(b1, b2)
    return np.stack([b1, b2, b3], axis=-1)


def _np_rodrigues(aa):
    out = np.zeros(aa.shape[:-1] + (3, 3))
    for idx in np.ndindex(aa.shape[:-1]):
        r = aa[idx]
        theta = np.linalg.norm(r)
        if theta < 1e-12:
            out[idx] = np.eye(3)
            continue
        k = r / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        out[idx] = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    return out


def test_rot6d_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 6).astype(np.float32)
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    want = _np_rot6d_to_rotmat(x)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Output must be valid rotations.
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(got), 1.0, atol=1e-5)


def test_rot6d_identity_layout():
    # Flat layout [1,0,0,1,0,0] must decode to the identity rotation; this pins
    # the (3,2) row-major interpretation used by mean-param initialisation.
    x = jnp.array([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
    got = np.asarray(rot6d_to_rotmat(x))[0]
    np.testing.assert_allclose(got, np.eye(3), atol=1e-6)


def test_rot6d_roundtrip():
    rng = np.random.RandomState(1)
    aa = rng.randn(32, 3).astype(np.float32)
    r = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    r2 = np.asarray(rot6d_to_rotmat(rotmat_to_rot6d(jnp.asarray(r))))
    np.testing.assert_allclose(r2, r, atol=1e-5)


def test_batch_rodrigues_matches_numpy():
    rng = np.random.RandomState(2)
    aa = rng.randn(4, 24, 3).astype(np.float32) * 2.0
    got = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    want = _np_rodrigues(aa)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_rodrigues_near_zero():
    aa = jnp.zeros((3, 3))
    got = np.asarray(batch_rodrigues(aa))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6)


def test_rotmat_to_axis_angle_roundtrip():
    rng = np.random.RandomState(3)
    aa = rng.randn(16, 3).astype(np.float32)
    # keep away from theta = pi where the log map is ambiguous
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0.1, 2.5, (16, 1))
    aa = aa.astype(np.float32)
    r = batch_rodrigues(jnp.asarray(aa))
    back = np.asarray(rotmat_to_axis_angle(r))
    np.testing.assert_allclose(back, aa, atol=1e-3)


def test_rotate_translate_points():
    rng = np.random.RandomState(4)
    pts = rng.randn(2, 10, 3).astype(np.float32)
    aa = rng.randn(3).astype(np.float32)
    r = _np_rodrigues(aa[None])[0]
    t = rng.randn(3).astype(np.float32)
    got = np.asarray(rotate_translate_points(jnp.asarray(pts), jnp.asarray(r), jnp.asarray(t)))
    want = np.einsum("ij,bkj->bki", r, pts) + t
    np.testing.assert_allclose(got, want, atol=1e-5)
