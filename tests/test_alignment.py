"""Tests for Procrustes / scale-translation alignment (eval_utils parity)."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops import procrustes_align, scale_and_translation_align


def _np_similarity_transform(s1, s2):
    """Single-sample reference semantics (eval_utils.py:7-55), numpy."""
    s1t, s2t = s1.T, s2.T
    mu1 = s1t.mean(axis=1, keepdims=True)
    mu2 = s2t.mean(axis=1, keepdims=True)
    x1, x2 = s1t - mu1, s2t - mu2
    var1 = np.sum(x1 ** 2)
    k = x1 @ x2.T
    u, _, vh = np.linalg.svd(k)
    v = vh.T
    z = np.eye(3)
    z[-1, -1] *= np.sign(np.linalg.det(u @ v.T))
    r = v @ (z @ u.T)
    scale = np.trace(r @ k) / var1
    t = mu2 - scale * (r @ mu1)
    return (scale * r @ s1t + t).T


def test_procrustes_matches_reference():
    rng = np.random.RandomState(0)
    s2 = rng.randn(4, 50, 3).astype(np.float32)
    # source = randomly transformed + noise
    s1 = s2 * 1.7 + rng.randn(4, 1, 3).astype(np.float32) \
        + 0.05 * rng.randn(4, 50, 3).astype(np.float32)
    got = np.asarray(procrustes_align(jnp.asarray(s1), jnp.asarray(s2)))
    want = np.stack([_np_similarity_transform(s1[i], s2[i]) for i in range(4)])
    # f32 matmul/SVD accumulation noise bounds the achievable agreement here;
    # exact-recovery and reflection tests below pin the semantics tightly.
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_procrustes_exact_recovery():
    rng = np.random.RandomState(1)
    s2 = rng.randn(2, 30, 3).astype(np.float32)
    # rotate+scale+translate s2 to get s1; alignment must recover s2 exactly
    theta = 0.7
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], dtype=np.float32)
    s1 = 2.0 * np.einsum("ij,bkj->bki", r, s2) + np.array([1.0, -2.0, 0.5])
    got = np.asarray(procrustes_align(jnp.asarray(s1), jnp.asarray(s2)))
    np.testing.assert_allclose(got, s2, atol=1e-4)


def test_procrustes_reflection_guard():
    rng = np.random.RandomState(2)
    s2 = rng.randn(1, 30, 3).astype(np.float32)
    s1 = s2.copy()
    s1[..., 0] *= -1  # mirrored — rotation must NOT be a reflection
    got = np.asarray(procrustes_align(jnp.asarray(s1), jnp.asarray(s2)))
    want = _np_similarity_transform(s1[0], s2[0])[None]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_scale_translation_align():
    rng = np.random.RandomState(3)
    t = rng.randn(3, 40, 3).astype(np.float32)
    p = t * 3.0 + np.array([5.0, 0.0, -2.0], dtype=np.float32)
    got = np.asarray(scale_and_translation_align(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, t, atol=1e-4)

    # reference formula parity on arbitrary inputs
    p2 = rng.randn(3, 40, 3).astype(np.float32)
    got2 = np.asarray(scale_and_translation_align(jnp.asarray(p2), jnp.asarray(t)))
    p_mean = p2.mean(axis=1, keepdims=True)
    p_c = p2 - p_mean
    p_scale = np.sqrt(np.sum(p_c ** 2, axis=(1, 2), keepdims=True) / p2.shape[1])
    t_mean = t.mean(axis=1, keepdims=True)
    t_scale = np.sqrt(np.sum((t - t_mean) ** 2, axis=(1, 2), keepdims=True) / t.shape[1])
    want2 = (p_c / p_scale) * t_scale + t_mean
    np.testing.assert_allclose(got2, want2, atol=1e-5)
