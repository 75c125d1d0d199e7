"""Batched rigid/similarity alignment used by the PVE-PA / MPJPE-PA metrics.

Matches ``/root/reference/Python/Soccer/PlayerReconstruction/utils/eval_utils.py``:
* ``procrustes_align`` — orthogonal Procrustes with scale (Umeyama), batched
  with ``vmap``-able jnp SVD instead of a Python loop over samples
  (eval_utils.py:7-63),
* ``scale_and_translation_align`` — RMS-normalise then re-scale/translate onto
  the target statistics (eval_utils.py:66-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Metric math must not silently drop to bf16 on TPU.
_matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def procrustes_align(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Similarity-transform s1 onto s2 (batched orthogonal Procrustes).

    Args:
      s1: (B, N, 3) source point sets.
      s2: (B, N, 3) target point sets.

    Returns:
      (B, N, 3) — ``scale·R·s1 + t`` minimizing L2 to s2.
    """
    # Work in (B, 3, N) like the classical formulation.
    x1 = jnp.swapaxes(s1, -1, -2)
    x2 = jnp.swapaxes(s2, -1, -2)

    mu1 = x1.mean(axis=-1, keepdims=True)
    mu2 = x2.mean(axis=-1, keepdims=True)
    c1 = x1 - mu1
    c2 = x2 - mu2

    var1 = jnp.sum(c1 * c1, axis=(-1, -2))
    k = _matmul(c1, jnp.swapaxes(c2, -1, -2))                    # (B, 3, 3)

    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(u @ jnp.swapaxes(v, -1, -2))
    z = jnp.broadcast_to(jnp.eye(3, dtype=s1.dtype), k.shape).copy()
    z = z.at[..., 2, 2].set(jnp.sign(det))
    r = _matmul(v, _matmul(z, jnp.swapaxes(u, -1, -2)))

    scale = jnp.trace(_matmul(r, k), axis1=-2, axis2=-1) / var1
    t = mu2 - scale[..., None, None] * _matmul(r, mu1)
    aligned = scale[..., None, None] * _matmul(r, x1) + t
    return jnp.swapaxes(aligned, -1, -2)


def scale_and_translation_align(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Normalise p to zero-mean unit-RMS, then match t's mean and RMS.

    Args:
      p: (B, N, 3) point sets to transform.
      t: (B, N, 3) reference point sets.

    Returns:
      (B, N, 3) transformed p.
    """
    n = p.shape[-2]
    p_mean = p.mean(axis=-2, keepdims=True)
    p_c = p - p_mean
    p_scale = jnp.sqrt(jnp.sum(p_c * p_c, axis=(-1, -2), keepdims=True) / n)
    p_norm = p_c / p_scale

    t_mean = t.mean(axis=-2, keepdims=True)
    t_c = t - t_mean
    t_scale = jnp.sqrt(jnp.sum(t_c * t_c, axis=(-1, -2), keepdims=True) / n)
    return p_norm * t_scale + t_mean
