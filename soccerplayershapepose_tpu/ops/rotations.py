"""Rotation-representation kernels.

Numerics match the reference:
* ``rot6d_to_rotmat`` — Zhou et al. 6D→SO(3) Gram–Schmidt, same column layout
  and normalization epsilon as
  ``/root/reference/Python/Soccer/PlayerReconstruction/utils/rigid_transform_utils.py:27-41``
  (which uses ``F.normalize`` with eps 1e-12).
* ``batch_rodrigues`` — axis-angle → rotation matrix, the role played by
  ``smplx.lbs.batch_rodrigues`` in the reference SMPL forward.
* ``rotate_translate_points`` — batched rigid transform of point sets
  (reference ``rigid_transform_utils.py:7-24``).
"""

from __future__ import annotations

import jax.numpy as jnp

from soccerplayershapepose_tpu.utils.precision import hp_einsum, hp_matmul


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis with torch.nn.functional.normalize
    semantics: ``v / max(||v||, eps)``."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """Convert 6D rotation representations to rotation matrices.

    Args:
      x: (..., 6) — interpreted as a (3, 2) matrix in row-major order whose two
        columns are the first two (un-orthonormalized) rotation columns. The
        flat layout is therefore [a1x, a2x, a1y, a2y, a1z, a2z], identical to
        the reference's ``x.view(-1, 3, 2)``.

    Returns:
      (..., 3, 3) rotation matrices with columns (b1, b2, b1×b2).
    """
    batch_shape = x.shape[:-1]
    m = x.reshape(batch_shape + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(r: jnp.ndarray) -> jnp.ndarray:
    """Inverse embedding: take the first two columns of each rotation matrix.

    (..., 3, 3) → (..., 6) with the same flat layout ``rot6d_to_rotmat``
    expects, so ``rot6d_to_rotmat(rotmat_to_rot6d(R)) == R`` for R in SO(3).
    """
    batch_shape = r.shape[:-2]
    return r[..., :, :2].reshape(batch_shape + (6,))


def batch_rodrigues(aa: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors → rotation matrices (Rodrigues' formula).

    Args:
      aa: (..., 3) axis-angle (direction = axis, norm = angle in radians).

    Returns:
      (..., 3, 3) rotation matrices. Matches smplx's batch_rodrigues
      quaternion-free formulation: ``R = I + sin(θ) K + (1-cos(θ)) K²`` with
      the angle regularized by ``θ = ||aa + eps_vector||`` — here we use
      ``θ = sqrt(||aa||² + eps²)`` which is smooth at 0 and agrees to <1e-7.
    """
    angle = jnp.sqrt(jnp.sum(aa * aa, axis=-1, keepdims=True) + eps * eps)
    axis = aa / angle
    sin = jnp.sin(angle)[..., None]
    cos = jnp.cos(angle)[..., None]
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(kx)
    k = jnp.stack([
        jnp.stack([zeros, -kz, ky], axis=-1),
        jnp.stack([kz, zeros, -kx], axis=-1),
        jnp.stack([-ky, kx, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=aa.dtype)
    return eye + sin * k + (1.0 - cos) * hp_matmul(k, k)


def rotmat_to_axis_angle(r: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrices → axis-angle vectors (log map of SO(3)).

    (..., 3, 3) → (..., 3). Stable away from θ=π; at θ→0 returns the skew part.
    Used to export fitted rotmats back into SMPL axis-angle checkpoints.
    """
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    skew = jnp.stack([
        r[..., 2, 1] - r[..., 1, 2],
        r[..., 0, 2] - r[..., 2, 0],
        r[..., 1, 0] - r[..., 0, 1],
    ], axis=-1)
    sin = jnp.sin(angle)
    scale = jnp.where(jnp.abs(sin) > eps, angle / (2.0 * jnp.maximum(jnp.abs(sin), eps)), 0.5)
    return skew * scale[..., None]


def rotate_translate_points(points: jnp.ndarray, rotmat: jnp.ndarray,
                            translation: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to batches of point sets.

    Args:
      points: (B, N, 3).
      rotmat: (3, 3) or (B, 3, 3).
      translation: (3,) or (B, 3).

    Returns:
      (B, N, 3) — ``points @ Rᵀ + t`` (row-vector convention, same as the
      reference einsum 'ij,bkj->bki').
    """
    if rotmat.ndim == 2:
        out = hp_einsum("ij,bkj->bki", rotmat, points)
    else:
        out = hp_einsum("bij,bkj->bki", rotmat, points)
    if translation.ndim == 1:
        return out + translation[None, None, :]
    return out + translation[:, None, :]
