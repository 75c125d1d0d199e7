"""Camera models: weak-perspective (scaled orthographic) and full perspective.

Numerics match
``/root/reference/Python/Soccer/PlayerReconstruction/utils/cam_utils.py`` and
``utils/joints2d_utils.py``:
* orthographic projection applies the 2D translation BEFORE the scale:
  ``u = s (x + tx)`` (cam_utils.py:5-26),
* weak-persp ⇄ camera-translation conversion uses ``t_z = 2f / (res·s + 1e-9)``
  (cam_utils.py:28-42),
* keypoint de-normalisation maps [-1, 1] → [0, wh] via ``(k + 1)·wh/2``
  (joints2d_utils.py:5-10).
"""

from __future__ import annotations

import jax.numpy as jnp

from soccerplayershapepose_tpu.utils.precision import hp_einsum


def orthographic_project(points3d: jnp.ndarray, cam_wp: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective projection to [-1, 1] image coordinates.

    Args:
      points3d: (..., N, 3).
      cam_wp: (..., 3) camera [s, tx, ty].

    Returns:
      (..., N, 2) projected points ``(s·(x+tx), s·(y+ty))``.
    """
    s = cam_wp[..., 0:1]
    t = cam_wp[..., 1:3]
    return s[..., None] * (points3d[..., :2] + t[..., None, :])


def weak_perspective_to_translation(cam_wp: jnp.ndarray, focal_length: float,
                                    resolution: float) -> jnp.ndarray:
    """[s, tx, ty] → perspective camera translation [tx, ty, 2f/(res·s+1e-9)]."""
    tz = 2.0 * focal_length / (resolution * cam_wp[..., 0] + 1e-9)
    return jnp.stack([cam_wp[..., 1], cam_wp[..., 2], tz], axis=-1)


def translation_to_weak_perspective(translation: jnp.ndarray, focal_length: float,
                                    resolution: float) -> jnp.ndarray:
    """Perspective camera translation → weak-perspective [s, tx, ty]."""
    s = 2.0 * focal_length / (resolution * translation[..., 2] + 1e-9)
    return jnp.stack([s, translation[..., 0], translation[..., 1]], axis=-1)


def get_intrinsics_matrix(img_width: int, img_height: int,
                          focal_length: float) -> jnp.ndarray:
    """3×3 pinhole intrinsics with principal point at the image center."""
    return jnp.array([[focal_length, 0.0, img_width / 2.0],
                      [0.0, focal_length, img_height / 2.0],
                      [0.0, 0.0, 1.0]], dtype=jnp.float32)


def perspective_project(points: jnp.ndarray,
                        rotation: jnp.ndarray | None,
                        translation: jnp.ndarray,
                        cam_k: jnp.ndarray | None = None,
                        focal_length: float | None = None,
                        img_wh: int | None = None) -> jnp.ndarray:
    """Batched perspective projection.

    Args:
      points: (B, N, 3).
      rotation: (B, 3, 3) camera rotation, or None for identity.
      translation: (B, 3).
      cam_k: (B, 3, 3) or (3, 3) intrinsics; if None, built from
        ``focal_length`` and ``img_wh``.

    Returns:
      (B, N, 2) pixel coordinates.
    """
    if cam_k is None:
        cam_k = get_intrinsics_matrix(img_wh, img_wh, focal_length)
    if rotation is not None:
        points = hp_einsum("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    projected = points / points[..., 2:3]
    if cam_k.ndim == 2:
        projected = hp_einsum("ij,bkj->bki", cam_k, projected)
    else:
        projected = hp_einsum("bij,bkj->bki", cam_k, projected)
    return projected[..., :2]


def undo_keypoint_normalisation(keypoints: jnp.ndarray, img_wh: int) -> jnp.ndarray:
    """[-1, 1] normalised keypoints → pixel space [0, img_wh]."""
    return (keypoints + 1.0) * (img_wh / 2.0)


def normalise_keypoints(keypoints: jnp.ndarray, img_wh: int) -> jnp.ndarray:
    """Pixel keypoints → [-1, 1] space: ``2k/wh - 1`` (loss-side convention,
    reference multi_task_loss.py:110-112)."""
    return (2.0 * keypoints) / img_wh - 1.0


def check_joints2d_visibility(joints2d: jnp.ndarray, img_wh: int) -> jnp.ndarray:
    """Per-joint visibility: inside [0, img_wh] on both axes.

    Args:
      joints2d: (..., N, 2).

    Returns:
      (..., N) boolean mask (reference joints2d_utils.py:23-33).
    """
    inside_x = (joints2d[..., 0] >= 0) & (joints2d[..., 0] <= img_wh)
    inside_y = (joints2d[..., 1] >= 0) & (joints2d[..., 1] <= img_wh)
    return inside_x & inside_y
