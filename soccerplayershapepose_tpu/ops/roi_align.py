"""ROIAlign (bilinear, average-pooled) as pure XLA gathers.

TPU-native replacement for the detectron2/torchvision CUDA ROIAlign
(SURVEY.md §2.12). Follows the ROIAlign paper semantics: each output cell
averages ``sampling_ratio²`` bilinear samples placed on a regular sub-grid;
``aligned=True`` applies the half-pixel offset.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_sample(fmap: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """fmap (H, W, C); ys/xs arbitrary equal shapes → (..., C)."""
    h, w = fmap.shape[:2]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    v00 = fmap[y0i, x0i]
    v01 = fmap[y0i, x1i]
    v10 = fmap[y1i, x0i]
    v11 = fmap[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = True) -> jnp.ndarray:
    """Args:
      features: (H, W, C) feature map.
      boxes: (N, 4) [x1, y1, x2, y2] in input-image coordinates.

    Returns:
      (N, output_size, output_size, C).
    """
    offset = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)

    s = sampling_ratio
    o = output_size
    # sample grid: for output cell (i, j), samples at
    # y = y1 + (i + (k+0.5)/s) * roi_h/o for k in [0, s)
    cell = (jnp.arange(o)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    cell = cell.reshape(-1) / o                            # (o*s,)
    ys = y1[:, None] + cell[None, :] * roi_h[:, None]      # (N, o*s)
    xs = x1[:, None] + cell[None, :] * roi_w[:, None]

    yy = jnp.broadcast_to(ys[:, :, None], ys.shape + (o * s,))
    xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], o * s, o * s))
    sampled = _bilinear_sample(features, yy, xx)           # (N, o*s, o*s, C)
    n, _, _, c = sampled.shape
    pooled = sampled.reshape(n, o, s, o, s, c).mean(axis=(2, 4))
    return pooled
