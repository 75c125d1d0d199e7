"""Vectorized Gaussian joint-heatmap synthesis.

Replaces the per-joint Python loops of the reference
(``/root/reference/Python/Soccer/PlayerReconstruction/utils/label_conversions.py:58-127``)
with one fused, batched XLA program, while reproducing its quirks exactly:

* joint centres are truncated toward zero (torch ``.int()`` semantics),
* the Gaussian window spans ``[-2σ, 2σ]`` sampled with ``linspace(-2σ, 2σ, 4σ)``
  — i.e. NON-integer pixel offsets with spacing ``4σ/(4σ-1)``,
* the window is pasted at pixel range ``[c-2σ, min(c+2σ, wh-1))`` — the slice
  end is exclusive and clipped at ``wh-1``, so the last row/column of the image
  is never written,
* a joint contributes only when ``all(c > -2σ)`` and ``all(c < wh-1+2σ)``
  (strict inequalities).
"""

from __future__ import annotations

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg


def joints2d_to_gaussian_heatmaps(joints2d: jnp.ndarray, img_wh: int,
                                  std: int = cfg.HEATMAP_STD) -> jnp.ndarray:
    """Convert 2D joint locations into truncated-Gaussian heatmaps.

    Args:
      joints2d: (..., N, 2) joint pixel coordinates (float or int); float
        values are truncated toward zero like the reference's ``.int()``.
      img_wh: output heatmap side length.
      std: Gaussian standard deviation in pixels (window truncated at 2·std).

    Returns:
      (..., N, img_wh, img_wh) float32 heatmaps, (y, x) indexed.
    """
    size = 2 * std
    n_win = 2 * size                       # number of Gaussian samples per axis
    step = (2.0 * size) / (n_win - 1)      # linspace(-size, size, n_win) spacing

    c = jnp.trunc(joints2d).astype(jnp.int32)          # (..., N, 2)
    cx, cy = c[..., 0], c[..., 1]

    px = jnp.arange(img_wh, dtype=jnp.int32)           # pixel index axis

    def axis_profile(centre):
        # g: index of pixel inside the Gaussian window; valid window indices
        # are [0, n_win) and the paste range excludes pixel img_wh-1 onward.
        g = px[None, ...] - (centre[..., None] - size)     # (..., N, wh) via bcast
        valid = (g >= 0) & (g < n_win) & (px[None, ...] <= img_wh - 2)
        u = -size + g.astype(jnp.float32) * step
        prof = jnp.exp(-(u * u) / (2.0 * std * std))
        return jnp.where(valid, prof, 0.0)

    flat_c = c.reshape((-1,) + c.shape[-2:])           # (B, N, 2)
    fx, fy = flat_c[..., 0], flat_c[..., 1]
    profile_x = axis_profile(fx.reshape(-1))           # (B*N, wh)
    profile_y = axis_profile(fy.reshape(-1))

    # Joint validity: strictly inside the padded frame on both axes.
    joint_ok = jnp.all((flat_c > -size) & (flat_c < img_wh - 1 + size), axis=-1)
    joint_ok = joint_ok.reshape(-1).astype(jnp.float32)

    # Separable outer product: exp(-(ux²+uy²)/2σ²) = exp(-ux²/2σ²)·exp(-uy²/2σ²)
    hm = (profile_y[:, :, None] * profile_x[:, None, :]) * joint_ok[:, None, None]
    return hm.reshape(joints2d.shape[:-1] + (img_wh, img_wh))


def joints2d_to_gaussian_heatmaps_nhwc(joints2d: jnp.ndarray, img_wh: int,
                                       std: int = cfg.HEATMAP_STD,
                                       dtype=jnp.float32) -> jnp.ndarray:
    """Channels-last variant of :func:`joints2d_to_gaussian_heatmaps`.

    Emits (..., img_wh, img_wh, N) directly — the layout the proxy
    representation / regressor conv consume — so the hot predict path never
    materialises the (..., N, H, W) tensor only to transpose it. Values are
    bit-identical to ``moveaxis(nchw, -3, -1)``: the per-axis profiles are
    computed in float32 and only the final outer-product write is cast to
    ``dtype``, exactly like casting the f32 NCHW product afterwards.
    """
    size = 2 * std
    n_win = 2 * size
    step = (2.0 * size) / (n_win - 1)

    c = jnp.trunc(joints2d).astype(jnp.int32)          # (..., N, 2)
    flat_c = c.reshape((-1,) + c.shape[-2:])           # (B, N, 2)
    px = jnp.arange(img_wh, dtype=jnp.int32)

    def axis_profile_cl(centre):                       # centre (B, N)
        # (B, wh, N): pixel axis second-minor, joint axis minor — the
        # channels-last layout of the output.
        g = px[None, :, None] - (centre[:, None, :] - size)
        valid = (g >= 0) & (g < n_win) & (px[None, :, None] <= img_wh - 2)
        u = -size + g.astype(jnp.float32) * step
        prof = jnp.exp(-(u * u) / (2.0 * std * std))
        return jnp.where(valid, prof, 0.0)

    profile_x = axis_profile_cl(flat_c[..., 0])        # (B, wh, N)
    profile_y = axis_profile_cl(flat_c[..., 1])

    joint_ok = jnp.all((flat_c > -size) & (flat_c < img_wh - 1 + size),
                       axis=-1).astype(jnp.float32)    # (B, N)

    hm = ((profile_y[:, :, None, :] * profile_x[:, None, :, :])
          * joint_ok[:, None, None, :]).astype(dtype)  # (B, H, W, N)
    return hm.reshape(joints2d.shape[:-2] + (img_wh, img_wh, c.shape[-2]))
