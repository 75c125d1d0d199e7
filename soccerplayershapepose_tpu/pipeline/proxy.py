"""Proxy-representation construction (silhouette + joint heatmaps [+ IUV]).

Role of the reference ``create_proxy_representation``
(``/root/reference/Python/Soccer/PlayerReconstruction/predict/predict_3D.py:67-81``):
resize the 512² silhouette to 256² with nearest-neighbour, scale the 2D joints
by 256/512, cast them to int16 and synthesize 17 Gaussian heatmaps, then stack
[silhouette, heatmaps] → 18 channels. IUV variants append 3 IUV channels
(PyTorch3DTest.py:2092-2116 — 20ch drops the silhouette, 21ch keeps it,
player_iuv_sp.py:88).

Fully batched and jit-safe; emits NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.ops.heatmaps import (
    joints2d_to_gaussian_heatmaps_nhwc)


def resize_nearest(images: jnp.ndarray, out_wh: int) -> jnp.ndarray:
    """Nearest-neighbour resize on the trailing two axes (..., H, W).

    Matches ``cv2.resize(..., interpolation=cv2.INTER_NEAREST)`` for integer
    downscale factors (source index = floor(dst · in/out))."""
    in_h, in_w = images.shape[-2], images.shape[-1]
    if in_h % out_wh == 0 and in_w % out_wh == 0:
        # Integer downscale: floor(i·in/out) = i·(in/out), so a strided
        # slice is bit-identical to the gather below and lowers to a cheap
        # lax.slice instead of a TPU gather (the 512→256 hot path).
        return images[..., ::in_h // out_wh, ::in_w // out_wh]
    ys = (jnp.arange(out_wh) * (in_h / out_wh)).astype(jnp.int32)
    xs = (jnp.arange(out_wh) * (in_w / out_wh)).astype(jnp.int32)
    return images[..., ys[:, None], xs[None, :]]


def create_proxy_representation(silhouette: jnp.ndarray,
                                joints2d: jnp.ndarray,
                                in_wh: int = cfg.PROXY_REP_INPUT_WH,
                                out_wh: int = cfg.REGRESSOR_IMG_WH,
                                iuv: Optional[jnp.ndarray] = None,
                                include_silhouette: bool = True,
                                dtype=jnp.float32) -> jnp.ndarray:
    """Build batched proxy representations.

    Args:
      silhouette: (B, in_wh, in_wh) binary masks.
      joints2d: (B, 17, 2) or (B, 17, 3) keypoints in in_wh pixel space
        (confidence column ignored).
      iuv: optional (B, in_wh, in_wh, 3) DensePose IUV image in [0, 1].
      include_silhouette: False gives the 20-channel heatmaps+IUV variant.
      dtype: output dtype. All channel math runs in float32 and only the
        final writes are cast, so ``dtype=bfloat16`` is value-identical to
        building in float32 and casting afterwards — but the (B, H, W, C)
        tensor hits HBM at half width and the heatmaps are synthesised
        straight into channels-last layout (no NCHW materialise+transpose),
        which is what makes the predict slice's proxy stage cheap.

    Returns:
      (B, out_wh, out_wh, C) NHWC proxy, C ∈ {18, 20, 21}.
    """
    scale = out_wh / float(in_wh)
    # Reference casts scaled joints to int16 before heatmap synthesis
    # (predict_3D.py:76); jnp.trunc in the heatmap op reproduces the cast.
    joints = jnp.trunc(joints2d[..., :2] * scale)
    heatmaps = joints2d_to_gaussian_heatmaps_nhwc(joints, out_wh,
                                                  dtype=dtype)   # (B,H,W,17)

    channels = []
    if include_silhouette:
        channels.append(resize_nearest(silhouette, out_wh)
                        .astype(dtype)[..., None])
    channels.append(heatmaps)
    if iuv is not None:
        channels.append(resize_nearest(
            jnp.moveaxis(iuv, -1, -3), out_wh)
            .transpose(0, 2, 3, 1).astype(dtype))
    return jnp.concatenate(channels, axis=-1)
