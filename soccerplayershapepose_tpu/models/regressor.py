"""Combined encoder + IEF regressor (proxy representation → SMPL params).

Role of the reference ``SingleInputRegressor``
(``/root/reference/Python/Soccer/PlayerReconstruction/models/regressor.py:7-56``):
ResNet-18 (512-d) or ResNet-50 (2048-d) over an N-channel proxy representation
(18 = 1 silhouette + 17 joint heatmaps; 20 = 17 heatmaps + 3 IUV; 21 = all),
followed by 3 IEF iterations producing weak-perspective camera (3), 24·6D pose
(144) and shape (10).

Input convention here is NHWC (B, wh, wh, C) — the TPU-native conv layout —
whereas the reference uses NCHW. The proxy builder emits NHWC directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from soccerplayershapepose_tpu.models.ief import IEFModule
from soccerplayershapepose_tpu.models.resnet import resnet18, resnet50


class SingleInputRegressor(nn.Module):
    in_channels: int = 18
    resnet_layers: int = 18
    ief_iters: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, proxy_rep: jnp.ndarray, initial_params: jnp.ndarray,
                 train: bool = False):
        """Args:
          proxy_rep: (B, wh, wh, in_channels) proxy representation.
          initial_params: (157,) IEF starting estimate
            (see models.ief.default_initial_params).

        Returns:
          (cam (B,3), pose (B,144), shape (B,10)).
        """
        assert proxy_rep.shape[-1] == self.in_channels, (
            f"expected {self.in_channels} proxy channels, got {proxy_rep.shape}")
        if self.resnet_layers == 18:
            encoder = resnet18(dtype=self.dtype)
            ief = IEFModule(hidden=(512, 512), in_features=512,
                            iterations=self.ief_iters)
        elif self.resnet_layers == 50:
            encoder = resnet50(dtype=self.dtype)
            ief = IEFModule(hidden=(1024, 1024), in_features=2048,
                            iterations=self.ief_iters)
        else:
            raise ValueError(f"resnet_layers must be 18 or 50, got {self.resnet_layers}")

        feats = encoder(proxy_rep, train=train).astype(jnp.float32)
        return ief(feats, initial_params)
