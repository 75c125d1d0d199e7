"""Main-camera frame classifier head.

Role of the reference ``ClassifyNet``
(``/root/reference/Python/Soccer/ImageClassification/classifi_model.py:4-13``):
a 2-layer MLP (1000 → 500 → 2) over the logits of a frozen ImageNet ResNet-18,
deciding whether a video frame is a main-camera (wide) shot. The frozen
feature extractor here is any (B, 1000) logit vector — e.g. a flax ResNet-18
classifier head or precomputed features.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ClassifyNet(nn.Module):
    hidden: int = 500
    num_classes: int = 2

    @nn.compact
    def __call__(self, backbone_logits: jnp.ndarray) -> jnp.ndarray:
        """(B, 1000) frozen-backbone logits → (B, 2) class logits."""
        x = nn.relu(nn.Dense(self.hidden)(backbone_logits))
        return nn.Dense(self.num_classes)(x)
