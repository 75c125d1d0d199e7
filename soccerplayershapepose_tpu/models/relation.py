"""Inter-player pose relation module (bbox-geometry-gated attention).

Role of the reference ``PoseRelationModule``
(``/root/reference/Python/Soccer/PlayerReconstruction/models/regressor_relate.py``):
refine the per-player 24×3×3 pose rotmats of all players in a frame by
attending across players, with an attention bias derived from relative
bounding-box geometry:

* relative geometry (|Δcx|/w, |Δcy|/h, log w-ratio, log h-ratio) → sinusoidal
  embedding (regressor_relate.py:34-76),
* 27 relation units, each an 8-dim key/query/value attention with a learned
  geometric gate ``log(max(ReLU(W_G e), 1e-6))`` added to the scaled dot
  (regressor_relate.py:112-139). For output player i the weights are
  ``softmax_j(k_i·q_j + log gate[i,j])`` and the unit returns
  ``Σ_j w[i,j] v_j``; unit outputs concatenate (27·8 = 216) and are
  residual-added to the flattened rotmats (regressor_relate.py:86-97).

TPU-first re-design: all 27 units run as ONE batched attention with a heads
axis, and the module is batched over frames with an explicit player-validity
mask (the reference runs one frame at a time with exactly-N players; frames
here are padded to ``max_players`` so a whole scene batch compiles once).
A v1 variant (regressor_relate1.py:19-32) lifts features 216→1024 with
``fc1`` (NO activation), runs 16 units of dim 64 with the residual added in
the LIFTED space (regressor_relate1.py:96), and projects back with ``fc2``
REPLACING the rotmats (no outer residual — regressor_relate1.py:30-32);
its positional embedding uses dim_g=64 (regressor_relate1.py:34). Enabled
via ``lift_dim=1024``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from soccerplayershapepose_tpu import config as cfg


def bbox_positional_embedding(boxes: jnp.ndarray, dim_g: int = 8,
                              wave_len: float = 1000.0) -> jnp.ndarray:
    """Pairwise bbox geometry embedding.

    Args:
      boxes: (..., N, 4) [x1, y1, x2, y2].
      dim_g: embedding dim (a multiple of 8).

    Returns:
      (..., N, N, dim_g) embedding where row i is the output player and
      column j the attended player, matching the reference formula
      (Δ normalised by the ROW player's box size).
    """
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0

    def rel(c, s):
        d = c[..., :, None] - c[..., None, :]
        return jnp.log(jnp.maximum(jnp.abs(d / s[..., :, None]), 1e-3))

    delta_x = rel(cx, w)
    delta_y = rel(cy, h)
    delta_w = jnp.log(w[..., :, None] / w[..., None, :])
    delta_h = jnp.log(h[..., :, None] / h[..., None, :])
    pos = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)   # (...,N,N,4)

    n_freq = dim_g // 8
    feat_range = jnp.arange(n_freq, dtype=jnp.float32) / n_freq
    inv_freq = 1.0 / jnp.power(wave_len, feat_range)                  # (n_freq,)
    angles = 100.0 * pos[..., None] * inv_freq                        # (...,N,N,4,n_freq)
    angles = angles.reshape(angles.shape[:-2] + (4 * n_freq,))
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class PoseRelationModule(nn.Module):
    """Batched multi-head relation attention over players in a frame."""

    n_relations: int = 27
    key_dim: int = 8
    geo_dim: int = 8
    lift_dim: Optional[int] = None      # 1024 for the v1 variant
    appearance_dim: int = cfg.NUM_JOINTS * 9

    @nn.compact
    def __call__(self, pose_rotmats: jnp.ndarray, boxes: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Args:
          pose_rotmats: (B, N, 24, 3, 3) per-player pose.
          boxes: (B, N, 4) player bboxes in frame pixels.
          mask: (B, N) bool — True for real players, False for padding.

        Returns:
          (B, N, 24, 3, 3) refined rotmats (residual-added); padded slots pass
          through unchanged.
        """
        b, n = pose_rotmats.shape[:2]
        f_a = pose_rotmats.reshape(b, n, self.appearance_dim)
        if mask is None:
            mask = jnp.ones((b, n), bool)

        feats = f_a
        if self.lift_dim is not None:
            # Reference fc1 has no activation (regressor_relate1.py:28).
            # The lifted residual (line ~130) requires the concatenated
            # unit outputs to span the lifted space.
            assert self.n_relations * self.key_dim == self.lift_dim, (
                "lift_dim must equal n_relations*key_dim (v1: 16*64=1024)")
            feats = nn.Dense(self.lift_dim, name="lift")(f_a)

        h, dk = self.n_relations, self.key_dim
        embed = bbox_positional_embedding(boxes, self.geo_dim)        # (B,N,N,G)

        # One fused projection for all relation units (heads).
        q = nn.DenseGeneral((h, dk), name="WQ")(feats)                # (B,N,H,dk)
        k = nn.DenseGeneral((h, dk), name="WK")(feats)
        v = nn.DenseGeneral((h, dk), name="WV")(feats)
        w_g = nn.relu(nn.DenseGeneral((h,), name="WG")(embed))        # (B,N,N,H)

        # logits[b,h,i,j] = k_i · q_j  (reference role assignment) + log-gate.
        logits = jnp.einsum("bihd,bjhd->bhij", k, q) / np.sqrt(dk)
        logits = logits + jnp.transpose(jnp.log(jnp.maximum(w_g, 1e-6)),
                                        (0, 3, 1, 2))
        # Padded players may not be attended to (mask the j axis).
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(mask[:, None, None, :], logits, neg)
        attn = nn.softmax(logits, axis=-1)

        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, h * dk)
        if self.lift_dim is not None:
            # v1: residual in LIFTED space, fc2 output REPLACES the rotmats
            # (regressor_relate1.py:30-32, 96).
            out = nn.Dense(self.appearance_dim, name="proj_back")(out + feats)
            refined = jnp.where(mask[..., None], out, f_a)
        else:
            refined = jnp.where(mask[..., None], out + f_a, f_a)
        return refined.reshape(b, n, cfg.NUM_JOINTS, 3, 3)
