"""Iterative Error Feedback (IEF) SMPL parameter regressor head.

Role of the reference IEF module
(``/root/reference/Python/Soccer/PlayerReconstruction/models/ief_module.py``):
starting from mean SMPL parameters (cam scale initialised to 0.9, 6D-identity
pose, zero betas), run 3 iterations of ``fc(feat+params → h → h → params)``
with ReLU, adding each delta to the running estimate; split the final estimate
into camera (3), pose (24·6) and shape (10).

TPU-first: the 3 iterations run under ``lax.scan`` (one compiled body), biases
zero-initialised like the reference.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg

NUM_CAM_PARAMS = 3
NUM_POSE_PARAMS = cfg.NUM_JOINTS * 6
NUM_SHAPE_PARAMS = cfg.NUM_BETAS
NUM_OUTPUT_PARAMS = NUM_CAM_PARAMS + NUM_POSE_PARAMS + NUM_SHAPE_PARAMS


def default_initial_params(mean_pose_rot6d: jnp.ndarray,
                           mean_shape: jnp.ndarray) -> jnp.ndarray:
    """[cam s=0.9, tx=0, ty=0 | mean 6D pose | mean shape] — the IEF starting
    estimate (reference ief_module.py:33-46)."""
    cam = jnp.array([0.9, 0.0, 0.0], jnp.float32)
    return jnp.concatenate([cam, mean_pose_rot6d, mean_shape])


class IEFModule(nn.Module):
    hidden: Sequence[int] = (512, 512)
    in_features: int = 512
    iterations: int = 3

    @nn.compact
    def __call__(self, features: jnp.ndarray,
                 initial_params: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Args:
          features: (B, in_features) image features.
          initial_params: (NUM_OUTPUT_PARAMS,) starting estimate.

        Returns:
          (cam (B,3), pose (B,144), shape (B,10)).
        """
        fc1 = nn.Dense(self.hidden[0], bias_init=nn.initializers.zeros)
        fc2 = nn.Dense(self.hidden[1], bias_init=nn.initializers.zeros)
        fc3 = nn.Dense(NUM_OUTPUT_PARAMS, bias_init=nn.initializers.zeros)

        def ief_layers(state):
            h = nn.relu(fc1(state))
            h = nn.relu(fc2(h))
            return fc3(h)

        b = features.shape[0]
        params = jnp.broadcast_to(initial_params, (b, NUM_OUTPUT_PARAMS))

        # 3 identical refinement steps: scan keeps one compiled body.
        def step(carry, _):
            delta = ief_layers(jnp.concatenate([features, carry], axis=1))
            return carry + delta, None

        if self.is_initializing():
            # run once eagerly so parameters materialise
            params, _ = step(params, None)
            for _ in range(self.iterations - 1):
                params, _ = step(params, None)
        else:
            params, _ = jax.lax.scan(step, params, None, length=self.iterations)

        cam = params[:, :NUM_CAM_PARAMS]
        pose = params[:, NUM_CAM_PARAMS:NUM_CAM_PARAMS + NUM_POSE_PARAMS]
        shape = params[:, NUM_CAM_PARAMS + NUM_POSE_PARAMS:]
        return cam, pose, shape
