"""Batched SMPL forward: blendshapes + kinematic chain + linear blend skinning.

Plays the role of ``smplx.lbs.lbs`` + the reference's 90-joint superset wrapper
(``/root/reference/Python/Soccer/PlayerReconstruction/models/smpl_official.py:10-41``):

output joints = [24 posed kinematic joints,
                 21 vertex-selected joints (face/feet/fingertips),
                 9 extra + 19 cocoplus + 17 H36M regressed joints] = 90.

Design: one jitted function over a (B, ...) batch. The heavy contractions —
shape blendshapes (B,10)x(10,V·3), pose blendshapes (B,207)x(207,V·3), joint
regression (J,V)x(B,V,3) and skinning (V,24)x(B,24,16) — are MXU-shaped
matmuls; the 24-step kinematic chain is unrolled at trace time (static tree).
Everything is differentiable w.r.t. betas / pose / global orient, which the
fitting loops rely on.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.ops.rotations import batch_rodrigues
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.utils.precision import hp_einsum


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray      # (B, 6890, 3)
    joints: jnp.ndarray        # (B, 90, 3) superset
    kin_joints: jnp.ndarray    # (B, 24, 3) posed kinematic joints
    v_shaped: jnp.ndarray      # (B, 6890, 3) T-pose shaped vertices


def _kinematic_chain(rotmats: jnp.ndarray, joints: jnp.ndarray,
                     parents) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the (static) SMPL tree.

    Args:
      rotmats: (B, 24, 3, 3) local joint rotations (root first).
      joints: (B, 24, 3) rest-pose joint locations.
      parents: tuple of 24 parent indices (root = -1).

    Returns:
      (posed_joints (B, 24, 3), rel_transforms (B, 24, 4, 4)) where
      rel_transforms carry the skinning transforms with the rest-pose joint
      locations already subtracted (the classic A - pack(A·j) trick).
    """
    b = rotmats.shape[0]
    rel = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]),
         joints[:, jnp.asarray(parents[1:], jnp.int32)]], axis=1)

    def make44(r, t):
        top = jnp.concatenate([r, t[..., None]], axis=-1)          # (B,3,4)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], r.dtype), (b, 1, 4))
        return jnp.concatenate([top, bottom], axis=-2)             # (B,4,4)

    world = [make44(rotmats[:, 0], rel[:, 0])]
    for j in range(1, cfg.NUM_JOINTS):
        local = make44(rotmats[:, j], rel[:, j])
        world.append(hp_einsum("bij,bjk->bik", world[parents[j]], local))
    world = jnp.stack(world, axis=1)                               # (B,24,4,4)

    posed_joints = world[..., :3, 3]
    # Subtract rest-pose joint position rotated into the posed frame so the
    # transform maps rest-pose vertices directly.
    correction = hp_einsum("bjxy,bjy->bjx", world[..., :3, :3], joints)
    rel_transforms = world.at[..., :3, 3].add(-correction)
    return posed_joints, rel_transforms


def smpl_forward(assets: SMPLAssets,
                 betas: jnp.ndarray,
                 body_pose: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 transl: Optional[jnp.ndarray] = None,
                 pose2rot: bool = False) -> SMPLOutput:
    """Batched SMPL forward pass.

    Args:
      assets: SMPL model tensors.
      betas: (B, 10) shape coefficients.
      body_pose: (B, 23, 3, 3) rotmats if ``pose2rot=False`` (the fitting-loop
        convention, reference player_recon.py:1207-1210), else (B, 23, 3) or
        (B, 69) axis-angle.
      global_orient: (B, 1, 3, 3) rotmats or (B, 3)/(B, 1, 3) axis-angle.
      transl: optional (B, 3) root translation added to outputs.
      pose2rot: True when pose inputs are axis-angle.

    Returns:
      SMPLOutput with vertices (B, 6890, 3) and 90-joint superset (B, 90, 3).
    """
    b = betas.shape[0]
    if pose2rot:
        body_rot = batch_rodrigues(body_pose.reshape(b, cfg.NUM_BODY_JOINTS, 3))
        orient_rot = batch_rodrigues(global_orient.reshape(b, 1, 3))
    else:
        body_rot = body_pose
        orient_rot = global_orient
    rotmats = jnp.concatenate([orient_rot, body_rot], axis=1)      # (B,24,3,3)

    # Shape blendshapes: v_shaped = T + S·β.
    v_shaped = assets.v_template[None] + hp_einsum(
        "bl,vcl->bvc", betas, assets.shapedirs)

    # Rest-pose joints from the shaped mesh.
    joints = hp_einsum("jv,bvc->bjc", assets.j_regressor, v_shaped)

    # Pose blendshapes: driven by (R_k - I) for the 23 non-root joints.
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_feature = (body_rot - eye).reshape(b, cfg.NUM_POSE_BLENDSHAPES)
    pose_offsets = hp_einsum("bp,pd->bd", pose_feature,
                             assets.posedirs).reshape(b, cfg.NUM_VERTS, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_transforms = _kinematic_chain(rotmats, joints, assets.parents)

    # Skinning: per-vertex blended 4x4, applied to rest-pose vertices.
    t_blend = hp_einsum("vj,bjxy->bvxy", assets.lbs_weights,
                        rel_transforms)                            # (B,V,4,4)
    verts = hp_einsum("bvxy,bvy->bvx", t_blend[..., :3, :3], v_posed) \
        + t_blend[..., :3, 3]

    # 90-joint superset.
    vertex_joints = verts[:, assets.extra_joint_vertex_ids]        # (B,21,3)
    extra = hp_einsum("jv,bvc->bjc", assets.j_regressor_extra, verts)
    cocoplus = hp_einsum("jv,bvc->bjc", assets.j_regressor_cocoplus, verts)
    h36m = hp_einsum("jv,bvc->bjc", assets.j_regressor_h36m, verts)
    all_joints = jnp.concatenate(
        [posed_joints, vertex_joints, extra, cocoplus, h36m], axis=1)

    if transl is not None:
        verts = verts + transl[:, None, :]
        all_joints = all_joints + transl[:, None, :]
        posed_joints = posed_joints + transl[:, None, :]

    return SMPLOutput(vertices=verts, joints=all_joints,
                      kin_joints=posed_joints, v_shaped=v_shaped)


def smpl_shape_only(assets: SMPLAssets, betas: jnp.ndarray) -> jnp.ndarray:
    """T-pose ("reposed") vertices from betas only — used by PVE-T metrics
    (reference predict path reposes via betas, player_recon.py:213-226)."""
    return assets.v_template[None] + hp_einsum("bl,vcl->bvc", betas,
                                               assets.shapedirs)
