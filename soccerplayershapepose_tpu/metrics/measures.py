"""Per-sample 3D error measures (PVE / MPJPE families).

Matches the reference tracker math
(``/root/reference/Python/Soccer/PlayerReconstruction/metrics/train_loss_and_metrics_tracker.py:132-222``):
each measure returns the PER-SAMPLE SUM over elements (vertices/joints); epoch
means divide by samples · elements-per-sample (6890 / 14 / 17 / 10 / 216,
tracker :256-268). ``*_sc`` applies scale+translation correction, ``*_pa``
Procrustes alignment, before the L2 norm.
"""

from __future__ import annotations

import jax.numpy as jnp

from soccerplayershapepose_tpu.ops.alignment import (
    procrustes_align, scale_and_translation_align)


def _sum_l2(a, b):
    return jnp.sum(jnp.linalg.norm(a - b, axis=-1), axis=-1)   # (B,)


def pve(pred_verts, target_verts):
    return _sum_l2(pred_verts, target_verts)


def pve_sc(pred_verts, target_verts):
    return _sum_l2(scale_and_translation_align(pred_verts, target_verts),
                   target_verts)


def pve_pa(pred_verts, target_verts):
    return _sum_l2(procrustes_align(pred_verts, target_verts), target_verts)


def mpjpe(pred_joints, target_joints):
    return _sum_l2(pred_joints, target_joints)


def mpjpe_sc(pred_joints, target_joints):
    return _sum_l2(scale_and_translation_align(pred_joints, target_joints),
                   target_joints)


def mpjpe_pa(pred_joints, target_joints):
    return _sum_l2(procrustes_align(pred_joints, target_joints), target_joints)


def pose_mse(pred_rotmats, target_rotmats):
    """Per-sample SUM of squared rotmat differences (tracker :203-206)."""
    return jnp.sum((pred_rotmats - target_rotmats) ** 2, axis=(-3, -2, -1))


def shape_mse(pred_betas, target_betas):
    return jnp.sum((pred_betas - target_betas) ** 2, axis=-1)
