"""SMPL forward parity vs an independent numpy LBS implementation.

The snapshot ships no SMPL binary assets (``.MISSING_LARGE_BLOBS``), so — per
SURVEY.md §7 "Missing assets" — parity is established on synthesized assets:
random betas/poses are pushed through both the batched JAX forward and a
straightforward per-sample numpy LBS written from the SMPL paper equations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.smpl import synthesize_assets, smpl_forward, smpl_shape_only
from soccerplayershapepose_tpu.ops import batch_rodrigues


@pytest.fixture(scope="module")
def assets():
    return synthesize_assets()


def _np_lbs(a, betas, rotmats):
    """Single-sample numpy LBS (SMPL paper eqs. 2-7). rotmats: (24,3,3)."""
    v_template = np.asarray(a.v_template, np.float64)
    shapedirs = np.asarray(a.shapedirs, np.float64)
    posedirs = np.asarray(a.posedirs, np.float64)
    j_reg = np.asarray(a.j_regressor, np.float64)
    weights = np.asarray(a.lbs_weights, np.float64)
    parents = a.parents

    v_shaped = v_template + shapedirs @ betas
    joints = j_reg @ v_shaped                                   # (24, 3)
    pose_feat = (rotmats[1:] - np.eye(3)).reshape(-1)           # (207,)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    # forward kinematics
    world = np.zeros((24, 4, 4))
    def make44(r, t):
        m = np.eye(4); m[:3, :3] = r; m[:3, 3] = t
        return m
    world[0] = make44(rotmats[0], joints[0])
    for j in range(1, 24):
        rel = joints[j] - joints[parents[j]]
        world[j] = world[parents[j]] @ make44(rotmats[j], rel)
    posed_joints = world[:, :3, 3].copy()

    # remove rest-pose joint locations from the skinning transforms
    rel_tf = world.copy()
    for j in range(24):
        rel_tf[j, :3, 3] -= world[j, :3, :3] @ joints[j]

    t_blend = np.einsum("vj,jxy->vxy", weights, rel_tf)
    verts = np.einsum("vxy,vy->vx", t_blend[:, :3, :3], v_posed) + t_blend[:, :3, 3]
    return verts, posed_joints, v_shaped


def _random_pose(rng, b):
    aa = rng.randn(b, 24, 3) * 0.3
    return np.asarray(batch_rodrigues(jnp.asarray(aa.astype(np.float32))))


def test_forward_matches_numpy_lbs(assets):
    rng = np.random.RandomState(0)
    b = 3
    betas = rng.randn(b, 10).astype(np.float32)
    rotmats = _random_pose(rng, b)

    out = smpl_forward(assets, jnp.asarray(betas),
                       jnp.asarray(rotmats[:, 1:]),
                       jnp.asarray(rotmats[:, :1]))
    got_v = np.asarray(out.vertices)
    got_j = np.asarray(out.kin_joints)

    for i in range(b):
        want_v, want_j, want_vs = _np_lbs(assets, betas[i].astype(np.float64),
                                          rotmats[i].astype(np.float64))
        np.testing.assert_allclose(got_v[i], want_v, atol=2e-5)
        np.testing.assert_allclose(got_j[i], want_j, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v_shaped)[i], want_vs, atol=2e-5)


def test_joint_superset_layout(assets):
    rng = np.random.RandomState(1)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
    rotmats = jnp.asarray(_random_pose(rng, 2))
    out = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
    assert out.joints.shape == (2, cfg.NUM_ALL_JOINTS, 3)
    assert out.vertices.shape == (2, cfg.NUM_VERTS, 3)
    # joints 0..23 are the kinematic joints
    np.testing.assert_allclose(np.asarray(out.joints[:, :24]),
                               np.asarray(out.kin_joints), atol=1e-6)
    # joints 24..44 are vertex selections (nose first: vertex 332)
    np.testing.assert_allclose(np.asarray(out.joints[:, 24]),
                               np.asarray(out.vertices[:, 332]), atol=1e-6)
    # H36M block is the last 17, matching ALL_JOINTS_TO_H36M_MAP = range(73,90)
    h36m = np.asarray(out.joints)[:, list(cfg.ALL_JOINTS_TO_H36M_MAP)]
    reg = np.einsum("jv,bvc->bjc", np.asarray(assets.j_regressor_h36m),
                    np.asarray(out.vertices))
    np.testing.assert_allclose(h36m, reg, atol=1e-5)


def test_identity_pose_is_shaped_template(assets):
    betas = jnp.zeros((1, 10))
    eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
    out = smpl_forward(assets, betas, eye[:, 1:], eye[:, :1])
    np.testing.assert_allclose(np.asarray(out.vertices[0]),
                               np.asarray(assets.v_template), atol=1e-5)
    np.testing.assert_allclose(np.asarray(smpl_shape_only(assets, betas))[0],
                               np.asarray(assets.v_template), atol=1e-6)


def test_translation_applied(assets):
    betas = jnp.zeros((1, 10))
    eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
    t = jnp.array([[1.0, 2.0, 3.0]])
    out0 = smpl_forward(assets, betas, eye[:, 1:], eye[:, :1])
    out1 = smpl_forward(assets, betas, eye[:, 1:], eye[:, :1], transl=t)
    np.testing.assert_allclose(np.asarray(out1.vertices),
                               np.asarray(out0.vertices) + np.array([1, 2, 3.0]),
                               atol=1e-6)


def test_pose2rot_axis_angle_path(assets):
    rng = np.random.RandomState(2)
    aa = rng.randn(2, 24, 3).astype(np.float32) * 0.2
    rotmats = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
    out_aa = smpl_forward(assets, betas, jnp.asarray(aa[:, 1:]),
                          jnp.asarray(aa[:, :1]), pose2rot=True)
    out_rm = smpl_forward(assets, betas, jnp.asarray(rotmats[:, 1:]),
                          jnp.asarray(rotmats[:, :1]))
    np.testing.assert_allclose(np.asarray(out_aa.vertices),
                               np.asarray(out_rm.vertices), atol=1e-5)


def test_grad_flows(assets):
    import jax
    betas = jnp.zeros((1, 10))
    eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))

    def loss(b):
        out = smpl_forward(assets, b, eye[:, 1:], eye[:, :1])
        return jnp.sum(out.vertices ** 2)

    g = jax.grad(loss)(betas)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
