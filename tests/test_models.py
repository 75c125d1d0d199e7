"""Tests for the flax networks (regressor, relation module, classifier)."""

import numpy as np
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models import (
    SingleInputRegressor, PoseRelationModule, ClassifyNet)
from soccerplayershapepose_tpu.models.ief import (
    default_initial_params, NUM_OUTPUT_PARAMS)
from soccerplayershapepose_tpu.ops import batch_rodrigues


def test_regressor_shapes_and_determinism():
    reg = SingleInputRegressor(in_channels=18, resnet_layers=18)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 18))
    init = jnp.zeros((NUM_OUTPUT_PARAMS,))
    params = reg.init(rng, x, init)
    cam, pose, shape = reg.apply(params, x, init)
    assert cam.shape == (2, 3) and pose.shape == (2, 144) and shape.shape == (2, 10)
    cam2, _, _ = reg.apply(params, x, init)
    np.testing.assert_array_equal(np.asarray(cam), np.asarray(cam2))


def test_ief_initial_params_layout():
    mean_pose = jnp.tile(jnp.array([1, 0, 0, 1, 0, 0], jnp.float32), 24)
    init = default_initial_params(mean_pose, jnp.zeros(10))
    assert init.shape == (NUM_OUTPUT_PARAMS,)
    assert abs(float(init[0]) - 0.9) < 1e-6 and float(init[1]) == 0.0
    np.testing.assert_array_equal(np.asarray(init[3:9]), [1, 0, 0, 1, 0, 0])


def test_relation_module_mask_semantics():
    """Padded players must not influence real players' refined poses."""
    mod = PoseRelationModule()
    rng = np.random.RandomState(0)
    n = 6
    aa = rng.randn(1, n, 24, 3).astype(np.float32) * 0.3
    poses = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    boxes = rng.uniform(0, 400, (1, n, 4)).astype(np.float32)
    boxes[..., 2:] += 450  # ensure x2>x1, y2>y1

    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(poses),
                      jnp.asarray(boxes))

    mask4 = jnp.asarray([[True] * 4 + [False] * 2])
    out_masked = mod.apply(params, jnp.asarray(poses), jnp.asarray(boxes), mask4)

    # Same 4 real players, with garbage in the padded slots: results for the
    # real 4 must be identical.
    poses2 = poses.copy()
    poses2[:, 4:] = rng.randn(1, 2, 24, 3, 3) * 10
    boxes2 = boxes.copy()
    boxes2[:, 4:] = rng.uniform(0, 100, (1, 2, 4))
    boxes2[:, 4:, 2:] += 200
    out_masked2 = mod.apply(params, jnp.asarray(poses2), jnp.asarray(boxes2), mask4)

    np.testing.assert_allclose(np.asarray(out_masked[:, :4]),
                               np.asarray(out_masked2[:, :4]), atol=1e-5)
    # padded slots pass through unchanged
    np.testing.assert_allclose(np.asarray(out_masked[:, 4:]),
                               poses[:, 4:], atol=1e-6)


def test_relation_module_residual_shape():
    mod = PoseRelationModule(lift_dim=1024, n_relations=16, key_dim=64)
    rng = np.random.RandomState(1)
    poses = np.asarray(batch_rodrigues(
        jnp.asarray(rng.randn(2, 3, 24, 3).astype(np.float32) * 0.2)))
    boxes = rng.uniform(0, 200, (2, 3, 4)).astype(np.float32)
    boxes[..., 2:] += 300
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(poses), jnp.asarray(boxes))
    out = mod.apply(params, jnp.asarray(poses), jnp.asarray(boxes))
    assert out.shape == (2, 3, cfg.NUM_JOINTS, 3, 3)


def test_classifier():
    net = ClassifyNet()
    x = jnp.ones((4, 1000))
    params = net.init(jax.random.PRNGKey(0), x)
    logits = net.apply(params, x)
    assert logits.shape == (4, 2)
