"""Distillation trainer smoke tests (the TestRegressor overfit probe of the
reference, PyTorch3DTest.py:240-339, upgraded to a real assertion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models import SingleInputRegressor
from soccerplayershapepose_tpu.ops import batch_rodrigues
from soccerplayershapepose_tpu.smpl import synthesize_assets
from soccerplayershapepose_tpu.train import make_train_state, make_train_step


@pytest.mark.slow
def test_train_step_decreases_loss():
    assets = synthesize_assets()
    regressor = SingleInputRegressor(in_channels=18, resnet_layers=18)
    state, tx = make_train_state(regressor, jax.random.PRNGKey(0),
                                 learning_rate=1e-4)
    step = jax.jit(make_train_step(regressor, tx))

    rng = np.random.RandomState(0)
    b = 2
    aa = rng.randn(b, 24, 3).astype(np.float32) * 0.2
    batch = {
        "proxy": jnp.asarray(rng.rand(b, cfg.REGRESSOR_IMG_WH,
                                      cfg.REGRESSOR_IMG_WH, 18)
                             .astype(np.float32)),
        "joints2d": jnp.asarray(rng.uniform(64, 448, (b, 17, 2))
                                .astype(np.float32)),
        "target_pose": batch_rodrigues(jnp.asarray(aa)),
        "target_betas": jnp.asarray(rng.randn(b, 10).astype(np.float32)),
        "mask": jnp.ones((b,), jnp.float32),
    }

    losses = []
    for _ in range(8):
        state, metrics, _ = step(state, assets, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfit on one fixed batch: loss must drop
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
