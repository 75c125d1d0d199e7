"""Self-sup fine-tuning + relation-module evaluation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models import SingleInputRegressor
from soccerplayershapepose_tpu.smpl import synthesize_assets
from soccerplayershapepose_tpu.train.selfsup import (
    losses_for_item, make_selfsup_state, make_selfsup_step)


def test_losses_for_item():
    assert losses_for_item("pose") == ("joints2D",)
    assert losses_for_item("shape") == ("silhouette",)
    assert losses_for_item("both") == ("joints2D", "silhouette")


@pytest.mark.slow
def test_selfsup_pose_mode_decreases_j2d_error():
    assets = synthesize_assets()
    regressor = SingleInputRegressor(in_channels=18)
    state, tx = make_selfsup_state(regressor, jax.random.PRNGKey(0),
                                   item="pose", learning_rate=1e-4)
    step = jax.jit(make_selfsup_step(regressor, tx, item="pose"))

    rng = np.random.RandomState(0)
    b = 2
    batch = {
        "proxy": jnp.asarray(rng.rand(b, 256, 256, 18).astype(np.float32)),
        "silhouette": jnp.zeros((b, 512, 512)),
        "joints2d": jnp.asarray(rng.uniform(150, 350, (b, 17, 2))
                                .astype(np.float32)),
    }
    errs = []
    for _ in range(10):
        state, metrics, _ = step(state, assets, batch)
        errs.append(float(metrics["joints2D_l2e"]))
    assert np.isfinite(errs).all()
    # optimization through the full predict path is noisy on one fixed batch;
    # require the settled error to beat the starting error
    assert np.mean(errs[-3:]) < errs[0], errs
    # log-vars are trained too (criterion parameters in the optimizer)
    assert float(jnp.abs(state.log_vars["joints2D"])) > 0


@pytest.mark.slow
def test_evaluate_model_relate(tmp_path):
    import os
    from soccerplayershapepose_tpu.drivers.training import (
        evaluate_model_relate)
    from soccerplayershapepose_tpu.io import (
        write_boxes, write_fit_npz, write_json_xml)
    from soccerplayershapepose_tpu.ops import batch_rodrigues
    from soccerplayershapepose_tpu.train.distill import make_train_state

    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    ir, pr, tr, br = [str(tmp_path / n) for n in
                      ("img", "prx", "tgt", "boxes")]
    for player in ("2", "3"):
        for r in (ir, pr, tr):
            os.makedirs(os.path.join(r, "g1", "s1", player), exist_ok=True)
        open(os.path.join(ir, "g1", "s1", player, "player.png"), "wb").close()
        np.save(os.path.join(pr, "g1", "s1", player, "player_sil.npy"),
                (rng.rand(512, 512) > 0.9).astype(np.uint8))
        write_json_xml(os.path.join(pr, "g1", "s1", player, "player_j2d.xml"),
                       rng.uniform(100, 400, (17, 3)).tolist())
        aa = rng.randn(24, 3).astype(np.float32) * 0.2
        rot = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]
        write_fit_npz(os.path.join(tr, "g1", "s1", player, "data.npz"),
                      rot[1:], rot[:1], rng.randn(10), np.zeros(3))
    os.makedirs(os.path.join(br, "g1", "s1"))
    write_boxes(os.path.join(br, "g1", "s1", "boxes.xml"),
                rng.uniform(0, 400, (2, 4)) + np.array([0, 0, 500, 500]))

    regressor = SingleInputRegressor(in_channels=18)
    state, _ = make_train_state(regressor, jax.random.PRNGKey(0))
    # Random relation init is rejected without the explicit opt-in.
    with pytest.raises(ValueError):
        evaluate_model_relate(assets, ir, pr, tr, state, boxes_root=br,
                              max_players=4)
    out = evaluate_model_relate(assets, ir, pr, tr, state, boxes_root=br,
                                max_players=4, allow_random_init=True)
    assert out["num_players"] == 2
    assert np.isfinite(out["pves"]) and np.isfinite(out["mpjpes_pa"])
