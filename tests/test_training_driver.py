"""Folder-tree distillation trainer test: train on a tiny synthetic tree with
pseudo-GT npz targets, checkpoint, resume."""

import json
import os

import numpy as np
import pytest

from soccerplayershapepose_tpu.drivers.training import (
    gather_scene_batches, train_regressor, evaluate_model, read_train_split)
from soccerplayershapepose_tpu.io import write_fit_npz, write_json_xml
from soccerplayershapepose_tpu.ops import batch_rodrigues
from soccerplayershapepose_tpu.smpl import synthesize_assets

import jax.numpy as jnp  # noqa: E402


def _dataset(tmp_path, games=("g1", "g2"), players=("2", "3")):
    rng = np.random.RandomState(0)
    image_root = str(tmp_path / "PlayerBroadImage")
    proxy_root = str(tmp_path / "PlayerBroadProxy")
    target_root = str(tmp_path / "PlayerBroadViewOpt")
    for game in games:
        for player in players:
            for root in (image_root, proxy_root, target_root):
                os.makedirs(os.path.join(root, game, "s1", player),
                            exist_ok=True)
            img_dir = os.path.join(image_root, game, "s1", player)
            open(os.path.join(img_dir, "player.png"), "wb").close()
            prx = os.path.join(proxy_root, game, "s1", player)
            np.save(os.path.join(prx, "player_sil.npy"),
                    (rng.rand(512, 512) > 0.9).astype(np.uint8))
            write_json_xml(os.path.join(prx, "player_j2d.xml"),
                           rng.uniform(100, 400, (17, 3)).tolist())
            aa = rng.randn(24, 3).astype(np.float32) * 0.2
            rot = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]
            write_fit_npz(os.path.join(target_root, game, "s1", player,
                                       "data.npz"),
                          rot[1:], rot[:1], rng.randn(10), np.zeros(3))
    return image_root, proxy_root, target_root


@pytest.mark.slow
def test_train_eval_checkpoint_resume(tmp_path):
    assets = synthesize_assets()
    image_root, proxy_root, target_root = _dataset(tmp_path)

    batches = gather_scene_batches(image_root, proxy_root, target_root,
                                   max_players=4)
    assert len(batches) == 2                      # one per game/scene
    assert batches[0]["num_real"] == 2
    assert batches[0]["mask"].sum() == 2

    ckpt_dir = str(tmp_path / "ckpt")
    out = train_regressor(assets, image_root, proxy_root, target_root,
                          ckpt_dir, train_games=["g1"], epochs=2,
                          max_players=4,
                          log_path=str(tmp_path / "logs.pkl"))
    assert out["best_epoch"] >= 1
    assert len(out["history"]["train_losses"]) == 2
    assert np.isfinite(out["history"]["val_pves_pa"]).all()

    # evaluation over the tree
    metrics = evaluate_model(assets, image_root, proxy_root, target_root,
                             out["state"], max_players=4)
    assert metrics["num_players"] == 4
    assert np.isfinite(metrics["pves"])

    # resume continues the epoch counter
    out2 = train_regressor(assets, image_root, proxy_root, target_root,
                           ckpt_dir, train_games=["g1"], epochs=3,
                           max_players=4, resume=True,
                           log_path=str(tmp_path / "logs.pkl"))
    assert len(out2["history"]["train_losses"]) == 3


def test_read_train_split(tmp_path):
    p = str(tmp_path / "train_set.xml")
    write_json_xml(p, ["g1", "g3"])
    assert read_train_split(p) == ["g1", "g3"]
