"""Unit tests for scripts/distill_circle.py's non-fit mechanics.

The full circle runs as TPU queue stages (scripts/tpu_queue_r5c.sh); here
the pure pieces are pinned so unattended runs can't silently regress:
game-split semantics, the teacher-quality gate's keep/drop layout, and the
translation→weak-perspective camera inversion used to score pseudo-GT.
"""

import argparse
import importlib.util
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "distill_circle", os.path.join(ROOT, "scripts", "distill_circle.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_val_games_split_by_game():
    dc = _mod()
    args = argparse.Namespace(games=8)
    assert dc.val_games(args) == ["game6", "game7"]
    # The reference's train_set.xml split is by GAME, never by scene
    # (PyTorch3DTest.py:855-856): every scene of a val game is held out.
    args = argparse.Namespace(games=2)
    assert dc.val_games(args) == ["game1"]


def test_filtered_target_root_links_only_passing_players(tmp_path):
    from soccerplayershapepose_tpu.io import formats as io

    dc = _mod()
    root = str(tmp_path)
    errs = {"2": 4.0, "3": 25.0, "4": 9.9}
    for pid, err in errs.items():
        img_dir = os.path.join(root, "broad_images", "game0", "scene0", pid)
        os.makedirs(img_dir)
        io.write_png(os.path.join(img_dir, "broad.png"),
                     np.zeros((1, 1, 3), np.uint8))
        fit_dir = os.path.join(root, "broad", "game0", "scene0", pid)
        os.makedirs(fit_dir)
        io.write_fit_npz(os.path.join(fit_dir, "data.npz"),
                         np.eye(3)[None].repeat(23, 0), np.eye(3)[None],
                         np.zeros(10), np.asarray([0.0, 0.0, 10.0]))
        io.write_metrics(os.path.join(fit_dir, "metrics.xml"), 0.9, err)

    args = argparse.Namespace(root=root, filter_px=10.0)
    out = dc._filtered_target_root(args)
    assert out.endswith("broad_filtered")
    kept = {pid: os.path.exists(os.path.join(out, "game0", "scene0", pid,
                                             "data.npz"))
            for pid in errs}
    assert kept == {"2": True, "3": False, "4": True}
    # filter disabled -> the raw tree is used untouched
    args = argparse.Namespace(root=root, filter_px=0.0)
    assert dc._filtered_target_root(args) == os.path.join(root, "broad")


def test_cam_from_translation_inverts_projection():
    import jax.numpy as jnp

    from soccerplayershapepose_tpu import config as cfg
    from soccerplayershapepose_tpu.ops.camera import \
        weak_perspective_to_translation

    dc = _mod()
    wh = 512
    cam = jnp.asarray([[1.3, 0.21, -0.4]])
    t = np.asarray(weak_perspective_to_translation(
        cam, cfg.FOCAL_LENGTH, wh))[0]
    back = dc._cam_from_translation(t, wh)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cam[0]),
                               rtol=1e-5)
