"""Wire-protocol round-trip tests (reference on-disk formats, SURVEY.md §2.11)."""

import json
import os

import numpy as np

from soccerplayershapepose_tpu.io import (
    read_boxes, write_boxes, read_index, write_index, read_joints2d,
    write_joints2d, read_metrics, write_metrics, read_fit_npz, write_fit_npz,
    read_multiview_npz, write_multiview_npz, read_hmr_prediction,
    read_spin_prediction, walk_player_tree, calc_metrics)


def test_boxes_roundtrip(tmp_path):
    p = str(tmp_path / "boxes.xml")
    boxes = np.array([[1, 2, 3, 4], [5.5, 6, 7, 8]])
    write_boxes(p, boxes)
    # file must be plain JSON (the C# GUI reads it with Newtonsoft.Json)
    with open(p) as f:
        raw = json.load(f)
    assert raw == [[1.0, 2.0, 3.0, 4.0], [5.5, 6.0, 7.0, 8.0]]
    np.testing.assert_array_equal(read_boxes(p), boxes)


def test_index_joints_metrics_roundtrip(tmp_path):
    pi = str(tmp_path / "index.xml")
    write_index(pi, [3, 1, 7])
    assert read_index(pi) == [3, 1, 7]

    pj = str(tmp_path / "view_1_j2d.xml")
    j = np.arange(51).reshape(17, 3).astype(np.float64)
    write_joints2d(pj, j)
    np.testing.assert_array_equal(read_joints2d(pj), j)

    pm = str(tmp_path / "metrics.xml")
    write_metrics(pm, 0.83, 7.2)
    assert read_metrics(pm) == (0.83, 7.2)


def test_fit_npz_roundtrip(tmp_path):
    p = str(tmp_path / "view_1.npz")
    rng = np.random.RandomState(0)
    bp = rng.randn(1, 23, 3, 3)
    go = rng.randn(1, 1, 3, 3)
    be = rng.randn(1, 10)
    t = rng.randn(1, 3)
    write_fit_npz(p, bp, go, be, t)
    out = read_fit_npz(p)
    np.testing.assert_allclose(out["body_pose"], bp)
    np.testing.assert_allclose(out["global_orient"], go)
    np.testing.assert_allclose(out["betas"], be)
    np.testing.assert_allclose(out["translation"], t)


def test_multiview_npz_roundtrip(tmp_path):
    d = str(tmp_path / "player")
    rng = np.random.RandomState(1)
    write_multiview_npz(d, rng.randn(1, 23, 3, 3), rng.randn(1, 10), {
        "view_1": {"translation": rng.randn(1, 3),
                   "global_orient": rng.randn(1, 1, 3, 3)},
        "view_2": {"translation": rng.randn(1, 3),
                   "global_orient": rng.randn(1, 1, 3, 3)},
    })
    out = read_multiview_npz(d)
    assert set(out["views"]) == {"view_1", "view_2"}
    assert out["body_pose"].shape == (1, 23, 3, 3)


def test_baseline_imports(tmp_path):
    hmr = str(tmp_path / "hmr.npy")
    np.save(hmr, np.arange(85.0).reshape(1, 85))
    out = read_hmr_prediction(hmr)
    assert out["cam_wp"].shape == (1, 3)
    assert out["pose_axis_angle"].shape == (1, 24, 3)
    assert out["betas"].shape == (1, 10)

    spin = str(tmp_path / "spin.npz")
    np.savez(spin, pred_rotmat=np.zeros((1, 24, 3, 3)),
             pred_betas=np.zeros((1, 10)), pred_camera=np.zeros((1, 3)))
    out = read_spin_prediction(spin)
    assert out["pose_rotmats"].shape == (1, 24, 3, 3)


def test_walk_tree_and_calc_metrics(tmp_path):
    root = str(tmp_path)
    for game, scene, player, err in [("g1", "s1", "1", 5.0),
                                     ("g1", "s1", "2", 12.0),
                                     ("g2", "s3", "4", 9.0)]:
        d = os.path.join(root, game, scene, player)
        os.makedirs(d)
        write_metrics(os.path.join(d, "metrics.xml"), 0.8, err)

    nodes = list(walk_player_tree(root, view_suffix="metrics.xml"))
    assert [(n.game, n.scene, n.player) for n in nodes] == [
        ("g1", "s1", "1"), ("g1", "s1", "2"), ("g2", "s3", "4")]

    agg = calc_metrics(root, score_thresh=10.0)
    assert agg["num_players"] == 3
    assert abs(agg["mean_joint_err"] - (5 + 12 + 9) / 3) < 1e-9
    assert agg["num_flagged_for_refine"] == 1
