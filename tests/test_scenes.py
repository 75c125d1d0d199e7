"""Scene factory + relation trainer + mv/track GT-3D eval tests.

Covers the round-5 additions: correlated-scene sampling
(train/scenes.py), the stage-compatible tree writer, track sequences,
relation-module training/eval/IO (train/relation.py), the IUV proxy
variants (train/straps.py), and CPU smokes of the multi-view/track GT-3D
cells (train/fit3d.py, slow tier)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.smpl import synthesize_assets
from soccerplayershapepose_tpu.train.scenes import (
    orient_for_view, synth_scene_params, synth_scene_views,
    synth_track_views, write_scene_tree)


def test_scene_params_shapes_and_correlation():
    n = 6
    s = synth_scene_params(jax.random.PRNGKey(0), n)
    assert s["body_pose"].shape == (n, 23, 3, 3)
    assert s["betas"].shape == (n, 10)
    assert s["boxes"].shape == (n, 4)
    # Rotmats are valid rotations.
    rm = np.asarray(s["body_pose"]).reshape(-1, 3, 3)
    np.testing.assert_allclose(rm @ rm.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), rm.shape),
                               atol=1e-5)
    # Shared base pose: within-scene pose distance < cross-scene distance
    # (averaged over several scenes — the learnable correlation).
    def mean_pairdist(x):
        d = x[:, None] - x[None, :]
        return float(np.sqrt((np.asarray(d) ** 2).sum((-1, -2, -3))).mean())
    within, cross = [], []
    prev = None
    for i in range(6):
        si = synth_scene_params(jax.random.PRNGKey(100 + i), n)
        within.append(mean_pairdist(si["body_pose"]))
        if prev is not None:
            d = np.asarray(si["body_pose"])[:, None] \
                - np.asarray(prev)[None, :]
            cross.append(float(np.sqrt((d ** 2).sum((-1, -2, -3))).mean()))
        prev = si["body_pose"]
    assert np.mean(within) < 0.9 * np.mean(cross)
    # Boxes live in the virtual frame.
    b = np.asarray(s["boxes"])
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b[:, 0].min() > -300 and b[:, 2].max() < 2200


def test_facing_correlates_with_ball():
    # Two players on opposite sides of the ball face ~opposite directions:
    # yaw differences reflect geometry (noise sigma = 0.25 rad).
    s = synth_scene_params(jax.random.PRNGKey(3), 8)
    pos = np.asarray(s["pitch_xy"])
    ball = np.asarray(s["ball_xy"])
    d = ball[None] - pos
    expect = np.arctan2(d[:, 0], -d[:, 1])
    err = np.abs(np.angle(np.exp(1j * (np.asarray(s["yaw"]) - expect))))
    assert err.mean() < 0.5


def test_scene_views_render_and_orient():
    assets = synthesize_assets()
    d = synth_scene_views(assets, jax.random.PRNGKey(1), n_players=2,
                          n_views=2, wh=64)
    assert len(d["views"]) == 2 and "broad" in d
    v0 = d["views"][0]
    assert v0["silhouette"].shape == (2, 64, 64)
    assert v0["image"].shape == (2, 64, 64, 3)
    assert v0["joints2d"].shape == (2, 17, 2)
    assert float(v0["silhouette"].sum()) > 50        # bodies rendered
    # Same body, different azimuth → same pose, different orient.
    v1 = d["views"][1]
    assert not np.allclose(np.asarray(v0["global_orient"]),
                           np.asarray(v1["global_orient"]), atol=1e-3)


def test_orient_for_view_azimuth_composition():
    yaw = jnp.asarray([0.3, -1.0])
    a = orient_for_view(jax.random.PRNGKey(0), yaw, 0.0)
    b = orient_for_view(jax.random.PRNGKey(0), yaw + 0.7, 0.0)
    c = orient_for_view(jax.random.PRNGKey(0), yaw, 0.7)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-5)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_track_views_shared_betas_smooth_pose():
    assets = synthesize_assets()
    d = synth_track_views(assets, jax.random.PRNGKey(2), n_players=2,
                          n_frames=4, wh=64)
    assert d["silhouette"].shape == (2, 4, 64, 64)
    assert d["betas"].shape == (2, 10)               # ONE betas per track
    assert d["body_pose"].shape == (2, 4, 23, 3, 3)
    # Motion is smooth: adjacent-frame pose delta < first-to-last delta.
    bp = np.asarray(d["body_pose"])
    adj = np.abs(bp[:, 1:] - bp[:, :-1]).mean()
    span = np.abs(bp[:, -1] - bp[:, 0]).mean()
    assert adj < span


def test_write_scene_tree_stage_compatible(tmp_path):
    from soccerplayershapepose_tpu.drivers.stages import load_proxy_batch
    from soccerplayershapepose_tpu.io import formats as io
    assets = synthesize_assets()
    d = synth_scene_views(assets, jax.random.PRNGKey(4), n_players=2,
                          n_views=2, wh=64, with_image=False)
    write_scene_tree(str(tmp_path), "g0", "s0", d,
                     corrupt_rng=jax.random.PRNGKey(5), write_images=False)
    nodes = list(io.walk_player_tree(str(tmp_path / "images")))
    assert [n.player for n in nodes] == ["2", "3"]
    assert nodes[0].views == ("view0.png", "view1.png")
    sils, joints = load_proxy_batch(
        str(tmp_path / "proxies" / "g0" / "s0" / "2"),
        ["view0.png", "view1.png"])
    assert sils.shape == (2, 64, 64) and joints.shape == (2, 17, 3)
    assert set(np.unique(sils)) <= {0.0, 1.0}
    bnodes = list(io.walk_player_tree(str(tmp_path / "broad_images")))
    assert bnodes[0].views == ("broad.png",)
    boxes = io.read_boxes(str(tmp_path / "scenes" / "g0" / "s0" /
                              "boxes.xml"))
    assert boxes.shape == (2, 4)
    with np.load(str(tmp_path / "gt" / "g0" / "s0" / "2" /
                     "gt.npz")) as z:
        assert z["body_pose"].shape == (23, 3, 3)
        assert z["broad_global_orient"].shape == (1, 3, 3)
        assert z["view0_joints2d"].shape == (17, 2)


def test_iuv_proxy_variants_train_batch():
    from soccerplayershapepose_tpu.train.straps import (
        gt_iuv_image, synth_regressor_batch)
    assets = synthesize_assets()
    for ch in (18, 20, 21):
        b = synth_regressor_batch(assets, jax.random.PRNGKey(0), b=2,
                                  wh=64, proxy_channels=ch)
        assert b["proxy"].shape == (2, 256, 256, ch), ch
    # IUV image convention: part-index/255 channel 0, U/V in [0,1].
    part = jnp.zeros((1, 16, 16), jnp.int32).at[0, 4:8, 4:8].set(7)
    uv = jnp.ones((1, 16, 16, 2)) * 0.5
    iuv = gt_iuv_image(part, uv, 64)
    assert iuv.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.unique(np.asarray(iuv[..., 0])),
                               [0.0, 7.0 / 255.0], atol=1e-6)
    # Foreground UV ≈ 0.5·255/255; background forced to 0.
    got = np.asarray(iuv[0, 16:32, 16:32, 1])
    assert np.allclose(got, 0.5, atol=1e-2)
    assert float(iuv[0, 0, 0, 1]) == 0.0


def test_relation_batch_and_training_step():
    from soccerplayershapepose_tpu.train.relation import (
        evaluate_relation, load_relation_weights, make_relation_train_step,
        save_relation_weights, synth_relation_batch, train_relation)
    relation, params, history = train_relation(
        jax.random.PRNGKey(0), steps=30, b=2, n_players=4, log_every=10,
        verbose=False)
    assert history and history[-1]["loss"] < history[0]["loss"] * 2
    # Save/load round-trip preserves outputs.
    batch = synth_relation_batch(jax.random.PRNGKey(9), b=2, n_players=4)
    out1 = relation.apply(params, batch["rotmats_noisy"], batch["boxes"],
                          batch["mask"])
    path = "/tmp/relation_test.npz"
    save_relation_weights(path, params)
    params2 = load_relation_weights(path, relation, n_players=4)
    out2 = relation.apply(params2, batch["rotmats_noisy"], batch["boxes"],
                          batch["mask"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-6)
    # Padded slots pass through unchanged.
    pad = ~np.asarray(batch["mask"])
    if pad.any():
        np.testing.assert_allclose(
            np.asarray(out1)[pad], np.asarray(batch["rotmats_noisy"])[pad],
            atol=1e-6)
    assets = synthesize_assets()
    ev = evaluate_relation(relation, params, assets, n_batches=1, b=2,
                           n_players=4)
    assert set(ev) >= {"mse_in", "mse_out", "angle_in_deg", "angle_out_deg",
                       "mpjpe_in_mm", "mpjpe_out_mm"}


@pytest.mark.slow
def test_relation_training_improves_denoising():
    """A short real training run must beat the identity baseline on
    held-out scenes (the capability claim behind weights/relation_v0)."""
    from soccerplayershapepose_tpu.train.relation import (
        evaluate_relation, train_relation)
    relation, params, _ = train_relation(jax.random.PRNGKey(1), steps=400,
                                         b=8, n_players=6, verbose=False)
    assets = synthesize_assets()
    ev = evaluate_relation(relation, params, assets, n_batches=4)
    assert ev["mse_out"] < ev["mse_in"] * 0.9
    assert ev["angle_out_deg"] < ev["angle_in_deg"]
    # MPJPE convergence needs the full 3k-step budget (the committed
    # relation_v0 artifact improves it, weights/relation_v0_eval.json);
    # at 400 steps only require no blow-up.
    assert ev["mpjpe_out_mm"] < ev["mpjpe_in_mm"] * 1.1


@pytest.mark.slow
def test_fit3d_multiview_cell_smoke():
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    from soccerplayershapepose_tpu.models.ief import default_initial_params
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.train.fit3d import \
        evaluate_fit_3d_multiview
    assets = synthesize_assets()
    model = SingleInputRegressor(in_channels=18)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 18)),
        default_initial_params(assets.mean_pose_rot6d, assets.mean_shape),
        train=False)
    out = evaluate_fit_3d_multiview(
        model, variables["params"], variables.get("batch_stats", {}),
        assets, n_batches=1, batch=2, n_views=2, wh=64,
        fit_cfg=FitConfig(iters=2, proxy_wh=64, render_wh=64,
                          use_silhouette=False, silhouette_metrics=False),
        rounds=1, iters_per_phase=2)
    for arm in ("init", "sv", "mv"):
        assert np.isfinite(out[f"{arm}_mpjpe_mm"]), arm


@pytest.mark.slow
def test_fit3d_track_cell_smoke():
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    from soccerplayershapepose_tpu.models.ief import default_initial_params
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.train.fit3d import evaluate_fit_3d_track
    assets = synthesize_assets()
    model = SingleInputRegressor(in_channels=18)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 18)),
        default_initial_params(assets.mean_pose_rot6d, assets.mean_shape),
        train=False)
    out = evaluate_fit_3d_track(
        model, variables["params"], variables.get("batch_stats", {}),
        assets, n_batches=1, batch=2, n_frames=3, wh=64,
        fit_cfg=FitConfig(iters=2, proxy_wh=64, render_wh=64,
                          use_silhouette=False, silhouette_metrics=False))
    assert np.isfinite(out["init_mpjpe_mm"])
    assert np.isfinite(out["fit_mpjpe_mm"])
