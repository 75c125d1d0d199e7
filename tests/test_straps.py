"""STRAPS-style synthetic regressor training (train/straps.py).

The reference ships its regressor as the external STRAPS checkpoint
(player_recon.py:133-140); these tests pin the in-repo replacement: the
corruption model, the GT-proxy batch contract, the PVE/MPJPE metric family
(train_loss_and_metrics_tracker.py:23-35), and that the distill train step
learns from the synthetic batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.regressor import SingleInputRegressor
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation)
from soccerplayershapepose_tpu.ops.rotations import rotmat_to_rot6d
from soccerplayershapepose_tpu.pipeline.proxy import (
    create_proxy_representation)
from soccerplayershapepose_tpu.smpl import synthesize_assets
from soccerplayershapepose_tpu.smpl.model import smpl_forward
from soccerplayershapepose_tpu.train.distill import (
    make_train_state, make_train_step)
from soccerplayershapepose_tpu.train.straps import (
    corrupt_proxy_inputs, evaluate_regressor, load_regressor_weights,
    regressor_metrics, save_regressor_weights, synth_regressor_batch)
from soccerplayershapepose_tpu.train.synth import random_smpl_params


def test_corrupt_proxy_inputs_shapes_and_effects():
    rng = jax.random.PRNGKey(0)
    wh = 128
    sil = jnp.ones((4, wh, wh))
    j2d = jnp.full((4, 17, 2), wh / 2.0)

    sil_c, j2d_c = corrupt_proxy_inputs(
        rng, sil, j2d, jitter_frac=0.02, drop_p=0.5, cutout_p=1.0)
    assert sil_c.shape == sil.shape and j2d_c.shape == j2d.shape
    # Cutouts with p=1 must remove silhouette area.
    assert float(sil_c.sum()) < float(sil.sum())
    # Dropped joints go far off-frame; their heatmaps are exactly zero.
    dropped = np.asarray(j2d_c[..., 0] < -1e3)
    assert dropped.any(), "drop_p=0.5 over 68 joints should drop some"
    proxy = create_proxy_representation(sil_c, j2d_c, in_wh=wh)
    heat = np.asarray(proxy[..., 1:18])           # (B, 256, 256, 17)
    assert (heat.max(axis=(1, 2))[dropped] == 0.0).all()
    # Surviving joints keep a Gaussian peak.
    assert (heat.max(axis=(1, 2))[~dropped] > 0.5).all()
    # Jitter is bounded sane: survivors moved, but by a few pixels only.
    moved = np.asarray(jnp.abs(j2d_c - j2d))[~dropped]
    assert moved.max() < 0.2 * wh


def test_regressor_metrics_zero_for_perfect_prediction():
    assets = synthesize_assets()
    body_rm, orient_rm, betas, cam_wp = random_smpl_params(
        jax.random.PRNGKey(1), 2)
    target_pose = jnp.concatenate([orient_rm, body_rm], axis=1)
    gt = smpl_forward(assets, betas, body_rm, orient_rm)
    kprcnn = jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)
    j2d = undo_keypoint_normalisation(
        orthographic_project(gt.joints, cam_wp)[:, kprcnn],
        cfg.PROXY_REP_INPUT_WH)

    pose6d = rotmat_to_rot6d(target_pose).reshape(2, -1)
    m = regressor_metrics(assets, cam_wp, pose6d, betas,
                          target_pose, betas, j2d)
    for key, val in m.items():
        assert float(val) < 1e-2, (key, float(val))


def test_synth_regressor_batch_contract():
    assets = synthesize_assets()
    wh = 64
    b = synth_regressor_batch(assets, jax.random.PRNGKey(2), b=2, wh=wh)
    assert b["proxy"].shape == (2, cfg.REGRESSOR_IMG_WH,
                                cfg.REGRESSOR_IMG_WH, 18)
    assert b["target_pose"].shape == (2, 24, 3, 3)
    assert b["target_betas"].shape == (2, 10)
    # Joint targets are reported in the 512² proxy frame regardless of the
    # render resolution (the distill loss normalizes by PROXY_REP_INPUT_WH).
    assert b["joints2d"].shape == (2, 17, 2)
    inside = np.asarray(b["joints2d"])
    assert inside.min() > -0.6 * cfg.PROXY_REP_INPUT_WH
    assert inside.max() < 1.6 * cfg.PROXY_REP_INPUT_WH
    # The silhouette channel has body pixels and the proxy is finite.
    assert float(b["proxy"][..., 0].sum()) > 0
    assert np.isfinite(np.asarray(b["proxy"])).all()
    # Targets really are the generating parameters: GT joints projected with
    # the GT weak-perspective cam land near the rendered joints2d (the
    # factory renders perspective at FOCAL_LENGTH=5000 — sub-pixel apart).
    gt = smpl_forward(assets, b["target_betas"], b["target_pose"][:, 1:],
                      b["target_pose"][:, :1])
    kprcnn = jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)
    ortho = undo_keypoint_normalisation(
        orthographic_project(gt.joints, b["gt_cam_wp"])[:, kprcnn],
        cfg.PROXY_REP_INPUT_WH)
    err = np.abs(np.asarray(ortho - b["joints2d"]))
    assert err.max() < 3.0, err.max()


@pytest.mark.slow
def test_regressor_learns_from_synth_batches():
    assets = synthesize_assets()
    reg = SingleInputRegressor(in_channels=18)
    state, tx = make_train_state(reg, jax.random.PRNGKey(3))
    step = jax.jit(make_train_step(reg, tx))
    batch = synth_regressor_batch(assets, jax.random.PRNGKey(4), b=2, wh=64)
    losses = []
    for _ in range(6):
        state, metrics, _ = step(state, assets, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # Eval + artifact roundtrip on the trained state.
    out = evaluate_regressor(reg, state.params, state.batch_stats, assets,
                             n_batches=1, batch=2, wh=64)
    assert set(out) >= {"pve_mm", "pve_pa_mm", "mpjpe_mm", "mpjpe_pa_mm",
                        "pve_t_mm", "joints2d_l2_px"}
    assert all(np.isfinite(v) for v in out.values() if isinstance(v, float))


@pytest.mark.slow
def test_fit3d_benchmark_cell():
    """GT-3D fitting benchmark runs end to end: regressor init metrics +
    single-view fit metrics on the same corrupted proxies."""
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    from soccerplayershapepose_tpu.train.straps import evaluate_fit_3d
    assets = synthesize_assets()
    reg = SingleInputRegressor(in_channels=18)
    state, _ = make_train_state(reg, jax.random.PRNGKey(6))
    out = evaluate_fit_3d(
        reg, state.params, state.batch_stats, assets, n_batches=1, batch=2,
        wh=64, fit_cfg=FitConfig(iters=4, proxy_wh=64, render_wh=64))
    assert {"init_pve_mm", "fit_pve_mm", "fit_silh_iou",
            "init_joint_err_px"} <= set(out)
    assert np.isfinite(out["fit_pve_mm"]) and np.isfinite(out["init_pve_mm"])


def test_regressor_weights_roundtrip(tmp_path):
    assets = synthesize_assets()
    reg = SingleInputRegressor(in_channels=18)
    state, _ = make_train_state(reg, jax.random.PRNGKey(5))
    path = str(tmp_path / "reg.npz")
    save_regressor_weights(path, state, dtype="float16")
    variables = load_regressor_weights(path, reg, assets)
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(variables["params"])
    assert len(flat_a) == len(flat_b)
    np.testing.assert_allclose(np.asarray(flat_a[0], np.float32),
                               np.asarray(flat_b[0], np.float32), atol=1e-3)


@pytest.mark.slow
def test_extracted_regressor_batch_contract():
    """E2E fine-tune batches: proxies come from a real ProxyNet extractor
    (deployment input distribution), supervision stays GT params."""
    from soccerplayershapepose_tpu.models.perception import ProxyNet
    from soccerplayershapepose_tpu.pipeline.extract import ProxyExtractor
    from soccerplayershapepose_tpu.train.straps import \
        extracted_regressor_batch

    assets = synthesize_assets()
    wh = 64
    model = ProxyNet(with_iuv=False, channels=16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, wh, wh, 3)))
    ex = ProxyExtractor(model, variables, wh=wh)
    batch = extracted_regressor_batch(assets, ex, jax.random.PRNGKey(1),
                                      b=2, wh=wh)
    assert batch["proxy"].shape == (2, cfg.REGRESSOR_IMG_WH,
                                    cfg.REGRESSOR_IMG_WH, 18)
    assert batch["joints2d"].shape == (2, 17, 2)
    assert batch["target_pose"].shape == (2, 24, 3, 3)
    assert batch["target_betas"].shape == (2, 10)
    # joints2d supervision is in the 512-proxy frame regardless of wh
    assert float(jnp.abs(batch["joints2d"]).max()) > wh
    # the batch feeds the distill train step unchanged
    reg = SingleInputRegressor(in_channels=18)
    state, _ = make_train_state(reg, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(reg, __import__("optax").adam(1e-4)))
    state2, metrics, _ = step(state, assets, batch)
    assert np.isfinite(float(metrics["loss"]))
