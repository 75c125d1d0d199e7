"""Fitting-loop tests (the reference's TestOptimization probe,
PyTorch3DTest.py:489+, upgraded to real assertions): fit to targets generated
from known SMPL parameters and check error reduction + best-iterate logic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit import (
    FitConfig, FitInit, single_view_fit, broad_view_fit)
from soccerplayershapepose_tpu.fit.multi_view import MultiViewInit, multi_view_fit
from soccerplayershapepose_tpu.fit.single_view import splice_body_pose
from soccerplayershapepose_tpu.ops import batch_rodrigues
from soccerplayershapepose_tpu.ops.camera import (
    orthographic_project, undo_keypoint_normalisation)
from soccerplayershapepose_tpu.smpl import synthesize_assets, smpl_forward


def _make_target(assets, rng, b):
    """Ground-truth params + their projected KP-RCNN joints (512 px)."""
    aa = rng.randn(b, 24, 3).astype(np.float32) * 0.15
    rotmats = batch_rodrigues(jnp.asarray(aa))
    betas = jnp.asarray(rng.randn(b, 10).astype(np.float32) * 0.5)
    cam = jnp.asarray(np.tile([[0.9, 0.0, 0.0]], (b, 1)).astype(np.float32))
    out = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
    j2d = orthographic_project(out.joints, cam)
    j2d = undo_keypoint_normalisation(
        j2d[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], 512)
    return rotmats, betas, cam, j2d


def _perturbed_init(rotmats, betas, cam, rng, scale=0.2):
    b = rotmats.shape[0]
    noise = rng.randn(b, 24, 3).astype(np.float32) * scale
    pert = batch_rodrigues(jnp.asarray(noise))
    noisy = jnp.einsum("bjxy,bjyz->bjxz", rotmats, pert)
    return FitInit(body_pose=noisy[:, 1:], global_orient=noisy[:, :1],
                   betas=betas + 0.3, cam_wp=cam + jnp.array([0.05, 0.02, -0.02]))


def test_splice_body_pose_freezes_hands_feet():
    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.randn(2, 23, 3, 3).astype(np.float32))
    sub = jnp.asarray(rng.randn(2, 19, 3, 3).astype(np.float32))
    full = np.asarray(splice_body_pose(sub, init))
    for j in cfg.FITTING_FROZEN_BODY_JOINTS:
        np.testing.assert_array_equal(full[:, j], np.asarray(init)[:, j])
    np.testing.assert_array_equal(full[:, 0], np.asarray(sub)[:, 0])
    np.testing.assert_array_equal(full[:, 8], np.asarray(sub)[:, 6])
    np.testing.assert_array_equal(full[:, 20], np.asarray(sub)[:, 18])


@pytest.mark.slow
def test_single_view_fit_reduces_joint_error():
    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)

    fit_cfg = FitConfig(iters=30, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False)
    sil = jnp.zeros((b, 512, 512))
    res = single_view_fit(assets, init, sil, j2d, fit_cfg)

    assert np.all(np.asarray(res.joint_err) <= np.asarray(res.init_joint_err))
    # meaningful improvement on at least the batch average
    assert np.asarray(res.joint_err).mean() < 0.9 * np.asarray(res.init_joint_err).mean()
    # hands/feet joints never moved
    for j in cfg.FITTING_FROZEN_BODY_JOINTS:
        np.testing.assert_array_equal(np.asarray(res.body_pose[:, j]),
                                      np.asarray(init.body_pose[:, j]))
    assert np.all(np.asarray(res.best_iter) >= 1)
    # translation consistent with the best cam
    tz = np.asarray(res.translation[:, 2])
    s = np.asarray(res.cam_wp[:, 0])
    np.testing.assert_allclose(tz, 2 * cfg.FOCAL_LENGTH / (512 * s + 1e-9), rtol=1e-5)


@pytest.mark.slow
def test_broad_view_fit_only_moves_cam_and_orient():
    assets = synthesize_assets()
    rng = np.random.RandomState(1)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng, scale=0.1)

    fit_cfg = FitConfig(iters=20, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False)
    res = broad_view_fit(assets, init.body_pose, init.betas,
                         init.global_orient, init.cam_wp,
                         jnp.zeros((b, 512, 512)), j2d, fit_cfg)
    # pose/betas are pass-through
    np.testing.assert_array_equal(np.asarray(res.body_pose),
                                  np.asarray(init.body_pose))
    np.testing.assert_array_equal(np.asarray(res.betas), np.asarray(init.betas))
    assert np.all(np.asarray(res.joint_err) <= np.asarray(res.init_joint_err))


@pytest.mark.slow
def test_multi_view_fit_shared_shape():
    assets = synthesize_assets()
    rng = np.random.RandomState(2)
    b, v = 1, 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b * v)
    init = MultiViewInit(
        body_pose=rotmats[:, 1:].reshape(b, v, 23, 3, 3),
        global_orient=rotmats[:, :1].reshape(b, v, 1, 3, 3),
        betas=betas.reshape(b, v, 10),
        cam_wp=cam.reshape(b, v, 3))
    fit_cfg = FitConfig(iters=3, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False)
    res = multi_view_fit(assets, init,
                         jnp.zeros((b, v, 512, 512)),
                         j2d.reshape(b, v, 17, 2),
                         fit_cfg, rounds=1, iters_per_phase=3)
    assert res.body_pose.shape == (b, 23, 3, 3)
    assert res.betas.shape == (b, 10)
    assert res.global_orient.shape == (b, v, 1, 3, 3)
    assert np.isfinite(np.asarray(res.joint_err)).all()


@pytest.mark.slow
def test_track_fit_shared_betas():
    from soccerplayershapepose_tpu.fit.track import TrackInit, track_fit
    assets = synthesize_assets()
    rng = np.random.RandomState(3)
    b, t = 1, 3
    rotmats, betas, cam, j2d = _make_target(assets, rng, b * t)
    init = TrackInit(
        body_pose=rotmats[:, 1:].reshape(b, t, 23, 3, 3),
        global_orient=rotmats[:, :1].reshape(b, t, 1, 3, 3),
        betas=(betas + 0.2).reshape(b, t, 10),
        cam_wp=cam.reshape(b, t, 3))
    fit_cfg = FitConfig(iters=4, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False)
    mask = jnp.asarray([[1.0, 1.0, 0.0]])   # variable-length track
    res = track_fit(assets, init, jnp.zeros((b, t, 512, 512)),
                    j2d.reshape(b, t, 17, 2), fit_cfg, frame_mask=mask)
    assert res.betas.shape == (b, 10)                 # one shared shape
    assert res.body_pose.shape == (b, t, 23, 3, 3)    # per-frame pose
    assert np.isfinite(np.asarray(res.joint_err)).all()


@pytest.mark.slow
def test_single_view_fit_with_backface_cull():
    """Culled-rasterizer fitting stays consistent with the full-face path."""
    assets = synthesize_assets()
    rng = np.random.RandomState(5)
    b = 1
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng, scale=0.1)
    sil = jnp.zeros((b, 512, 512)).at[:, 200:300, 200:300].set(1.0)

    base = FitConfig(iters=3, lr=0.01, render_wh=64, sigma=1e-4,
                     use_pallas=False)
    culled = FitConfig(iters=3, lr=0.01, render_wh=64, sigma=1e-4,
                       use_pallas=False, backface_cull=True)
    r0 = single_view_fit(assets, init, sil, j2d, base)
    r1 = single_view_fit(assets, init, sil, j2d, culled)
    # silhouette union is winding-invariant: IoUs should agree closely
    np.testing.assert_allclose(np.asarray(r1.silh_iou),
                               np.asarray(r0.silh_iou), atol=0.05)


@pytest.mark.slow
def test_snapshot_trajectory_and_save_every():
    """single_view_optimization_test parity (player_recon.py:1309-1567):
    save_every keeps the LAST iterate; snapshot_every returns the parameter
    trajectory, whose first entry is the init and whose entries change."""
    assets = synthesize_assets()
    rng = np.random.RandomState(1)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)
    sil = jnp.zeros((b, 512, 512))

    fit_cfg = FitConfig(iters=12, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False, save_every=True,
                        snapshot_every=3, iters_per_call=5)
    res = single_view_fit(assets, init, sil, j2d, fit_cfg)

    assert res.snapshots is not None
    snaps = {k: np.asarray(v) for k, v in res.snapshots.items()}
    assert snaps["body_pose"].shape == (4, b, 23, 3, 3)   # ceil(12/3)
    assert snaps["cam_wp"].shape == (4, b, 3)
    # First snapshot is the (pre-update) init.
    np.testing.assert_allclose(snaps["betas"][0], np.asarray(init.betas),
                               atol=1e-6)
    np.testing.assert_allclose(snaps["global_orient"][0],
                               np.asarray(init.global_orient), atol=1e-6)
    # Trajectory actually moves.
    assert np.abs(snaps["cam_wp"][-1] - snaps["cam_wp"][0]).max() > 0
    # save_every ⇒ best == final iterate (best_iter == iters).
    np.testing.assert_array_equal(np.asarray(res.best_iter), 12)
    # Frozen joints frozen in every snapshot too.
    for j in cfg.FITTING_FROZEN_BODY_JOINTS:
        np.testing.assert_array_equal(snaps["body_pose"][:, :, j],
                                      np.broadcast_to(
                                          np.asarray(init.body_pose[:, j]),
                                          (4, b, 3, 3)))


@pytest.mark.slow
def test_single_view_optimization_test_stage(tmp_path):
    """Driver writes per-epoch npz snapshots next to the final result."""
    import os
    from soccerplayershapepose_tpu.drivers.stages import (
        single_view_optimization_test)
    from soccerplayershapepose_tpu.io import formats as io
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor

    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    ir, pr, rr = (str(tmp_path / d) for d in ("img", "proxy", "res"))
    for view in ("view_1", "view_2"):
        d = os.path.join(ir, "g1", "s1", "p1")
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, view + ".png"), "wb").close()
        pd = os.path.join(pr, "g1", "s1", "p1")
        os.makedirs(pd, exist_ok=True)
        np.save(os.path.join(pd, view + "_sil.npy"),
                (rng.rand(512, 512) > 0.5).astype(np.uint8))
        io.write_joints2d(os.path.join(pd, view + "_j2d.xml"),
                     rng.uniform(100, 400, (17, 3)))

    regressor, params, regressor_fn = build_predictor(in_channels=18)
    out = single_view_optimization_test(
        assets, ir, pr, rr, params=params, regressor_fn=regressor_fn,
        fit_cfg=FitConfig(iters=6, use_silhouette=False,
                          silhouette_metrics=False, iters_per_call=None),
        batch_size=2, snapshot_every=2)
    assert out["count"] == 2
    assert out["snapshots_per_view"] == 3
    base = os.path.join(rr, "g1", "s1", "p1")
    assert os.path.exists(os.path.join(base, "view_1.npz"))
    assert os.path.exists(os.path.join(base, "view_2.npz"))
    for t in (1, 3, 5):
        p = os.path.join(base, f"view_2_epoch{t}.npz")
        assert os.path.exists(p), p
        data = np.load(p)
        assert data["body_pose"].shape == (1, 23, 3, 3)


def test_single_view_fit_with_mesh_matches_unsharded():
    """mesh=... shards the player axis over the data axis; on however many
    CPU devices exist the sharded loop must produce the same best iterate as
    the unsharded one (embarrassingly parallel — no cross-player math)."""
    from soccerplayershapepose_tpu.parallel.mesh import make_mesh
    devices = jax.devices("cpu")
    mesh = make_mesh(devices[:2] if len(devices) >= 2 else devices[:1])
    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    b = 2 * mesh.shape["data"]
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)
    fit_cfg = FitConfig(iters=6, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False, iters_per_call=3)
    sil = jnp.zeros((b, 512, 512))
    res_sharded = single_view_fit(assets, init, sil, j2d, fit_cfg, mesh=mesh)
    res_plain = single_view_fit(assets, init, sil, j2d, fit_cfg)
    np.testing.assert_allclose(np.asarray(res_sharded.joint_err),
                               np.asarray(res_plain.joint_err),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_sharded.betas),
                               np.asarray(res_plain.betas),
                               rtol=1e-3, atol=1e-4)


def test_run_fit_loop_mesh_rejects_ragged_rows():
    from soccerplayershapepose_tpu.parallel.mesh import make_mesh
    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 CPU devices for a data axis of 2")
    mesh = make_mesh(devices[:2])
    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    rotmats, betas, cam, j2d = _make_target(assets, rng, 3)  # 3 % 2 != 0
    init = _perturbed_init(rotmats, betas, cam, rng)
    fit_cfg = FitConfig(iters=2, use_silhouette=False,
                        silhouette_metrics=False)
    with pytest.raises(ValueError, match="multiple of the data axis"):
        single_view_fit(assets, init, jnp.zeros((3, 512, 512)), j2d,
                        fit_cfg, mesh=mesh)


def test_multi_view_fit_with_mesh_matches_unsharded():
    """The grouped (views-per-player) fit path under a data mesh must agree
    with the unsharded run — the rows axis (B·V) AND the groups axis (B)
    both shard over `data`."""
    from soccerplayershapepose_tpu.parallel.mesh import make_mesh
    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 CPU devices")
    mesh = make_mesh(devices[:2])
    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    b, v = 2 * mesh.shape["data"], 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b * v)
    init = MultiViewInit(
        body_pose=rotmats[:, 1:].reshape(b, v, 23, 3, 3),
        global_orient=rotmats[:, :1].reshape(b, v, 1, 3, 3),
        betas=betas.reshape(b, v, 10),
        cam_wp=cam.reshape(b, v, 3))
    sils = jnp.zeros((b, v, 512, 512))
    j2d_v = j2d.reshape(b, v, 17, j2d.shape[-1])
    fit_cfg = FitConfig(iters=4, use_silhouette=False,
                        silhouette_metrics=False, iters_per_call=2)
    res_m = multi_view_fit(assets, init, sils, j2d_v, fit_cfg,
                           rounds=1, iters_per_phase=4, mesh=mesh)
    res_p = multi_view_fit(assets, init, sils, j2d_v, fit_cfg,
                           rounds=1, iters_per_phase=4)
    np.testing.assert_allclose(np.asarray(res_m.betas),
                               np.asarray(res_p.betas),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_m.joint_err),
                               np.asarray(res_p.joint_err),
                               rtol=1e-4, atol=1e-4)


def test_conf_weighting_ignores_zero_score_joints():
    """A corrupted joint with score 0 must not pull the fit; with score 1
    and no weighting it does (FitConfig.joint_conf_weighting)."""
    assets = synthesize_assets()
    rng = np.random.RandomState(3)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)
    # corrupt one joint far away
    j2d_bad = np.asarray(j2d).copy()
    j2d_bad[:, 5] += 300.0
    scores = np.ones((b, 17, 1), np.float32)
    scores[:, 5] = 0.0
    targets = jnp.asarray(np.concatenate([j2d_bad, scores], -1),
                          jnp.float32)

    sil = jnp.zeros((b, 512, 512))
    base = dict(iters=12, lr=0.01, use_silhouette=False,
                silhouette_metrics=False)
    res_w = single_view_fit(assets, init, sil, targets,
                            FitConfig(joint_conf_weighting=True, **base))
    res_u = single_view_fit(assets, init, sil, targets,
                            FitConfig(joint_conf_weighting=False, **base))

    # err metric is against targets incl. the bad joint; compare against
    # the CLEAN joints instead: weighted fit should track them better.
    def clean_err(res):
        out = smpl_forward(assets, res.betas, res.body_pose,
                           res.global_orient)
        p = orthographic_project(out.joints, res.cam_wp)
        p = undo_keypoint_normalisation(
            p[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], 512)
        good = [j for j in range(17) if j != 5]
        return float(jnp.linalg.norm(
            p[:, good] - j2d[:, good], axis=-1).mean())

    assert clean_err(res_w) < clean_err(res_u)


def test_betas_prior_shrinks_shape_drift():
    assets = synthesize_assets()
    rng = np.random.RandomState(4)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)
    sil = jnp.zeros((b, 512, 512))
    base = dict(iters=10, lr=0.02, use_silhouette=False,
                silhouette_metrics=False)
    res_p = single_view_fit(assets, init, sil, j2d,
                            FitConfig(betas_prior=1.0, **base))
    res_0 = single_view_fit(assets, init, sil, j2d, FitConfig(**base))
    # Strong prior keeps ||betas|| smaller than the unregularized fit.
    assert float(jnp.sum(res_p.betas ** 2)) \
        < float(jnp.sum(res_0.betas ** 2))


def test_ortho_prior_reduces_rotmat_shear():
    assets = synthesize_assets()
    rng = np.random.RandomState(5)
    b = 2
    rotmats, betas, cam, j2d = _make_target(assets, rng, b)
    init = _perturbed_init(rotmats, betas, cam, rng)
    sil = jnp.zeros((b, 512, 512))
    base = dict(iters=15, lr=0.05, use_silhouette=False,
                silhouette_metrics=False)

    def shear(res):
        r = jnp.concatenate([res.global_orient, res.body_pose], 1)
        rtr = jnp.einsum("bjki,bjkl->bjil", r, r)
        return float(jnp.sum((rtr - jnp.eye(3)) ** 2))

    res_o = single_view_fit(assets, init, sil, j2d,
                            FitConfig(rot_ortho_prior=10.0, **base))
    res_0 = single_view_fit(assets, init, sil, j2d, FitConfig(**base))
    assert shear(res_o) < shear(res_0)


def _silh_fixture(wh=64):
    """GT-rendered silhouette + joints with a perturbed init, at a tiny
    resolution so the full silhouette loss path runs fast on CPU."""
    from soccerplayershapepose_tpu.render.softras import render_silhouette
    from soccerplayershapepose_tpu.ops.camera import (
        weak_perspective_to_translation)
    assets = synthesize_assets()
    rng = np.random.RandomState(7)
    b = 2
    rotmats, betas, cam, _ = _make_target(assets, rng, b)
    out = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
    j2d = orthographic_project(out.joints, cam)
    j2d = undo_keypoint_normalisation(
        j2d[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], wh)
    tr = weak_perspective_to_translation(cam, cfg.FOCAL_LENGTH, wh)
    sil = (render_silhouette(out.vertices, tr, assets.faces, wh,
                             cfg.FOCAL_LENGTH, render_wh=wh,
                             use_pallas=False) > 0.5).astype(jnp.float32)
    init = _perturbed_init(rotmats, betas, cam, rng)
    scores = np.linspace(0.1, 0.95, 17, dtype=np.float32)
    j2d3 = jnp.concatenate(
        [j2d, jnp.tile(jnp.asarray(scores)[None, :, None], (b, 1, 1))], -1)
    return assets, init, sil, j2d3, wh


def test_priors_not_flushed_under_silhouette_loss():
    """Regression (r4): with the reference-parity 1e6-weighted pixel-SUM
    silhouette loss (total ~1e9), ABSOLUTE prior weights flushed below f32
    update resolution — betas_prior=1e-3 produced bit-identical 100-iter
    GT-3D cells. The relative (|total|-anchored) priors must actually move
    the trajectory at small nominal weights."""
    assets, init, sil, j2d3, wh = _silh_fixture()
    base = dict(iters=6, lr=0.01, proxy_wh=wh, render_wh=wh,
                use_pallas=False)
    res_0 = single_view_fit(assets, init, sil, j2d3, FitConfig(**base))
    res_b = single_view_fit(assets, init, sil, j2d3,
                            FitConfig(betas_prior=0.05, **base))
    assert float(jnp.sum(res_b.betas ** 2)) < float(jnp.sum(res_0.betas ** 2))


def test_joints2d_scale_gives_joint_evidence_traction():
    """Regression (r4): at reference weights the joints2D term (~O(1)) is
    numerically dead next to the 1e6-weighted silhouette sum — conf
    weighting was bit-identical to base. joints2d_scale rebalances; with it
    the trajectory must (a) differ from base and (b) make conf weighting
    itself have an effect."""
    assets, init, sil, j2d3, wh = _silh_fixture()
    base = dict(iters=6, lr=0.01, proxy_wh=wh, render_wh=wh,
                use_pallas=False)

    def sig(res):
        return (np.asarray(res.betas), np.asarray(res.cam_wp))

    res_0 = single_view_fit(assets, init, sil, j2d3, FitConfig(**base))
    res_j = single_view_fit(assets, init, sil, j2d3,
                            FitConfig(joints2d_scale=1e6, **base))
    assert any(not np.array_equal(a, b) for a, b in zip(sig(res_0),
                                                        sig(res_j)))
    res_jc = single_view_fit(
        assets, init, sil, j2d3,
        FitConfig(joints2d_scale=1e6, joint_conf_weighting=True, **base))
    assert any(not np.array_equal(a, b) for a, b in zip(sig(res_j),
                                                        sig(res_jc)))
