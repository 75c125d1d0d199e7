"""Baseline (HMR/SPIN/PARE) harness tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu.drivers.baselines import (
    load_baseline_prediction, evaluate_baseline_2d, evaluate_baseline_cross,
    multi_view_optimization_multi, calc_result)
from soccerplayershapepose_tpu.fit import FitConfig
from soccerplayershapepose_tpu.ops import batch_rodrigues
from soccerplayershapepose_tpu.smpl import synthesize_assets


def _predictions(rng, n):
    out = []
    for _ in range(n):
        aa = rng.randn(1, 24, 3).astype(np.float32) * 0.2
        out.append({
            "pose_rotmats": np.asarray(batch_rodrigues(jnp.asarray(aa))),
            "betas": rng.randn(1, 10).astype(np.float32) * 0.3,
            "cam_wp": np.array([[0.9, 0.0, 0.0]], np.float32),
        })
    return out


def test_load_baseline_formats(tmp_path):
    hmr = str(tmp_path / "p.npy")
    np.save(hmr, np.concatenate(
        [[0.9, 0, 0], np.zeros(72), np.zeros(10)]).reshape(1, 85))
    d = load_baseline_prediction(hmr)
    assert d["pose_rotmats"].shape == (1, 24, 3, 3)
    # zero axis-angle → identity rotations
    np.testing.assert_allclose(d["pose_rotmats"][0, 0], np.eye(3), atol=1e-6)

    spin = str(tmp_path / "p.npz")
    np.savez(spin, pred_rotmat=np.tile(np.eye(3), (1, 24, 1, 1)),
             pred_betas=np.zeros((1, 10)), pred_camera=np.zeros((1, 3)))
    d = load_baseline_prediction(spin)
    assert d["cam_wp"].shape == (1, 3)


@pytest.mark.slow
def test_evaluate_and_multiview_variants(tmp_path):
    assets = synthesize_assets()
    rng = np.random.RandomState(0)
    n, v = 2, 2
    preds = _predictions(rng, n)
    sils = np.zeros((n, 512, 512), np.float32)
    j2d = rng.uniform(100, 400, (n, 17, 2)).astype(np.float32)
    fast = FitConfig(iters=3, lr=0.01, use_silhouette=False,
                     silhouette_metrics=False)

    out = evaluate_baseline_2d(assets, preds, sils, j2d, fit_cfg=fast)
    assert np.all(out["opt_err"] <= out["init_err"])

    out_noopt = evaluate_baseline_2d(assets, preds, sils, j2d, fit_cfg=fast,
                                     optimize=False)
    np.testing.assert_allclose(out_noopt["init_err"], out_noopt["opt_err"])

    # cross/multi-view variants
    sils_v = np.zeros((n, v, 512, 512), np.float32)
    j2d_v = rng.uniform(100, 400, (n, v, 17, 2)).astype(np.float32)
    cross = evaluate_baseline_cross(assets, preds, sils_v, j2d_v,
                                    fit_view=0, eval_view=1, n_views=v,
                                    fit_cfg=fast)
    assert cross["joint_err"].shape == (n,)

    mv = multi_view_optimization_multi(assets, preds, sils_v, j2d_v,
                                       single_view_init=False, fit_cfg=fast,
                                       rounds=1, iters_per_phase=2)
    assert mv["result"].body_pose.shape == (n, 23, 3, 3)

    # calc_result aggregation
    import os
    from soccerplayershapepose_tpu.io import write_metrics
    d = tmp_path / "g1" / "s1" / "2"
    os.makedirs(d)
    write_metrics(str(d / "metrics.xml"), 0.5, 8.0)
    iou, err, count = calc_result(str(tmp_path))
    assert (iou, err, count) == (0.5, 8.0, 1)
