"""End-to-end folder-tree stage driver test on a tiny synthetic dataset:
predict → single-view → multi-view → broad-view, checking the on-disk wire
protocol at each step (joints-only fitting: silhouette rendering is too slow
for the CPU test host; the render path is covered by test_render/test_fit)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.drivers import (
    predict_stage, single_view_optimization, multi_view_optimization,
    broad_view_optimization, calc_initial_metrics)
from soccerplayershapepose_tpu.fit import FitConfig
from soccerplayershapepose_tpu.io import (
    read_fit_npz, read_multiview_npz, read_metrics, write_joints2d)
from soccerplayershapepose_tpu.pipeline.predict import build_predictor
from soccerplayershapepose_tpu.smpl import synthesize_assets


def _make_dataset(tmp_path, n_players=2, n_views=2):
    rng = np.random.RandomState(0)
    image_root = str(tmp_path / "PlayerCrop")
    proxy_root = str(tmp_path / "PlayerProxy")
    for player in range(2, 2 + n_players):
        img_dir = os.path.join(image_root, "g1", "s1", str(player))
        prx_dir = os.path.join(proxy_root, "g1", "s1", str(player))
        os.makedirs(img_dir)
        os.makedirs(prx_dir)
        for v in range(1, 1 + n_views):
            open(os.path.join(img_dir, f"view_{v}.png"), "wb").close()
            np.save(os.path.join(prx_dir, f"view_{v}_sil.npy"),
                    (rng.rand(512, 512) > 0.9).astype(np.uint8))
            write_joints2d(os.path.join(prx_dir, f"view_{v}_j2d.xml"),
                           np.concatenate([rng.uniform(100, 400, (17, 2)),
                                           np.ones((17, 1))], axis=1))
    return image_root, proxy_root


@pytest.mark.slow
def test_stage_pipeline_end_to_end(tmp_path):
    assets = synthesize_assets()
    image_root, proxy_root = _make_dataset(tmp_path)
    _, params, fn = build_predictor()

    fast = FitConfig(iters=2, use_silhouette=False, silhouette_metrics=False)

    # predict stage
    pred_root = str(tmp_path / "PlayerRecon")
    n = predict_stage(assets, proxy_root, image_root, pred_root,
                      params=params, regressor_fn=fn, batch_size=4)
    assert n == 4
    d = read_fit_npz(os.path.join(pred_root, "g1", "s1", "2", "view_1.npz"))
    assert d["body_pose"].shape == (1, 23, 3, 3)

    # single view
    sv_root = str(tmp_path / "PlayerSingleViewOpt")
    out = single_view_optimization(assets, image_root, proxy_root, sv_root,
                                   params=params, regressor_fn=fn,
                                   fit_cfg=fast, batch_size=4, verbose=False,
                                   ignore_first=False)
    assert out["count"] == 4
    d = read_fit_npz(os.path.join(sv_root, "g1", "s1", "2", "view_2.npz"))
    assert d["translation"].shape == (1, 3)

    # multi view
    mv_root = str(tmp_path / "PlayerMultiViewOpt")
    out = multi_view_optimization(assets, image_root, proxy_root, sv_root,
                                  mv_root, fit_cfg=fast, batch_size=2,
                                  ignore_first=False, verbose=False)
    assert out["count"] == 2
    mv = read_multiview_npz(os.path.join(mv_root, "g1", "s1", "2"))
    assert set(mv["views"]) == {"view_1", "view_2"}
    assert os.path.exists(os.path.join(mv_root, "g1", "s1", "2", "metrics.xml"))

    # broad view (reuse the per-view crops as fake broadcast crops)
    bv_root = str(tmp_path / "PlayerBroadViewOpt")
    out = broad_view_optimization(assets, image_root, proxy_root, mv_root,
                                  bv_root, params=params, regressor_fn=fn,
                                  fit_cfg=fast, batch_size=4, verbose=False)
    assert out["count"] == 4
    iou, err = read_metrics(os.path.join(bv_root, "g1", "s1", "2",
                                         "metrics.xml"))
    assert np.isfinite(err)
    # broad pose must equal the multi-view shared pose (frozen transfer)
    bd = read_fit_npz(os.path.join(bv_root, "g1", "s1", "2", "data.npz"))
    np.testing.assert_allclose(bd["body_pose"][0], mv["body_pose"][0],
                               atol=1e-6)

    # initial metrics over the single-view results
    m = calc_initial_metrics(assets, image_root, proxy_root, sv_root,
                             fit_cfg=fast, batch_size=4)
    assert m["count"] == 4
    assert np.isfinite(m["joint_err"])


@pytest.mark.slow
def test_single_view_vis_output(tmp_path):
    """vis_folder writes decodable best-iterate overlay PNGs."""
    from soccerplayershapepose_tpu.pipeline.densepose import decode_png
    assets = synthesize_assets()
    image_root, proxy_root = _make_dataset(tmp_path, n_players=1, n_views=1)
    _, params, fn = build_predictor()
    out = single_view_optimization(
        assets, image_root, proxy_root, str(tmp_path / "SV"),
        params=params, regressor_fn=fn,
        fit_cfg=FitConfig(iters=2, use_silhouette=False,
                          silhouette_metrics=False, render_wh=128),
        batch_size=2, ignore_first=False, verbose=False,
        vis_folder=str(tmp_path / "SVVis"))
    assert out["count"] == 1
    png = (tmp_path / "SVVis" / "g1" / "s1" / "2" / "view_1_1.png").read_bytes()
    img = decode_png(png)
    assert img.shape == (512, 512, 3)
