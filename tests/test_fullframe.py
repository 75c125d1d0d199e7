"""Full-frame pipeline (BASELINE config 3) — one jitted program from frames
to per-player SMPL meshes. Structural test with tiny nets; the throughput
number lives in bench.py (frame mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soccerplayershapepose_tpu.models.detector import PlayerDetector
from soccerplayershapepose_tpu.models.perception import ProxyNet
from soccerplayershapepose_tpu.pipeline.fullframe import (
    build_frame_pipeline, _square_boxes)
from soccerplayershapepose_tpu.pipeline.predict import build_predictor
from soccerplayershapepose_tpu.smpl import load_assets


def test_square_boxes():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 80.0]])
    sq = np.asarray(_square_boxes(boxes, border=5.0))[0]
    assert sq[2] - sq[0] == pytest.approx(70.0)   # max side 60 + 2*5
    assert sq[3] - sq[1] == pytest.approx(70.0)
    assert (sq[0] + sq[2]) / 2 == pytest.approx(20.0)    # center kept
    assert (sq[1] + sq[3]) / 2 == pytest.approx(50.0)


@pytest.mark.slow
def test_frame_pipeline_shapes():
    assets = load_assets()
    k = 3
    detector = PlayerDetector(channels=16)
    det_vars = detector.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 96, 3)))
    proxynet = ProxyNet(with_iuv=False, channels=16)
    proxy_vars = proxynet.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 64, 64, 3)))
    regressor, reg_params, _ = build_predictor(in_channels=18)

    fn = build_frame_pipeline(detector, det_vars, proxynet, proxy_vars,
                              regressor, reg_params, max_players=k,
                              crop_wh=64)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 96, 3), jnp.float32)
    out = fn(assets, frames)
    assert out.vertices.shape == (2, k, 6890, 3)
    assert out.joints2d.shape == (2, k, 17, 2)
    assert out.pose_rotmats.shape == (2, k, 24, 3, 3)
    assert out.betas.shape == (2, k, 10)
    assert out.boxes.shape == (2, k, 4)
    assert out.scores.shape == (2, k)
    assert out.valid.dtype == jnp.bool_
    assert np.isfinite(np.asarray(out.vertices)).all()
