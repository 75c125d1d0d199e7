"""Tests for the proxy builder and the batched predict slice."""

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.ops import joints2d_to_gaussian_heatmaps
from soccerplayershapepose_tpu.pipeline import (
    create_proxy_representation, resize_nearest, build_predictor)
from soccerplayershapepose_tpu.smpl import synthesize_assets


def test_resize_nearest_downscale():
    img = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(resize_nearest(img, 2))
    # floor(dst * 2) sampling: rows/cols 0,2
    np.testing.assert_array_equal(out, [[0, 2], [8, 10]])


def test_resize_nearest_strided_matches_gather():
    # The integer-downscale fast path (strided slice) must be bit-identical
    # to the general floor(dst·in/out) gather it replaces.
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 512, 512).astype(np.float32))
    fast = np.asarray(resize_nearest(img, 256))
    ys = (np.arange(256) * 2.0).astype(np.int32)
    np.testing.assert_array_equal(fast, np.asarray(img)[:, ys[:, None],
                                                        ys[None, :]])
    # non-integer ratio still uses the gather path
    odd = np.asarray(resize_nearest(img, 100))
    ys = (np.arange(100) * 5.12).astype(np.int32)
    np.testing.assert_array_equal(odd, np.asarray(img)[:, ys[:, None],
                                                       ys[None, :]])


def test_proxy_representation_layout():
    rng = np.random.RandomState(0)
    sil = (rng.rand(2, 512, 512) > 0.5).astype(np.float32)
    j2d = rng.uniform(50, 450, (2, 17, 3)).astype(np.float32)

    proxy = np.asarray(create_proxy_representation(
        jnp.asarray(sil), jnp.asarray(j2d)))
    assert proxy.shape == (2, 256, 256, 18)

    # channel 0 = nearest-resized silhouette
    np.testing.assert_array_equal(proxy[..., 0], sil[:, ::2, ::2])

    # channels 1..17 = heatmaps of scaled+truncated joints
    want = np.asarray(joints2d_to_gaussian_heatmaps(
        jnp.trunc(jnp.asarray(j2d[..., :2]) * 0.5), 256))
    np.testing.assert_allclose(proxy[..., 1:], np.moveaxis(want, 1, -1),
                               atol=1e-6)


def test_proxy_iuv_variants():
    rng = np.random.RandomState(1)
    sil = (rng.rand(1, 512, 512) > 0.5).astype(np.float32)
    j2d = rng.uniform(50, 450, (1, 17, 2)).astype(np.float32)
    iuv = rng.rand(1, 512, 512, 3).astype(np.float32)
    p21 = create_proxy_representation(jnp.asarray(sil), jnp.asarray(j2d),
                                      iuv=jnp.asarray(iuv))
    assert p21.shape == (1, 256, 256, 21)
    p20 = create_proxy_representation(jnp.asarray(sil), jnp.asarray(j2d),
                                      iuv=jnp.asarray(iuv),
                                      include_silhouette=False)
    assert p20.shape == (1, 256, 256, 20)
    np.testing.assert_array_equal(np.asarray(p21[..., -3:]),
                                  np.asarray(p20[..., -3:]))


@pytest.mark.slow
def test_predict_slice_end_to_end():
    assets = synthesize_assets()
    _, params, fn = build_predictor(in_channels=18, resnet_layers=18)
    rng = np.random.RandomState(0)
    b = 2
    sil = jnp.asarray((rng.rand(b, 512, 512) > 0.8).astype(np.float32))
    j2d = jnp.asarray(rng.uniform(64, 448, (b, 17, 2)).astype(np.float32))
    out = fn(params, assets, sil, j2d)
    assert out.vertices.shape == (b, cfg.NUM_VERTS, 3)
    assert out.joints.shape == (b, cfg.NUM_ALL_JOINTS, 3)
    assert out.joints2d_kprcnn.shape == (b, 17, 2)
    assert out.pose_rotmats.shape == (b, 24, 3, 3)
    for leaf in out:
        assert bool(jnp.isfinite(leaf).all()), "non-finite output"
    # rotmats valid
    r = np.asarray(out.pose_rotmats).reshape(-1, 3, 3)
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    # translation consistent with cam
    tz = np.asarray(out.translation[:, 2])
    s = np.asarray(out.cam_wp[:, 0])
    np.testing.assert_allclose(tz, 2 * cfg.FOCAL_LENGTH / (512 * s + 1e-9),
                               rtol=1e-5)
