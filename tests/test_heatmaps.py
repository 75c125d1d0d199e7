"""Parity tests for Gaussian heatmap synthesis against a direct numpy
re-statement of the reference algorithm (label_conversions.py:90-127)."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.ops import joints2d_to_gaussian_heatmaps


def _np_reference_heatmaps(joints2d, img_wh, std=4):
    """Loop-based reference semantics: truncate-to-int centres, linspace
    Gaussian window, end-exclusive paste clipped at img_wh-1."""
    j = np.trunc(joints2d).astype(np.int64)
    b, n = j.shape[:2]
    out = np.zeros((b, n, img_wh, img_wh), dtype=np.float32)
    size = 2 * std
    xs, ys = np.meshgrid(np.linspace(-size, size, 2 * size),
                         np.linspace(-size, size, 2 * size))
    g = np.exp(-(np.sqrt(xs * xs + ys * ys) ** 2) / (2.0 * std ** 2))
    for i in range(b):
        for k in range(n):
            c = j[i, k]
            if np.all(c > -size) and np.all(c < img_wh - 1 + size):
                hs_x = max(0, c[0] - size)
                he_x = min(img_wh - 1, c[0] + size)
                hs_y = max(0, c[1] - size)
                he_y = min(img_wh - 1, c[1] + size)
                gs_x = max(0, size - c[0])
                ge_x = min(2 * size, 2 * size - (size + c[0] - (img_wh - 1)))
                gs_y = max(0, size - c[1])
                ge_y = min(2 * size, 2 * size - (size + c[1] - (img_wh - 1)))
                out[i, k, hs_y:he_y, hs_x:he_x] = g[gs_y:ge_y, gs_x:ge_x]
    return out


def test_heatmaps_match_reference_interior():
    rng = np.random.RandomState(0)
    j = rng.uniform(20, 200, (2, 17, 2)).astype(np.float32)
    got = np.asarray(joints2d_to_gaussian_heatmaps(jnp.asarray(j), 256))
    want = _np_reference_heatmaps(j, 256)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_heatmaps_match_reference_boundaries():
    # Centres straddling every clipping case, incl. negative and out-of-range.
    j = np.array([[[-7.0, 5.0], [0.0, 0.0], [255.0, 255.0], [250.0, 3.0],
                   [-9.0, 10.0], [300.0, 10.0], [10.0, 262.0], [262.9, -7.9]]],
                 dtype=np.float32)
    got = np.asarray(joints2d_to_gaussian_heatmaps(jnp.asarray(j), 256))
    want = _np_reference_heatmaps(j, 256)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_heatmaps_peak_location():
    j = np.array([[[100.0, 50.0]]], dtype=np.float32)
    hm = np.asarray(joints2d_to_gaussian_heatmaps(jnp.asarray(j), 256))[0, 0]
    # linspace window has no exact-zero sample; peak sits adjacent to centre.
    y, x = np.unravel_index(hm.argmax(), hm.shape)
    assert abs(x - 100) <= 1 and abs(y - 50) <= 1
    assert hm.max() > 0.98


def test_heatmaps_last_row_col_never_written():
    j = np.array([[[255.0, 255.0]]], dtype=np.float32)
    hm = np.asarray(joints2d_to_gaussian_heatmaps(jnp.asarray(j), 256))[0, 0]
    assert hm[:, 255].max() == 0.0 and hm[255, :].max() == 0.0
    assert hm.max() > 0.0  # but the window interior is written


def test_heatmaps_nhwc_matches_nchw_transposed():
    from soccerplayershapepose_tpu.ops.heatmaps import (
        joints2d_to_gaussian_heatmaps_nhwc)
    rng = np.random.RandomState(3)
    # Interior + every boundary clipping case from the tests above.
    j = np.concatenate([
        rng.uniform(20, 200, (2, 8, 2)),
        np.array([[[-7.0, 5.0], [0.0, 0.0], [255.0, 255.0], [250.0, 3.0],
                   [-9.0, 10.0], [300.0, 10.0], [10.0, 262.0], [262.9, -7.9]],
                  [[1.0, 254.0], [254.0, 1.0], [-8.9, -8.9], [263.9, 263.9],
                   [128.0, 128.0], [0.5, 255.5], [199.2, 0.2], [77.0, 201.0]]]),
    ], axis=1).astype(np.float32)
    nchw = np.asarray(joints2d_to_gaussian_heatmaps(jnp.asarray(j), 256))
    nhwc = np.asarray(joints2d_to_gaussian_heatmaps_nhwc(jnp.asarray(j), 256))
    assert nhwc.shape == (2, 256, 256, 16)
    np.testing.assert_array_equal(nhwc, np.moveaxis(nchw, 1, -1))


def test_heatmaps_nhwc_bf16_equals_cast_f32():
    from soccerplayershapepose_tpu.ops.heatmaps import (
        joints2d_to_gaussian_heatmaps_nhwc)
    rng = np.random.RandomState(4)
    j = rng.uniform(-12, 268, (3, 17, 2)).astype(np.float32)
    f32 = joints2d_to_gaussian_heatmaps_nhwc(jnp.asarray(j), 256)
    b16 = joints2d_to_gaussian_heatmaps_nhwc(jnp.asarray(j), 256,
                                             dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(b16.astype(jnp.float32)),
                                  np.asarray(f32.astype(jnp.bfloat16)
                                             .astype(jnp.float32)))
