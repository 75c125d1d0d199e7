"""Pallas rasterizer vs the XLA oracle (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu.render import soft_silhouette
from soccerplayershapepose_tpu.render.pallas_raster import soft_silhouette_pallas


def test_pallas_matches_xla_simple():
    verts = np.array([[[10.5, 12.25], [40.0, 14.0], [25.0, 45.5],
                       [50.2, 50.0], [60.0, 52.0], [55.0, 62.0]]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    a = np.asarray(soft_silhouette_pallas(jnp.asarray(verts),
                                          jnp.asarray(faces), 64, sigma=1e-4,
                                          band_h=16, chunk=8, interpret=True))
    b = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64,
                                   sigma=1e-4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_band_skip_margin_is_safe():
    """A soft blob near a band boundary: the skip margin must not clip its
    sigmoid tail (large sigma stresses the support radius)."""
    verts = np.array([[[20.0, 15.5], [44.0, 16.5], [32.0, 17.5]]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    a = np.asarray(soft_silhouette_pallas(jnp.asarray(verts),
                                          jnp.asarray(faces), 64, sigma=3e-3,
                                          band_h=16, chunk=8, interpret=True))
    b = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64,
                                   sigma=3e-3))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_pallas_matches_xla_smpl_mesh():
    from soccerplayershapepose_tpu.smpl import synthesize_assets
    assets = synthesize_assets()
    v = np.asarray(assets.v_template)[None]
    v2d = jnp.asarray((v[..., :2] * 28 / np.abs(v[..., :2]).max() + 32)
                      .astype(np.float32))
    a = np.asarray(soft_silhouette_pallas(v2d, assets.faces, 64, sigma=1e-5,
                                          band_h=16, chunk=32, interpret=True))
    b = np.asarray(soft_silhouette(v2d, assets.faces, 64, sigma=1e-5))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert 0.1 < (a > 0.5).mean() < 0.5


def test_pallas_backward_matches_xla_grad():
    import jax
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.array([[[12.3, 14.1], [42.7, 16.2], [28.9, 44.8],
                                   [30.1, 20.5], [55.0, 30.0], [40.0, 55.0]]],
                                 np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    gw = jnp.asarray(rng.randn(1, 64, 64).astype(np.float32))

    from soccerplayershapepose_tpu.render.pallas_raster import (
        soft_silhouette_fast)
    gp = jax.grad(lambda v: jnp.sum(
        soft_silhouette_fast(v, faces, 64, 1e-4, 16, 8, True) * gw))(verts)
    gx = jax.grad(lambda v: jnp.sum(
        soft_silhouette(v, faces, 64, sigma=1e-4) * gw))(verts)
    rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
    assert rel < 1e-3, rel
