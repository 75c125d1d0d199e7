"""Soft rasterizer correctness tests (analytic fixtures)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu.render import (
    soft_silhouette, hard_silhouette, render_silhouette)
from soccerplayershapepose_tpu.render.softras import cull_backfaces


def _square_mesh(lo, hi):
    """Two triangles covering the axis-aligned square [lo, hi]²."""
    verts = np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts[None], faces


def test_hard_silhouette_square_coverage():
    verts, faces = _square_mesh(16.25, 47.75)
    sil = np.asarray(hard_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64))
    # pixels with center strictly inside [16.25, 47.75]²: 17..47 inclusive
    assert sil.shape == (1, 64, 64)
    inside = sil[0][17:48, 17:48]
    assert inside.min() == 1.0
    assert sil[0][:16, :].max() == 0.0 and sil[0][:, :16].max() == 0.0
    assert sil[0][49:, :].max() == 0.0 and sil[0][:, 49:].max() == 0.0


def test_soft_silhouette_matches_hard_at_small_sigma():
    # non-integer corners: no pixel center lies exactly on an edge (boundary
    # pixels are genuinely ambiguous between soft-0.5 and hard semantics)
    verts, faces = _square_mesh(16.25, 47.75)
    soft = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces),
                                      64, sigma=1e-7))
    hard = np.asarray(hard_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64))
    # thresholded soft == hard except possibly the one-pixel boundary ring
    agree = (soft > 0.5) == (hard > 0.5)
    assert agree.mean() > 0.995


def test_soft_silhouette_winding_invariance():
    verts, faces = _square_mesh(10.0, 30.0)
    flipped = faces[:, ::-1].copy()
    a = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64))
    b = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(flipped), 64))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_soft_silhouette_gradients_move_boundary():
    """Gradient of coverage w.r.t. vertices: growing the square increases
    total coverage, so d(sum)/d(hi-corner coords) must be positive."""
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))

    def coverage(hi):
        verts = jnp.stack([
            jnp.stack([jnp.full((), 16.0), jnp.full((), 16.0)]),
            jnp.stack([hi, jnp.full((), 16.0)]),
            jnp.stack([hi, hi]),
            jnp.stack([jnp.full((), 16.0), hi]),
        ])[None]
        return jnp.sum(soft_silhouette(verts, faces, 64, sigma=1e-4))

    g = float(jax.grad(coverage)(jnp.asarray(40.0)))
    assert np.isfinite(g) and g > 0, g


def test_degenerate_faces_are_harmless():
    verts = jnp.asarray(np.array([[[10.0, 10.0], [30.0, 10.0], [20.0, 30.0]]],
                                 np.float32))
    tri = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    with_degen = jnp.asarray(np.array([[0, 1, 2], [0, 0, 0], [1, 1, 1]], np.int32))
    a = np.asarray(soft_silhouette(verts, tri, 64, sigma=1e-6))
    b = np.asarray(soft_silhouette(verts, with_degen, 64, sigma=1e-6))
    # degenerate faces contribute only a hairline along themselves; coverage
    # away from the vertices is unchanged
    assert np.abs(a - b).mean() < 1e-3


@pytest.mark.slow
def test_render_silhouette_smpl_mesh():
    from soccerplayershapepose_tpu.smpl import synthesize_assets, smpl_forward
    from soccerplayershapepose_tpu import config as cfg

    assets = synthesize_assets()
    eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
    out = smpl_forward(assets, jnp.zeros((1, 10)), eye[:, 1:], eye[:, :1])
    t = jnp.array([[0.0, 0.0, 2 * cfg.FOCAL_LENGTH / (512 * 0.9)]])
    sil = render_silhouette(out.vertices, t, assets.faces, 512,
                            cfg.FOCAL_LENGTH, sigma=1e-6, render_wh=128)
    sil = np.asarray(sil)
    assert sil.shape == (1, 128, 128)
    frac = (sil > 0.5).mean()
    # body blob roughly centred, covering a plausible fraction of the crop
    assert 0.05 < frac < 0.8, frac
    ys, xs = np.nonzero(sil[0] > 0.5)
    assert abs(xs.mean() - 64) < 15 and abs(ys.mean() - 64) < 15


def test_backface_cull_preserves_silhouette():
    """Closed-mesh silhouette is unchanged when back faces are dropped."""
    from soccerplayershapepose_tpu.smpl import synthesize_assets
    assets = synthesize_assets()
    verts = np.asarray(assets.v_template)[None]
    # orthographic-ish projection to a 64px frame
    v2d = jnp.asarray((verts[..., :2] * 28 / np.abs(verts[..., :2]).max()
                       + 32).astype(np.float32))
    full = np.asarray(soft_silhouette(v2d, assets.faces, 64, sigma=1e-6))
    culled_faces = cull_backfaces(v2d, assets.faces, keep_fraction=0.6)
    assert culled_faces.shape == (1, int(13776 * 0.6), 3)
    culled = np.asarray(soft_silhouette(v2d, culled_faces, 64, sigma=1e-6))
    agree = (full > 0.5) == (culled > 0.5)
    assert agree.mean() > 0.995, agree.mean()
