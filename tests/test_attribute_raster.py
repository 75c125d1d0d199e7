"""Z-buffered attribute rasterization tests."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.render.attribute import (
    rasterize_attributes, render_part_segmentation, render_textured)

VERTS = np.array([[[10, 10], [50, 10], [30, 50],
                   [10, 12], [50, 12], [30, 52]]], np.float32)
FACES = np.array([[0, 1, 2], [3, 4, 5]], np.int32)


def test_zbuffer_picks_nearer_face():
    z = jnp.asarray(np.array([[5, 5, 5, 2, 2, 2]], np.float32))
    attrs = jnp.asarray(np.array(
        [[[1, 0], [1, 0], [1, 0], [0, 1], [0, 1], [0, 1]]], np.float32))
    out, mask = rasterize_attributes(jnp.asarray(VERTS), z, attrs,
                                     jnp.asarray(FACES), 64)
    out, mask = np.asarray(out), np.asarray(mask)
    assert mask[0, 30, 30]
    np.testing.assert_allclose(out[0, 30, 30], [0, 1], atol=1e-6)
    assert not mask[0, 0, 0]


def test_barycentric_interpolation_linear():
    attrs = jnp.asarray(np.array(
        [[[0., 0], [1, 0], [0, 1], [0, 0], [0, 0], [0, 0]]], np.float32))
    out, mask = rasterize_attributes(jnp.asarray(VERTS), jnp.ones((1, 6)),
                                     attrs, jnp.asarray(FACES[:1]), 64)
    out = np.asarray(out)
    # attribute 0 is the barycentric weight of vertex 1 at (50,10): near 1
    # close to that vertex, ~0.5 at the edge midpoint (30,10-ish)
    assert out[0, 11, 48, 0] > 0.9
    assert abs(out[0, 11, 30, 0] - 0.5) < 0.05


def test_part_segmentation_and_textured_render():
    z = jnp.asarray(np.array([[5, 5, 5, 2, 2, 2]], np.float32))
    seg = render_part_segmentation(jnp.asarray(VERTS), z,
                                   jnp.asarray([1, 1, 1, 3, 3, 3]),
                                   jnp.asarray(FACES), 64)
    seg = np.asarray(seg)
    assert seg[0, 30, 30] == 3       # nearer face's part
    assert seg[0, 0, 0] == 0         # background

    tex = jnp.asarray(np.full((16, 16, 3), 0.5, np.float32))
    img, mask = render_textured(jnp.asarray(VERTS), z,
                                jnp.asarray(np.full((6, 2), 0.5, np.float32)),
                                jnp.asarray(FACES), tex, 64)
    img = np.asarray(img)
    np.testing.assert_allclose(img[0, 30, 30], [0.5, 0.5, 0.5], atol=1e-6)
    assert img[0, 0, 0].max() == 0.0


def _random_scene(b=2, n_tri=40, wh=64, seed=0):
    rng = np.random.RandomState(seed)
    v = n_tri * 3
    verts = rng.uniform(-8, wh + 8, (b, v, 2)).astype(np.float32)
    # shrink triangles toward their centroid so most are small + disjoint
    verts = verts.reshape(b, n_tri, 3, 2)
    cen = verts.mean(axis=2, keepdims=True)
    verts = (cen + (verts - cen) * rng.uniform(0.2, 0.9)).reshape(b, v, 2)
    z = rng.uniform(1.0, 9.0, (b, v)).astype(np.float32)
    z = z.reshape(b, n_tri, 3).mean(-1, keepdims=True).repeat(3, -1)
    z = z.reshape(b, v)                 # planar-z faces: interp z == const
    attrs = rng.rand(b, v, 5).astype(np.float32)
    faces = np.arange(v, dtype=np.int32).reshape(n_tri, 3)
    return (jnp.asarray(verts), jnp.asarray(z), jnp.asarray(attrs),
            jnp.asarray(faces))


def test_pallas_zbuffer_matches_oracle_interpret():
    """Banded Pallas z-buffer kernel (interpret mode) vs the XLA scan."""
    from soccerplayershapepose_tpu.render.attribute import \
        rasterize_attributes_xla
    from soccerplayershapepose_tpu.render.pallas_zbuffer import \
        rasterize_attributes_fast

    verts, z, attrs, faces = _random_scene()
    ref, rmask = rasterize_attributes_xla(verts, z, attrs, faces, 64)
    out, mask = rasterize_attributes_fast(verts, z, attrs, faces, 64,
                                          band_h=8, interpret=True)
    ref, rmask = np.asarray(ref), np.asarray(rmask)
    out, mask = np.asarray(out), np.asarray(mask)
    np.testing.assert_array_equal(mask, rmask)
    # Pixels on exactly-shared edges may pick either face; everywhere the
    # winner agrees the interpolation must match to float tolerance.
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_pallas_zbuffer_two_bodies_occlusion_interpret():
    """Nearer of two overlapping faces wins (z-buffer semantics)."""
    from soccerplayershapepose_tpu.render.pallas_zbuffer import \
        rasterize_attributes_fast

    z = jnp.asarray(np.array([[5, 5, 5, 2, 2, 2]], np.float32))
    attrs = jnp.asarray(np.array(
        [[[1, 0], [1, 0], [1, 0], [0, 1], [0, 1], [0, 1]]], np.float32))
    out, mask = rasterize_attributes_fast(
        jnp.asarray(VERTS), z, attrs, jnp.asarray(FACES), 64,
        band_h=8, interpret=True)
    out, mask = np.asarray(out), np.asarray(mask)
    assert mask[0, 30, 30]
    np.testing.assert_allclose(out[0, 30, 30], [0, 1], atol=1e-5)
    assert not mask[0, 0, 0]


def test_pallas_zbuffer_grouped_ranges_interpret(monkeypatch):
    """SMEM-capped grouped chunk bboxes (group > 1) stay exact supersets."""
    import soccerplayershapepose_tpu.render.pallas_zbuffer as Zm
    from soccerplayershapepose_tpu.render.attribute import \
        rasterize_attributes_xla

    verts, z, attrs, faces = _random_scene(b=1, n_tri=60, seed=3)
    ref, rmask = rasterize_attributes_xla(verts, z, attrs, faces, 64)
    monkeypatch.setattr(Zm, "_MAX_SMEM_ENTRIES", 2)   # force group ≈ 4
    out, mask = Zm.rasterize_attributes_fast(verts, z, attrs, faces, 64,
                                             band_h=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(rmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
