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
