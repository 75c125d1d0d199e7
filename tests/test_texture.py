"""Texture subsystem tests (IUV → atlas scatter, fusion, atlas⇄normal)."""

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu.texture import (
    iuv_to_atlas_texture, fuse_atlas_textures, concat_atlas, split_atlas,
    atlas_to_normal, normal_to_atlas, sample_uv_texture)


def test_iuv_scatter_basic():
    img = np.zeros((8, 8, 3), np.float32)
    img[2, 3] = [1.0, 0.5, 0.25]
    iuv = np.zeros((8, 8, 3), np.float32)
    iuv[2, 3] = [5, 0.5, 0.25]           # part 5, U=0.5, V=0.25
    tex, mask = iuv_to_atlas_texture(jnp.asarray(img), jnp.asarray(iuv),
                                     part_res=100)
    tex, mask = np.asarray(tex), np.asarray(mask)
    assert tex.shape == (24, 100, 100, 3) and mask.shape == (24, 100, 100)
    r = round(0.5 * 99)
    c = round(0.25 * 99)
    np.testing.assert_allclose(tex[4, r, c], [1.0, 0.5, 0.25])
    assert mask[4, r, c] == 1.0
    assert mask.sum() == 1.0             # only one texel written


def test_iuv_scatter_averages_collisions():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1, 0, 0]
    img[0, 1] = [0, 1, 0]
    iuv = np.zeros((2, 2, 3), np.float32)
    iuv[0, 0] = [1, 0, 0]
    iuv[0, 1] = [1, 0, 0]                # same texel
    tex, _ = iuv_to_atlas_texture(jnp.asarray(img), jnp.asarray(iuv),
                                  part_res=10)
    np.testing.assert_allclose(np.asarray(tex)[0, 0, 0], [0.5, 0.5, 0.0])


def test_fusion_weighted_by_mask():
    t = np.zeros((2, 24, 10, 10, 3), np.float32)
    m = np.zeros((2, 24, 10, 10), np.float32)
    t[0, 0, 0, 0] = [1, 1, 1]
    m[0, 0, 0, 0] = 1
    t[1, 0, 0, 0] = [0, 0, 0]            # unmasked — must not dilute
    fused, mask = fuse_atlas_textures(jnp.asarray(t), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(fused)[0, 0, 0], [1, 1, 1])
    assert np.asarray(mask)[0, 0, 0] == 1.0
    # both frames valid → average
    m[1, 0, 0, 0] = 1
    fused, _ = fuse_atlas_textures(jnp.asarray(t), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(fused)[0, 0, 0], [0.5, 0.5, 0.5])


def test_atlas_grid_roundtrip():
    rng = np.random.RandomState(0)
    parts = jnp.asarray(rng.rand(24, 16, 16, 3).astype(np.float32))
    sheet = concat_atlas(parts)
    assert sheet.shape == (4 * 16, 6 * 16, 3)
    back = split_atlas(sheet, part_res=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(parts))


def test_atlas_normal_roundtrip_procedural():
    # smooth per-part gradients: the tiling map resamples, so the roundtrip
    # can only be accurate for band-limited content (random texels would be
    # unrecoverable wherever the 60x40 tile undersamples the 50x50 part)
    u = np.linspace(0, 1, 50, dtype=np.float32)
    grad = np.stack(np.meshgrid(u, u, indexing="ij") + (np.outer(u, u),), -1)
    atlas = jnp.asarray(np.stack([grad * (0.3 + 0.02 * i) for i in range(24)]))
    normal = atlas_to_normal(atlas, normal_res=240)
    assert normal.shape == (240, 240, 3)
    back = normal_to_atlas(normal, part_res=50)
    assert float(jnp.abs(back - atlas).mean()) < 0.02


def test_sample_uv_texture_bilinear():
    tex = jnp.asarray(np.arange(16.0).reshape(4, 4, 1))
    # center of texel grid: u=v=0.5 → coordinate 1.5 → average of middle 4
    val = float(sample_uv_texture(tex, jnp.array([[0.5, 0.5]]))[0, 0])
    assert abs(val - np.mean([5, 6, 9, 10])) < 1e-5
    # corners exact
    assert float(sample_uv_texture(tex, jnp.array([[0.0, 0.0]]))[0, 0]) == 0.0
    assert float(sample_uv_texture(tex, jnp.array([[1.0, 1.0]]))[0, 0]) == 15.0
