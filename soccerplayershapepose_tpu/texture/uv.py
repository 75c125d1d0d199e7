"""UV texture conversion: DensePose IUV → 24-part SMPL atlas → normal UV map.

Role of the reference ``UVTextureConverter``
(``/root/reference/Python/Soccer/PlayerReconstruction/UVTextureConverter/``):

* ``create_smpl_from_images`` (UVConverter.py:134-177): for every pixel of an
  IUV image, scatter its RGB into part texture ``I`` at location (U, V)
  scaled to the per-part resolution (24 parts × 200²) and keep a mask of
  written texels,
* ``create_texture_from_video`` (UVConverter.py:193-207): fuse per-frame
  textures by mask-weighted averaging,
* atlas grid concat/split as a 4×6 tile sheet (UVConverter.py:110-131),
* ``Atlas2Normal`` / ``Normal2Atlas``: precomputed mapping pickles convert
  between the 24-part atlas and the single 512² "normal" SMPL UV map. Those
  binary mappings are missing from the snapshot (.MISSING_LARGE_BLOBS);
  :func:`atlas_to_normal` loads them when provided, else uses a procedural
  tile-packing mapping (each part occupies a 4×6 grid cell of the normal
  map) — structurally identical, byte-parity pending the real assets,
* ``NMRRenderer.render_texture`` (renderers/nmr_renderer.py:125-152) samples
  the normal UV map with grid_sample; :func:`sample_uv_texture` is the jnp
  equivalent (bilinear map_coordinates).

TPU-first: the per-pixel Python loops of the reference become one batched
``scatter-add`` per frame; fusion is a weighted segment mean.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

NUM_PARTS = 24
PART_RES = 200
GRID_ROWS, GRID_COLS = 4, 6


def iuv_to_atlas_texture(image_rgb: jnp.ndarray, iuv: jnp.ndarray,
                         part_res: int = PART_RES
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter an IUV-annotated image into the 24-part atlas texture.

    Args:
      image_rgb: (H, W, 3) float in [0, 1].
      iuv: (H, W, 3) where channel 0 = part index I in [0, 24] (0=background),
        channels 1, 2 = U, V in [0, 1] (or [0, 255] — auto-scaled).

    Returns:
      (texture (24, part_res, part_res, 3), mask (24, part_res, part_res)).
    """
    i_chan = iuv[..., 0]
    u = iuv[..., 1].astype(jnp.float32)
    v = iuv[..., 2].astype(jnp.float32)
    u = jnp.where(u > 1.5, u / 255.0, u)
    v = jnp.where(v > 1.5, v / 255.0, v)

    part = jnp.round(i_chan).astype(jnp.int32)
    valid = part > 0
    part_idx = jnp.clip(part - 1, 0, NUM_PARTS - 1)

    # Reference indexing (UVConverter.py:158-166): texel row from U, col from
    # V, both scaled by (part_res - 1).
    tex_r = jnp.clip(jnp.round(u * (part_res - 1)), 0, part_res - 1).astype(jnp.int32)
    tex_c = jnp.clip(jnp.round(v * (part_res - 1)), 0, part_res - 1).astype(jnp.int32)

    flat_idx = (part_idx * part_res + tex_r) * part_res + tex_c
    flat_idx = jnp.where(valid, flat_idx, 0)
    weights = valid.astype(jnp.float32).reshape(-1)

    n_texels = NUM_PARTS * part_res * part_res
    rgb_sum = jnp.zeros((n_texels, 3), jnp.float32).at[flat_idx.reshape(-1)].add(
        image_rgb.reshape(-1, 3) * weights[:, None])
    cnt = jnp.zeros((n_texels,), jnp.float32).at[flat_idx.reshape(-1)].add(weights)

    texture = rgb_sum / jnp.maximum(cnt[:, None], 1.0)
    mask = (cnt > 0).astype(jnp.float32)
    return (texture.reshape(NUM_PARTS, part_res, part_res, 3),
            mask.reshape(NUM_PARTS, part_res, part_res))


def fuse_atlas_textures(textures: jnp.ndarray, masks: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask-weighted average over frames (create_texture_from_video,
    UVConverter.py:193-207).

    Args:
      textures: (T, 24, R, R, 3); masks: (T, 24, R, R).
    """
    w = masks[..., None]
    total = jnp.sum(textures * w, axis=0)
    cnt = jnp.sum(w, axis=0)
    return total / jnp.maximum(cnt, 1.0), (cnt[..., 0] > 0).astype(jnp.float32)


def concat_atlas(parts: jnp.ndarray) -> jnp.ndarray:
    """(24, R, R, C) → (4R, 6R, C) tile sheet (UVConverter.py:110-119)."""
    r = parts.shape[1]
    rows = [jnp.concatenate([parts[i * GRID_COLS + j]
                             for j in range(GRID_COLS)], axis=1)
            for i in range(GRID_ROWS)]
    return jnp.concatenate(rows, axis=0).reshape(GRID_ROWS * r, GRID_COLS * r,
                                                 *parts.shape[3:])


def split_atlas(sheet: jnp.ndarray, part_res: int = PART_RES) -> jnp.ndarray:
    """(4R, 6R, C) → (24, R, R, C) (UVConverter.py:121-131)."""
    parts = [sheet[i * part_res:(i + 1) * part_res,
                   j * part_res:(j + 1) * part_res]
             for i in range(GRID_ROWS) for j in range(GRID_COLS)]
    return jnp.stack(parts)


def _procedural_mapping(normal_res: int, part_res: int):
    """Fallback atlas⇄normal mapping: pack the 24 parts as 4×6 tiles of the
    normal map (used when the reference mapping pickles are absent)."""
    tile_h = normal_res // GRID_ROWS
    tile_w = normal_res // GRID_COLS
    ys = np.arange(normal_res)
    xs = np.arange(normal_res)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    part = np.clip(yy // tile_h, 0, GRID_ROWS - 1) * GRID_COLS + \
        np.clip(xx // tile_w, 0, GRID_COLS - 1)
    within_y = ((yy % tile_h) * (part_res - 1) / max(tile_h - 1, 1)).astype(np.int32)
    within_x = ((xx % tile_w) * (part_res - 1) / max(tile_w - 1, 1)).astype(np.int32)
    return part.astype(np.int32), within_y, within_x


def _load_mapping(path: str):
    """Load a mapping pickle: either this package's dense dict layout
    ({'part','y','x'} full-grid arrays) or the reference's sparse relation
    list (Atlas2Normal.py:79-84 / Normal2Atlas.py:88-94 — K entries of 5
    ints). Returns ('dict', part, y, x) or ('list', (K,5) int array)."""
    with open(path, "rb") as f:
        mapping = pickle.load(f)
    if isinstance(mapping, dict):
        return ("dict", np.asarray(mapping["part"]), np.asarray(mapping["y"]),
                np.asarray(mapping["x"]))
    rel = np.asarray(mapping, np.int64)
    if rel.ndim != 2 or rel.shape[1] != 5:
        raise ValueError(
            f"unrecognized mapping pickle layout: shape {rel.shape}")
    return ("list", rel)


def atlas_to_normal(atlas: jnp.ndarray, normal_res: int = 512,
                    mapping_pickle: Optional[str] = None) -> jnp.ndarray:
    """24-part atlas (24, R, R, 3) → normal UV map (normal_res², 3)
    (Atlas2Normal.convert, Atlas2Normal.py:25-100). Loads a reference
    ``atlas2normal_*.pickle`` relation list ([normal_y, normal_x, part,
    atlas_i, atlas_j] per entry, applied at Atlas2Normal.py:90-93) or this
    package's dense dict mapping when given; otherwise the procedural
    tiling. Values are passed through unscaled (the reference divides by
    255 only because its atlas is uint8)."""
    r = atlas.shape[1]
    if mapping_pickle:
        loaded = _load_mapping(mapping_pickle)
        if loaded[0] == "list":
            rel = loaded[1]
            normal = jnp.zeros((normal_res, normal_res, atlas.shape[-1]),
                               atlas.dtype)
            return normal.at[rel[:, 0], rel[:, 1]].set(
                atlas[rel[:, 2], rel[:, 3], rel[:, 4]])
        _, part, wy, wx = loaded
        part, wy, wx = (jnp.asarray(a, jnp.int32) for a in (part, wy, wx))
    else:
        p, y, x = _procedural_mapping(normal_res, r)
        part, wy, wx = jnp.asarray(p), jnp.asarray(y), jnp.asarray(x)
    return atlas[part, wy, wx]


def normal_to_atlas(normal: jnp.ndarray, part_res: int = PART_RES,
                    mapping_pickle: Optional[str] = None) -> jnp.ndarray:
    """Normal UV map → 24-part atlas (Normal2Atlas.convert,
    Normal2Atlas.py:24-109).

    With a reference mapping pickle: scatter-mean over its (normal-texel →
    atlas-texel) relation. Procedurally: a direct gather (each atlas texel
    samples its tile location in the normal map) so every texel is covered —
    a scatter inversion of the tiling would leave undersampled columns empty.
    """
    res = normal.shape[0]
    if mapping_pickle:
        loaded = _load_mapping(mapping_pickle)
        if loaded[0] == "list":
            # Reference normal2atlas relation list: [atlas_i, atlas_j, part,
            # normal_y, normal_x] applied at Normal2Atlas.py:100-101.
            rel = loaded[1]
            atlas = jnp.zeros((NUM_PARTS, part_res, part_res,
                               normal.shape[-1]), normal.dtype)
            return atlas.at[rel[:, 2], rel[:, 0], rel[:, 1]].set(
                normal[rel[:, 3], rel[:, 4]])
        _, part, wy, wx = (loaded[0], jnp.asarray(loaded[1]),
                           jnp.asarray(loaded[2]), jnp.asarray(loaded[3]))
        flat = (part * part_res + wy) * part_res + wx
        n = NUM_PARTS * part_res * part_res
        total = jnp.zeros((n, normal.shape[-1])).at[flat.reshape(-1)].add(
            normal.reshape(-1, normal.shape[-1]))
        cnt = jnp.zeros((n,)).at[flat.reshape(-1)].add(1.0)
        return (total / jnp.maximum(cnt[:, None], 1.0)).reshape(
            NUM_PARTS, part_res, part_res, normal.shape[-1])

    tile_h = res // GRID_ROWS
    tile_w = res // GRID_COLS
    pi = np.arange(NUM_PARTS)
    rows = (pi // GRID_COLS)[:, None, None]
    cols = (pi % GRID_COLS)[:, None, None]
    ii = np.arange(part_res)[None, :, None]
    jj = np.arange(part_res)[None, None, :]
    ny = rows * tile_h + np.round(ii * (tile_h - 1) / (part_res - 1)).astype(np.int64)
    nx = cols * tile_w + np.round(jj * (tile_w - 1) / (part_res - 1)).astype(np.int64)
    ny, nx = np.broadcast_arrays(ny, nx)
    return normal[jnp.asarray(ny), jnp.asarray(nx)]


def sample_uv_texture(texture: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture lookup — jnp grid_sample equivalent used by the
    textured renderer (nmr_renderer.py:139-152).

    Args:
      texture: (H, W, C) normal UV map.
      uv: (..., 2) coordinates in [0, 1] (u → x, v → y).

    Returns:
      (..., C) sampled colors.
    """
    h, w = texture.shape[:2]
    x = uv[..., 0] * (w - 1)
    y = uv[..., 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i, x1i, y0i, y1i = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))
    top = texture[y0i, x0i] * (1 - wx) + texture[y0i, x1i] * wx
    bot = texture[y1i, x0i] * (1 - wx) + texture[y1i, x1i] * wx
    return top * (1 - wy) + bot * wy
