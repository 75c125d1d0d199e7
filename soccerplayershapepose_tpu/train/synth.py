"""Synthetic SMPL render factory: training data for the perception nets.

The reference gets its 2D predictors for free (COCO/DensePose-pretrained
detectron2 + torchvision weights,
``/root/reference/Python/Soccer/PlayerReconstruction/predict/predict_3D.py:35-64``,
``PlayerDetection/player_detection.py:86-87``). No such weights exist here, but
this framework has something the reference lacks: a differentiable SMPL +
rasterizer stack that can mint unlimited (image, keypoints, silhouette, IUV,
boxes) ground-truth tuples on device. ProxyNet and PlayerDetector train on
these renders; the factory is one jitted program per batch (MXU-shaped matmul
core + the chunked rasterizers).

GT conventions match the proxy contract (player_recon.py:61-124): keypoints
(17, [x,y]) in crop pixel space via the SMPL→KPRCNN joint map, binary
silhouette at full crop resolution, IUV part ids 0..24 with per-part UV in
[0, 1] at the stride-4 head resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.perception import NUM_PARTS, STRIDE
from soccerplayershapepose_tpu.ops.camera import (
    perspective_project, weak_perspective_to_translation)
from soccerplayershapepose_tpu.render.attribute import rasterize_attributes
from soccerplayershapepose_tpu.render.softras import hard_silhouette
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward

# 24 visually-distinct part colors (hue wheel), built once at trace time.
def _part_palette() -> jnp.ndarray:
    h = jnp.arange(NUM_PARTS, dtype=jnp.float32) / NUM_PARTS * 6.0
    x = 1.0 - jnp.abs(jnp.mod(h, 2.0) - 1.0)
    z = jnp.zeros_like(h)
    o = jnp.ones_like(h)
    rgb = jnp.select(
        [(h < 1)[:, None], (h < 2)[:, None], (h < 3)[:, None],
         (h < 4)[:, None], (h < 5)[:, None], (h >= 5)[:, None]],
        [jnp.stack([o, x, z], -1), jnp.stack([x, o, z], -1),
         jnp.stack([z, o, x], -1), jnp.stack([z, x, o], -1),
         jnp.stack([x, z, o], -1), jnp.stack([o, z, x], -1)])
    return 0.25 + 0.6 * rgb                                # avoid pure green


def vertex_parts(assets: SMPLAssets) -> jnp.ndarray:
    """(V,) dominant-joint part id in 0..23 — the densepose-I analogue
    (the reference's cube-parts vertex lookup role, nmr_renderer.py:154-162)."""
    return jnp.argmax(assets.lbs_weights, axis=-1).astype(jnp.int32)


def vertex_uv(assets: SMPLAssets) -> jnp.ndarray:
    """(V, 2) pseudo-UV from the template geometry, normalized to [0, 1]."""
    v = assets.v_template
    lo = jnp.min(v, axis=0)
    hi = jnp.max(v, axis=0)
    n = (v - lo) / jnp.maximum(hi - lo, 1e-6)
    return jnp.stack([n[:, 0], n[:, 1]], axis=-1)


def random_smpl_params(rng: jax.Array, b: int):
    """Plausible random bodies: mild pose noise around rest, random shape."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    body_aa = jax.random.normal(k1, (b, cfg.NUM_BODY_JOINTS, 3)) * 0.25
    orient_aa = jnp.concatenate([
        jnp.full((b, 1), jnp.pi) + jax.random.normal(k2, (b, 1)) * 0.3,
        jax.random.normal(k2, (b, 2)) * 0.4], axis=-1)[:, None, :]
    betas = jax.random.normal(k3, (b, 10)) * 1.5
    cam_wp = jnp.stack([
        jax.random.uniform(k4, (b,), minval=0.65, maxval=1.05),
        jax.random.uniform(jax.random.fold_in(k4, 1), (b,),
                           minval=-0.15, maxval=0.15),
        jax.random.uniform(jax.random.fold_in(k4, 2), (b,),
                           minval=-0.15, maxval=0.15)], axis=-1)
    return body_aa, orient_aa, betas, cam_wp


def _background(rng: jax.Array, b: int, wh: int) -> jnp.ndarray:
    """Field-like background: green base + hue jitter + pixel noise."""
    k1, k2 = jax.random.split(rng)
    base = jnp.array([0.18, 0.42, 0.22])
    jitter = jax.random.uniform(k1, (b, 1, 1, 3), minval=-0.08, maxval=0.08)
    noise = jax.random.uniform(k2, (b, wh, wh, 3), minval=-0.06, maxval=0.06)
    return jnp.clip(base + jitter + noise, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("b", "wh"))
def synth_crop_batch(assets: SMPLAssets, rng: jax.Array, b: int = 8,
                     wh: int = 256) -> dict:
    """One batch of player-crop training tuples.

    Returns dict:
      image (B, wh, wh, 3) [0,1]; silhouette (B, wh, wh) {0,1};
      joints2d (B, 17, 2) pixels; part (B, wh/4, wh/4) int 0..24;
      uv (B, wh/4, wh/4, 2) [0,1].
    """
    assert wh % STRIDE == 0
    k_par, k_bg, k_shade = jax.random.split(rng, 3)
    body_aa, orient_aa, betas, cam_wp = random_smpl_params(k_par, b)
    out = smpl_forward(assets, betas, body_aa, orient_aa, pose2rot=True)

    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    verts2d = perspective_project(out.vertices, None, transl,
                                  focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    verts_z = out.vertices[..., 2] + transl[:, None, 2]

    joints2d = perspective_project(
        out.joints[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], None, transl,
        focal_length=cfg.FOCAL_LENGTH, img_wh=wh)

    sil = hard_silhouette(verts2d, assets.faces, wh)

    # Dense attributes (part one-hot + UV) at head resolution (stride 4).
    small = wh // STRIDE
    parts = vertex_parts(assets)
    attrs = jnp.concatenate([jax.nn.one_hot(parts, NUM_PARTS),
                             vertex_uv(assets)], axis=-1)       # (V, 26)
    attrs_b = jnp.broadcast_to(attrs[None], (b,) + attrs.shape)
    small_attr, small_mask = rasterize_attributes(
        verts2d * (small / wh), verts_z, attrs_b, assets.faces, small)
    part = jnp.where(small_mask,
                     jnp.argmax(small_attr[..., :NUM_PARTS], axis=-1) + 1, 0)
    uv = small_attr[..., NUM_PARTS:] * small_mask[..., None]

    # Image: part-colored body (UV-modulated shading) over a field background.
    palette = _part_palette()
    color = palette[jnp.clip(part - 1, 0, NUM_PARTS - 1)]
    shade = 0.7 + 0.3 * uv[..., 1:2]
    body = color * shade * (part > 0)[..., None]
    body = jnp.repeat(jnp.repeat(body, STRIDE, axis=1), STRIDE, axis=2)
    bg = _background(k_bg, b, wh)
    noise = jax.random.uniform(k_shade, (b, wh, wh, 3),
                               minval=-0.04, maxval=0.04)
    image = jnp.clip(body * sil[..., None] + bg * (1 - sil[..., None])
                     + noise, 0.0, 1.0)

    return {"image": image, "silhouette": sil, "joints2d": joints2d,
            "part": part.astype(jnp.int32), "uv": uv}


@functools.partial(jax.jit, static_argnames=("b", "n_players", "hw"))
def synth_frame_batch(assets: SMPLAssets, rng: jax.Array, b: int = 2,
                      n_players: int = 6, hw: tuple = (256, 256)) -> dict:
    """Multi-player frames for detector training.

    Players are placed by per-player weak-perspective cameras (small scale,
    scattered tx/ty); boxes come from the projected vertex extents.

    Returns dict: image (B, H, W, 3); boxes (B, N, 4) pixel [x1,y1,x2,y2];
    mask (B, N) validity (all ones — static count).
    """
    h, w = hw
    wh = max(h, w)
    k_par, k_cam, k_bg = jax.random.split(rng, 3)
    bn = b * n_players
    body_aa, orient_aa, betas, _ = random_smpl_params(k_par, bn)
    out = smpl_forward(assets, betas, body_aa, orient_aa, pose2rot=True)

    ks = jax.random.split(k_cam, 3)
    s = jax.random.uniform(ks[0], (bn,), minval=0.1, maxval=0.25)
    tx = jax.random.uniform(ks[1], (bn,), minval=-0.8, maxval=0.8)
    ty = jax.random.uniform(ks[2], (bn,), minval=-0.7, maxval=0.7)
    cam_wp = jnp.stack([s, tx, ty], axis=-1)
    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    verts2d = perspective_project(out.vertices, None, transl,
                                  focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    # Rectangular frame: center the square projection window on the frame.
    verts2d = verts2d + jnp.array([(w - wh) / 2.0, (h - wh) / 2.0])

    boxes = jnp.concatenate([jnp.min(verts2d, axis=1),
                             jnp.max(verts2d, axis=1)], axis=-1)  # (BN, 4)
    sil = hard_silhouette(verts2d, assets.faces, wh)[:, :h, :w]
    sil = sil.reshape(b, n_players, h, w)

    palette = _part_palette()
    colors = palette[jax.random.randint(k_par, (bn,), 0, NUM_PARTS)]
    body = jnp.sum(sil[..., None] * colors.reshape(b, n_players, 1, 1, 3),
                   axis=1)
    any_sil = jnp.clip(jnp.sum(sil, axis=1), 0.0, 1.0)
    bg = _background(k_bg, b, wh)[:, :h, :w]
    image = jnp.clip(body + bg * (1 - any_sil[..., None]), 0.0, 1.0)

    return {"image": image, "boxes": boxes.reshape(b, n_players, 4),
            "mask": jnp.ones((b, n_players), jnp.float32)}
