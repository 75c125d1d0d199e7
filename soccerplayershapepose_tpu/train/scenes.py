"""Synthetic broadcast-SCENE factory: multi-view player trees with GT.

The reference's data is a private FIFA capture organised as
``<root>/<game>/<scene>/<player>/<view>.png`` plus per-player proxies,
multi-camera views of each scene, and one broadcast ("broad") view
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:61-124``,
``global_var.py:5-24``). That data is absent from the snapshot, so the
rebuild supplies a generator with the same observable structure — and,
unlike the reference, *known* 3D ground truth:

* a scene is N players with CORRELATED params: a shared base pose mixed
  into each player's individual sample (team-action structure) and global
  orientations that face a shared ball point — so inter-player geometry
  carries pose information, which is what the PoseRelationModule
  (models/relation.py; reference regressor_relate.py) needs to have any
  signal to learn;
* each player is rendered from V narrow camera azimuths plus one broad
  (broadcast-like) azimuth — same body, rotated global orient — giving
  real multi-view constraints for ``fit.multi_view`` / pseudo-GT minting;
* virtual broadcast-frame boxes are derived from pitch positions with a
  perspective size gradient, correlated with the facing yaw through the
  ball position (``scenes/<game>/<scene>/boxes.xml``).

The on-disk tree written by :func:`write_scene_tree` is byte-compatible
with the stage drivers (drivers/stages.py) and the distillation trainer
(drivers/training.py): images/, proxies/ (``<view>_sil.npy`` uint8 +
``<view>_j2d.xml`` with confidence scores), broad_images/, broad_proxies/,
gt/ (generating SMPL params — the rebuild's extra), scenes/ (boxes).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.ops.camera import (
    perspective_project, weak_perspective_to_translation)
from soccerplayershapepose_tpu.ops.rotations import batch_rodrigues
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward
from soccerplayershapepose_tpu.render.attribute import rasterize_attributes
from soccerplayershapepose_tpu.train.synth import (
    _POSE_SCALE, _background, _kit_vertex_colors, _motion_blur,
    _photometric, _shaded_colors)

# Virtual broadcast frame the scene boxes live in (pixels).
FRAME_W, FRAME_H = 1920, 1080


# ---------------------------------------------------------------------------
# Scene parameter sampling (correlated players)
# ---------------------------------------------------------------------------

def synth_scene_params(rng: jax.Array, n_players: int,
                       pose_mix: float = 0.55) -> dict:
    """One scene's correlated SMPL parameters + broadcast geometry.

    Structure (the learnable inter-player signal):
      * body pose: per-player axis-angle = (1-w)·scene_base + w·individual,
        w = ``pose_mix`` — players share a team-action component;
      * facing: each player's yaw points at a shared ball position on the
        pitch (+ noise), so relative orientation is predictable from
        relative position;
      * boxes: virtual 1920×1080 broadcast-frame boxes from pitch position
        with a perspective size gradient (near edge = bigger).

    Returns dict of numpy-convertible arrays:
      body_pose (N,23,3,3), betas (N,10), yaw (N,), pitch_xy (N,2),
      ball_xy (2,), boxes (N,4) [x1,y1,x2,y2] pixels.
    """
    ks = jax.random.split(rng, 8)
    base_aa = jax.random.normal(ks[0], (1, 23, 3)) \
        * jnp.asarray(_POSE_SCALE)[None] \
        * jax.random.uniform(ks[1], (1, 1, 1), minval=0.4, maxval=1.5)
    indiv_aa = jax.random.normal(ks[2], (n_players, 23, 3)) \
        * jnp.asarray(_POSE_SCALE)[None] \
        * jax.random.uniform(ks[3], (n_players, 1, 1), minval=0.4,
                             maxval=1.5)
    body_aa = (1.0 - pose_mix) * base_aa + pose_mix * indiv_aa
    body_aa = body_aa.at[:, [3, 4], 0].set(jnp.abs(body_aa[:, [3, 4], 0]))
    body_rm = batch_rodrigues(body_aa.reshape(-1, 3)) \
        .reshape(n_players, 23, 3, 3)

    betas = jax.random.normal(ks[4], (n_players, 10)) * 1.5

    # Pitch layout: positions in [0,1]² (x = along-frame, y = depth toward
    # camera), ball somewhere on the pitch; facing yaw points at the ball.
    pitch_xy = jax.random.uniform(ks[5], (n_players, 2),
                                  minval=0.05, maxval=0.95)
    ball_xy = jax.random.uniform(ks[6], (2,), minval=0.15, maxval=0.85)
    d = ball_xy[None] - pitch_xy                                   # (N,2)
    # yaw 0 faces the camera (-y); face the ball in pitch coords + noise.
    yaw = jnp.arctan2(d[:, 0], -d[:, 1]) \
        + jax.random.normal(ks[7], (n_players,)) * 0.25

    # Broadcast-frame boxes: perspective gradient — near edge (y→1) bigger.
    box_h = (0.12 + 0.22 * pitch_xy[:, 1]) * FRAME_H
    box_w = box_h * 0.42
    cx = pitch_xy[:, 0] * FRAME_W
    cy = (0.18 + 0.64 * pitch_xy[:, 1]) * FRAME_H
    boxes = jnp.stack([cx - box_w / 2, cy - box_h / 2,
                       cx + box_w / 2, cy + box_h / 2], axis=-1)

    return {"body_pose": body_rm, "betas": betas, "yaw": yaw,
            "pitch_xy": pitch_xy, "ball_xy": ball_xy, "boxes": boxes}


def orient_for_view(rng: jax.Array, yaw: jnp.ndarray,
                    azimuth: float) -> jnp.ndarray:
    """Global-orient rotmats for players with facing ``yaw`` seen from a
    camera at ``azimuth``: upright (π about x + noise) ∘ R_y(yaw+azimuth),
    the same convention as the crop factory (train/synth.py
    random_smpl_params)."""
    n = yaw.shape[0]
    k1, k2 = jax.random.split(rng)
    upright = batch_rodrigues(jnp.concatenate(
        [jnp.full((n, 1), jnp.pi) + jax.random.normal(k1, (n, 1)) * 0.15,
         jax.random.normal(k2, (n, 2)) * 0.10], axis=-1))
    total = yaw + azimuth
    zero = jnp.zeros_like(total)
    yaw_rm = batch_rodrigues(jnp.stack([zero, total, zero], axis=-1))
    return jnp.einsum("bij,bjk->bik", upright, yaw_rm)[:, None]


# ---------------------------------------------------------------------------
# View rendering (single body per crop; reuses the crop factory's pieces)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("wh", "with_image"))
def render_view(assets: SMPLAssets, rng: jax.Array,
                body_pose: jnp.ndarray, global_orient: jnp.ndarray,
                betas: jnp.ndarray, cam_wp: jnp.ndarray,
                wh: int = cfg.PROXY_REP_INPUT_WH,
                with_image: bool = True) -> dict:
    """Render one camera view of N players (independent crops).

    Returns {silhouette (N,wh,wh), joints2d (N,17,2) px[, image (N,wh,wh,3)]}.
    """
    n = betas.shape[0]
    keys = jax.random.split(rng, 4)
    out = smpl_forward(assets, betas, body_pose, global_orient,
                       pose2rot=False)
    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    verts2d = perspective_project(out.vertices, None, transl,
                                  focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    verts_z = out.vertices[..., 2] + transl[:, None, 2]
    joints2d = perspective_project(
        out.joints[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], None, transl,
        focal_length=cfg.FOCAL_LENGTH, img_wh=wh)

    if with_image:
        colors = _shaded_colors(keys[0], out.vertices, assets.faces,
                                _kit_vertex_colors(assets, keys[1], n))
    else:
        colors = jnp.zeros(out.vertices.shape[:2] + (3,))
    attrs, mask = rasterize_attributes(verts2d, verts_z, colors,
                                       assets.faces, wh)
    sil = mask.astype(jnp.float32)
    batch = {"silhouette": sil, "joints2d": joints2d}
    if with_image:
        bg = _background(keys[2], n, wh, wh)
        image = attrs * sil[..., None] + bg * (1 - sil[..., None])
        image = _photometric(jax.random.fold_in(keys[3], 1),
                             _motion_blur(keys[3], image))
        batch["image"] = image
    return batch


def synth_scene_views(assets: SMPLAssets, rng: jax.Array,
                      n_players: int = 6, n_views: int = 3,
                      wh: int = cfg.PROXY_REP_INPUT_WH,
                      with_image: bool = True,
                      broad: bool = True) -> dict:
    """One full scene: correlated params + V narrow views (+ 1 broad view).

    Narrow cameras sit at evenly spread azimuths (+ noise) with close-up
    scales; the broad camera is an extra azimuth at broadcast-like scale
    (the reference's crop-and-resize normalises broadcast crops back to
    512², so "broad" differs by azimuth/scale statistics, not resolution).

    Returns dict:
      scene params (see :func:`synth_scene_params`),
      views: list of per-view dicts {silhouette, joints2d[, image],
        global_orient (N,1,3,3), cam_wp (N,3), azimuth},
      broad: one such dict (present when ``broad=True``).
    """
    k_scene, k_views = jax.random.split(rng)
    scene = synth_scene_params(k_scene, n_players)

    def one_view(k, azimuth, scale_lo, scale_hi):
        k1, k2, k3 = jax.random.split(k, 3)
        orient = orient_for_view(k1, scene["yaw"], azimuth)
        s = jax.random.uniform(k2, (n_players,), minval=scale_lo,
                               maxval=scale_hi)
        t = jax.random.uniform(k3, (n_players, 2), minval=-0.15,
                               maxval=0.15)
        cam_wp = jnp.concatenate([s[:, None], t], axis=-1)
        view = render_view(assets, jax.random.fold_in(k, 7),
                           scene["body_pose"], orient, scene["betas"],
                           cam_wp, wh=wh, with_image=with_image)
        view.update(global_orient=orient, cam_wp=cam_wp,
                    azimuth=float(azimuth))
        return view

    views = []
    for v in range(n_views):
        kv = jax.random.fold_in(k_views, v)
        az = 2.0 * np.pi * v / max(n_views, 1) \
            + float(jax.random.normal(jax.random.fold_in(kv, 1), ()) * 0.12)
        views.append(one_view(kv, az, 0.65, 1.0))

    out = {"scene": scene, "views": views}
    if broad:
        kb = jax.random.fold_in(k_views, 1000)
        az = float(jax.random.uniform(jax.random.fold_in(kb, 1), (),
                                      minval=-np.pi, maxval=np.pi))
        out["broad"] = one_view(kb, az, 0.55, 0.85)
    return out


# ---------------------------------------------------------------------------
# Track sequences (shared shape, smoothly varying pose — fit/track.py input)
# ---------------------------------------------------------------------------

def synth_track_views(assets: SMPLAssets, rng: jax.Array,
                      n_players: int = 4, n_frames: int = 8,
                      wh: int = cfg.PROXY_REP_INPUT_WH,
                      with_image: bool = False) -> dict:
    """A broadcast-clip track per player: T frames of one moving body.

    Pose interpolates linearly in axis-angle between two sampled action
    poses (smooth motion), yaw drifts linearly, betas are FIXED per player
    — the invariant ``fit.track.track_fit`` exploits with its shared-betas
    parameterisation (reference ``player_recon.track``/predict_3D clip
    fitting). Camera scale/offset jitters per frame like broadcast
    tracking crops.

    Returns {silhouette (N,T,wh,wh), joints2d (N,T,17,2),
    body_pose (N,T,23,3,3), global_orient (N,T,1,3,3), betas (N,10),
    cam_wp (N,T,3)[, image (N,T,wh,wh,3)]}.
    """
    ks = jax.random.split(rng, 10)
    n, t = n_players, n_frames
    scale_aa = jnp.asarray(_POSE_SCALE)[None]

    def sample_aa(k):
        return jax.random.normal(k, (n, 23, 3)) * scale_aa \
            * jax.random.uniform(jax.random.fold_in(k, 1), (n, 1, 1),
                                 minval=0.4, maxval=1.5)

    aa0, aa1 = sample_aa(ks[0]), sample_aa(ks[1])
    frac = jnp.linspace(0.0, 1.0, t)[None, :, None, None]
    body_aa = aa0[:, None] * (1 - frac) + aa1[:, None] * frac   # (N,T,23,3)
    body_aa = body_aa.at[:, :, [3, 4], 0].set(
        jnp.abs(body_aa[:, :, [3, 4], 0]))
    body_rm = batch_rodrigues(body_aa.reshape(-1, 3)) \
        .reshape(n, t, 23, 3, 3)

    yaw0 = jax.random.uniform(ks[2], (n,), minval=-np.pi, maxval=np.pi)
    dyaw = jax.random.normal(ks[3], (n,)) * 0.6
    yaw = yaw0[:, None] + dyaw[:, None] * jnp.linspace(0, 1, t)[None]
    orient = orient_for_view(ks[4], yaw.reshape(-1), 0.0) \
        .reshape(n, t, 1, 3, 3)

    betas = jax.random.normal(ks[5], (n, 10)) * 1.5
    s = jax.random.uniform(ks[6], (n, 1), minval=0.6, maxval=0.95) \
        + jax.random.normal(ks[7], (n, t)) * 0.02
    txy = jax.random.normal(ks[8], (n, t, 2)) * 0.06
    cam_wp = jnp.concatenate([s[..., None], txy], axis=-1)      # (N,T,3)

    flat = render_view(
        assets, ks[9], body_rm.reshape(n * t, 23, 3, 3),
        orient.reshape(n * t, 1, 3, 3),
        jnp.repeat(betas, t, axis=0), cam_wp.reshape(n * t, 3),
        wh=wh, with_image=with_image)
    out = {"silhouette": flat["silhouette"].reshape(n, t, wh, wh),
           "joints2d": flat["joints2d"].reshape(n, t, 17, 2),
           "body_pose": body_rm, "global_orient": orient,
           "betas": betas, "cam_wp": cam_wp}
    if with_image:
        out["image"] = flat["image"].reshape(n, t, wh, wh, 3)
    return out


# ---------------------------------------------------------------------------
# Tree writer (stage-driver-compatible layout)
# ---------------------------------------------------------------------------

def _write_proxy(proxy_dir: str, stem: str, sil: np.ndarray,
                 j2d: np.ndarray) -> None:
    from soccerplayershapepose_tpu.io import formats as io
    os.makedirs(proxy_dir, exist_ok=True)
    # uint8 keeps the tree ~4x smaller; load_proxy_batch float32-casts.
    np.save(os.path.join(proxy_dir, stem + "_sil.npy"),
            sil.astype(np.uint8))
    io.write_joints2d(os.path.join(proxy_dir, stem + "_j2d.xml"), j2d)


def write_scene_tree(root: str, game: str, scene_name: str, data: dict,
                     corrupt_rng: Optional[jax.Array] = None,
                     write_images: bool = True,
                     first_player_id: int = 2) -> None:
    """Write one generated scene to the reference folder layout.

    ``corrupt_rng`` applies the STRAPS detector-noise model
    (train/straps.py corrupt_proxy_inputs: joint jitter + silhouette
    cut-outs, no dropout — fits consume raw coordinates) to the WRITTEN
    proxies; clean GT stays in gt/. Player ids start at
    ``first_player_id`` because the single/multi drivers skip id '1' (the
    reference's camera-man crop, player_recon.py:1124-1125).
    """
    from soccerplayershapepose_tpu.io import formats as io
    from soccerplayershapepose_tpu.train.straps import corrupt_proxy_inputs

    scene = data["scene"]
    n = int(np.asarray(scene["betas"]).shape[0])
    named = [(f"view{i}", v) for i, v in enumerate(data["views"])]
    gt_views = {}

    def corrupted(view, key):
        sil = view["silhouette"]
        j2d = view["joints2d"]
        if corrupt_rng is None:
            scores = jnp.ones(j2d.shape[:2] + (1,), j2d.dtype)
            return np.asarray(sil), np.asarray(
                jnp.concatenate([j2d, scores], axis=-1))
        s, j, sc = corrupt_proxy_inputs(
            jax.random.fold_in(corrupt_rng, key), sil, j2d, drop_p=0.0,
            return_scores=True)
        return np.asarray(s), np.asarray(
            jnp.concatenate([j, sc[..., None]], axis=-1))

    packs = [("images", "proxies", named)]
    if "broad" in data:
        packs.append(("broad_images", "broad_proxies",
                      [("broad", data["broad"])]))

    for img_root, proxy_root, view_list in packs:
        for key, (stem, view) in enumerate(view_list):
            sil_c, j2d_c = corrupted(view, hash((img_root, key)) & 0xFFFF)
            gt_views[stem] = {
                "global_orient": np.asarray(view["global_orient"]),
                "cam_wp": np.asarray(view["cam_wp"]),
                "joints2d": np.asarray(view["joints2d"]),
            }
            for p in range(n):
                pid = str(first_player_id + p)
                img_dir = os.path.join(root, img_root, game, scene_name, pid)
                os.makedirs(img_dir, exist_ok=True)
                if write_images and "image" in view:
                    io.write_png(
                        os.path.join(img_dir, stem + ".png"),
                        (np.asarray(view["image"][p]) * 255).astype(np.uint8))
                else:
                    # View marker: the tree walker enumerates views by .png
                    # presence; a 1-px png keeps geometry-only trees small.
                    io.write_png(os.path.join(img_dir, stem + ".png"),
                                 np.zeros((1, 1, 3), np.uint8))
                _write_proxy(
                    os.path.join(root, proxy_root, game, scene_name, pid),
                    stem, sil_c[p], j2d_c[p])

    for p in range(n):
        pid = str(first_player_id + p)
        gt_dir = os.path.join(root, "gt", game, scene_name, pid)
        os.makedirs(gt_dir, exist_ok=True)
        np.savez(os.path.join(gt_dir, "gt.npz"),
                 body_pose=np.asarray(scene["body_pose"][p]),
                 betas=np.asarray(scene["betas"][p]),
                 yaw=np.asarray(scene["yaw"][p]),
                 boxes=np.asarray(scene["boxes"][p]),
                 **{f"{stem}_global_orient": gv["global_orient"][p]
                    for stem, gv in gt_views.items()},
                 **{f"{stem}_cam_wp": gv["cam_wp"][p]
                    for stem, gv in gt_views.items()},
                 **{f"{stem}_joints2d": gv["joints2d"][p]
                    for stem, gv in gt_views.items()})

    scene_dir = os.path.join(root, "scenes", game, scene_name)
    os.makedirs(scene_dir, exist_ok=True)
    io.write_boxes(os.path.join(scene_dir, "boxes.xml"),
                   np.asarray(scene["boxes"]))
    io.write_index(os.path.join(scene_dir, "index.xml"),
                   list(range(first_player_id, first_player_id + n)))
    io.write_json_xml(os.path.join(scene_dir, "ball.xml"),
                      [float(x) for x in np.asarray(scene["ball_xy"])])
