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

Domain randomization (the bridge toward the broadcast-footage robustness the
reference inherits from COCO pretraining, ``player_recon.py:61-124``):

* kit-colored bodies — skin / jersey / shorts / socks vertex groups with
  random team colors and stripe patterns, Lambert-shaded from a random light,
* z-buffered occluding second player in crop batches (GT stays the centred
  player's VISIBLE silhouette/parts — the contract the reference's predictors
  produce on overlapping players),
* procedural pitch backgrounds: hue-jittered grass, mowing stripes, white
  field lines, crowd bands, occasional non-field noise,
* photometric jitter + directional motion blur
  (``global_utils.py:408-440``'s augmentation role, on-device),
* per-joint visibility labels (in-frame AND unoccluded) so keypoint scores
  can be trained/evaluated as calibrated confidences
  (``utils/joints2d_utils.py:23-33`` consumption semantics).

GT conventions match the proxy contract (player_recon.py:61-124): keypoints
(17, [x,y]) in crop pixel space via the SMPL→KPRCNN joint map, binary
silhouette at full crop resolution, IUV part ids 0..24 with per-part UV in
[0, 1] at the stride-4 head resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.perception import NUM_PARTS, STRIDE
from soccerplayershapepose_tpu.ops.camera import (
    perspective_project, weak_perspective_to_translation)
from soccerplayershapepose_tpu.ops.rotations import batch_rodrigues
from soccerplayershapepose_tpu.render.attribute import rasterize_attributes
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.smpl.model import smpl_forward

# ---------------------------------------------------------------------------
# Body attributes
# ---------------------------------------------------------------------------


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

# Kit groups over the 24 SMPL joints (part id = dominant LBS joint):
# 0 skin, 1 jersey, 2 shorts, 3 socks/boots.
_KIT_GROUP = np.zeros(24, np.int32)
_KIT_GROUP[[3, 6, 9, 13, 14, 16, 17, 18, 19]] = 1    # spine/collar/arm→elbow
_KIT_GROUP[[0, 1, 2]] = 2                            # pelvis + hips
_KIT_GROUP[[7, 8, 10, 11]] = 3                       # ankles + feet
# knees/wrists/hands/neck/head stay 0 (skin)

_SKIN_TONES = np.array([
    [0.98, 0.84, 0.72], [0.92, 0.74, 0.60], [0.82, 0.62, 0.48],
    [0.66, 0.47, 0.34], [0.48, 0.32, 0.22], [0.35, 0.22, 0.15],
], np.float32)


def _kit_vertex_colors(assets: SMPLAssets, rng: jax.Array,
                       b: int) -> jnp.ndarray:
    """(B, V, 3) randomized kit colors: team jersey (striped or plain),
    shorts, socks, skin tone."""
    parts = vertex_parts(assets)                          # (V,)
    group = jnp.asarray(_KIT_GROUP)[parts]                # (V,)
    uvt = vertex_uv(assets)                               # (V, 2)

    ks = jax.random.split(rng, 8)
    skin = jnp.asarray(_SKIN_TONES)[
        jax.random.randint(ks[0], (b,), 0, len(_SKIN_TONES))]
    skin = skin * jax.random.uniform(ks[1], (b, 1), minval=0.85, maxval=1.1)
    jersey1 = jax.random.uniform(ks[2], (b, 3), minval=0.05, maxval=1.0)
    jersey2 = jax.random.uniform(ks[3], (b, 3), minval=0.05, maxval=1.0)
    # Plain kit (stripe freq 0) half the time.
    freq = jax.random.randint(ks[4], (b, 1), 0, 2).astype(jnp.float32) \
        * jax.random.uniform(ks[4], (b, 1), minval=8.0, maxval=26.0)
    vertical = jax.random.bernoulli(ks[5], 0.5, (b, 1))
    phase = jax.random.uniform(ks[5], (b, 1), maxval=6.28)
    shorts = jnp.where(
        jax.random.bernoulli(ks[6], 0.5, (b, 1)),
        jax.random.uniform(ks[6], (b, 3), minval=0.05, maxval=1.0),
        jnp.where(jax.random.bernoulli(ks[7], 0.5, (b, 1)),
                  jnp.full((b, 3), 0.92), jnp.full((b, 3), 0.08)))
    socks = jnp.where(jax.random.bernoulli(ks[7], 0.6, (b, 1))[..., None],
                      jersey1[:, None], jnp.full((b, 1, 3), 0.9))[:, 0]

    coord = jnp.where(vertical, uvt[None, :, 0], uvt[None, :, 1])  # (B, V)
    stripe = jnp.sin(freq * coord * 6.28 + phase) > 0.0
    jersey = jnp.where(stripe[..., None], jersey1[:, None], jersey2[:, None])

    colors = jnp.select(
        [(group == 0)[None, :, None], (group == 1)[None, :, None],
         (group == 2)[None, :, None], (group == 3)[None, :, None]],
        [jnp.broadcast_to(skin[:, None], (b, group.shape[0], 3)),
         jnp.broadcast_to(jersey, (b, group.shape[0], 3)),
         jnp.broadcast_to(shorts[:, None], (b, group.shape[0], 3)),
         jnp.broadcast_to(socks[:, None], (b, group.shape[0], 3))])
    return colors


def _vertex_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3) area-weighted vertex normals of the posed mesh."""
    v0 = vertices[:, faces[:, 0]]
    v1 = vertices[:, faces[:, 1]]
    v2 = vertices[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)                      # (B, F, 3)
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[:, faces[:, k]].add(fn)
    return vn / jnp.maximum(
        jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def _shaded_colors(rng: jax.Array, vertices: jnp.ndarray,
                   faces: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Lambert shading from a random directional light + ambient."""
    b = vertices.shape[0]
    k1, k2 = jax.random.split(rng)
    light = jax.random.normal(k1, (b, 3))
    light = light.at[:, 1].add(-1.0)       # bias: light from above (−y up)
    light = light / jnp.maximum(jnp.linalg.norm(light, axis=-1,
                                                keepdims=True), 1e-8)
    ambient = jax.random.uniform(k2, (b, 1, 1), minval=0.45, maxval=0.75)
    vn = _vertex_normals(vertices, faces)
    lambert = jnp.maximum(jnp.einsum("bvk,bk->bv", vn, light), 0.0)[..., None]
    return jnp.clip(colors * (ambient + (1.0 - ambient) * lambert), 0.0, 1.0)

# ---------------------------------------------------------------------------
# Random bodies
# ---------------------------------------------------------------------------

# Per-body-joint axis-angle noise scales (23, 3): strong articulation on
# limbs (running/kicking coverage), mild on the spine. Index i = SMPL joint
# i+1 (1 L_hip ... 23 R_hand).
_POSE_SCALE = np.full((23, 3), 0.12, np.float32)
_POSE_SCALE[[0, 1]] = (0.55, 0.25, 0.25)      # hips
_POSE_SCALE[[3, 4]] = (0.65, 0.10, 0.10)      # knees (flexion-dominant)
_POSE_SCALE[[6, 7]] = (0.30, 0.15, 0.15)      # ankles
_POSE_SCALE[[15, 16]] = (0.35, 0.45, 0.45)    # shoulders
_POSE_SCALE[[17, 18]] = (0.25, 0.60, 0.30)    # elbows
_POSE_SCALE[[19, 20]] = (0.25, 0.25, 0.25)    # wrists


def random_smpl_params(rng: jax.Array, b: int, yaw_range: float = np.pi):
    """Plausible random soccer bodies.

    Returns (body_rotmats (B,23,3,3), orient_rotmats (B,1,3,3),
    betas (B,10), cam_wp (B,3)). Global orient = upright (π about x, the
    reference render convention) composed with a full random yaw so players
    are seen from every side, plus small pitch/roll noise.
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    energy = jax.random.uniform(k5, (b, 1, 1), minval=0.4, maxval=1.5)
    body_aa = jax.random.normal(k1, (b, 23, 3)) \
        * jnp.asarray(_POSE_SCALE)[None] * energy
    # Knees flex one way only.
    body_aa = body_aa.at[:, [3, 4], 0].set(
        jnp.abs(body_aa[:, [3, 4], 0]))
    body_rm = batch_rodrigues(body_aa.reshape(-1, 3)).reshape(b, 23, 3, 3)

    upright = batch_rodrigues(
        jnp.concatenate([jnp.full((b, 1), jnp.pi)
                         + jax.random.normal(k2, (b, 1)) * 0.25,
                         jax.random.normal(k2, (b, 2)) * 0.15], axis=-1))
    yaw = jax.random.uniform(k6, (b,), minval=-yaw_range, maxval=yaw_range)
    zero = jnp.zeros_like(yaw)
    yaw_rm = batch_rodrigues(jnp.stack([zero, yaw, zero], axis=-1))
    orient_rm = jnp.einsum("bij,bjk->bik", upright, yaw_rm)[:, None]

    betas = jax.random.normal(k3, (b, 10)) * 1.5
    cam_wp = jnp.stack([
        jax.random.uniform(k4, (b,), minval=0.5, maxval=1.1),
        jax.random.uniform(jax.random.fold_in(k4, 1), (b,),
                           minval=-0.2, maxval=0.2),
        jax.random.uniform(jax.random.fold_in(k4, 2), (b,),
                           minval=-0.2, maxval=0.2)], axis=-1)
    return body_rm, orient_rm, betas, cam_wp

# ---------------------------------------------------------------------------
# Backgrounds + photometric augmentation
# ---------------------------------------------------------------------------


def _background(rng: jax.Array, b: int, h: int, w: int) -> jnp.ndarray:
    """Procedural pitch: hue-jittered grass + mowing stripes + white field
    lines + optional crowd band + noise; occasionally pure noise."""
    ks = jax.random.split(rng, 10)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    base = jnp.array([0.16, 0.42, 0.20]) \
        + jax.random.uniform(ks[0], (b, 1, 1, 3), minval=-0.08, maxval=0.10)

    # Mowing stripes: banded brightness along a random direction.
    theta = jax.random.uniform(ks[1], (b, 1, 1), maxval=3.14)
    period = jax.random.uniform(ks[2], (b, 1, 1), minval=25.0, maxval=90.0)
    phase = jax.random.uniform(ks[2], (b, 1, 1), maxval=6.28)
    proj = xs * jnp.cos(theta) + ys * jnp.sin(theta)
    mow = 1.0 + 0.05 * jnp.sign(jnp.sin(proj * 6.28 / period + phase))
    bg = base * mow[..., None]

    # White field lines (up to 2).
    for i in range(2):
        ka = jax.random.fold_in(ks[3], i)
        alpha = jax.random.uniform(ka, (b, 1, 1), maxval=3.14)
        c = jax.random.uniform(jax.random.fold_in(ka, 1), (b, 1, 1),
                               maxval=1.0) * float(max(h, w))
        lw = jax.random.uniform(jax.random.fold_in(ka, 2), (b, 1, 1),
                                minval=1.0, maxval=3.0)
        on = jax.random.bernoulli(jax.random.fold_in(ka, 3), 0.6,
                                  (b, 1, 1)).astype(jnp.float32)
        d = jnp.abs(xs * jnp.cos(alpha) + ys * jnp.sin(alpha) - c)
        m = (jnp.exp(-(d / lw) ** 2) * 0.85 * on)[..., None]
        bg = bg * (1 - m) + 0.93 * m

    # Crowd band at the top: high-frequency colored noise, soft lower edge.
    crowd_frac = jax.random.bernoulli(ks[4], 0.35, (b, 1, 1)) \
        * jax.random.uniform(ks[5], (b, 1, 1), minval=0.10, maxval=0.35)
    hc = max(h // 4, 1)
    wc = max(w // 4, 1)
    crowd = jax.random.uniform(ks[6], (b, hc, wc, 3), minval=0.05,
                               maxval=0.85)
    crowd = jnp.repeat(jnp.repeat(crowd, 4, axis=1), 4, axis=2)[:, :h, :w]
    edge = jnp.clip((crowd_frac * h - ys) / 6.0, 0.0, 1.0)[..., None]
    bg = bg * (1 - edge) + crowd * edge

    # Occasionally a non-field background entirely (robustness).
    wild = jax.random.bernoulli(ks[7], 0.08, (b, 1, 1, 1)).astype(jnp.float32)
    wild_bg = jax.random.uniform(ks[8], (b, hc, wc, 3))
    wild_bg = jnp.repeat(jnp.repeat(wild_bg, 4, axis=1), 4, axis=2)[:, :h, :w]
    bg = bg * (1 - wild) + wild_bg * wild

    noise = jax.random.uniform(ks[9], (b, h, w, 3), minval=-0.05, maxval=0.05)
    return jnp.clip(bg + noise, 0.0, 1.0)


def _motion_blur(rng: jax.Array, image: jnp.ndarray,
                 p: float = 0.35, ksize: int = 9) -> jnp.ndarray:
    """Random directional motion blur (add_motion_blur role,
    global_utils.py:408-440), depthwise conv with per-sample line kernels."""
    b = image.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    theta = jax.random.uniform(k1, (b,), maxval=3.14)
    length = jax.random.uniform(k2, (b,), minval=1.0, maxval=float(ksize))
    t = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    ii = t[:, None]
    jj = t[None, :]
    along = (jj * jnp.cos(theta)[:, None, None]
             + ii * jnp.sin(theta)[:, None, None])
    perp = (-jj * jnp.sin(theta)[:, None, None]
            + ii * jnp.cos(theta)[:, None, None])
    kern = jnp.exp(-(perp / 0.6) ** 2) \
        * (jnp.abs(along) <= length[:, None, None] / 2.0)
    kern = kern / jnp.maximum(jnp.sum(kern, axis=(1, 2), keepdims=True), 1e-8)

    def blur_one(im, k):
        k4 = jnp.tile(k[:, :, None, None], (1, 1, 1, 3))       # HWIO
        return jax.lax.conv_general_dilated(
            im[None], k4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)[0]

    blurred = jax.vmap(blur_one)(image, kern)
    apply = jax.random.bernoulli(k3, p, (b, 1, 1, 1)).astype(jnp.float32)
    return image * (1 - apply) + blurred * apply


def _photometric(rng: jax.Array, image: jnp.ndarray) -> jnp.ndarray:
    """Brightness / contrast / per-channel gain / sensor noise."""
    b = image.shape[0]
    ks = jax.random.split(rng, 4)
    bright = jax.random.uniform(ks[0], (b, 1, 1, 1), minval=-0.10,
                                maxval=0.10)
    contrast = jax.random.uniform(ks[1], (b, 1, 1, 1), minval=0.8,
                                  maxval=1.2)
    gains = jax.random.uniform(ks[2], (b, 1, 1, 3), minval=0.92, maxval=1.08)
    noise = jax.random.normal(ks[3], image.shape) \
        * jax.random.uniform(ks[3], (b, 1, 1, 1), maxval=0.03)
    return jnp.clip(((image - 0.5) * contrast + 0.5 + bright) * gains + noise,
                    0.0, 1.0)

# ---------------------------------------------------------------------------
# Crop batches (ProxyNet training)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("b", "wh", "occluders", "domain_rand",
                                    "return_params", "with_image"))
def synth_crop_batch(assets: SMPLAssets, rng: jax.Array, b: int = 8,
                     wh: int = 256, occluders: bool = True,
                     domain_rand: bool = True,
                     return_params: bool = False,
                     with_image: bool = True) -> dict:
    """One batch of player-crop training tuples.

    Returns dict:
      image (B, wh, wh, 3) [0,1]; silhouette (B, wh, wh) {0,1} — the centred
      player's VISIBLE region; joints2d (B, 17, 2) pixels;
      kp_visible (B, 17) {0,1} in-frame AND unoccluded;
      part (B, wh/4, wh/4) int 0..24; uv (B, wh/4, wh/4, 2) [0,1].

    ``domain_rand=False`` is the ablation baseline: plain green-noise
    background, no motion blur / photometric jitter (kit coloring and
    shading stay — they are the body appearance itself).

    ``return_params=True`` adds the ground-truth SMPL sample the crop was
    rendered from — body_pose (B,23,3,3), global_orient (B,1,3,3), betas
    (B,10), cam_wp (B,3) — the supervision the STRAPS-style regressor
    trainer (train/straps.py) needs. ``with_image=False`` skips the RGB
    shading/background/augmentation work for consumers that only need
    geometry labels (the rasterizer pass still runs — it produces the
    occlusion-aware silhouette).
    """
    assert wh % STRIDE == 0
    keys = jax.random.split(rng, 12)
    body_rm, orient_rm, betas, cam_wp = random_smpl_params(keys[0], b)
    out = smpl_forward(assets, betas, body_rm, orient_rm, pose2rot=False)

    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    verts2d = perspective_project(out.vertices, None, transl,
                                  focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    verts_z = out.vertices[..., 2] + transl[:, None, 2]
    joints2d = perspective_project(
        out.joints[:, jnp.asarray(cfg.SMPL_TO_KPRCNN_MAP)], None, transl,
        focal_length=cfg.FOCAL_LENGTH, img_wh=wh)

    if with_image:
        colors = _shaded_colors(keys[1], out.vertices, assets.faces,
                                _kit_vertex_colors(assets, keys[2], b))
    else:   # geometry-only: a zero color channel keeps the attr layout
        colors = jnp.zeros(out.vertices.shape[:2] + (3,))

    # Occluding second player: own body/kit, offset to a crop edge, in front
    # of or behind the labeled player (z-buffer decides visibility).
    if occluders:
        o_body, o_orient, o_betas, o_cam = random_smpl_params(keys[3], b)
        side = jnp.where(jax.random.bernoulli(keys[4], 0.5, (b,)), 1.0, -1.0)
        o_cam = o_cam.at[:, 1].set(
            cam_wp[:, 1] + side * jax.random.uniform(
                keys[5], (b,), minval=0.35, maxval=0.8))
        o_out = smpl_forward(assets, o_betas, o_body, o_orient,
                             pose2rot=False)
        o_transl = weak_perspective_to_translation(o_cam, cfg.FOCAL_LENGTH,
                                                   wh)
        dz = jnp.where(jax.random.bernoulli(keys[6], 0.5, (b,)), -1.0, 1.0) \
            * jax.random.uniform(keys[6], (b,), minval=0.3, maxval=1.2)
        o_transl = o_transl.at[:, 2].add(dz)
        o_v2d = perspective_project(o_out.vertices, None, o_transl,
                                    focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
        o_z = o_out.vertices[..., 2] + o_transl[:, None, 2]
        present = jax.random.bernoulli(keys[7], 0.45, (b, 1)).astype(
            jnp.float32)
        o_v2d = o_v2d + (1.0 - present[..., None]) * 1e5   # absent → offscreen
        if with_image:
            o_colors = _shaded_colors(
                keys[8], o_out.vertices, assets.faces,
                _kit_vertex_colors(assets, keys[9], b))
        else:
            o_colors = jnp.zeros(o_out.vertices.shape[:2] + (3,))

        v = assets.v_template.shape[0]
        scene_v2d = jnp.concatenate([verts2d, o_v2d], axis=1)
        scene_z = jnp.concatenate([verts_z, o_z], axis=1)
        scene_colors = jnp.concatenate([colors, o_colors], axis=1)
        is_player = jnp.concatenate(
            [jnp.ones((b, v, 1)), jnp.zeros((b, v, 1))], axis=1)
        scene_faces = jnp.concatenate([assets.faces, assets.faces + v])
    else:
        scene_v2d, scene_z, scene_colors = verts2d, verts_z, colors
        is_player = jnp.ones((b, verts2d.shape[1], 1))
        scene_faces = assets.faces

    # Full-res pass: shaded RGB + player-ownership channel, z-buffered.
    full_attrs = jnp.concatenate([scene_colors, is_player], axis=-1)
    full, full_mask = rasterize_attributes(scene_v2d, scene_z, full_attrs,
                                           scene_faces, wh)
    body_rgb = full[..., :3]
    sil = (full_mask & (full[..., 3] > 0.5)).astype(jnp.float32)
    any_body = full_mask.astype(jnp.float32)

    # Stride-4 GT pass: part one-hot + UV + ownership on the same scene.
    small = wh // STRIDE
    parts = vertex_parts(assets)
    attr_small = jnp.concatenate([jax.nn.one_hot(parts, NUM_PARTS),
                                  vertex_uv(assets)], axis=-1)    # (V, 26)
    n_bodies = scene_v2d.shape[1] // assets.v_template.shape[0]
    attr_small = jnp.tile(attr_small, (n_bodies, 1))
    attr_small = jnp.concatenate([
        jnp.broadcast_to(attr_small[None],
                         (b,) + attr_small.shape), is_player], axis=-1)
    small_attr, small_mask = rasterize_attributes(
        scene_v2d * (small / wh), scene_z, attr_small, scene_faces, small)
    own_small = small_mask & (small_attr[..., -1] > 0.5)
    part = jnp.where(own_small,
                     jnp.argmax(small_attr[..., :NUM_PARTS], axis=-1) + 1, 0)
    uv = small_attr[..., NUM_PARTS:NUM_PARTS + 2] * own_small[..., None]

    # Per-joint visibility: inside the crop AND on a player-owned pixel
    # (3-px dilated sample so edge joints on silhouette boundaries count).
    ji = jnp.clip(jnp.round(joints2d).astype(jnp.int32), 0, wh - 1)
    vis_img = jax.lax.reduce_window(
        sil, 0.0, jax.lax.max, (1, 7, 7), (1, 1, 1),
        [(0, 0), (3, 3), (3, 3)])
    on_body = jax.vmap(lambda m, idx: m[idx[:, 1], idx[:, 0]])(vis_img, ji)
    in_frame = ((joints2d[..., 0] >= 0) & (joints2d[..., 0] < wh)
                & (joints2d[..., 1] >= 0) & (joints2d[..., 1] < wh))
    kp_visible = (on_body > 0.5) & in_frame

    batch = {"silhouette": sil, "joints2d": joints2d,
             "kp_visible": kp_visible.astype(jnp.float32),
             "part": part.astype(jnp.int32), "uv": uv}
    if with_image:
        if domain_rand:
            bg = _background(keys[10], b, wh, wh)
        else:
            k1, k2 = jax.random.split(keys[10])
            bg = jnp.clip(
                jnp.array([0.18, 0.42, 0.22])
                + jax.random.uniform(k1, (b, 1, 1, 3), minval=-0.08,
                                     maxval=0.08)
                + jax.random.uniform(k2, (b, wh, wh, 3), minval=-0.06,
                                     maxval=0.06), 0.0, 1.0)
        image = body_rgb * any_body[..., None] + bg * (1 - any_body[..., None])
        if domain_rand:
            image = _photometric(jax.random.fold_in(keys[11], 1),
                                 _motion_blur(keys[11], image))
        batch["image"] = image
    if return_params:
        batch.update(body_pose=body_rm, global_orient=orient_rm,
                     betas=betas, cam_wp=cam_wp)
    return batch

# ---------------------------------------------------------------------------
# Frame batches (detector training)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("b", "n_players", "hw"))
def synth_frame_batch(assets: SMPLAssets, rng: jax.Array, b: int = 2,
                      n_players: int = 6, hw: tuple = (256, 256)) -> dict:
    """Multi-player frames for detector training.

    Players are kit-colored shaded bodies placed by per-player
    weak-perspective cameras (small scale, scattered tx/ty) and rendered in
    one z-buffered pass, so overlapping players occlude naturally. A random
    subset of players is dropped (moved off-frame, validity mask 0) so the
    detector sees variable player counts.

    Returns dict: image (B, H, W, 3); boxes (B, N, 4) pixel [x1,y1,x2,y2];
    mask (B, N) validity; visible_fill (B, N) = visible (unoccluded,
    z-buffer-winning) pixels / bbox area. A fully visible player fills
    ~0.35-0.45 of its bbox, so fill ≈ 0.04 means ~90% occluded — callers
    gate on this (training: don't teach the net to hallucinate hidden
    players; eval: COCO-style ignore, the torchvision reference is only
    ever asked for VISIBLE people, player_detection.py:16-37).
    """
    h, w = hw
    wh = max(h, w)
    keys = jax.random.split(rng, 8)
    bn = b * n_players
    body_rm, orient_rm, betas, _ = random_smpl_params(keys[0], bn)
    out = smpl_forward(assets, betas, body_rm, orient_rm, pose2rot=False)

    ks = jax.random.split(keys[1], 3)
    s = jax.random.uniform(ks[0], (bn,), minval=0.08, maxval=0.28)
    tx = jax.random.uniform(ks[1], (bn,), minval=-0.85, maxval=0.85)
    ty = jax.random.uniform(ks[2], (bn,), minval=-0.75, maxval=0.75)
    cam_wp = jnp.stack([s, tx, ty], axis=-1)
    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    verts2d = perspective_project(out.vertices, None, transl,
                                  focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    verts_z = out.vertices[..., 2] + transl[:, None, 2]
    # Rectangular frame: center the square projection window on the frame.
    verts2d = verts2d + jnp.array([(w - wh) / 2.0, (h - wh) / 2.0])

    # Variable player count: dropped players go off-frame with mask 0.
    valid = jax.random.bernoulli(keys[2], 0.8, (bn,)).astype(jnp.float32)
    verts2d = verts2d + (1.0 - valid)[:, None, None] * 1e5

    boxes = jnp.concatenate([jnp.min(verts2d, axis=1),
                             jnp.max(verts2d, axis=1)], axis=-1)   # (BN, 4)

    colors = _shaded_colors(keys[3], out.vertices, assets.faces,
                            _kit_vertex_colors(assets, keys[4], bn))
    v = assets.v_template.shape[0]
    scene_v2d = verts2d.reshape(b, n_players * v, 2)
    scene_z = verts_z.reshape(b, n_players * v)
    # 4th attribute channel: per-player id (1..N) — the z-buffer winner per
    # pixel identifies WHICH player is visible there (all three verts of any
    # face share the id, so interpolation is exact).
    ids = jnp.repeat(jnp.arange(1, n_players + 1, dtype=jnp.float32), v)
    scene_attrs = jnp.concatenate(
        [colors.reshape(b, n_players * v, 3),
         jnp.broadcast_to(ids[None, :, None], (b, n_players * v, 1))],
        axis=-1)
    scene_faces = (jnp.tile(assets.faces, (n_players, 1))
                   + (jnp.arange(n_players).repeat(assets.faces.shape[0])
                      * v)[:, None])
    attrs, mask = rasterize_attributes(scene_v2d, scene_z, scene_attrs,
                                       scene_faces, wh)
    body = attrs[:, :h, :w, :3]
    any_sil = mask[:, :h, :w].astype(jnp.float32)
    id_map = jnp.round(attrs[:, :h, :w, 3]) * any_sil        # (B, h, w)

    boxes_n = boxes.reshape(b, n_players, 4)
    vis_px = jnp.sum(
        id_map[..., None] == jnp.arange(1, n_players + 1, dtype=jnp.float32),
        axis=(1, 2)).astype(jnp.float32)                     # (B, N)
    area = jnp.clip((boxes_n[..., 2] - boxes_n[..., 0])
                    * (boxes_n[..., 3] - boxes_n[..., 1]), 1.0, None)
    visible_fill = vis_px / area

    bg = _background(keys[5], b, h, w)
    image = body * any_sil[..., None] + bg * (1 - any_sil[..., None])
    image = _photometric(jax.random.fold_in(keys[7], 1),
                         _motion_blur(keys[6], image))

    return {"image": image, "boxes": boxes_n,
            "mask": valid.reshape(b, n_players),
            "visible_fill": visible_fill}
