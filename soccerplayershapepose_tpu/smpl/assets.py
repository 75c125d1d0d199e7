"""SMPL model assets: loading real files or synthesizing a compatible model.

The reference wraps the external ``smplx`` package and loads model ``.pkl``
files plus three extra joint regressors
(``/root/reference/Python/Soccer/PlayerReconstruction/models/smpl_official.py:10-41``,
``config.py:3-12``). Those binary assets are NOT in the snapshot
(``.MISSING_LARGE_BLOBS``), so this module provides:

* :func:`load_assets` — reads real SMPL assets (``.npz`` export or a
  chumpy-free ``.pkl``) plus the ``J_regressor_*.npy`` extras when present;
* :func:`synthesize_assets` — a deterministic, structurally-identical stand-in
  (6890 verts / 13776 faces / 24 joints / 10 betas / 207 pose blendshapes /
  21 vertex-selected extra joints / 9+19+17 extra regressors) built from a
  closed sphere triangulation deformed into a rough body shape, so every
  downstream kernel (LBS, rasterizer, fitting) runs with true shapes and
  realistic sparsity. Parity tests compare the JAX forward against an
  independent numpy LBS on these assets.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg


@dataclasses.dataclass(frozen=True)
class SMPLAssets:
    """Pytree of SMPL model tensors (float32 jnp arrays).

    ``parents`` is static metadata (a tuple of Python ints) because the
    kinematic chain is unrolled at trace time.
    """

    v_template: jnp.ndarray        # (V, 3)
    shapedirs: jnp.ndarray         # (V, 3, 10)
    posedirs: jnp.ndarray          # (207, V*3)  — row-major (v, xyz) flatten
    j_regressor: jnp.ndarray       # (24, V)
    lbs_weights: jnp.ndarray       # (V, 24)
    faces: jnp.ndarray             # (F, 3) int32
    extra_joint_vertex_ids: jnp.ndarray   # (21,) int32
    j_regressor_extra: jnp.ndarray        # (9, V)
    j_regressor_cocoplus: jnp.ndarray     # (19, V)
    j_regressor_h36m: jnp.ndarray         # (17, V)
    mean_pose_rot6d: jnp.ndarray          # (24*6,) IEF initialisation
    mean_shape: jnp.ndarray               # (10,)
    parents: tuple = cfg.SMPL_PARENTS    # static kinematic tree


jax.tree_util.register_dataclass(
    SMPLAssets,
    data_fields=["v_template", "shapedirs", "posedirs", "j_regressor",
                 "lbs_weights", "faces", "extra_joint_vertex_ids",
                 "j_regressor_extra", "j_regressor_cocoplus",
                 "j_regressor_h36m", "mean_pose_rot6d", "mean_shape"],
    meta_fields=["parents"],
)


def _sphere_mesh(n_rings: int = 82, n_cols: int = 84):
    """Closed UV-sphere triangulation with exactly V = rings*cols + 2 = 6890
    vertices and F = 2*rings*cols = 13776 faces (Euler: F = 2V - 4)."""
    v = np.zeros((n_rings * n_cols + 2, 3), dtype=np.float64)
    v[0] = (0.0, 1.0, 0.0)      # north pole
    v[-1] = (0.0, -1.0, 0.0)    # south pole
    idx = 1
    for r in range(n_rings):
        phi = np.pi * (r + 1) / (n_rings + 1)
        for c in range(n_cols):
            theta = 2 * np.pi * c / n_cols
            v[idx] = (np.sin(phi) * np.cos(theta), np.cos(phi),
                      np.sin(phi) * np.sin(theta))
            idx += 1

    faces = []
    def ring_vert(r, c):
        return 1 + r * n_cols + (c % n_cols)
    for c in range(n_cols):           # north cap
        faces.append((0, ring_vert(0, c + 1), ring_vert(0, c)))
    for r in range(n_rings - 1):      # quads split in two
        for c in range(n_cols):
            a, b = ring_vert(r, c), ring_vert(r, c + 1)
            d, e = ring_vert(r + 1, c), ring_vert(r + 1, c + 1)
            faces.append((a, b, e))
            faces.append((a, e, d))
    last = n_rings * n_cols + 1
    for c in range(n_cols):           # south cap
        faces.append((last, ring_vert(n_rings - 1, c), ring_vert(n_rings - 1, c + 1)))
    return v, np.asarray(faces, dtype=np.int32)


# Canonical rest-pose joint positions of a rough T-posed body (x right, y up,
# z forward), ordered like SMPL: pelvis, L/R hip, spine1, L/R knee, spine2,
# L/R ankle, spine3, L/R foot, neck, L/R collar, head, L/R shoulder,
# L/R elbow, L/R wrist, L/R hand.
_JOINT_POSITIONS = np.array([
    [0.00, 0.00, 0.0],   # 0 pelvis
    [0.09, -0.07, 0.0],  # 1 left hip
    [-0.09, -0.07, 0.0], # 2 right hip
    [0.00, 0.12, 0.0],   # 3 spine1
    [0.10, -0.45, 0.0],  # 4 left knee
    [-0.10, -0.45, 0.0], # 5 right knee
    [0.00, 0.25, 0.0],   # 6 spine2
    [0.10, -0.85, 0.0],  # 7 left ankle
    [-0.10, -0.85, 0.0], # 8 right ankle
    [0.00, 0.32, 0.0],   # 9 spine3
    [0.12, -0.92, 0.10], # 10 left foot
    [-0.12, -0.92, 0.10],# 11 right foot
    [0.00, 0.45, 0.0],   # 12 neck
    [0.08, 0.40, 0.0],   # 13 left collar
    [-0.08, 0.40, 0.0],  # 14 right collar
    [0.00, 0.58, 0.0],   # 15 head
    [0.18, 0.42, 0.0],   # 16 left shoulder
    [-0.18, 0.42, 0.0],  # 17 right shoulder
    [0.45, 0.42, 0.0],   # 18 left elbow
    [-0.45, 0.42, 0.0],  # 19 right elbow
    [0.70, 0.42, 0.0],   # 20 left wrist
    [-0.70, 0.42, 0.0],  # 21 right wrist
    [0.78, 0.42, 0.0],   # 22 left hand
    [-0.78, 0.42, 0.0],  # 23 right hand
], dtype=np.float64)


def synthesize_assets(seed: int = 0) -> SMPLAssets:
    """Deterministic SMPL-compatible synthetic model (see module docstring)."""
    rng = np.random.RandomState(seed)
    v_sphere, faces = _sphere_mesh()
    assert v_sphere.shape[0] == cfg.NUM_VERTS and faces.shape[0] == cfg.NUM_FACES

    # Deform the sphere into a body-ish ellipsoid spanning the joint skeleton.
    v_template = v_sphere * np.array([0.45, 0.85, 0.22]) + np.array([0.0, -0.15, 0.0])

    joints = _JOINT_POSITIONS

    # LBS weights: softmax over negative squared distance to joints, sharp
    # enough to be realistically sparse (~2-4 effective joints per vertex).
    d2 = ((v_template[:, None, :] - joints[None, :, :]) ** 2).sum(-1)
    logits = -d2 / 0.02
    logits -= logits.max(axis=1, keepdims=True)
    w = np.exp(logits)
    lbs_weights = w / w.sum(axis=1, keepdims=True)

    # Joint regressor: for each joint, convex weights over its nearest 32
    # vertices (soft nearest-neighbour), so J_regressor @ v_template ≈ joints.
    j_regressor = np.zeros((cfg.NUM_JOINTS, cfg.NUM_VERTS))
    for j in range(cfg.NUM_JOINTS):
        nearest = np.argsort(d2[:, j])[:32]
        wj = np.exp(-d2[nearest, j] / 0.01)
        j_regressor[j, nearest] = wj / wj.sum()

    def _sparse_regressor(n_joints: int, spread: float = 0.02) -> np.ndarray:
        reg = np.zeros((n_joints, cfg.NUM_VERTS))
        anchors = rng.randint(0, cfg.NUM_VERTS, size=n_joints)
        for j, a in enumerate(anchors):
            d = ((v_template - v_template[a]) ** 2).sum(-1)
            nearest = np.argsort(d)[:24]
            wj = np.exp(-d[nearest] / spread)
            reg[j, nearest] = wj / wj.sum()
        return reg

    shapedirs = rng.randn(cfg.NUM_VERTS, 3, cfg.NUM_BETAS) * 0.01
    posedirs = rng.randn(cfg.NUM_POSE_BLENDSHAPES, cfg.NUM_VERTS * 3) * 0.001

    # Mean pose for IEF init: identity rotations in the 6D layout
    # [1,0,0,1,0,0] per joint (see ops.rotations.rot6d_to_rotmat layout).
    mean_pose = np.tile(np.array([1, 0, 0, 1, 0, 0], dtype=np.float32),
                        cfg.NUM_JOINTS)

    return SMPLAssets(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(j_regressor, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        parents=cfg.SMPL_PARENTS,
        faces=jnp.asarray(faces, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(cfg.EXTRA_JOINT_VERTEX_IDS, jnp.int32),
        j_regressor_extra=jnp.asarray(_sparse_regressor(cfg.NUM_EXTRA_JOINTS), jnp.float32),
        j_regressor_cocoplus=jnp.asarray(_sparse_regressor(cfg.NUM_COCOPLUS_JOINTS), jnp.float32),
        j_regressor_h36m=jnp.asarray(_sparse_regressor(cfg.NUM_H36M_JOINTS), jnp.float32),
        mean_pose_rot6d=jnp.asarray(mean_pose, jnp.float32),
        mean_shape=jnp.zeros((cfg.NUM_BETAS,), jnp.float32),
    )


def load_assets(model_dir: Optional[str] = None,
                gender: str = "neutral",
                mean_params_path: Optional[str] = None,
                extra_regressor_dir: Optional[str] = None) -> SMPLAssets:
    """Load real SMPL assets if available, else synthesize.

    Accepts either ``SMPL_<GENDER>.npz`` (numpy export) or a chumpy-free
    ``.pkl`` in ``model_dir``. Extra regressors (``J_regressor_extra.npy``,
    ``cocoplus_regressor.npy``, ``J_regressor_h36m.npy``) and the IEF
    mean-parameter file (``neutral_smpl_mean_params_6dpose.npz``, reference
    models/ief_module.py:33-46) are read when present.
    """
    data = None
    if model_dir:
        for name in (f"SMPL_{gender.upper()}.npz", f"smpl_{gender}.npz",
                     f"SMPL_{gender.upper()}.pkl",
                     f"basicModel_{gender}_lbs_10_207_0_v1.0.0.pkl"):
            path = os.path.join(model_dir, name)
            if os.path.exists(path):
                if path.endswith(".npz"):
                    data = dict(np.load(path, allow_pickle=True))
                else:
                    with open(path, "rb") as f:
                        raw = pickle.load(f, encoding="latin1")
                    # Keep values as-is: np.asarray would wrap scipy-sparse
                    # matrices (J_regressor in real SMPL pkls) into 0-d
                    # object arrays, losing .todense for _dense below.
                    data = {k: v for k, v in raw.items()
                            if not isinstance(v, str)}
                break
    if data is None:
        return synthesize_assets()

    def _dense(x):
        return np.asarray(x.todense() if hasattr(x, "todense") else x, np.float64)

    v_template = _dense(data["v_template"])
    shapedirs = _dense(data["shapedirs"])[..., :cfg.NUM_BETAS]
    posedirs = _dense(data["posedirs"])
    posedirs = posedirs.reshape(cfg.NUM_VERTS * 3, -1).T   # (207, V*3)
    j_regressor = _dense(data["J_regressor"])
    lbs_weights = _dense(data["weights"])
    faces = np.asarray(data.get("f", data.get("faces")), np.int32)
    parents = np.asarray(data["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    parents = tuple(int(x) for x in parents)

    def _load_npy(fname, fallback):
        if extra_regressor_dir:
            p = os.path.join(extra_regressor_dir, fname)
            if os.path.exists(p):
                return np.load(p).astype(np.float32)
        return fallback

    synth = synthesize_assets()
    mean_pose = np.asarray(synth.mean_pose_rot6d)
    mean_shape = np.zeros((cfg.NUM_BETAS,), np.float32)
    if mean_params_path and os.path.exists(mean_params_path):
        mp = np.load(mean_params_path)
        mean_pose = mp["pose"].astype(np.float32)
        mean_shape = mp["shape"].astype(np.float32)

    return SMPLAssets(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(j_regressor, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        parents=parents,
        faces=jnp.asarray(faces, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(cfg.EXTRA_JOINT_VERTEX_IDS, jnp.int32),
        j_regressor_extra=jnp.asarray(
            _load_npy("J_regressor_extra.npy", np.asarray(synth.j_regressor_extra)), jnp.float32),
        j_regressor_cocoplus=jnp.asarray(
            _load_npy("cocoplus_regressor.npy", np.asarray(synth.j_regressor_cocoplus)), jnp.float32),
        j_regressor_h36m=jnp.asarray(
            _load_npy("J_regressor_h36m.npy", np.asarray(synth.j_regressor_h36m)), jnp.float32),
        mean_pose_rot6d=jnp.asarray(mean_pose, jnp.float32),
        mean_shape=jnp.asarray(mean_shape, jnp.float32),
    )
