"""Trainer for the inter-player PoseRelationModule.

The reference ships ``PoseRelationModule`` weights as external checkpoints
(``PyTorch3DTest.evaluate_model_relate`` loads them,
``PyTorch3DTest.py:1501-1861``; module ``models/regressor_relate.py``) that
are absent from the snapshot — so the relate path could never execute with
real parameters. This trainer supplies the capability in-repo: it learns,
on synthetic scenes with KNOWN inter-player structure
(:mod:`train.scenes`: shared team-action pose component, ball-facing
orientations correlated with broadcast-frame boxes), to refine noisy
per-player pose rotmats given every player's rotmats + boxes.

Noise model: per-joint right-multiplied rotation perturbations with a
per-scene magnitude sampled from a range covering the measured regressor
error band, plus heavy-tail outlier joints — so the module sees both small
corrections and gross single-joint failures. Supervision is plain masked
MSE to the GT rotmats in the flattened 216-dim space the module operates
in (matching the reference's residual formulation, regressor_relate.py:97).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.models.relation import PoseRelationModule
from soccerplayershapepose_tpu.ops.rotations import batch_rodrigues
from soccerplayershapepose_tpu.train.scenes import (
    orient_for_view, synth_scene_params)


class RelationTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


# v1 variant configuration (regressor_relate1.py:19-34): 16 units of dim
# 64 in a 1024-lifted space, dim_g=64 positional embedding.
V1_KWARGS = {"lift_dim": 1024, "n_relations": 16, "key_dim": 64,
             "geo_dim": 64}


def synth_relation_batch(rng: jax.Array, b: int = 8, n_players: int = 6,
                         noise_lo: float = 0.05, noise_hi: float = 0.35,
                         outlier_p: float = 0.06,
                         outlier_scale: float = 1.0) -> dict:
    """One batch of noisy-scene training tuples (jit/vmap-composed).

    Returns {rotmats_noisy (B,N,24,3,3), rotmats_gt, boxes (B,N,4),
    mask (B,N) bool}.
    """
    ks = jax.random.split(rng, 6)
    scenes = jax.vmap(lambda k: synth_scene_params(k, n_players))(
        jax.random.split(ks[0], b))
    azimuth = jax.random.uniform(ks[1], (b,), minval=-np.pi, maxval=np.pi)
    orient = jax.vmap(
        lambda k, yaw, az: orient_for_view(k, yaw, az))(
        jax.random.split(ks[2], b), scenes["yaw"], azimuth)  # (B,N,1,3,3)
    gt = jnp.concatenate([orient, scenes["body_pose"]], axis=2)  # (B,N,24..)

    # Per-scene noise magnitude + per-joint heavy-tail outliers.
    sigma = jax.random.uniform(ks[3], (b, 1, 1, 1),
                               minval=noise_lo, maxval=noise_hi)
    eps = jax.random.normal(ks[4], (b, n_players, cfg.NUM_JOINTS, 3)) * sigma
    out_mask = jax.random.bernoulli(
        ks[5], outlier_p, (b, n_players, cfg.NUM_JOINTS, 1))
    eps = eps + out_mask * jax.random.normal(
        jax.random.fold_in(ks[5], 1),
        (b, n_players, cfg.NUM_JOINTS, 3)) * outlier_scale
    noise_rm = batch_rodrigues(eps.reshape(-1, 3)) \
        .reshape(b, n_players, cfg.NUM_JOINTS, 3, 3)
    noisy = jnp.einsum("bnjik,bnjkl->bnjil", gt, noise_rm)

    # Variable player count: at least 2 real players per scene.
    n_real = jax.random.randint(jax.random.fold_in(ks[5], 2), (b,), 2,
                                n_players + 1)
    mask = jnp.arange(n_players)[None] < n_real[:, None]
    return {"rotmats_noisy": noisy, "rotmats_gt": gt,
            "boxes": scenes["boxes"], "mask": mask}


def make_relation_train_step(relation: PoseRelationModule,
                             tx: optax.GradientTransformation):
    def step(state: RelationTrainState, batch: dict):
        def loss_fn(params):
            refined = relation.apply(params, batch["rotmats_noisy"],
                                     batch["boxes"], batch["mask"])
            m = batch["mask"][..., None, None, None]
            err = jnp.where(m, refined - batch["rotmats_gt"], 0.0)
            in_err = jnp.where(m, batch["rotmats_noisy"]
                               - batch["rotmats_gt"], 0.0)
            denom = jnp.maximum(jnp.sum(batch["mask"]), 1.0) * 216.0
            loss = jnp.sum(err ** 2) / denom
            return loss, jnp.sum(in_err ** 2) / denom
        (loss, in_mse), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (RelationTrainState(params, opt_state, state.step + 1),
                {"loss": loss, "input_mse": in_mse})
    return step


def train_relation(rng: jax.Array, steps: int = 3000, b: int = 8,
                   n_players: int = 6, lr: float = 1e-3,
                   lift_dim: Optional[int] = None,
                   log_every: int = 200, verbose: bool = True):
    """Train a relation module on synthetic correlated scenes.

    ``lift_dim=1024`` selects the full v1 configuration (16 units × dim
    64, geo_dim 64 — :data:`V1_KWARGS`). Returns (relation_module,
    params, history).
    """
    relation = PoseRelationModule(**(V1_KWARGS if lift_dim else {}))
    k_init, k_data = jax.random.split(rng)
    dummy = synth_relation_batch(jax.random.fold_in(k_data, 0), b=1,
                                 n_players=n_players)
    params = relation.init(k_init, dummy["rotmats_noisy"], dummy["boxes"],
                           dummy["mask"])
    if lift_dim is None:
        # Zero the value projection so the v0 residual starts at exact
        # identity (refined == input); training then strictly improves on
        # the no-relation baseline instead of first unlearning random
        # attention output.
        params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze copy
        wv = params["params"]["WV"]
        params["params"]["WV"] = {k: jnp.zeros_like(v)
                                  for k, v in wv.items()}
    tx = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, lr, max(steps // 10, 1), steps, lr * 0.05))
    state = RelationTrainState(params, tx.init(params),
                               jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_relation_train_step(relation, tx))
    batch_fn = jax.jit(lambda k: synth_relation_batch(
        k, b=b, n_players=n_players))

    history = []
    for i in range(steps):
        state, metrics = step_fn(state, batch_fn(
            jax.random.fold_in(k_data, i + 1)))
        if (i + 1) % log_every == 0 or i + 1 == steps:
            rec = {"step": i + 1,
                   **{k: float(v) for k, v in metrics.items()}}
            history.append(rec)
            if verbose:
                print(f"relation step {rec['step']}: loss {rec['loss']:.5f} "
                      f"(input {rec['input_mse']:.5f})", flush=True)
    return relation, state.params, history


def evaluate_relation(relation: PoseRelationModule, params, assets,
                      n_batches: int = 8, b: int = 8, n_players: int = 6,
                      seed: int = 50_000_000) -> dict:
    """Held-out denoising metrics: rotmat MSE + mean per-joint geodesic
    angle + MPJPE (SMPL forward) before vs after relation refinement."""
    from soccerplayershapepose_tpu.smpl.model import smpl_forward

    coco = jnp.asarray(cfg.ALL_JOINTS_TO_COCO_MAP)

    @jax.jit
    def cell(rng):
        batch = synth_relation_batch(rng, b=b, n_players=n_players)
        refined = relation.apply(params, batch["rotmats_noisy"],
                                 batch["boxes"], batch["mask"])
        m = batch["mask"]
        w = m[..., None, None, None]
        denom = jnp.maximum(jnp.sum(m), 1.0)

        def mse(x):
            return jnp.sum(jnp.where(w, (x - batch["rotmats_gt"]) ** 2,
                                     0.0)) / (denom * 216.0)

        def angle_deg(x):
            # geodesic angle via trace(R_gt^T R); refined rotmats are a
            # residual sum (reference quirk) — project-free estimate.
            rel = jnp.einsum("bnjki,bnjkl->bnjil", batch["rotmats_gt"], x)
            tr = jnp.clip((jnp.trace(rel, axis1=-2, axis2=-1) - 1) / 2,
                          -1.0, 1.0)
            a = jnp.degrees(jnp.arccos(tr))
            return jnp.sum(jnp.where(m[..., None], a, 0.0)) \
                / (denom * cfg.NUM_JOINTS)

        def mpjpe(x):
            flat = x.reshape(-1, cfg.NUM_JOINTS, 3, 3)
            betas = jnp.zeros((flat.shape[0], 10))
            out = smpl_forward(assets, betas, flat[:, 1:], flat[:, :1])
            gt_flat = batch["rotmats_gt"].reshape(-1, cfg.NUM_JOINTS, 3, 3)
            gt_out = smpl_forward(assets, betas, gt_flat[:, 1:],
                                  gt_flat[:, :1])
            d = jnp.linalg.norm(out.joints[:, coco] - gt_out.joints[:, coco],
                                axis=-1).mean(-1).reshape(b, n_players)
            return jnp.sum(jnp.where(m, d, 0.0)) / denom * 1000.0

        return {"mse_in": mse(batch["rotmats_noisy"]),
                "mse_out": mse(refined),
                "angle_in_deg": angle_deg(batch["rotmats_noisy"]),
                "angle_out_deg": angle_deg(refined),
                "mpjpe_in_mm": mpjpe(batch["rotmats_noisy"]),
                "mpjpe_out_mm": mpjpe(refined)}

    sums = None
    for i in range(n_batches):
        m = {k: float(v) for k, v in cell(
            jax.random.fold_in(jax.random.PRNGKey(seed), i)).items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
    out = {k: v / n_batches for k, v in sums.items()}
    out["n_scenes"] = n_batches * b
    return out


def save_relation_weights(path: str, params) -> None:
    from soccerplayershapepose_tpu.train.checkpoint import _flatten
    flat = _flatten({"params": params["params"]})
    np.savez(path, **flat)


def load_relation_weights(path: str, relation: PoseRelationModule,
                          n_players: int = 6) -> dict:
    from soccerplayershapepose_tpu.train.checkpoint import _unflatten_like
    template = relation.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, n_players, cfg.NUM_JOINTS, 3, 3)),
        jnp.zeros((1, n_players, 4)), jnp.ones((1, n_players), bool))
    flat = dict(np.load(path))
    return _unflatten_like({"params": template["params"]}, flat)
