"""Folder-tree distillation training + evaluation drivers.

Role of the reference ``PyTorch3DTest.train_regressor`` / ``evaluate_model``
(``/root/reference/Python/Soccer/PlayerReconstruction/PyTorch3DTest.py:831-1500``)
and ``player_iuv_sp.train_regressor_iuv``: per scene, gather ALL players'
proxies and broadcast-view-optimized pseudo-GT, train the regressor with the
multi-task loss, split train/val by game via ``Data/train_set.xml``
(:855-856, 964-970), track the PVE/MPJPE metric family, and checkpoint current
+ best weights with the all-val-metrics-improve rule (:1123-1178).

TPU re-design: scenes become padded fixed-size batches (max_players) feeding
one jitted train step; metric sums come back as a handful of scalars per step.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.drivers.stages import load_proxy_batch
from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.metrics import measures
from soccerplayershapepose_tpu.metrics.tracker import MetricsTracker
from soccerplayershapepose_tpu.models.regressor import SingleInputRegressor
from soccerplayershapepose_tpu.pipeline.proxy import create_proxy_representation
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets
from soccerplayershapepose_tpu.train.checkpoint import CheckpointManager
from soccerplayershapepose_tpu.train.distill import (
    make_eval_step, make_train_state, make_train_step)

TRACKED_METRICS = ("pves", "pves_sc", "pves_pa", "pve-ts", "pve-ts_sc",
                   "mpjpes", "mpjpes_sc", "mpjpes_pa",
                   "pose_mses", "shape_mses", "joints2D_l2es")
SAVE_VAL_METRICS = ("pves_pa", "mpjpes_pa")


def read_train_split(path: str) -> List[str]:
    """Game names in the train split (Data/train_set.xml, JSON list)."""
    return [str(g) for g in io.read_json_xml(path)]


def gather_scene_batches(image_root: str, proxy_root: str, target_root: str,
                         max_players: int = cfg.MAX_PLAYERS_PER_FRAME
                         ) -> List[dict]:
    """One padded batch per scene: proxies + broad-view pseudo-GT npz."""
    scenes: Dict[Tuple[str, str], List[io.PlayerTree]] = {}
    for node in io.walk_player_tree(image_root):
        tgt = os.path.join(target_root, node.game, node.scene, node.player,
                           "data.npz")
        prx = os.path.join(proxy_root, node.game, node.scene, node.player)
        if os.path.exists(tgt) and os.path.isdir(prx) and node.views:
            scenes.setdefault((node.game, node.scene), []).append(node)

    batches = []
    for (game, scene), nodes in sorted(scenes.items()):
        nodes = nodes[:max_players]
        sils, joints, poses, betas = [], [], [], []
        for node in nodes:
            prx = os.path.join(proxy_root, node.game, node.scene, node.player)
            s, j = load_proxy_batch(prx, node.views[:1])
            sils.append(s[0])
            joints.append(j[0])
            d = io.read_fit_npz(os.path.join(target_root, node.game,
                                             node.scene, node.player,
                                             "data.npz"))
            poses.append(np.concatenate([d["global_orient"][0],
                                         d["body_pose"][0]], axis=0))
            betas.append(d["betas"][0])
        n = len(nodes)
        pad = max_players - n

        def padded(arr_list, template):
            arr = np.stack(arr_list).astype(np.float32)
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            return arr

        batches.append({
            "game": game, "scene": scene, "num_real": n,
            "silhouette": padded(sils, None),
            "joints2d": padded(joints, None),
            "target_pose": padded(poses, None),
            "target_betas": padded(betas, None),
            "mask": (np.arange(max_players) < n).astype(np.float32),
        })
    return batches


def _device_batch(batch: dict) -> dict:
    proxy = create_proxy_representation(
        jnp.asarray(batch["silhouette"]), jnp.asarray(batch["joints2d"]))
    return {"proxy": proxy,
            "joints2d": jnp.asarray(batch["joints2d"][..., :2]),
            "target_pose": jnp.asarray(batch["target_pose"]),
            "target_betas": jnp.asarray(batch["target_betas"]),
            "mask": jnp.asarray(batch["mask"])}


def _metric_sums(aux: dict, mask: np.ndarray) -> Dict[str, float]:
    """Per-batch metric SUMS over real players (device → 11 scalars)."""
    pred, target = aux["pred"], aux["target"]
    h36m = jnp.asarray(cfg.ALL_JOINTS_TO_H36M_MAP)
    j14 = jnp.asarray(cfg.H36M_TO_J14)
    pj = pred["joints3D"][:, h36m][:, j14]
    tj = target["joints3D"][:, h36m][:, j14]
    m = jnp.asarray(mask)

    vals = {
        "pves": measures.pve(pred["verts"], target["verts"]),
        "pves_sc": measures.pve_sc(pred["verts"], target["verts"]),
        "pves_pa": measures.pve_pa(pred["verts"], target["verts"]),
        "pve-ts": measures.pve(pred["reposed_verts"], target["reposed_verts"]),
        "pve-ts_sc": measures.pve_sc(pred["reposed_verts"],
                                     target["reposed_verts"]),
        "mpjpes": measures.mpjpe(pj, tj),
        "mpjpes_sc": measures.mpjpe_sc(pj, tj),
        "mpjpes_pa": measures.mpjpe_pa(pj, tj),
        "pose_mses": measures.pose_mse(pred["pose_rotmats"],
                                       target["pose_rotmats"]),
        "shape_mses": measures.shape_mse(pred["betas"], target["betas"]),
    }
    return {k: float(jnp.sum(v * m)) for k, v in vals.items()}


def train_regressor(assets: SMPLAssets,
                    image_root: str, proxy_root: str, target_root: str,
                    checkpoint_dir: str,
                    train_games: Optional[Sequence[str]] = None,
                    epochs: int = cfg.REGRESSOR_TRAIN_EPOCHS,
                    learning_rate: float = cfg.REGRESSOR_TRAIN_LR,
                    in_channels: int = 18,
                    max_players: int = cfg.MAX_PLAYERS_PER_FRAME,
                    log_path: Optional[str] = None,
                    seed: int = 0,
                    resume: bool = False,
                    init_weights: Optional[str] = None) -> dict:
    """Scene-batched distillation training loop (see module docstring).

    ``init_weights`` warm-starts params + BN stats from a packed regressor
    .npz (train/straps.py save_regressor_weights) — the reference fine-tunes
    from the STRAPS checkpoint rather than training from scratch
    (PyTorch3DTest.py:893-900 loads resume/pretrained weights).
    """
    regressor = SingleInputRegressor(in_channels=in_channels)
    state, tx = make_train_state(regressor, jax.random.PRNGKey(seed),
                                 learning_rate=learning_rate)
    if init_weights:
        from soccerplayershapepose_tpu.train.straps import \
            load_regressor_weights
        variables = load_regressor_weights(init_weights, regressor, assets)
        state = state._replace(params=variables["params"],
                               batch_stats=variables["batch_stats"])
    train_step = jax.jit(make_train_step(regressor, tx))
    eval_step = jax.jit(make_eval_step(regressor))

    batches = gather_scene_batches(image_root, proxy_root, target_root,
                                   max_players)
    if train_games is None:
        games = sorted({b["game"] for b in batches})
        train_games = games[:max(1, int(len(games) * 0.8))]
    train_batches = [b for b in batches if b["game"] in set(train_games)]
    val_batches = [b for b in batches if b["game"] not in set(train_games)] \
        or train_batches[-1:]

    tracker = MetricsTracker(
        losses_to_track=["verts", "joints2D", "joints3D", "pose_params",
                         "shape_params"],
        metrics_to_track=list(TRACKED_METRICS), log_path=log_path)
    ckpt = CheckpointManager(checkpoint_dir, list(SAVE_VAL_METRICS))

    best_epoch = 0
    best_params = state.params
    best_val = {m: np.inf for m in SAVE_VAL_METRICS}
    start_epoch = 1
    if resume and os.path.exists(os.path.join(checkpoint_dir, "latest")):
        state, best_params, meta = ckpt.restore(state)
        best_epoch = meta["best_epoch"]
        best_val = meta["best_epoch_val_metrics"]
        start_epoch = meta["epoch"] + 1
        if log_path and os.path.exists(log_path):
            tracker.load(log_path, meta["epoch"])

    rng = np.random.RandomState(seed)
    for epoch in range(start_epoch, epochs + 1):
        order = rng.permutation(len(train_batches))
        for i in order:
            db = _device_batch(train_batches[i])
            state, step_metrics, aux = train_step(state, assets, db)
            n = train_batches[i]["num_real"]
            sums = _metric_sums(aux, train_batches[i]["mask"])
            sums["joints2D_l2es"] = 0.0
            tracker.update_per_batch(
                "train", float(step_metrics["loss"]),
                {k.split("/", 1)[1]: float(v) for k, v in step_metrics.items()
                 if k.startswith("loss/")},
                sums, n)
        for b in val_batches:
            db = _device_batch(b)
            step_metrics, aux = eval_step(state, assets, db)
            sums = _metric_sums(aux, b["mask"])
            sums["joints2D_l2es"] = 0.0
            tracker.update_per_batch(
                "val", float(step_metrics["loss"]),
                {k.split("/", 1)[1]: float(v) for k, v in step_metrics.items()
                 if k.startswith("loss/")},
                sums, b["num_real"])
        tracker.update_per_epoch()

        if tracker.determine_save_model_weights_this_epoch(
                list(SAVE_VAL_METRICS), best_val):
            best_epoch = epoch
            best_params = state.params
            for m in SAVE_VAL_METRICS:
                best_val[m] = tracker.history[f"val_{m}"][-1]
        ckpt.save(epoch, state, best_params, best_epoch,
                  {k: float(v) for k, v in best_val.items()})

    return {"state": state, "best_params": best_params,
            "best_epoch": best_epoch, "best_val": best_val,
            "history": tracker.history}


def evaluate_model(assets: SMPLAssets, image_root: str, proxy_root: str,
                   target_root: str, state,
                   in_channels: int = 18,
                   max_players: int = cfg.MAX_PLAYERS_PER_FRAME) -> dict:
    """Eval pass over every scene: mean PVE/MPJPE family vs pseudo-GT
    (PyTorch3DTest.evaluate_model :1186+)."""
    regressor = SingleInputRegressor(in_channels=in_channels)
    eval_step = jax.jit(make_eval_step(regressor))
    batches = gather_scene_batches(image_root, proxy_root, target_root,
                                   max_players)
    totals = {m: 0.0 for m in TRACKED_METRICS}
    n_total = 0
    for b in batches:
        _, aux = eval_step(state, assets, _device_batch(b))
        sums = _metric_sums(aux, b["mask"])
        for k, v in sums.items():
            totals[k] = totals.get(k, 0.0) + v
        n_total += b["num_real"]

    per_sample = {"pve": 6890, "mpjpe": 14, "pose_mse": 216, "shape_mse": 10}

    def divisor(metric):
        for key, n in per_sample.items():
            if key in metric.replace("-", "_") or key in metric:
                return n
        return 1

    return {m: (totals[m] / (n_total * divisor(m)) if n_total else np.nan)
            for m in totals} | {"num_players": n_total}


def evaluate_model_relate(assets: SMPLAssets, image_root: str,
                          proxy_root: str, target_root: str, state,
                          relation_params=None, boxes_root: str = None,
                          optimize_cam: bool = False,
                          in_channels: int = 18,
                          relation_kwargs: Optional[dict] = None,
                          max_players: int = cfg.MAX_PLAYERS_PER_FRAME,
                          allow_random_init: bool = False) -> dict:
    """Relation-module evaluation (PyTorch3DTest.evaluate_model_relate
    :1501-1860): run the regressor per scene, refine the batch's pose rotmats
    with the bbox-geometry PoseRelationModule (:1747-1756), optionally
    re-optimize [cam, orient] per player with the 50-iter joints2D-only Adam
    of ``optimize_camera`` (:3055-3139), then report the PVE/MPJPE family.

    Boxes come from ``<boxes_root>/<game>/<scene>/boxes.xml`` with player
    folder names indexing ``index.xml``; without a boxes tree, unit boxes at
    the origin are used (geometry gate becomes uninformative but shapes hold).

    ``relation_params`` is REQUIRED — pass converted reference weights
    (``io.torch_import.load_relation_checkpoint``) or a trained flax tree.
    Random init would produce numbers that look like metrics but mean
    nothing, so it is an error (``allow_random_init=True`` opts out for
    shape/smoke tests only).
    """
    import flax.linen  # noqa: F401  (ensures flax import errors surface here)
    from soccerplayershapepose_tpu.fit import FitConfig, broad_view_fit
    from soccerplayershapepose_tpu.models.ief import default_initial_params
    from soccerplayershapepose_tpu.models.relation import PoseRelationModule
    from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
    from soccerplayershapepose_tpu.smpl.model import smpl_forward, smpl_shape_only

    regressor = SingleInputRegressor(in_channels=in_channels)
    relation = PoseRelationModule(**(relation_kwargs or {}))
    batches = gather_scene_batches(image_root, proxy_root, target_root,
                                   max_players)

    if relation_params is None:
        if not allow_random_init:
            raise ValueError(
                "evaluate_model_relate needs trained relation weights: pass "
                "relation_params (e.g. io.torch_import."
                "load_relation_checkpoint(path)). Random init is only "
                "meaningful for smoke tests; opt in with "
                "allow_random_init=True.")
        rng = jax.random.PRNGKey(0)
        relation_params = relation.init(
            rng, jnp.zeros((1, max_players, 24, 3, 3)),
            jnp.zeros((1, max_players, 4)),
            jnp.ones((1, max_players), bool))

    def load_boxes(game, scene, n):
        if boxes_root:
            path = os.path.join(boxes_root, game, scene, "boxes.xml")
            if os.path.exists(path):
                boxes = io.read_boxes(path)[:n].astype(np.float32)
                if len(boxes) < n:
                    boxes = np.concatenate(
                        [boxes, np.tile([[0, 0, 1, 1]], (n - len(boxes), 1))])
                return boxes
        return np.tile(np.array([[0, 0, 1, 1]], np.float32), (max_players, 1))

    @jax.jit
    def forward(params, batch_stats, rel_params, assets, proxy, boxes, mask):
        variables = {"params": params, "batch_stats": batch_stats}
        init = default_initial_params(assets.mean_pose_rot6d,
                                      assets.mean_shape)
        cam_wp, pose6d, betas = regressor.apply(variables, proxy, init)
        rotmats = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        refined = relation.apply(rel_params, rotmats[None], boxes[None],
                                 mask[None].astype(bool))[0]
        return cam_wp, refined, betas

    totals = {m: 0.0 for m in TRACKED_METRICS}
    n_total = 0
    fit_cfg = FitConfig(iters=50, lr=0.01, use_silhouette=False,
                        silhouette_metrics=False)
    for b in batches:
        db = _device_batch(b)
        boxes = jnp.asarray(load_boxes(b["game"], b["scene"], max_players))
        cam_wp, rotmats, betas = forward(state.params, state.batch_stats,
                                         relation_params, assets,
                                         db["proxy"], boxes, db["mask"])
        if optimize_cam:
            res = broad_view_fit(assets, rotmats[:, 1:], betas,
                                 rotmats[:, :1], cam_wp,
                                 jnp.zeros(rotmats.shape[:1] + (512, 512)),
                                 db["joints2d"], fit_cfg,
                                 mask=db["mask"])
            rotmats = jnp.concatenate([res.global_orient, res.body_pose],
                                      axis=1)
            cam_wp = res.cam_wp

        pred = smpl_forward(assets, betas, rotmats[:, 1:], rotmats[:, :1])
        target = smpl_forward(assets, db["target_betas"],
                              db["target_pose"][:, 1:],
                              db["target_pose"][:, :1])
        aux = {"pred": {"verts": pred.vertices, "joints3D": pred.joints,
                        "betas": betas, "pose_rotmats": rotmats,
                        "reposed_verts": smpl_shape_only(assets, betas)},
               "target": {"verts": target.vertices,
                          "joints3D": target.joints,
                          "betas": db["target_betas"],
                          "pose_rotmats": db["target_pose"],
                          "reposed_verts": smpl_shape_only(
                              assets, db["target_betas"])}}
        sums = _metric_sums(aux, b["mask"])
        for k, v in sums.items():
            totals[k] = totals.get(k, 0.0) + v
        n_total += b["num_real"]

    per_sample = {"pve": 6890, "mpjpe": 14, "pose_mse": 216, "shape_mse": 10}

    def divisor(metric):
        for key, n in per_sample.items():
            if key in metric.replace("-", "_"):
                return n
        return 1

    return {m: (totals[m] / (n_total * divisor(m)) if n_total else np.nan)
            for m in totals} | {"num_players": n_total}
