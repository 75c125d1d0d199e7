"""Folder-tree stage drivers: the reference's public API, batched onto TPU.

These functions reproduce the observable behavior of the reference drivers
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py``):
same input/output folder layouts and file formats (SURVEY.md §2.11), same
stage semantics (init/opt metric prints, is_refine score gating, resumable
per-player results) — but instead of a Python loop running one player at a
time on the GPU, every stage GATHERS players from the tree into padded
batches, runs ONE compiled TPU program, and scatters results back to files.

Stage map (reference → here):
* predict (player_recon.py:133-250)            → :func:`predict_stage`
* single_view_optimization (:1046-1307)        → :func:`single_view_optimization`
* multi_view_optimization (:1568-1999)         → :func:`multi_view_optimization`
* broad_view_optimization (:2003-2262)         → :func:`broad_view_optimization`
* calc_initial_metrics (:2264-2389)            → :func:`calc_initial_metrics`
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from soccerplayershapepose_tpu import config as cfg
from soccerplayershapepose_tpu.fit import (
    FitConfig, FitInit, broad_view_fit, single_view_fit)
from soccerplayershapepose_tpu.fit.multi_view import (
    MultiViewInit, multi_view_fit)
from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.pipeline.predict import build_predictor
from soccerplayershapepose_tpu.smpl.assets import SMPLAssets


# ---------------------------------------------------------------------------
# Gather: folder tree → padded arrays
# ---------------------------------------------------------------------------

def load_proxy_batch(proxy_dir: str, view_names: Iterable[str]
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (<view>_sil.npy, <view>_j2d.xml) pairs → (silhouettes, joints)."""
    sils, joints = [], []
    for view in view_names:
        stem = os.path.join(proxy_dir, os.path.splitext(view)[0])
        sils.append(np.load(stem + "_sil.npy"))
        joints.append(io.read_joints2d(stem + "_j2d.xml"))
    return np.stack(sils).astype(np.float32), np.stack(joints).astype(np.float32)


def _gather_views(image_root: str, proxy_root: str,
                  ignore_first: bool = True,
                  refine_filter: Optional[Callable[[io.PlayerTree], bool]] = None,
                  skip_existing_root: Optional[str] = None,
                  skip_existing_name: Optional[str] = None
                  ) -> List[Tuple[io.PlayerTree, str]]:
    """All (player, view) pairs with available proxies.

    ``ignore_first`` skips player id '1' like the reference single-view driver
    (player_recon.py:1124-1125, the camera-man crop). ``skip_existing_root``
    makes the stage resumable at player-view granularity (the reference skips
    already-processed games via existence checks, player_recon.py:1101-1102;
    per-view is strictly finer-grained).
    """
    out = []
    for node in io.walk_player_tree(image_root):
        if ignore_first and node.player == "1":
            continue
        if refine_filter is not None and not refine_filter(node):
            continue
        proxy_dir = os.path.join(proxy_root, node.game, node.scene, node.player)
        for view in node.views:
            stem = os.path.join(proxy_dir, os.path.splitext(view)[0])
            if not (os.path.exists(stem + "_sil.npy")
                    and os.path.exists(stem + "_j2d.xml")):
                continue
            if skip_existing_root is not None:
                done = os.path.join(
                    skip_existing_root, node.game, node.scene, node.player,
                    skip_existing_name or
                    (os.path.splitext(view)[0] + ".npz"))
                if os.path.exists(done):
                    continue
            out.append((node, view))
    return out


def _refine_gate(mul_folder: str, score_thresh: float
                 ) -> Callable[[io.PlayerTree], bool]:
    """is_refine gating: only players whose multi-view metrics.xml joint error
    ≥ score_thresh are reprocessed (player_recon.py:1132-1136)."""
    def check(node: io.PlayerTree) -> bool:
        path = os.path.join(mul_folder, node.game, node.scene, node.player,
                            "metrics.xml")
        if not os.path.exists(path):
            return True
        _, err = io.read_metrics(path)
        return err >= score_thresh
    return check


def _batched(items: Sequence, batch_size: int):
    for i in range(0, len(items), batch_size):
        yield items[i:i + batch_size]


def _pad_batch(arrays: List[np.ndarray], batch_size: int) -> np.ndarray:
    arr = np.stack(arrays)
    pad = batch_size - len(arrays)
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
    return arr


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------

def predict_stage(assets: SMPLAssets, proxy_root: str, image_root: str,
                  result_root: str, params=None, regressor_fn=None,
                  batch_size: int = 32) -> int:
    """Regressor forward over every player-view; writes per-view ``.npz``
    fit-format files (the reference ``predict``, player_recon.py:133-250).

    Returns the number of views processed.
    """
    if regressor_fn is None:
        _, params, regressor_fn = build_predictor()
    pairs = _gather_views(image_root, proxy_root, ignore_first=False)
    count = 0
    for chunk in _batched(pairs, batch_size):
        sils, joints = [], []
        for node, view in chunk:
            s, j = load_proxy_batch(
                os.path.join(proxy_root, node.game, node.scene, node.player),
                [view])
            sils.append(s[0])
            joints.append(j[0])
        n_real = len(chunk)
        sil_b = _pad_batch(sils, batch_size)
        j2d_b = _pad_batch(joints, batch_size)
        out = regressor_fn(params, assets, jnp.asarray(sil_b),
                           jnp.asarray(j2d_b))
        body_pose = np.asarray(out.pose_rotmats[:, 1:])
        orient = np.asarray(out.pose_rotmats[:, :1])
        betas = np.asarray(out.betas)
        transl = np.asarray(out.translation)
        for i, (node, view) in enumerate(chunk[:n_real]):
            out_dir = os.path.join(result_root, node.game, node.scene,
                                   node.player)
            os.makedirs(out_dir, exist_ok=True)
            io.write_fit_npz(
                os.path.join(out_dir, os.path.splitext(view)[0] + ".npz"),
                body_pose[i], orient[i], betas[i], transl[i])
            count += 1
    return count


def single_view_optimization(assets: SMPLAssets, image_root: str,
                             proxy_root: str, result_root: str,
                             params=None, regressor_fn=None,
                             fit_cfg: Optional[FitConfig] = None,
                             batch_size: int = 32,
                             is_refine: bool = False,
                             score_thresh: float = cfg.REFINE_SCORE_THRESH,
                             mul_folder: Optional[str] = None,
                             ignore_first: bool = True,
                             skip_existing: bool = False,
                             vis_folder: Optional[str] = None,
                             verbose: bool = True,
                             mesh=None) -> dict:
    """Batched single-view fitting over the player tree; writes per-view
    ``.npz`` results and returns the init/opt metric means the reference
    prints (player_recon.py:1305-1307). ``skip_existing`` resumes an
    interrupted run at player-view granularity."""
    fit_cfg = fit_cfg or FitConfig()
    if regressor_fn is None:
        _, params, regressor_fn = build_predictor()

    refine_filter = _refine_gate(mul_folder, score_thresh) \
        if (is_refine and mul_folder) else None
    pairs = _gather_views(image_root, proxy_root, ignore_first, refine_filter,
                          skip_existing_root=result_root if skip_existing
                          else None)

    sums = {"init_iou": 0.0, "init_err": 0.0, "opt_iou": 0.0, "opt_err": 0.0}
    count = 0
    for chunk in _batched(pairs, batch_size):
        sils, joints = [], []
        for node, view in chunk:
            s, j = load_proxy_batch(
                os.path.join(proxy_root, node.game, node.scene, node.player),
                [view])
            sils.append(s[0])
            joints.append(j[0])
        n_real = len(chunk)
        sil_b = jnp.asarray(_pad_batch(sils, batch_size))
        j2d_b = jnp.asarray(_pad_batch(joints, batch_size))
        mask = jnp.asarray((np.arange(batch_size) < n_real).astype(np.float32))

        pred = regressor_fn(params, assets, sil_b, j2d_b)
        init = FitInit(body_pose=pred.pose_rotmats[:, 1:],
                       global_orient=pred.pose_rotmats[:, :1],
                       betas=pred.betas, cam_wp=pred.cam_wp)
        res = single_view_fit(assets, init, sil_b, j2d_b, fit_cfg, mask,
                              mesh=mesh)

        if vis_folder is not None:
            # best-iterate mesh overlay per view (the reference's *_1.png
            # vis, player_recon.py:1286-1291) over the proxy silhouette
            from soccerplayershapepose_tpu.render.vis import render_mesh_overlay
            from soccerplayershapepose_tpu.smpl.model import smpl_forward
            best = smpl_forward(assets, res.betas, res.body_pose,
                                res.global_orient)
        for i, (node, view) in enumerate(chunk[:n_real]):
            out_dir = os.path.join(result_root, node.game, node.scene,
                                   node.player)
            os.makedirs(out_dir, exist_ok=True)
            io.write_fit_npz(
                os.path.join(out_dir, os.path.splitext(view)[0] + ".npz"),
                np.asarray(res.body_pose[i]), np.asarray(res.global_orient[i]),
                np.asarray(res.betas[i]), np.asarray(res.translation[i]))
            # Per-player score for the refine gate / calc_metrics roll-up
            # (the reference prints + stores these per stage,
            # player_recon.py:874,1046,1305-1307). Single-view trees are
            # the only fit output the broadcast-only chain produces, so
            # without this the gate has nothing to aggregate.
            io.write_metrics(os.path.join(out_dir, "metrics.xml"),
                             float(res.silh_iou[i]),
                             float(res.joint_err[i]))
            if vis_folder is not None:
                vis_dir = os.path.join(vis_folder, node.game, node.scene,
                                       node.player)
                os.makedirs(vis_dir, exist_ok=True)
                base = (np.asarray(sil_b[i]) * 128).astype(np.uint8)
                base = np.stack([base] * 3, axis=-1)
                overlay = render_mesh_overlay(
                    best.vertices[i], assets.faces, res.cam_wp[i], base)
                io.write_png(os.path.join(
                    vis_dir, os.path.splitext(view)[0] + "_1.png"), overlay)
            sums["init_iou"] += float(res.init_silh_iou[i])
            sums["init_err"] += float(res.init_joint_err[i])
            sums["opt_iou"] += float(res.silh_iou[i])
            sums["opt_err"] += float(res.joint_err[i])
            count += 1

    result = {k: (v / count if count else float("nan"))
              for k, v in sums.items()}
    result["count"] = count
    if verbose and count:
        print(f"silh_iou_init: {result['init_iou']}, "
              f"joint_error_init: {result['init_err']}")
        print(f"silh_iou_opt: {result['opt_iou']}, "
              f"joint_error_opt: {result['opt_err']}")
    return result


def single_view_optimization_test(assets: SMPLAssets, image_root: str,
                                  proxy_root: str, result_root: str,
                                  params=None, regressor_fn=None,
                                  fit_cfg: Optional[FitConfig] = None,
                                  batch_size: int = 32,
                                  snapshot_every: int = 1,
                                  save_every: bool = True,
                                  ignore_first: bool = True) -> dict:
    """Ablation variant of the single-view stage
    (``single_view_optimization_test``, player_recon.py:1309-1567): the kept
    iterate updates every epoch (``save_every``) and the parameter
    trajectory is dumped as per-epoch ``<view>_epoch{k}.npz`` snapshots next
    to the final ``<view>.npz``."""
    import dataclasses as _dc

    fit_cfg = fit_cfg or FitConfig()
    fit_cfg = _dc.replace(fit_cfg, save_every=save_every,
                          snapshot_every=snapshot_every)
    if regressor_fn is None:
        _, params, regressor_fn = build_predictor()
    pairs = _gather_views(image_root, proxy_root, ignore_first, None, None)

    count = 0
    for chunk in _batched(pairs, batch_size):
        sils, joints = [], []
        for node, view in chunk:
            s, j = load_proxy_batch(
                os.path.join(proxy_root, node.game, node.scene, node.player),
                [view])
            sils.append(s[0])
            joints.append(j[0])
        n_real = len(chunk)
        sil_b = jnp.asarray(_pad_batch(sils, batch_size))
        j2d_b = jnp.asarray(_pad_batch(joints, batch_size))
        mask = jnp.asarray((np.arange(batch_size) < n_real).astype(np.float32))

        pred = regressor_fn(params, assets, sil_b, j2d_b)
        init = FitInit(body_pose=pred.pose_rotmats[:, 1:],
                       global_orient=pred.pose_rotmats[:, :1],
                       betas=pred.betas, cam_wp=pred.cam_wp)
        res = single_view_fit(assets, init, sil_b, j2d_b, fit_cfg, mask)
        snaps = {k: np.asarray(v) for k, v in res.snapshots.items()}

        for i, (node, view) in enumerate(chunk[:n_real]):
            out_dir = os.path.join(result_root, node.game, node.scene,
                                   node.player)
            os.makedirs(out_dir, exist_ok=True)
            base = os.path.splitext(view)[0]
            io.write_fit_npz(
                os.path.join(out_dir, base + ".npz"),
                np.asarray(res.body_pose[i]), np.asarray(res.global_orient[i]),
                np.asarray(res.betas[i]), np.asarray(res.translation[i]))
            for t in range(snaps["body_pose"].shape[0]):
                io.write_fit_npz(
                    os.path.join(out_dir,
                                 f"{base}_epoch{t * snapshot_every + 1}.npz"),
                    snaps["body_pose"][t, i], snaps["global_orient"][t, i],
                    snaps["betas"][t, i], snaps["translation"][t, i])
            count += 1
    return {"count": count,
            "snapshots_per_view": 0 if not count
            else (fit_cfg.iters + snapshot_every - 1) // snapshot_every}


def multi_view_optimization(assets: SMPLAssets, image_root: str,
                            proxy_root: str, single_view_root: str,
                            result_root: str,
                            fit_cfg: Optional[FitConfig] = None,
                            batch_size: int = 8,
                            ignore_first: bool = True,
                            verbose: bool = True,
                            rounds: int = cfg.MULTI_VIEW_ROUNDS,
                            iters_per_phase: int = cfg.MULTI_VIEW_ITERS,
                            mesh=None) -> dict:
    """Batched multi-view fitting; writes shared data.npz + per-view npz +
    metrics.xml per player (player_recon.py:1976-1986). ``rounds`` /
    ``iters_per_phase`` scale the 3×(50 cam + 50 pose) reference budget
    (global_var.py:95-97) for smoke runs."""
    fit_cfg = fit_cfg or FitConfig(iters=cfg.MULTI_VIEW_ITERS)

    players = []
    for node in io.walk_player_tree(image_root):
        if ignore_first and node.player == "1":
            continue
        sv_dir = os.path.join(single_view_root, node.game, node.scene,
                              node.player)
        if not os.path.isdir(sv_dir):
            continue
        views = [v for v in node.views if os.path.exists(
            os.path.join(sv_dir, os.path.splitext(v)[0] + ".npz"))]
        if views:
            players.append((node, views))

    n_views = max((len(v) for _, v in players), default=0)
    sums = {"iou": 0.0, "err": 0.0}
    count = 0
    for chunk in _batched(players, batch_size):
        init_bp, init_go, init_be, init_cam, sil_l, j2d_l = \
            [], [], [], [], [], []
        for node, views in chunk:
            sv_dir = os.path.join(single_view_root, node.game, node.scene,
                                  node.player)
            proxy_dir = os.path.join(proxy_root, node.game, node.scene,
                                     node.player)
            s, j = load_proxy_batch(proxy_dir, views)
            bp, go, be, cw = [], [], [], []
            for v in views:
                d = io.read_fit_npz(
                    os.path.join(sv_dir, os.path.splitext(v)[0] + ".npz"))
                bp.append(d["body_pose"][0])
                go.append(d["global_orient"][0])
                be.append(d["betas"][0])
                t = d["translation"][0]
                cw.append([2 * cfg.FOCAL_LENGTH /
                           (fit_cfg.proxy_wh * t[2] + 1e-9), t[0], t[1]])

            def pad_views(x):
                x = np.asarray(x, np.float32)
                if len(x) < n_views:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], n_views - len(x), axis=0)])
                return x
            init_bp.append(pad_views(bp))
            init_go.append(pad_views(go))
            init_be.append(pad_views(be))
            init_cam.append(pad_views(cw))
            sil_l.append(pad_views(s))
            j2d_l.append(pad_views(j))

        n_real = len(chunk)
        init = MultiViewInit(
            body_pose=jnp.asarray(_pad_batch(init_bp, batch_size)),
            global_orient=jnp.asarray(_pad_batch(init_go, batch_size)),
            betas=jnp.asarray(_pad_batch(init_be, batch_size)),
            cam_wp=jnp.asarray(_pad_batch(init_cam, batch_size)))
        mask = jnp.asarray((np.arange(batch_size) < n_real).astype(np.float32))
        res = multi_view_fit(assets, init,
                             jnp.asarray(_pad_batch(sil_l, batch_size)),
                             jnp.asarray(_pad_batch(j2d_l, batch_size)),
                             fit_cfg, rounds=rounds,
                             iters_per_phase=iters_per_phase,
                             mask=mask, mesh=mesh)

        for i, (node, views) in enumerate(chunk[:n_real]):
            out_dir = os.path.join(result_root, node.game, node.scene,
                                   node.player)
            per_view = {}
            for vi, v in enumerate(views):
                per_view[os.path.splitext(v)[0]] = {
                    "translation": np.asarray(res.translation[i, vi]),
                    "global_orient": np.asarray(res.global_orient[i, vi]),
                }
            io.write_multiview_npz(out_dir, np.asarray(res.body_pose[i]),
                                   np.asarray(res.betas[i]), per_view)
            io.write_metrics(os.path.join(out_dir, "metrics.xml"),
                             float(res.silh_iou[i]), float(res.joint_err[i]))
            sums["iou"] += float(res.silh_iou[i])
            sums["err"] += float(res.joint_err[i])
            count += 1

    result = {"iou": sums["iou"] / count if count else float("nan"),
              "err": sums["err"] / count if count else float("nan"),
              "count": count}
    if verbose and count:
        print(f"multi-view: silh_iou {result['iou']}, "
              f"joint_error {result['err']} over {count} players")
    return result


def broad_view_optimization(assets: SMPLAssets, broad_image_root: str,
                            broad_proxy_root: str, multi_view_root: str,
                            result_root: str, params=None, regressor_fn=None,
                            fit_cfg: Optional[FitConfig] = None,
                            batch_size: int = 32,
                            is_refine: bool = False,
                            score_thresh: float = cfg.REFINE_SCORE_THRESH,
                            verbose: bool = True,
                            mesh=None) -> dict:
    """Broadcast transfer: pose/shape frozen from multi-view, optimize
    [cam, orient] per player on the broadcast proxy; writes data.npz +
    metrics.xml (player_recon.py:2003-2262)."""
    fit_cfg = fit_cfg or FitConfig(iters=cfg.BROAD_VIEW_ITERS,
                                   lr=cfg.BROAD_VIEW_LR)
    if regressor_fn is None:
        _, params, regressor_fn = build_predictor()

    refine_filter = _refine_gate(result_root, score_thresh) if is_refine \
        else None
    pairs = _gather_views(broad_image_root, broad_proxy_root,
                          ignore_first=False, refine_filter=refine_filter)
    # keep only players with a multi-view result
    pairs = [(n, v) for n, v in pairs if os.path.exists(
        os.path.join(multi_view_root, n.game, n.scene, n.player, "data.npz"))]

    sums = {"init_iou": 0.0, "init_err": 0.0, "opt_iou": 0.0, "opt_err": 0.0}
    count = 0
    for chunk in _batched(pairs, batch_size):
        sils, joints, bps, bes = [], [], [], []
        for node, view in chunk:
            s, j = load_proxy_batch(
                os.path.join(broad_proxy_root, node.game, node.scene,
                             node.player), [view])
            sils.append(s[0])
            joints.append(j[0])
            mv = io.read_multiview_npz(
                os.path.join(multi_view_root, node.game, node.scene,
                             node.player))
            bps.append(mv["body_pose"][0])
            bes.append(mv["betas"][0])

        n_real = len(chunk)
        sil_b = jnp.asarray(_pad_batch(sils, batch_size))
        j2d_b = jnp.asarray(_pad_batch(joints, batch_size))
        mask = jnp.asarray((np.arange(batch_size) < n_real).astype(np.float32))

        pred = regressor_fn(params, assets, sil_b, j2d_b)
        res = broad_view_fit(
            assets, jnp.asarray(_pad_batch(bps, batch_size)),
            jnp.asarray(_pad_batch(bes, batch_size)),
            pred.pose_rotmats[:, :1], pred.cam_wp, sil_b, j2d_b,
            fit_cfg, mask, mesh=mesh)

        for i, (node, view) in enumerate(chunk[:n_real]):
            out_dir = os.path.join(result_root, node.game, node.scene,
                                   node.player)
            os.makedirs(out_dir, exist_ok=True)
            io.write_fit_npz(os.path.join(out_dir, "data.npz"),
                             np.asarray(res.body_pose[i]),
                             np.asarray(res.global_orient[i]),
                             np.asarray(res.betas[i]),
                             np.asarray(res.translation[i]))
            io.write_metrics(os.path.join(out_dir, "metrics.xml"),
                             float(res.silh_iou[i]), float(res.joint_err[i]))
            sums["init_iou"] += float(res.init_silh_iou[i])
            sums["init_err"] += float(res.init_joint_err[i])
            sums["opt_iou"] += float(res.silh_iou[i])
            sums["opt_err"] += float(res.joint_err[i])
            count += 1

    result = {k: (v / count if count else float("nan"))
              for k, v in sums.items()}
    result["count"] = count
    if verbose and count:
        print(f"broad: silh_iou {result['init_iou']} -> {result['opt_iou']}, "
              f"joint_error {result['init_err']} -> {result['opt_err']}")
    return result


def calc_initial_metrics(assets: SMPLAssets, image_root: str, proxy_root: str,
                         result_root: str, fit_cfg: Optional[FitConfig] = None,
                         batch_size: int = 32) -> dict:
    """Pre-optimization metric baseline over stored fit results
    (player_recon.py:2264-2389)."""
    from soccerplayershapepose_tpu.fit.engine import fit_metrics
    fit_cfg = fit_cfg or FitConfig()

    pairs = _gather_views(image_root, proxy_root, ignore_first=False)
    pairs = [(n, v) for n, v in pairs if os.path.exists(os.path.join(
        result_root, n.game, n.scene, n.player,
        os.path.splitext(v)[0] + ".npz"))]

    total_iou, total_err, count = 0.0, 0.0, 0
    for chunk in _batched(pairs, batch_size):
        sils, joints, inits = [], [], []
        for node, view in chunk:
            s, j = load_proxy_batch(
                os.path.join(proxy_root, node.game, node.scene, node.player),
                [view])
            sils.append(s[0])
            joints.append(j[0])
            inits.append(io.read_fit_npz(os.path.join(
                result_root, node.game, node.scene, node.player,
                os.path.splitext(view)[0] + ".npz")))

        n_real = len(chunk)
        init = FitInit(
            body_pose=jnp.asarray(_pad_batch(
                [d["body_pose"][0] for d in inits], batch_size)),
            global_orient=jnp.asarray(_pad_batch(
                [d["global_orient"][0] for d in inits], batch_size)),
            betas=jnp.asarray(_pad_batch(
                [d["betas"][0] for d in inits], batch_size)),
            cam_wp=jnp.asarray(_pad_batch(
                [[2 * cfg.FOCAL_LENGTH / (fit_cfg.proxy_wh * d["translation"][0][2] + 1e-9),
                  d["translation"][0][0], d["translation"][0][1]]
                 for d in inits], batch_size)))
        m = fit_metrics(assets, init, jnp.asarray(_pad_batch(sils, batch_size)),
                        jnp.asarray(_pad_batch(joints, batch_size)), fit_cfg)
        total_iou += float(np.asarray(m["silh_iou"])[:n_real].sum())
        total_err += float(np.asarray(m["joint_err"])[:n_real].sum())
        count += n_real

    return {"silh_iou": total_iou / count if count else float("nan"),
            "joint_err": total_err / count if count else float("nan"),
            "count": count}
