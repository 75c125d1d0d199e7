"""Command-line interface for the pipeline stages.

The reference has no CLI — stages are selected by editing comment blocks at
module bottom (player_recon.py:2500-2551). This exposes each stage driver as a
subcommand over the same folder-tree dataplane:

    python -m soccerplayershapepose_tpu predict --proxy-root ... --image-root ...
    python -m soccerplayershapepose_tpu single-view --image-root ... ...
    python -m soccerplayershapepose_tpu multi-view ...
    python -m soccerplayershapepose_tpu broad-view ...
    python -m soccerplayershapepose_tpu calc-metrics --root ...
    python -m soccerplayershapepose_tpu train --image-root ... --target-root ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_fit_args(p: argparse.ArgumentParser):
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--no-silhouette", action="store_true",
                   help="joints-only loss (faster; reference uses both)")
    p.add_argument("--render-wh", type=int, default=None,
                   help="silhouette render resolution (default: proxy 512)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--smpl-dir", default=None,
                   help="SMPL asset dir (synthetic model if absent)")
    p.add_argument("--checkpoint", default=None,
                   help="reference straps .tar checkpoint to import")
    # 3D-regularization knobs (defaults off = reference-parity free-rotmat
    # 2D fit; see FitConfig + weights/fit3d_sweep_r04/ for measured GT-3D
    # effects of each):
    p.add_argument("--conf-weight", action="store_true",
                   help="weight the joints2D fit loss by the keypoint "
                        "score channel of *_j2d.xml")
    p.add_argument("--betas-prior", type=float, default=0.0)
    p.add_argument("--pose-prior", type=float, default=0.0)
    p.add_argument("--ortho-prior", type=float, default=0.0,
                   help="rotation-manifold prior weight on the free 3x3s")
    p.add_argument("--silh-warmup", type=int, default=0,
                   help="linear silhouette-loss warmup iterations")
    p.add_argument("--joints2d-scale", type=float, default=1.0,
                   help="multiplier on the raw joints2D fit loss; ~1e6 "
                        "puts joint evidence on par with the reference's "
                        "1e6-weighted silhouette sum (FitConfig docs)")


def _build_fit_cfg(args, default_iters, default_lr):
    from soccerplayershapepose_tpu.fit import FitConfig
    kw = {}
    kw["iters"] = args.iters if args.iters is not None else default_iters
    kw["lr"] = args.lr if args.lr is not None else default_lr
    if args.no_silhouette:
        kw["use_silhouette"] = False
        kw["silhouette_metrics"] = False
    if args.render_wh:
        kw["render_wh"] = args.render_wh
    kw["joint_conf_weighting"] = args.conf_weight
    kw["betas_prior"] = args.betas_prior
    kw["pose_prior"] = args.pose_prior
    kw["rot_ortho_prior"] = args.ortho_prior
    kw["silh_warmup_iters"] = args.silh_warmup
    kw["joints2d_scale"] = args.joints2d_scale
    return FitConfig(**kw)


def _load_runtime(args):
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor
    from soccerplayershapepose_tpu.smpl import load_assets
    assets = load_assets(model_dir=args.smpl_dir)
    regressor, params, fn = build_predictor()
    if args.checkpoint and os.path.exists(args.checkpoint):
        from soccerplayershapepose_tpu.io.torch_import import (
            load_straps_checkpoint)
        params = load_straps_checkpoint(args.checkpoint)
    else:
        # Committed in-repo artifact (train/straps.py trainer) — the role
        # of the reference's external straps_model_checkpoint.tar
        # (player_recon.py:133-140). Random init only if neither exists.
        from soccerplayershapepose_tpu.train.perception import \
            default_weights_path
        path = default_weights_path("regressor")
        if path:
            from soccerplayershapepose_tpu.train.straps import \
                load_regressor_weights
            params = load_regressor_weights(path, regressor, assets)
            print(f"regressor weights: {path}")
    return assets, params, fn


def _require_weights(kind: str) -> str:
    """Resolve the committed weights artifact or fail with guidance."""
    from soccerplayershapepose_tpu.train.perception import \
        default_weights_path
    path = default_weights_path(kind)
    if path is None:
        raise SystemExit(
            f"no --weights given and no committed weights/{kind}*_f16.npz "
            "artifact found; train one with scripts/train_perception.py")
    return path


def _resolve_score_thresh(args, weights: str) -> float:
    """--score-thresh, else the weights artifact's measured best-F1
    operating point (sibling .json written by the eval harness), else the
    reference's assumed 0.7 (player_detection.py:28)."""
    if args.score_thresh is not None:
        return args.score_thresh
    meta = os.path.splitext(weights)[0] + ".json"
    if os.path.exists(meta):
        try:
            with open(meta) as f:
                t = json.load(f).get("best_f1_score_thresh")
            if t and 0.0 < t < 1.0:
                return float(t)
        except Exception:
            pass
    from soccerplayershapepose_tpu import config as cfg
    return cfg.DETECTION_SCORE_THRESH


def main(argv=None) -> int:
    from soccerplayershapepose_tpu import config as cfg

    parser = argparse.ArgumentParser(prog="soccerplayershapepose_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("predict", "single-view", "broad-view"):
        p = sub.add_parser(name)
        p.add_argument("--image-root", required=True)
        p.add_argument("--proxy-root", required=True)
        p.add_argument("--result-root", required=True)
        if name == "broad-view":
            p.add_argument("--multi-view-root", required=True)
            p.add_argument("--is-refine", action="store_true")
        if name == "single-view":
            p.add_argument("--is-refine", action="store_true")
            p.add_argument("--mul-folder", default=None)
            p.add_argument("--skip-existing", action="store_true")
        _add_fit_args(p)

    p = sub.add_parser("multi-view")
    p.add_argument("--image-root", required=True)
    p.add_argument("--proxy-root", required=True)
    p.add_argument("--single-view-root", required=True)
    p.add_argument("--result-root", required=True)
    _add_fit_args(p)

    p = sub.add_parser("calc-metrics")
    p.add_argument("--root", required=True)
    p.add_argument("--score-thresh", type=float,
                   default=cfg.REFINE_SCORE_THRESH)

    p = sub.add_parser("train")
    p.add_argument("--image-root", required=True)
    p.add_argument("--proxy-root", required=True)
    p.add_argument("--target-root", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--train-set", default=None,
                   help="train_set.xml game split file")
    p.add_argument("--epochs", type=int, default=cfg.REGRESSOR_TRAIN_EPOCHS)
    p.add_argument("--lr", type=float, default=cfg.REGRESSOR_TRAIN_LR)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--smpl-dir", default=None)

    p = sub.add_parser("train-perception",
                       help="train ProxyNet/detector on synthetic SMPL "
                            "renders (replaces downloaded detectron2/"
                            "torchvision weights)")
    p.add_argument("--out", required=True, help="output weights .npz")
    p.add_argument("--model", choices=["proxynet", "detector"],
                   default="proxynet")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--wh", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--no-iuv", action="store_true")
    p.add_argument("--smpl-dir", default=None)

    p = sub.add_parser("create-proxy",
                       help="on-device proxy extraction from raw crops "
                            "(player_recon.py create_proxy)")
    p.add_argument("--image-root", required=True)
    p.add_argument("--proxy-root", required=True)
    p.add_argument("--vis-root", default=None)
    p.add_argument("--weights", default=None,
                   help="ProxyNet weights .npz (default: committed "
                        "weights/proxynet*_f16.npz artifact)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--write-iuv", action="store_true")
    p.add_argument("--no-iuv", action="store_true")
    p.add_argument("--no-flip-tta", action="store_true",
                   help="disable the horizontal-flip mask/IUV ensemble "
                        "(default on: +2.1 IoU pts on paired held-out "
                        "eval, docs/QUALITY.md; one 2B-batch forward)")

    p = sub.add_parser("detect-players",
                       help="detect + crop players from raw frames "
                            "(player_detection.py crop pipelines)")
    p.add_argument("--frame-root", required=True)
    p.add_argument("--out-root", required=True)
    p.add_argument("--weights", default=None,
                   help="detector weights .npz (default: committed "
                        "weights/detector*_f16.npz artifact)")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--score-thresh", type=float, default=None,
                   help="detection score threshold (default: the weights "
                        "artifact's measured best-F1 operating point, else "
                        "the reference's 0.7)")
    p.add_argument("--flip-tta", action="store_true",
                   help="horizontal-flip ensemble for detections")

    p = sub.add_parser("crop-player",
                       help="per-view centre-player crops over a "
                            "<game>/<scene>/<player>/<view> tree "
                            "(player_detection.py crop_player)")
    p.add_argument("--image-root", required=True)
    p.add_argument("--out-root", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--score-thresh", type=float, default=None,
                   help="detection score threshold (default: the weights "
                        "artifact's measured best-F1 operating point, else "
                        "the reference's 0.7)")
    p.add_argument("--flip-tta", action="store_true")
    p.add_argument("--keep-player-one", action="store_true")
    p.add_argument("--skip-if-present", default=None,
                   help="broadcast tree root (check_board semantics)")
    p.add_argument("--save-mid", action="store_true")

    p = sub.add_parser("crop-broad-player",
                       help="broadcast boxes.xml + vis, then index.xml-"
                            "driven player crops (crop_broad_player[_images])")
    p.add_argument("--frame-root", required=True)
    p.add_argument("--box-root", required=True)
    p.add_argument("--vis-root", default=None)
    p.add_argument("--player-root", default=None,
                   help="also write <index>/player.png crops here")
    p.add_argument("--weights", default=None)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--score-thresh", type=float, default=None,
                   help="detection score threshold (default: the weights "
                        "artifact's measured best-F1 operating point, else "
                        "the reference's 0.7)")
    p.add_argument("--flip-tta", action="store_true")

    p = sub.add_parser("harvest-frames",
                       help="match video -> classified <game>/<scene> "
                            "frame tree (classification.py "
                            "predict_with_classifier_final)")
    p.add_argument("--video", required=True, nargs="+",
                   help="one or more video files")
    p.add_argument("--out-root", required=True)
    p.add_argument("--classifier-params", default=None,
                   help="trained ClassifyNet params .npz "
                        "(pipeline/classification.py); omit to accept "
                        "every sampled frame")
    p.add_argument("--n-samples", type=int, default=500,
                   help="random frames sampled per video (reference 500)")
    p.add_argument("--max-accepted", type=int, default=200,
                   help="accepted frames kept per video (reference 200)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)

    args = parser.parse_args(argv)

    if args.command == "train-perception":
        from soccerplayershapepose_tpu.smpl import load_assets
        from soccerplayershapepose_tpu.train.perception import (
            save_perception_weights, train_detector_synth,
            train_proxynet_synth)
        assets = load_assets(model_dir=args.smpl_dir)
        if args.model == "proxynet":
            state = train_proxynet_synth(
                assets, steps=args.steps, batch=args.batch_size, wh=args.wh,
                learning_rate=args.lr, with_iuv=not args.no_iuv)
        else:
            state = train_detector_synth(
                assets, steps=args.steps, batch=max(1, args.batch_size // 2),
                learning_rate=args.lr)
        save_perception_weights(args.out, state)
        print(json.dumps({"weights": args.out, "steps": args.steps}))
        return 0

    if args.command == "create-proxy":
        from soccerplayershapepose_tpu.models.perception import ProxyNet
        from soccerplayershapepose_tpu.pipeline.extract import (
            ProxyExtractor, create_proxy_stage)
        from soccerplayershapepose_tpu.train.perception import (
            load_perception_weights)
        model = ProxyNet(with_iuv=not args.no_iuv)
        weights = args.weights or _require_weights("proxynet")
        variables = load_perception_weights(weights, model)
        extractor = ProxyExtractor(model, variables,
                                   flip_tta=not args.no_flip_tta)
        out = create_proxy_stage(extractor, args.image_root, args.proxy_root,
                                 vis_root=args.vis_root,
                                 batch_size=args.batch_size,
                                 write_iuv=args.write_iuv)
        print(json.dumps(out))
        return 0

    if args.command == "harvest-frames":
        from soccerplayershapepose_tpu.pipeline.classification import \
            load_classifier
        from soccerplayershapepose_tpu.pipeline.video import \
            harvest_frames_stage
        gate = (load_classifier(args.classifier_params)
                if args.classifier_params else None)
        results = []
        for k, video in enumerate(args.video):
            results.append(harvest_frames_stage(
                video, args.out_root, classifier=gate,
                n_samples=args.n_samples, max_accepted=args.max_accepted,
                seed=args.seed + k, size_hw=(args.height, args.width)))
        print(json.dumps({"videos": results,
                          "accepted": sum(r["accepted"] for r in results)}))
        return 0

    if args.command == "detect-players":
        from soccerplayershapepose_tpu.models.detector import PlayerDetector
        from soccerplayershapepose_tpu.pipeline.extract import (
            PlayerDetectorRunner, detect_players_stage)
        from soccerplayershapepose_tpu.train.perception import (
            load_perception_weights)
        model = PlayerDetector()
        hw = (args.height, args.width)
        weights = args.weights or _require_weights("detector")
        variables = load_perception_weights(weights, model, hw=hw)
        runner = PlayerDetectorRunner(
            model, variables, hw,
            score_thresh=_resolve_score_thresh(args, weights),
            flip_tta=args.flip_tta)
        out = detect_players_stage(runner, args.frame_root, args.out_root,
                                   batch_size=args.batch_size)
        print(json.dumps(out))
        return 0

    if args.command in ("crop-player", "crop-broad-player"):
        from soccerplayershapepose_tpu.models.detector import PlayerDetector
        from soccerplayershapepose_tpu.pipeline.extract import (
            PlayerDetectorRunner, crop_broad_player_images_stage,
            crop_broad_player_stage, crop_player_stage)
        from soccerplayershapepose_tpu.train.perception import (
            load_perception_weights)
        model = PlayerDetector()
        hw = (args.height, args.width)
        weights = args.weights or _require_weights("detector")
        variables = load_perception_weights(weights, model, hw=hw)
        runner = PlayerDetectorRunner(
            model, variables, hw,
            score_thresh=_resolve_score_thresh(args, weights),
            flip_tta=args.flip_tta)
        if args.command == "crop-player":
            out = crop_player_stage(
                runner, args.image_root, args.out_root,
                batch_size=args.batch_size,
                skip_player_one=not args.keep_player_one,
                skip_if_present_root=args.skip_if_present,
                save_mid=args.save_mid)
        else:
            out = crop_broad_player_stage(runner, args.frame_root,
                                          args.box_root, args.vis_root,
                                          batch_size=args.batch_size)
            if args.player_root:
                out["images"] = crop_broad_player_images_stage(
                    args.box_root, args.frame_root, args.player_root)
        print(json.dumps(out))
        return 0

    if args.command == "calc-metrics":
        from soccerplayershapepose_tpu.io import calc_metrics
        print(json.dumps(calc_metrics(args.root, args.score_thresh)))
        return 0

    if args.command == "train":
        from soccerplayershapepose_tpu.drivers.training import (
            read_train_split, train_regressor)
        from soccerplayershapepose_tpu.smpl import load_assets
        assets = load_assets(model_dir=args.smpl_dir)
        split = read_train_split(args.train_set) if args.train_set else None
        out = train_regressor(assets, args.image_root, args.proxy_root,
                              args.target_root, args.checkpoint_dir,
                              train_games=split, epochs=args.epochs,
                              learning_rate=args.lr, resume=args.resume)
        print(json.dumps({"best_epoch": out["best_epoch"],
                          "best_val": {k: float(v)
                                       for k, v in out["best_val"].items()}}))
        return 0

    assets, params, fn = _load_runtime(args)
    from soccerplayershapepose_tpu.drivers import (
        broad_view_optimization, multi_view_optimization, predict_stage,
        single_view_optimization)

    if args.command == "predict":
        n = predict_stage(assets, args.proxy_root, args.image_root,
                          args.result_root, params=params, regressor_fn=fn,
                          batch_size=args.batch_size)
        print(json.dumps({"views": n}))
    elif args.command == "single-view":
        out = single_view_optimization(
            assets, args.image_root, args.proxy_root, args.result_root,
            params=params, regressor_fn=fn,
            fit_cfg=_build_fit_cfg(args, cfg.SINGLE_VIEW_ITERS,
                                   cfg.FITTING_LR),
            batch_size=args.batch_size, is_refine=args.is_refine,
            mul_folder=args.mul_folder, skip_existing=args.skip_existing)
        print(json.dumps(out))
    elif args.command == "multi-view":
        out = multi_view_optimization(
            assets, args.image_root, args.proxy_root, args.single_view_root,
            args.result_root,
            fit_cfg=_build_fit_cfg(args, cfg.MULTI_VIEW_ITERS,
                                   cfg.FITTING_LR),
            batch_size=max(1, args.batch_size // 4))
        print(json.dumps(out))
    elif args.command == "broad-view":
        out = broad_view_optimization(
            assets, args.image_root, args.proxy_root, args.multi_view_root,
            args.result_root, params=params, regressor_fn=fn,
            fit_cfg=_build_fit_cfg(args, cfg.BROAD_VIEW_ITERS,
                                   cfg.BROAD_VIEW_LR),
            batch_size=args.batch_size, is_refine=args.is_refine)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
