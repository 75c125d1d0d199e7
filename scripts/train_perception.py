"""Segmented TPU training driver for the perception nets.

Trains ProxyNet / PlayerDetector on the domain-randomized synth factory with
the same crash-envelope discipline bench.py uses: the `drive-*` modes run
training in bounded subprocess segments (checkpoint + re-exec), so a remote
TPU worker fault costs one segment, not the run. Held-out eval runs between
segments (crash-isolated too) and the best inference weights are kept.

Replaces the reference's weight *download* step (predict_3D.py:35-64,
player_detection.py:86-87) with an in-repo training capability.

Usage:
  python scripts/train_perception.py drive-proxynet --steps 6000 --batch 16 \
      --wh 256 --ckpt-dir weights/proxynet_r03 [--finetune-from DIR]
  python scripts/train_perception.py drive-detector --steps 4000 --batch 8 \
      --ckpt-dir weights/detector_r03
  python scripts/train_perception.py drive-regressor --steps 4000 --batch 16 \
      --wh 512 --lr 1e-4 --ckpt-dir weights/regressor_r03
  python scripts/train_perception.py eval-proxynet --ckpt-dir ... --wh 512 \
      --json QUALITY_proxynet.json
  python scripts/train_perception.py eval-detector --ckpt-dir ... --json ...
  python scripts/train_perception.py eval-regressor --weights ... [--eval-corrupt]

Internal (one segment, called by drive-*): proxynet / detector / regressor
(the STRAPS-style synthetic-proxy regressor trainer, train/straps.py —
replaces the reference's external straps_model_checkpoint.tar,
player_recon.py:133-140).
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEGMENT_RC = 10          # segment finished, more steps remain


def _log(ckpt_dir, record):
    with open(os.path.join(ckpt_dir, "log.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def _save_state(path, state):
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _flatten
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if hasattr(state, "log_vars"):   # regressor: learned loss log-variances
        tree["log_vars"] = state.log_vars
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(tree))
    os.replace(tmp, path)


def _load_state(path, template_state):
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _unflatten_like
    from soccerplayershapepose_tpu.train.perception import \
        PerceptionTrainState
    tree = {"params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "step": template_state.step}
    has_log_vars = hasattr(template_state, "log_vars")
    if has_log_vars:
        tree["log_vars"] = template_state.log_vars
    flat = dict(np.load(path))
    t = _unflatten_like(tree, flat)
    if has_log_vars:
        from soccerplayershapepose_tpu.train.distill import TrainState
        return TrainState(t["params"], t["batch_stats"], t["log_vars"],
                          t["opt_state"], t["step"])
    return PerceptionTrainState(t["params"], t["batch_stats"],
                                t["opt_state"], t["step"])


def _make_tx(args):
    import optax
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr,
        warmup_steps=max(min(300, args.steps // 10), 1),
        decay_steps=args.steps, end_value=args.lr * 0.05)
    return optax.adam(sched)


def _proxynet_setup(args):
    import jax
    from soccerplayershapepose_tpu.models.perception import ProxyNet
    from soccerplayershapepose_tpu.train.perception import \
        make_proxynet_state
    model = ProxyNet(with_iuv=not args.no_iuv, channels=args.channels)
    tx = _make_tx(args)
    state, _ = make_proxynet_state(model, jax.random.PRNGKey(args.seed),
                                   wh=args.wh, tx=tx)
    return model, tx, state


def _detector_setup(args):
    import jax
    from soccerplayershapepose_tpu.models.detector import PlayerDetector
    from soccerplayershapepose_tpu.train.perception import \
        make_detector_state
    model = PlayerDetector(channels=args.channels)
    tx = _make_tx(args)
    state, _ = make_detector_state(model, jax.random.PRNGKey(args.seed),
                                   hw=(args.h, args.w), tx=tx)
    return model, tx, state


def _regressor_setup(args):
    import jax
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.train.distill import make_train_state
    model = SingleInputRegressor(in_channels=args.proxy_channels,
                                 resnet_layers=args.resnet_layers)
    tx = _make_tx(args)
    state, _ = make_train_state(model, jax.random.PRNGKey(args.seed), tx=tx)
    return model, tx, state


def _train_segment(args, kind):
    """Run up to --segment steps; exit SEGMENT_RC if more steps remain."""
    import jax
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.perception import (
        make_detector_train_step, make_proxynet_train_step,
        save_perception_weights)
    from soccerplayershapepose_tpu.train.synth import (
        synth_crop_batch, synth_frame_batch)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    assets = load_assets()
    base = jax.random.PRNGKey(args.seed + 1)
    if kind == "proxynet":
        model, tx, state = _proxynet_setup(args)
        step_fn = jax.jit(make_proxynet_train_step(model, tx))
        synth_fn = lambda i: synth_crop_batch(  # noqa: E731
            assets, jax.random.fold_in(base, i), b=args.batch, wh=args.wh,
            occluders=not args.no_occluders,
            domain_rand=not args.no_domain_rand)
        if args.real_image_root:
            # Distillation mix: real crops labeled by precomputed proxies
            # (train/real_data.py) alongside the synth factory.
            from soccerplayershapepose_tpu.train.real_data import (
                mixed_batches, proxy_tree_batches)
            real = proxy_tree_batches(
                args.real_image_root, args.real_proxy_root or
                args.real_image_root, batch=args.batch, wh=args.wh,
                seed=args.seed)
            mixer = mixed_batches(synth_fn, real, p_real=args.p_real,
                                  seed=args.seed)
            batch_fn = lambda i: next(mixer)  # noqa: E731
        else:
            batch_fn = synth_fn
    elif kind == "regressor":
        # STRAPS-style synthetic-proxy training (train/straps.py): GT
        # params supervise the distill multi-task loss.
        from soccerplayershapepose_tpu.train.distill import make_train_step
        from soccerplayershapepose_tpu.train.straps import \
            synth_regressor_batch
        model, tx, state = _regressor_setup(args)
        base_step = make_train_step(model, tx)

        def _regressor_step(s, batch):
            s2, metrics, _ = base_step(s, assets, batch)
            out = {"total": metrics.pop("loss"), **metrics}
            return s2, out

        step_fn = jax.jit(_regressor_step)
        if args.via_proxynet:
            # E2E fine-tune: train on proxies EXTRACTED by the trained
            # ProxyNet (the real deployment inputs) mixed with the plain
            # corrupted-GT batches (keeps clean-proxy performance);
            # --p-real sets the extracted fraction.
            from soccerplayershapepose_tpu.models.perception import ProxyNet
            from soccerplayershapepose_tpu.pipeline.extract import \
                ProxyExtractor
            from soccerplayershapepose_tpu.train.perception import \
                load_perception_weights
            from soccerplayershapepose_tpu.train.straps import \
                extracted_regressor_batch
            pnet = ProxyNet(with_iuv=not args.no_iuv, channels=args.channels)
            pvars = load_perception_weights(args.via_proxynet, pnet,
                                            wh=args.wh)
            ex = ProxyExtractor(pnet, pvars, wh=args.wh,
                                flip_tta=args.flip_tta)
            import numpy as _np

            cache_dir = args.extract_cache
            if cache_dir:
                os.makedirs(cache_dir, exist_ok=True)

            def _extracted(i, _ex=ex):
                if not cache_dir:
                    return extracted_regressor_batch(
                        assets, _ex, jax.random.fold_in(base, i),
                        b=args.batch, wh=args.wh,
                        proxy_channels=args.proxy_channels)
                # Disk-cached extraction: the ProxyNet forward + 1-core
                # host post is ~10s/batch, far slower than a train step, so
                # each cache slot is extracted once (first epoch) and
                # replayed afterwards. Files persist across segment
                # re-execs and timeouts — retried segments are cheap.
                from soccerplayershapepose_tpu.train.straps import \
                    assemble_extracted_batch
                slot = i % args.extract_batches
                path = os.path.join(cache_dir, f"batch_{slot:05d}.npz")
                if not os.path.exists(path):
                    raw = extracted_regressor_batch(
                        assets, _ex, jax.random.fold_in(base, 777_000 + slot),
                        b=args.batch, wh=args.wh,
                        proxy_channels=args.proxy_channels, return_raw=True)
                    tmp = path + ".tmp.npz"
                    _np.savez(tmp, **raw)
                    os.replace(tmp, path)
                with _np.load(path) as z:
                    raw = {k: z[k] for k in z.files}
                return assemble_extracted_batch(raw, args.wh,
                                                args.proxy_channels)

            def batch_fn(i):
                # Per-step deterministic mix decision (stable across
                # segment re-exec boundaries).
                if _np.random.RandomState(
                        args.seed * 1000003 + i).rand() < args.p_real:
                    return _extracted(i)
                return synth_regressor_batch(
                    assets, jax.random.fold_in(base, i), b=args.batch,
                    wh=args.wh, corrupt=not args.no_corrupt,
                    occluders=not args.no_occluders,
                    proxy_channels=args.proxy_channels)
        else:
            batch_fn = lambda i: synth_regressor_batch(  # noqa: E731
                assets, jax.random.fold_in(base, i), b=args.batch,
                wh=args.wh, corrupt=not args.no_corrupt,
                occluders=not args.no_occluders,
                proxy_channels=args.proxy_channels)
    else:
        model, tx, state = _detector_setup(args)
        step_fn = jax.jit(make_detector_train_step(model, tx))
        batch_fn = lambda i: synth_frame_batch(  # noqa: E731
            assets, jax.random.fold_in(base, i), b=args.batch,
            n_players=args.players, hw=(args.h, args.w))

    state_path = os.path.join(args.ckpt_dir, "state.npz")
    if os.path.exists(state_path):
        state = _load_state(state_path, state)
    elif args.finetune_from:
        # Warm-start params/batch_stats from another run (e.g. 256² → 512²
        # resolution fine-tune; the nets are fully convolutional).
        src = os.path.join(args.finetune_from, "weights_last.npz")
        if kind == "regressor":
            from soccerplayershapepose_tpu.train.straps import \
                load_regressor_weights
            variables = load_regressor_weights(src, model, assets)
        else:
            from soccerplayershapepose_tpu.train.perception import \
                load_perception_weights
            variables = load_perception_weights(
                src, model, wh=args.wh,
                hw=(args.h, args.w) if kind == "detector" else None)
        state = state._replace(params=variables["params"],
                               batch_stats=variables["batch_stats"])

    start = int(state.step)
    if start >= args.steps:
        print(f"{kind}: training complete at step {start}")
        return 0
    end = min(start + args.segment, args.steps)
    t0 = time.time()

    def checkpoint(st):
        _save_state(state_path, st)
        save_perception_weights(
            os.path.join(args.ckpt_dir, "weights_last.npz"), st)

    for i in range(start, end):
        batch = batch_fn(i)
        state, losses = step_fn(state, batch)
        if (i + 1) % args.log_every == 0:
            # Force completion (tunnel: block_until_ready alone is unreliable)
            vals = {k: float(v) for k, v in losses.items()}
            rate = (i + 1 - start) / (time.time() - t0)
            print(f"{kind} step {i + 1}/{args.steps}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in vals.items())
                  + f" ({rate:.2f} steps/s)", flush=True)
            _log(args.ckpt_dir, {"kind": kind, "step": i + 1, **vals,
                                 "steps_per_s": rate})
        # In-process periodic checkpoint: the axon backend does NOT persist
        # compiles across processes, so crash recovery must not depend on
        # short-lived segment re-exec — bank progress while compiled.
        if args.save_every and (i + 1) % args.save_every == 0 \
                and (i + 1) < end:
            float(losses["total"])
            checkpoint(state)
    float(losses["total"])          # sync before checkpointing
    checkpoint(state)
    print(f"{kind}: segment done at step {int(state.step)}", flush=True)
    return 0 if int(state.step) >= args.steps else SEGMENT_RC


def _eval_proxynet(args):
    import jax
    from soccerplayershapepose_tpu.models.perception import ProxyNet
    from soccerplayershapepose_tpu.pipeline.extract import ProxyExtractor
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.perception import \
        load_perception_weights
    from soccerplayershapepose_tpu.train.quality import evaluate_proxynet

    model = ProxyNet(with_iuv=not args.no_iuv, channels=args.channels)
    weights = args.weights or os.path.join(args.ckpt_dir, "weights_last.npz")
    variables = load_perception_weights(weights, model, wh=args.wh)
    ex = ProxyExtractor(model, variables, wh=args.wh,
                        flip_tta=args.flip_tta,
                        kp_tta_tau=args.kp_tta_tau,
                        kp_disagree_penalty=args.kp_disagree_penalty)
    assets = load_assets()
    out = evaluate_proxynet(ex, assets, n_batches=args.eval_batches,
                            batch=args.batch, wh=args.wh,
                            occluders=not args.no_occluders,
                            domain_rand=not args.eval_easy)
    out["weights"] = weights
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _eval_detector(args):
    from soccerplayershapepose_tpu.models.detector import PlayerDetector
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.perception import \
        load_perception_weights
    from soccerplayershapepose_tpu.train.quality import evaluate_detector

    model = PlayerDetector(channels=args.channels)
    weights = args.weights or os.path.join(args.ckpt_dir, "weights_last.npz")
    variables = load_perception_weights(weights, model, hw=(args.h, args.w))
    assets = load_assets()
    out = evaluate_detector(model, variables, assets,
                            n_batches=args.eval_batches, batch=args.batch,
                            hw=(args.h, args.w), n_players=args.players,
                            flip_tta=args.flip_tta)
    out["weights"] = weights
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _eval_regressor(args):
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.straps import (
        evaluate_regressor, load_regressor_weights)

    model = SingleInputRegressor(in_channels=args.proxy_channels,
                                 resnet_layers=args.resnet_layers)
    weights = args.weights or os.path.join(args.ckpt_dir, "weights_last.npz")
    assets = load_assets()
    variables = load_regressor_weights(weights, model, assets)
    if args.via_proxynet:
        # Full-pipeline cell: RGB crop → trained ProxyNet extraction →
        # proxy → regressor → 3D error (the create_proxy+predict chain).
        from soccerplayershapepose_tpu.models.perception import ProxyNet
        from soccerplayershapepose_tpu.pipeline.extract import ProxyExtractor
        from soccerplayershapepose_tpu.train.perception import \
            load_perception_weights
        from soccerplayershapepose_tpu.train.straps import \
            evaluate_regressor_e2e
        pnet = ProxyNet(with_iuv=not args.no_iuv, channels=args.channels)
        pvars = load_perception_weights(args.via_proxynet, pnet, wh=args.wh)
        ex = ProxyExtractor(pnet, pvars, wh=args.wh,
                            flip_tta=args.flip_tta)
        out = evaluate_regressor_e2e(model, variables["params"],
                                     variables["batch_stats"], ex, assets,
                                     n_batches=args.eval_batches,
                                     batch=args.batch, wh=args.wh,
                                     proxy_channels=args.proxy_channels)
        out["proxynet_weights"] = args.via_proxynet
    else:
        out = evaluate_regressor(model, variables["params"],
                                 variables["batch_stats"], assets,
                                 n_batches=args.eval_batches,
                                 batch=args.batch,
                                 wh=args.wh, corrupt=args.eval_corrupt,
                                 proxy_channels=args.proxy_channels)
    out["proxy_channels"] = args.proxy_channels
    out["weights"] = weights
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _eval_fit3d(args):
    from soccerplayershapepose_tpu.train.straps import evaluate_fit_3d

    model, variables, assets, weights = _load_fit3d_model(args)
    out = evaluate_fit_3d(model, variables["params"],
                          variables["batch_stats"], assets,
                          n_batches=args.eval_batches, batch=args.batch,
                          wh=args.wh, corrupt=not args.no_corrupt,
                          fit_cfg=_fit3d_cfg(args))
    out["weights"] = weights
    out["fit_knobs"] = _fit3d_knobs(args)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _fit3d_cfg(args):
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    return FitConfig(
        iters=args.fit_iters or 100, proxy_wh=args.wh,
        render_wh=min(args.wh, 256), lr=args.fit_lr,
        joint_conf_weighting=args.conf_weight,
        betas_prior=args.betas_prior, pose_prior=args.pose_prior,
        rot_ortho_prior=args.ortho_prior,
        silh_warmup_iters=args.silh_warmup,
        joints2d_scale=args.joints2d_scale)


def _fit3d_knobs(args):
    return {"lr": args.fit_lr, "conf_weight": args.conf_weight,
            "betas_prior": args.betas_prior, "pose_prior": args.pose_prior,
            "ortho_prior": args.ortho_prior,
            "silh_warmup": args.silh_warmup,
            "joints2d_scale": args.joints2d_scale,
            "prior_scale": "relative (r4c: anchored to stop_grad|total|)"}


def _load_fit3d_model(args):
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.straps import load_regressor_weights
    model = SingleInputRegressor(in_channels=18,
                                 resnet_layers=args.resnet_layers)
    weights = args.weights or os.path.join(args.ckpt_dir, "weights_last.npz")
    assets = load_assets()
    variables = load_regressor_weights(weights, model, assets)
    return model, variables, assets, weights


def _eval_fit3d_mv(args):
    from soccerplayershapepose_tpu.train.fit3d import \
        evaluate_fit_3d_multiview
    model, variables, assets, weights = _load_fit3d_model(args)
    out = evaluate_fit_3d_multiview(
        model, variables["params"], variables["batch_stats"], assets,
        n_batches=args.eval_batches, batch=args.batch, n_views=args.views,
        wh=args.wh, corrupt=not args.no_corrupt, fit_cfg=_fit3d_cfg(args),
        rounds=args.mv_rounds, iters_per_phase=args.mv_iters)
    out["weights"] = weights
    out["fit_knobs"] = _fit3d_knobs(args)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _eval_fit3d_track(args):
    from soccerplayershapepose_tpu.train.fit3d import evaluate_fit_3d_track
    model, variables, assets, weights = _load_fit3d_model(args)
    out = evaluate_fit_3d_track(
        model, variables["params"], variables["batch_stats"], assets,
        n_batches=args.eval_batches, batch=args.batch,
        n_frames=args.frames, wh=args.wh, corrupt=not args.no_corrupt,
        fit_cfg=_fit3d_cfg(args))
    out["weights"] = weights
    out["fit_knobs"] = _fit3d_knobs(args)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


def _wait_for_device(max_wait_s=2400):
    deadline = time.time() + max_wait_s
    probe = "import jax, jax.numpy as jnp; print(float(jnp.ones((8,)).sum()))"
    while time.time() < deadline:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, timeout=120)
            if out.returncode == 0 and b"8.0" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print("waiting for device...", flush=True)
        time.sleep(30)
    return False


def _drive(args, kind, argv):
    """Outer loop: segment subprocesses + eval + best-weights tracking."""
    os.makedirs(args.ckpt_dir, exist_ok=True)
    best_path = os.path.join(args.ckpt_dir, "best.json")
    best = None
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = json.load(f)

    inner = [a for a in argv if a != f"drive-{kind}"]
    inner_cmd = [sys.executable, os.path.abspath(__file__), kind] + inner
    eval_cmd = [sys.executable, os.path.abspath(__file__),
                f"eval-{kind}"] + inner

    while True:
        try:
            rc = subprocess.run(inner_cmd, timeout=args.segment_timeout
                                ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc not in (0, SEGMENT_RC):
            print(f"segment crashed (rc={rc}); waiting for device",
                  flush=True)
            if not _wait_for_device():
                return 1
            continue

        if args.eval_batches > 0:
            try:
                out = subprocess.run(eval_cmd, capture_output=True,
                                     timeout=args.segment_timeout)
                line = out.stdout.decode().strip().splitlines()[-1]
                metrics = json.loads(line)
                if kind == "proxynet":
                    score = (metrics.get("kp_pck@0.10bbox") or 0.0) \
                        + (metrics.get("mask_mean_iou") or 0.0)
                elif kind == "regressor":
                    # Lower PVE is better; negate so max-score still wins.
                    score = -(metrics.get("pve_mm") or 1e9)
                else:
                    score = metrics.get("ap@0.5") or 0.0
                _log(args.ckpt_dir, {"kind": f"eval-{kind}", **metrics})
                print("eval:", json.dumps(metrics), flush=True)
                # A NaN score (e.g. every extraction failed on an
                # early-training eval) must never become `best`: NaN
                # poisons the `score > best` comparison forever after.
                import math
                if not math.isfinite(score):
                    print("eval score non-finite; not tracked", flush=True)
                elif (best is None
                      or not math.isfinite(best.get("score", float("nan")))
                      or score > best["score"]):
                    best = {"score": score, **metrics}
                    with open(best_path, "w") as f:
                        json.dump(best, f, indent=1)
                    import shutil
                    shutil.copyfile(
                        os.path.join(args.ckpt_dir, "weights_last.npz"),
                        os.path.join(args.ckpt_dir, "weights_best.npz"))
                    print(f"new best score {score:.4f}", flush=True)
            except Exception as e:   # eval crash: skip, keep training
                print(f"eval failed: {e}", flush=True)
                _wait_for_device()

        if rc == 0:
            print("drive: training complete", flush=True)
            return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=[
        "proxynet", "detector", "regressor",
        "drive-proxynet", "drive-detector", "drive-regressor",
        "eval-proxynet", "eval-detector", "eval-regressor", "eval-fit3d",
        "eval-fit3d-mv", "eval-fit3d-track"])
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--segment", type=int, default=400)
    p.add_argument("--segment-timeout", type=int, default=2400)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--wh", type=int, default=256)
    p.add_argument("--h", type=int, default=256)
    p.add_argument("--w", type=int, default=448)
    p.add_argument("--players", type=int, default=8)
    p.add_argument("--views", type=int, default=3,
                   help="eval-fit3d-mv: cameras per player")
    p.add_argument("--frames", type=int, default=8,
                   help="eval-fit3d-track: clip length per player")
    p.add_argument("--mv-rounds", type=int, default=3,
                   help="eval-fit3d-mv: alternation rounds (reference 3)")
    p.add_argument("--mv-iters", type=int, default=50,
                   help="eval-fit3d-mv: iters per phase (reference 50)")
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--save-every", type=int, default=200,
                   help="in-process checkpoint interval (0 = segment end "
                        "only)")
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--no-iuv", action="store_true")
    p.add_argument("--no-occluders", action="store_true")
    p.add_argument("--resnet-layers", type=int, default=18,
                   help="regressor encoder depth (18 or 50)")
    p.add_argument("--proxy-channels", type=int, default=18,
                   choices=[18, 20, 21],
                   help="regressor proxy input: 18 = [sil, heatmaps]; 21 "
                        "adds IUV; 20 = [heatmaps, IUV] "
                        "(player_iuv_sp.py:61-427)")
    p.add_argument("--no-corrupt", action="store_true",
                   help="regressor ablation: train on clean GT proxies "
                        "(no STRAPS-style corruption)")
    p.add_argument("--eval-corrupt", action="store_true",
                   help="evaluate the regressor under the corruption noise "
                        "model instead of clean proxies")
    p.add_argument("--via-proxynet", default=None,
                   help="ProxyNet weights .npz: full-pipeline regressor "
                        "eval (RGB crop → extracted proxy → regressor)")
    p.add_argument("--fit-iters", type=int, default=0,
                   help="eval-fit3d: override the 100-iter reference "
                        "budget (0 = default FitConfig)")
    p.add_argument("--fit-lr", type=float, default=0.001,
                   help="eval-fit3d: fitting Adam lr (reference 0.001)")
    p.add_argument("--conf-weight", action="store_true",
                   help="eval-fit3d: weight the joints2D fit loss by the "
                        "keypoint score channel")
    p.add_argument("--betas-prior", type=float, default=0.0)
    p.add_argument("--pose-prior", type=float, default=0.0)
    p.add_argument("--ortho-prior", type=float, default=0.0)
    p.add_argument("--joints2d-scale", type=float, default=1.0)
    p.add_argument("--silh-warmup", type=int, default=0,
                   help="eval-fit3d: silhouette-loss linear warmup iters")
    p.add_argument("--no-domain-rand", action="store_true",
                   help="ablation baseline: plain background, no blur/"
                        "photometric jitter")
    p.add_argument("--eval-easy", action="store_true",
                   help="eval on the non-randomized held-out set")
    p.add_argument("--flip-tta", action="store_true",
                   help="horizontal-flip ensemble in the eval extractor")
    p.add_argument("--kp-tta-tau", type=float, default=0.08,
                   help="kp TTA agreement radius (fraction of crop size)")
    p.add_argument("--kp-disagree-penalty", type=float, default=1.0,
                   help="kp TTA score multiplier on pass disagreement")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint dir (required for training; eval modes "
                        "may instead pass explicit --weights)")
    p.add_argument("--real-image-root", default=None,
                   help="crop tree for distillation mixing")
    p.add_argument("--real-proxy-root", default=None)
    p.add_argument("--p-real", type=float, default=0.3)
    p.add_argument("--extract-cache", default=None,
                   help="regressor --via-proxynet: directory caching "
                        "extracted batches (each slot extracted once, "
                        "replayed across epochs/segment retries)")
    p.add_argument("--extract-batches", type=int, default=48,
                   help="number of cache slots (distinct extracted batches)")
    p.add_argument("--finetune-from", default=None)
    p.add_argument("--weights", default=None)
    p.add_argument("--json", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="pin the default device to CPU (the axon plugin "
                        "ignores JAX_PLATFORMS; tests/smoke runs use this)")
    args = p.parse_args()

    if args.cpu:
        from soccerplayershapepose_tpu.utils.precision import pin_cpu
        pin_cpu()

    if args.mode.startswith("eval-"):
        if not (args.weights or args.ckpt_dir):
            p.error("eval modes need --weights or --ckpt-dir")
    elif not args.ckpt_dir:
        p.error("--ckpt-dir is required for training")

    if args.mode in ("proxynet", "detector", "regressor"):
        sys.exit(_train_segment(args, args.mode))
    if args.mode.startswith("drive-"):
        kind = args.mode.split("-", 1)[1]
        sys.exit(_drive(args, kind, sys.argv[1:]))
    if args.mode == "eval-proxynet":
        sys.exit(_eval_proxynet(args))
    if args.mode == "eval-regressor":
        sys.exit(_eval_regressor(args))
    if args.mode == "eval-fit3d":
        sys.exit(_eval_fit3d(args))
    if args.mode == "eval-fit3d-mv":
        sys.exit(_eval_fit3d_mv(args))
    if args.mode == "eval-fit3d-track":
        sys.exit(_eval_fit3d_track(args))
    sys.exit(_eval_detector(args))


if __name__ == "__main__":
    main()
