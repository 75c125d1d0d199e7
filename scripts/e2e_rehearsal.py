"""One-clip dress rehearsal: the full broadcast chain as CLI invocations.

VERDICT r4 #6/#10: every stage was tested in isolation but no single
committed run went video -> classify -> detect/crop -> proxy -> predict ->
fit -> metrics.xml -> refine gate (the reference's de-facto acceptance
path, ``player_recon.py:2500-2551`` + ``classification.py:261-295`` +
``player_detection.py:152-250``). This script builds a synthetic broadcast
clip (wide main-camera frames interleaved with close-up shots the
classifier must reject), then drives the REAL ``soccerplayershapepose_tpu``
CLI stage by stage, recording every stage's JSON output + wall time into
``weights/e2e_r05/summary.json`` (rendered to docs/E2E.md).

Phases are idempotent (output-guarded): rerun freely after a device fault.

  python scripts/e2e_rehearsal.py [--root /tmp/e2e_r05] [--fast] [--cpu]
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

OUT_DIR = os.path.join(REPO, "weights", "e2e_r05")


def _summary(root):
    path = os.path.join(OUT_DIR, "summary.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except ValueError:
            pass
    return {}


def _save(summary):
    os.makedirs(OUT_DIR, exist_ok=True)
    tmp = os.path.join(OUT_DIR, "summary.json.tmp")
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, os.path.join(OUT_DIR, "summary.json"))


_CPU_SHIM = ("from soccerplayershapepose_tpu.utils.precision import "
             "pin_cpu; pin_cpu(); import sys; "
             "from soccerplayershapepose_tpu.cli import main; "
             "sys.exit(main(sys.argv[1:]))")


def run_cli(args_list, cpu=False, timeout_s=1800):
    if cpu:   # CPU smoke: the TPU plugin ignores JAX_PLATFORMS (conftest)
        cmd = [sys.executable, "-c", _CPU_SHIM] + args_list
    else:
        cmd = [sys.executable, "-m", "soccerplayershapepose_tpu"] + args_list
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=timeout_s)
    wall = round(time.time() - t0, 1)
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    rec = json.loads(lines[-1]) if lines else None
    if out.returncode != 0:
        raise RuntimeError(
            f"CLI {' '.join(args_list[:2])} rc={out.returncode}: "
            f"{out.stderr[-400:]}")
    return rec, wall, " ".join(["soccerplayershapepose_tpu"] + args_list)


def make_video(args):
    """Synthetic broadcast clip: wide frames + close-up shots, mp4."""
    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.synth import (
        synth_crop_batch, synth_frame_batch)

    path = os.path.join(args.root, "clip.mp4")
    if os.path.exists(path):
        return {"video": path, "cached": True}
    os.makedirs(args.root, exist_ok=True)
    assets = load_assets()
    rng = jax.random.PRNGKey(11)
    h, w = 256, 448
    frames = []
    n_wide = args.frames
    n_close = max(args.frames // 3, 2)
    for i in range(0, n_wide, 2):
        b = synth_frame_batch(assets, jax.random.fold_in(rng, i), b=2,
                              n_players=args.players, hw=(h, w))
        frames += [np.asarray(jnp.clip(img * 255, 0, 255)).astype(np.uint8)
                   for img in b["image"]]
    close = []
    for i in range(0, n_close, 2):
        b = synth_crop_batch(assets, jax.random.fold_in(rng, 500 + i), b=2,
                             wh=256)
        for img in np.asarray(jnp.clip(b["image"] * 255, 0, 255)) \
                .astype(np.uint8):
            canvas = np.zeros((h, w, 3), np.uint8)
            canvas[:, (w - 256) // 2:(w - 256) // 2 + 256] = img
            close.append(canvas)
    # Interleave: close-ups scattered through the broadcast.
    order = frames[:]
    step = max(len(order) // (len(close) + 1), 1)
    for k, c in enumerate(close):
        order.insert(min((k + 1) * step + k, len(order)), c)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
    for f in order:
        vw.write(f[..., ::-1])
    vw.release()
    return {"video": path, "wide_frames": len(frames),
            "closeup_frames": len(close)}


def render_md(summary):
    """docs/E2E.md: the one-clip acceptance run as a stage table."""
    lines = [
        "# One-clip dress rehearsal",
        "",
        "A single synthetic broadcast clip through the full chain — the",
        "reference's de-facto acceptance path (`player_recon.py:2500-2551`,",
        "`classification.py:261-295`, `player_detection.py:152-250`) as",
        "real CLI invocations. Regenerate with",
        "`python scripts/e2e_rehearsal.py`; raw record:",
        "`weights/e2e_r05/summary.json`.",
        "",
    ]
    vid = summary.get("video", {})
    if vid:
        lines += [f"Clip: {vid.get('wide_frames', '?')} wide broadcast "
                  f"frames + {vid.get('closeup_frames', '?')} close-up "
                  "shots the classifier gate must reject.", ""]
    lines += ["| stage | wall s | result |", "|---|---|---|"]
    for name in ("harvest", "crop_broad", "create_proxy", "predict",
                 "single_view", "calc_metrics"):
        st = summary.get(name)
        if not isinstance(st, dict) or "result" not in st:
            continue
        res = json.dumps(st["result"])
        res = res[:160] + ("…" if len(res) > 160 else "")
        lines.append(f"| `{st['command'].split()[1]}` | {st['wall_s']} "
                     f"| `{res}` |")
    lines += ["", summary.get("note", ""), ""]
    path = os.path.join(REPO, "docs", "E2E.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"rendered {path}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/e2e_r05")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--players", type=int, default=8)
    p.add_argument("--max-accepted", type=int, default=8)
    p.add_argument("--fast", action="store_true",
                   help="4-iter fits (CPU smoke)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from soccerplayershapepose_tpu.utils.precision import pin_cpu
        pin_cpu()

    summary = _summary(args.root)
    root = args.root
    broad = os.path.join(root, "Broad")
    boxes = os.path.join(root, "BroadBox")
    crops = os.path.join(root, "BroadPlayer")
    proxies = os.path.join(root, "BroadProxy")
    sgl_init = os.path.join(root, "SglInit")
    sgl = os.path.join(root, "Sgl")
    cls_weights = os.path.join(REPO, "weights", "frame_classifier.npz")
    fit_iters = ["--iters", "4"] if args.fast else []

    def stage(name, cli_args, timeout_s=1800):
        if name in summary:
            print(f"{name}: cached", flush=True)
            return
        rec, wall, cmd = run_cli(cli_args, cpu=args.cpu,
                                 timeout_s=timeout_s)
        summary[name] = {"result": rec, "wall_s": wall, "command": cmd}
        _save(summary)
        print(f"{name} ({wall}s): {json.dumps(rec)[:300]}", flush=True)

    if "video" not in summary:
        summary["video"] = make_video(args)
        _save(summary)
        print("video:", json.dumps(summary["video"]), flush=True)

    harvest = ["harvest-frames", "--video",
               os.path.join(root, "clip.mp4"), "--out-root", broad,
               "--n-samples", str(args.frames * 3),
               "--max-accepted", str(args.max_accepted),
               "--height", "256", "--width", "448"]
    if os.path.exists(cls_weights):
        harvest += ["--classifier-params", cls_weights]
    stage("harvest", harvest)

    stage("crop_broad", ["crop-broad-player", "--frame-root", broad,
                         "--box-root", boxes, "--player-root", crops])
    stage("create_proxy", ["create-proxy", "--image-root", crops,
                           "--proxy-root", proxies])
    stage("predict", ["predict", "--image-root", crops,
                      "--proxy-root", proxies, "--result-root", sgl_init])
    stage("single_view", ["single-view", "--image-root", crops,
                          "--proxy-root", proxies, "--result-root", sgl]
          + fit_iters, timeout_s=3600)
    stage("calc_metrics", ["calc-metrics", "--root", sgl])

    summary["note"] = (
        "synthetic broadcast clip -> harvest(classifier gate) -> "
        "broadcast boxes/crops -> ProxyNet proxies -> regressor predict -> "
        "single-view fits (metrics.xml per player) -> calc-metrics "
        "(refine gate count at 10 px, player_recon.py:874,1046)")
    _save(summary)
    render_md(summary)
    print(json.dumps({k: v for k, v in summary.items()
                      if k in ("harvest", "calc_metrics")}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
