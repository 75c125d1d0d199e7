"""Assemble QUALITY_r{N}.json: held-out quality of the COMMITTED weight
artifacts.

Runs each evaluation cell crash-isolated (the axon TPU worker can fault
mid-run; a cell is retried after the device answers again) and writes one
record the judge can diff against VERDICT expectations:

* proxynet @256 and @512 — the committed f16 artifacts, evaluated on the
  HARD held-out stream (domain randomization + occluders, the deployment
  condition) and on the EASY stream (no randomization) as the
  robustness-ablation row,
* detector — AP@0.5 / recall / precision at the reference operating point
  (score >= 0.7, player_detection.py:28),
* optional training-ablation arms (nets trained with/without domain
  randomization, equal budgets) merged from weights/ablation_*/best.json
  when present.

Usage: python scripts/quality_record.py [--out QUALITY_r03.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(ROOT, "scripts", "train_perception.py")


def _wait_for_device(max_wait_s=2400):
    if os.environ.get("SPT_CPU") == "1":   # cells run on host; nothing to wait for
        return True
    deadline = time.time() + max_wait_s
    probe = "import jax, jax.numpy as jnp; print(float(jnp.ones((8,)).sum()))"
    while time.time() < deadline:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, timeout=90)
            if out.returncode == 0 and b"8.0" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print("waiting for device...", flush=True)
        time.sleep(30)
    return False


def _write_record(record, path):
    """Atomic incremental write: a deadline kill mid-dump must never leave
    a truncated file (the next run seeds from it — ADVICE r4)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, path)


def run_cell(args, timeout_s=None, attempts=3):
    """One eval subprocess; parsed JSON from its last stdout line."""
    if timeout_s is None:
        timeout_s = int(os.environ.get("SPT_CELL_TIMEOUT", "1500"))
    cmd = [sys.executable, TRAIN] + args
    for attempt in range(attempts):
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout_s, cwd=ROOT)
            lines = [ln for ln in out.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if out.returncode == 0 and lines:
                return json.loads(lines[-1])
            print(f"cell rc={out.returncode}: {out.stderr[-300:]}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print("cell timeout", flush=True)
        if attempt + 1 < attempts:
            _wait_for_device()
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(ROOT, "QUALITY_r04.json"))
    p.add_argument("--round", type=int, default=4)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--detector-weights",
                   default="weights/detector_256x448_f16.npz")
    p.add_argument("--regressor-weights",
                   default="weights/regressor_18ch_f16.npz")
    p.add_argument("--skip", default="",
                   help="comma list of cell names to skip")
    p.add_argument("--suffix", default="",
                   help="provenance tag appended to every cell name it "
                        "writes (e.g. _64img_cpu); --skip matches the "
                        "UNsuffixed name")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    common = ["--eval-batches", str(args.eval_batches),
              "--batch", str(args.batch)]
    # The metrics are hardware-independent; SPT_CPU=1 pins every eval cell
    # to the host CPU (fallback for long TPU outages — slower, same math).
    if os.environ.get("SPT_CPU") == "1":
        common.append("--cpu")
    # Ordered by record value: with incremental per-cell writes (below), a
    # deadline kill mid-run keeps everything already measured — so the
    # cells the VERDICT tracks come first.
    cells = {
        # Full RGB->ProxyNet->regressor chain (the e2e 3D number):
        "regressor_e2e": ["eval-regressor", "--wh", "256", "--weights",
                          args.regressor_weights, "--via-proxynet",
                          "weights/proxynet_256_f16.npz"] + common,
        "detector_hard": ["eval-detector", "--weights",
                          args.detector_weights] + common,
        "proxynet_256_hard": ["eval-proxynet", "--wh", "256", "--weights",
                              "weights/proxynet_256_f16.npz"] + common,
        # Regressor artifact cells (clean proxies / training-noise proxies):
        "regressor_clean": ["eval-regressor", "--wh", "512", "--weights",
                            args.regressor_weights] + common,
        "regressor_corrupt": ["eval-regressor", "--wh", "512",
                              "--eval-corrupt", "--weights",
                              args.regressor_weights] + common,
        "proxynet_256_easy": ["eval-proxynet", "--wh", "256", "--weights",
                              "weights/proxynet_256_f16.npz",
                              "--eval-easy"] + common,
        "proxynet_256_hard_tta": ["eval-proxynet", "--wh", "256",
                                  "--weights",
                                  "weights/proxynet_256_f16.npz",
                                  "--flip-tta"] + common,
        "proxynet_512_hard": ["eval-proxynet", "--wh", "512", "--weights",
                              "weights/proxynet_512_f16.npz"] + common,
        "proxynet_512_hard_tta": ["eval-proxynet", "--wh", "512",
                                  "--weights",
                                  "weights/proxynet_512_f16.npz",
                                  "--flip-tta"] + common,
        "detector_hard_tta": ["eval-detector", "--weights",
                              args.detector_weights, "--flip-tta"] + common,
    }

    # Round-5 artifact cells — included only when the weights exist.
    distilled = "weights/distill_r05/regressor_18ch_distilled.npz"
    if os.path.exists(os.path.join(ROOT, distilled)):
        cells["regressor_distilled_clean"] = \
            ["eval-regressor", "--wh", "512", "--weights", distilled] + common
        cells["regressor_distilled_e2e"] = \
            ["eval-regressor", "--wh", "256", "--weights", distilled,
             "--via-proxynet", "weights/proxynet_256_f16.npz"] + common
    # Extracted-proxy fine-tuned regressor (r5a2 queue; kept separate from
    # the base artifact so in-flight comparisons against regressor_18ch_f16
    # stay coherent).
    e2eft = "weights/regressor_18ch_e2eft.npz"
    if os.path.exists(os.path.join(ROOT, e2eft)):
        cells["regressor_e2eft_clean"] = \
            ["eval-regressor", "--wh", "512", "--weights", e2eft] + common
        cells["regressor_e2eft_e2e"] = \
            ["eval-regressor", "--wh", "256", "--weights", e2eft,
             "--via-proxynet", "weights/proxynet_256_f16.npz"] + common
    for ch in (21, 20):
        w = f"weights/regressor_iuv{ch}/weights_last.npz"
        if os.path.exists(os.path.join(ROOT, w)):
            cells[f"regressor_iuv{ch}_clean"] = \
                ["eval-regressor", "--wh", "512", "--proxy-channels",
                 str(ch), "--weights", w] + common
            cells[f"regressor_iuv{ch}_corrupt"] = \
                ["eval-regressor", "--wh", "512", "--eval-corrupt",
                 "--proxy-channels", str(ch), "--weights", w] + common
    if os.path.exists(os.path.join(ROOT,
                                   "weights/regressor_iuv21/weights_last.npz")):
        cells["regressor_iuv21_e2e"] = \
            ["eval-regressor", "--wh", "256", "--proxy-channels", "21",
             "--weights", "weights/regressor_iuv21/weights_last.npz",
             "--via-proxynet", "weights/proxynet_256_f16.npz"] + common

    # Seed from an existing record so a --skip rerun (e.g. merging the
    # late-finishing ablation arms) updates cells in place instead of
    # dropping the skipped ones from the rewritten file.
    record = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                record = json.load(f)
        except ValueError:
            print(f"{args.out} is corrupt; starting a fresh record",
                  flush=True)
    record.update({"round": args.round, "eval_batches": args.eval_batches,
                   "batch": args.batch,
                   "note": ("held-out synthetic eval (seeds disjoint from "
                            "training, train/quality.py); 'hard' = domain "
                            "randomization + occluders (deployment "
                            "condition), 'easy' = clean renders")})
    for name, cell in cells.items():
        if name in skip:
            continue
        out_name = name + args.suffix
        print(f"=== {out_name}", flush=True)
        res = run_cell(cell)
        if res is None and out_name in record:
            print(f"{out_name}: cell failed; keeping the existing value",
                  flush=True)
            continue
        record[out_name] = res
        print(json.dumps({out_name: res}), flush=True)
        _write_record(record, args.out)     # incremental: survive a kill

    # Training-ablation arms (equal-budget domain-rand on/off): merge the
    # drive's hard-set best.json and add a clean-set cell per arm so the
    # docs table shows the robustness/cleanness trade both ways.
    for arm in ("ablation_rand_on", "ablation_rand_off"):
        path = os.path.join(ROOT, "weights", arm, "best.json")
        if not os.path.exists(path) or arm in skip:
            continue
        with open(path) as f:
            record[f"{arm}_hard{args.suffix}"] = json.load(f)
        res = run_cell(["eval-proxynet", "--wh", "256", "--eval-easy",
                        "--weights", f"weights/{arm}/weights_best.npz"]
                       + common)
        if res is None and f"{arm}_easy{args.suffix}" in record:
            print(f"{arm}_easy: cell failed; keeping the existing value",
                  flush=True)
            continue
        record[f"{arm}_easy{args.suffix}"] = res
        print(json.dumps({f"{arm}_easy{args.suffix}": res}), flush=True)
        _write_record(record, args.out)

    _write_record(record, args.out)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
