#!/bin/bash
# Round-3 TPU work queue — everything the 2026-08-17/18 outage left
# unexecuted, ordered by VALUE PER CHIP-MINUTE so a late-returning chip
# still produces the records that matter most:
#
#   A. bench.py full record (~10 min — BENCH numbers incl. the committed
#      fused-backward rasterizer, unmeasured on-chip so far)
#   B. MFU characterization, predict + fit (~20 min — completes PERF.md)
#   C. finish detector training 1200 -> 4000 steps (~1.5 h; AP@0.5 was
#      still climbing) + repack/re-eval the committed artifact
#   D. held-out quality cells -> QUALITY_r03.json (64-image TPU cells)
#   E. STRAPS regressor training + eval chain (~2.5 h — replaces the
#      reference's external straps checkpoint with an in-repo artifact)
#   F. rasterizer chunk-size sweep (informs round-4 defaults)
#   G. equal-budget domain-randomization ablation arms (2 x 1500 steps)
#   H. ProxyNet low-lr continuation, improve-gated repack
#
# Run:  nohup bash scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Each stage runs in its own process (the remote worker crash-loops after
# Mosaic aborts / long executions; a crashed client cannot recover
# in-process) and re-waits for the device before starting.

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

log() { echo "[queue $(date +%H:%M:%S)] $*"; }

wait_dev() {
    # Blocks until the device answers a tiny op (probe subprocesses inside).
    python scripts/probe_tpu.py wait
}

stage() {  # stage <name> <timeout_s> <cmd...>
    local name="$1" t="$2"; shift 2
    log "=== $name"
    if ! wait_dev; then log "$name: device never came up; skipping"; return 1; fi
    timeout "$t" "$@"
    local rc=$?
    log "$name: rc=$rc"
    return $rc
}

# --- A. Bench record (highest value density: fit numbers pick up the
#        committed backward-kernel fusion, never yet measured on-chip) ------
# The JSON line is also persisted into the repo: if the chip dies again
# before the driver's round-end bench run, the measurement survives.
save_bench() {  # save_bench <log> <out.json>
    python - "$1" "$2" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.startswith("{")]
if lines:
    rec = json.loads(lines[-1])
    rec["source"] = "tpu_queue.sh on-chip run"
    with open(sys.argv[2], "w") as f:
        json.dump(rec, f, indent=1)
    print("saved", sys.argv[2])
EOF
}
stage bench 3600 python bench.py 2>&1 | tee /tmp/bench_r03_manual.log
save_bench /tmp/bench_r03_manual.log BENCH_r03_queue.json

# --- B. MFU characterization ------------------------------------------------
stage mfu-predict 1800 python scripts/mfu.py predict \
    2>&1 | tee /tmp/mfu_predict_r03.log
stage mfu-fit 1800 python scripts/mfu.py fit \
    2>&1 | tee /tmp/mfu_fit_r03.log

# --- C. Detector: resume 1200 -> 4000 steps (restarts from state.npz).
# Args pinned to the ORIGINAL run (det_watch.sh) so the per-segment eval set
# stays identical — best.json scores are only comparable on the same set.
stage detector-finish 14400 \
    python scripts/train_perception.py drive-detector --steps 4000 \
        --batch 8 --h 256 --w 448 --players 8 --segment 400 \
        --save-every 100 --eval-batches 4 \
        --ckpt-dir weights/detector_r03

# Repack the committed artifact + fresh eval json at the new best.
if [ -f weights/detector_r03/weights_best.npz ]; then
    stage detector-pack 600 \
        python scripts/pack_weights.py weights/detector_r03/weights_best.npz \
            weights/detector_256x448_f16.npz &&
    stage detector-artifact-eval 3600 \
        python scripts/train_perception.py eval-detector \
            --weights weights/detector_256x448_f16.npz \
            --eval-batches 4 --batch 16 \
            --json weights/detector_256x448_f16.json &&
    # Provenance fields the packed-artifact json carries alongside metrics
    # (only after BOTH the pack and the fresh eval actually succeeded —
    # otherwise the json would claim a run that never happened).
    python - <<'EOF'
import json
p = "weights/detector_256x448_f16.json"
with open(p) as f:
    d = json.load(f)
d["weights"] = "weights/detector_256x448_f16.npz"
d["training_steps"] = 4000
d["note"] = "f16-packed weights_best of the full 4000-step run"
with open(p, "w") as f:
    json.dump(d, f, indent=1)
print("provenance updated")
EOF
fi

# --- D. Quality cells (64-image TPU evals of the committed artifacts) ------
stage quality-cells 10800 \
    python scripts/quality_record.py --suffix _64img_tpu \
        --detector-weights weights/detector_256x448_f16.npz

# --- E. STRAPS-style regressor training (train/straps.py) -------------------
# Replaces the reference's external straps_model_checkpoint.tar
# (player_recon.py:133-140) with an in-repo trained artifact.
stage regressor-train 21600 \
    python scripts/train_perception.py drive-regressor --steps 4000 \
        --batch 16 --wh 512 --lr 1e-4 --ckpt-dir weights/regressor_r03
if [ -f weights/regressor_r03/weights_best.npz ]; then
    stage regressor-pack 600 \
        python scripts/pack_weights.py weights/regressor_r03/weights_best.npz \
            weights/regressor_18ch_f16.npz &&
    stage regressor-artifact-eval 3600 \
        python scripts/train_perception.py eval-regressor \
            --weights weights/regressor_18ch_f16.npz --wh 512 \
            --eval-batches 4 --batch 16 \
            --json weights/regressor_18ch_f16.json &&
    stage regressor-artifact-eval-corrupt 3600 \
        python scripts/train_perception.py eval-regressor \
            --weights weights/regressor_18ch_f16.npz --wh 512 --eval-corrupt \
            --eval-batches 4 --batch 16 \
            --json weights/regressor_18ch_f16_corrupt.json &&
    # Full-pipeline cell: RGB crop -> trained ProxyNet extraction -> proxy
    # -> regressor -> 3D error (the deployment-condition number).
    stage regressor-e2e-eval 3600 \
        python scripts/train_perception.py eval-regressor \
            --weights weights/regressor_18ch_f16.npz \
            --via-proxynet weights/proxynet_256_f16.npz --wh 256 --flip-tta \
            --eval-batches 4 --batch 16 \
            --json weights/regressor_18ch_e2e.json &&
    # GT-3D fitting benchmark: PVE/MPJPE of regressor init vs the 100-iter
    # render-and-compare fit (a number the reference cannot measure).
    stage fit3d-benchmark 3600 \
        python scripts/train_perception.py eval-fit3d \
            --weights weights/regressor_18ch_f16.npz --wh 512 \
            --eval-batches 2 --batch 8 --json weights/fit3d_benchmark.json
fi

# --- F. Rasterizer chunk sweep (one config per process: a faulting Mosaic
#        config must not take the rest of the grid down with it) ------------
for cfg in "256 8 256 8" "256 8 256 16" "256 8 256 32" "256 8 256 64" \
           "256 16 256 16" "256 8 128 16" \
           "512 16 128 8" "512 16 128 16" "512 16 128 4" \
           "512 8 128 8" "512 16 64 8"; do
    # shellcheck disable=SC2086
    stage "raster-sweep $cfg" 1200 python scripts/tune_raster.py $cfg \
        2>&1 | tee -a /tmp/raster_sweep_r03.log
done

# --- G. Equal-budget domain-randomization ablation arms --------------------
stage ablation-rand-on 10800 \
    python scripts/train_perception.py drive-proxynet --steps 1500 \
        --ckpt-dir weights/ablation_rand_on
stage ablation-rand-off 10800 \
    python scripts/train_perception.py drive-proxynet --steps 1500 \
        --no-domain-rand --ckpt-dir weights/ablation_rand_off

# Merge the arm results (+ per-arm easy cells) into QUALITY_r03.json without
# re-running the already-recorded cells.
stage quality-ablation-merge 7200 \
    python scripts/quality_record.py --suffix _64img_tpu \
        --detector-weights weights/detector_256x448_f16.npz \
        --skip proxynet_256_hard,proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard,detector_hard_tta

# --- H. ProxyNet low-lr continuation (6000 -> 10000 steps) ------------------
# The committed artifact's held-out kp median is 9.4 px (target: lower);
# resume the r03 run with a smaller peak lr and repack ONLY if the drive's
# held-out score (pck@0.1 + mask IoU, same formula as best.json) beats the
# committed artifact — never regress a shipped artifact from a queue stage.
stage proxynet-finetune 7200 \
    python scripts/train_perception.py drive-proxynet --steps 10000 \
        --lr 5e-4 --ckpt-dir weights/proxynet_r03
if python - <<'EOF'
import json, sys
try:
    best = json.load(open("weights/proxynet_r03/best.json"))
    cur = json.load(open("weights/proxynet_256_f16.json"))
except OSError:
    sys.exit(1)
cur_score = cur.get("score") or (cur["kp_pck@0.10bbox"] + cur["mask_mean_iou"])
sys.exit(0 if best["score"] > cur_score + 1e-6 else 1)
EOF
then
    log "fine-tune improved the held-out score; repacking"
    stage proxynet-pack 600 \
        python scripts/pack_weights.py weights/proxynet_r03/weights_best.npz \
            weights/proxynet_256_f16.npz &&
    stage proxynet-artifact-eval 3600 \
        python scripts/train_perception.py eval-proxynet \
            --weights weights/proxynet_256_f16.npz --wh 256 \
            --eval-batches 4 --batch 16 \
            --json weights/proxynet_256_f16.json &&
    stage quality-refresh-proxynet 10800 \
        python scripts/quality_record.py --suffix _64img_tpu \
            --detector-weights weights/detector_256x448_f16.npz \
            --skip detector_hard,detector_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,ablation_rand_on,ablation_rand_off
else
    log "fine-tune did not beat the committed artifact; keeping it"
fi

# --- Final: re-bench + refresh the quality record if trainings landed ------
stage bench-final 3600 python bench.py 2>&1 | tee -a /tmp/bench_r03_manual.log
save_bench /tmp/bench_r03_manual.log BENCH_r03_queue.json

# Persist the MFU records next to PERF.md's analytical section too.
python - <<'EOF'
import json, os
out = {}
for tag, path in (("predict", "/tmp/mfu_predict_r03.log"),
                  ("fit", "/tmp/mfu_fit_r03.log")):
    if os.path.exists(path):
        lines = [l for l in open(path) if l.startswith("{")]
        if lines:
            out[tag] = json.loads(lines[-1])
if out:
    with open("MFU_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print("saved MFU_r03.json")
EOF

log "queue complete"
