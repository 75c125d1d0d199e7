#!/bin/bash
# Round-3 TPU queue, part B — the chip came back 2026-08-19 but the
# workspace is fresh: the gitignored checkpoint dirs (weights/*_r03*/)
# did not survive the session boundary, so nothing can resume from
# state.npz. Only the COMMITTED f16 artifacts exist. This revision of
# scripts/tpu_queue.sh therefore:
#   * warm-starts the detector continuation from the committed artifact
#     via --finetune-from (fresh Adam state, fresh 2800-step cosine —
#     1200 committed + 2800 = the originally planned 4000),
#   * keeps the same value-per-chip-minute ordering,
#   * drops the proxynet low-lr continuation (its source run is gone;
#     a from-scratch 10k-step run is not worth the chip time vs the
#     regressor + ablation stages below).
#
# Run:  nohup bash scripts/tpu_queue_r3b.sh > /tmp/tpu_queue_b.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

log() { echo "[queue $(date +%H:%M:%S)] $*"; }

wait_dev() {
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

save_bench() {  # save_bench <log> <out.json>
    python - "$1" "$2" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.startswith("{")]
if lines:
    rec = json.loads(lines[-1])
    rec["source"] = "tpu_queue_r3b.sh on-chip run"
    with open(sys.argv[2], "w") as f:
        json.dump(rec, f, indent=1)
    print("saved", sys.argv[2])
EOF
}

# --- A. Bench record (fit numbers pick up the committed fused-backward
#        rasterizer, never yet measured on-chip) -----------------------------
stage bench 3600 python bench.py 2>&1 | tee /tmp/bench_r03_manual.log
save_bench /tmp/bench_r03_manual.log BENCH_r03_queue.json

# --- B. Detector: finish the interrupted run. Committed artifact is the
#        step-1200 weights; continue 2800 more (fresh Adam, seed 1 for
#        fresh data folds; eval set is EVAL_SEED_BASE-derived and
#        identical across runs, so AP comparisons stay valid). --------------
mkdir -p weights/detector_warm
cp weights/detector_256x448_f16.npz weights/detector_warm/weights_last.npz
stage detector-finish 14400 \
    python scripts/train_perception.py drive-detector --steps 2800 \
        --batch 8 --h 256 --w 448 --players 8 --segment 400 \
        --save-every 100 --eval-batches 4 --seed 1 \
        --finetune-from weights/detector_warm \
        --ckpt-dir weights/detector_r03b

# Repack ONLY if the continuation's held-out AP beats the committed one.
if python - <<'EOF'
import json, sys
try:
    best = json.load(open("weights/detector_r03b/best.json"))
    cur = json.load(open("weights/detector_256x448_f16.json"))
except OSError:
    sys.exit(1)
sys.exit(0 if best["score"] > (cur.get("ap@0.5") or 0.0) + 1e-6 else 1)
EOF
then
    log "detector continuation improved held-out AP; repacking"
    stage detector-pack 600 \
        python scripts/pack_weights.py weights/detector_r03b/weights_best.npz \
            weights/detector_256x448_f16.npz &&
    stage detector-artifact-eval 3600 \
        python scripts/train_perception.py eval-detector \
            --weights weights/detector_256x448_f16.npz \
            --eval-batches 4 --batch 16 \
            --json weights/detector_256x448_f16.json &&
    python - <<'EOF'
import json
p = "weights/detector_256x448_f16.json"
with open(p) as f:
    d = json.load(f)
d["weights"] = "weights/detector_256x448_f16.npz"
d["training_steps"] = 4000
d["note"] = ("f16-packed weights_best; 1200 steps (r03 run, committed) + "
             "2800-step warm-started continuation (r03b)")
with open(p, "w") as f:
    json.dump(d, f, indent=1)
print("provenance updated")
EOF
else
    log "detector continuation did not beat the committed artifact"
fi

# --- C. MFU characterization ------------------------------------------------
stage mfu-predict 1800 python scripts/mfu.py predict \
    2>&1 | tee /tmp/mfu_predict_r03.log
stage mfu-fit 1800 python scripts/mfu.py fit \
    2>&1 | tee /tmp/mfu_fit_r03.log
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

# --- D. Quality cells: refresh the detector cells against the (possibly
#        repacked) artifact; proxynet 64-img TPU cells are already in
#        QUALITY_r03.json and are skipped. ----------------------------------
stage quality-detector 10800 \
    python scripts/quality_record.py --suffix _64img_tpu \
        --detector-weights weights/detector_256x448_f16.npz \
        --skip proxynet_256_hard,proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta

# --- E. STRAPS-style regressor training + eval chain ------------------------
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
    stage regressor-e2e-eval 3600 \
        python scripts/train_perception.py eval-regressor \
            --weights weights/regressor_18ch_f16.npz \
            --via-proxynet weights/proxynet_256_f16.npz --wh 256 --flip-tta \
            --eval-batches 4 --batch 16 \
            --json weights/regressor_18ch_e2e.json &&
    stage fit3d-benchmark 3600 \
        python scripts/train_perception.py eval-fit3d \
            --weights weights/regressor_18ch_f16.npz --wh 512 \
            --eval-batches 2 --batch 8 --json weights/fit3d_benchmark.json
fi

# --- F. Equal-budget domain-randomization ablation arms ---------------------
stage ablation-rand-on 10800 \
    python scripts/train_perception.py drive-proxynet --steps 1500 \
        --ckpt-dir weights/ablation_rand_on
stage ablation-rand-off 10800 \
    python scripts/train_perception.py drive-proxynet --steps 1500 \
        --no-domain-rand --ckpt-dir weights/ablation_rand_off
stage quality-ablation-merge 7200 \
    python scripts/quality_record.py --suffix _64img_tpu \
        --detector-weights weights/detector_256x448_f16.npz \
        --skip proxynet_256_hard,proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard,detector_hard_tta

# --- G. Rasterizer chunk sweep ----------------------------------------------
for cfg in "256 8 256 8" "256 8 256 16" "256 8 256 32" "256 8 256 64" \
           "256 16 256 16" "256 8 128 16" \
           "512 16 128 8" "512 16 128 16" "512 16 128 4" \
           "512 8 128 8" "512 16 64 8"; do
    # shellcheck disable=SC2086
    stage "raster-sweep $cfg" 1200 python scripts/tune_raster.py $cfg \
        2>&1 | tee -a /tmp/raster_sweep_r03.log
done

# --- Final: re-bench (picks up anything the trainings changed) --------------
stage bench-final 3600 python bench.py 2>&1 | tee -a /tmp/bench_r03_manual.log
save_bench /tmp/bench_r03_manual.log BENCH_r03_queue.json

log "queue complete"
