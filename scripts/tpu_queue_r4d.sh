#!/bin/bash
# Round-4 queue D (run after/instead of the tail of tpu_queue_r4c.sh):
#
#   1. GT-3D knob sweep WITH THE FIXED KNOB SCALING (fit/engine.py r4c:
#      relative priors + joints2d_scale) — the r4c sweep measured the old
#      absolutely-weighted knobs, which flush below f32 ulp under the
#      reference's 1e6-weighted silhouette SUM and were no-ops; pick the
#      best combo and write the round-4 GT-3D benchmark record
#   2. bench dress rehearsal (warms /tmp/jax_cache for the driver's
#      official BENCH_r04 run; lands BENCH_r04_queue.json)
#   3. MFU records (if r4c did not get there)
#   4. QUALITY_r04 assembly (committed artifacts, DARK-decode numbers)
#   5. rasterizer config sweep (if r4c did not get there)
#
# Run:  nohup bash scripts/tpu_queue_r4d.sh > /tmp/tpu_queue_r4d.log 2>&1 &
# Idempotent: stages skip when their outputs exist.

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

log() { echo "[queue4d $(date +%H:%M:%S)] $*"; }
wait_dev() { python scripts/probe_tpu.py wait; }
stage() {
    local name="$1" t="$2"; shift 2
    log "=== $name"
    if ! wait_dev; then log "$name: device never came up; skipping"; return 1; fi
    timeout "$t" "$@"
    local rc=$?
    log "$name: rc=$rc"
    return $rc
}

# --- 1. GT-3D sweep with working knobs ---------------------------------------
mkdir -p weights/fit3d_sweep_r04d
fit3d() {  # fit3d <tag> <extra args...>
    local tag="$1"; shift
    [ -s "weights/fit3d_sweep_r04d/$tag.json" ] && { log "fit3d $tag: cached"; return 0; }
    stage "fit3d-$tag" 2400 \
        python scripts/train_perception.py eval-fit3d \
            --weights weights/regressor_18ch_f16.npz \
            --eval-batches 2 --batch 8 --wh 512 --fit-iters 100 \
            --json "weights/fit3d_sweep_r04d/$tag.json" "$@"
}
# joints2d_scale puts joint evidence on par with the 1e6-weighted
# silhouette sum; priors are now relative weights (see engine.py).
fit3d js          --joints2d-scale 1e6
fit3d js_cw       --joints2d-scale 1e6 --conf-weight
fit3d js_cw_b     --joints2d-scale 1e6 --conf-weight --betas-prior 0.01
fit3d js_cw_b_o   --joints2d-scale 1e6 --conf-weight --betas-prior 0.01 --ortho-prior 0.05
fit3d js_cw_p     --joints2d-scale 1e6 --conf-weight --pose-prior 0.02
fit3d js3e5_cw    --joints2d-scale 3e5 --conf-weight

# Pick the combo with the largest init->fit MPJPE-PA gain whose silh IoU
# still improves; rerun it as the round-4 GT-3D benchmark record.
BESTARGS=$(python - <<'EOF'
import glob, json, os
knobs = {"js": "--joints2d-scale 1e6",
         "js_cw": "--joints2d-scale 1e6 --conf-weight",
         "js_cw_b": "--joints2d-scale 1e6 --conf-weight --betas-prior 0.01",
         "js_cw_b_o": ("--joints2d-scale 1e6 --conf-weight "
                       "--betas-prior 0.01 --ortho-prior 0.05"),
         "js_cw_p": "--joints2d-scale 1e6 --conf-weight --pose-prior 0.02",
         "js3e5_cw": "--joints2d-scale 3e5 --conf-weight"}
best, gain = None, 0.0
for path in glob.glob("weights/fit3d_sweep_r04d/*.json"):
    try:
        r = json.load(open(path))
    except ValueError:
        continue
    g = r["init_mpjpe_pa_mm"] - r["fit_mpjpe_pa_mm"]
    if r["fit_silh_iou"] <= r["init_silh_iou"]:
        continue
    if g > gain:
        best, gain = os.path.basename(path)[:-5], g
if best:
    json.dump({"best": best, "mpjpe_pa_gain_mm": gain},
              open("weights/fit3d_sweep_r04d/BEST.json", "w"), indent=1)
    print(knobs.get(best, ""))
EOF
)
# (distinct output: r4c's tail writes fit3d_benchmark_r04.json with the
# pre-fix knobs; this is the fixed-knob record)
if [ -n "$BESTARGS" ] && [ ! -s weights/fit3d_benchmark_r04d.json ]; then
    stage fit3d-final 2400 \
        python scripts/train_perception.py eval-fit3d \
            --weights weights/regressor_18ch_f16.npz \
            --eval-batches 2 --batch 8 --wh 512 --fit-iters 100 \
            --json weights/fit3d_benchmark_r04d.json $BESTARGS
fi

# --- 2. Bench dress rehearsal -------------------------------------------------
if [ ! -s BENCH_r04_queue.json ]; then
    stage bench-rehearsal 1500 \
        env BENCH_TIME_BUDGET=1140 python bench.py \
        2>&1 | tee /tmp/bench_r04_rehearsal.log
    python - <<'EOF'
import json
lines = [l.strip() for l in open("/tmp/bench_r04_rehearsal.log")
         if l.strip().startswith("{")]
if lines:
    rec = json.loads(lines[-1])
    if rec.get("value"):
        json.dump(rec, open("BENCH_r04_queue.json", "w"), indent=1)
        print("wrote BENCH_r04_queue.json:", rec.get("value"), rec.get("unit"))
    else:
        print("bench rehearsal produced no headline value; not recording")
EOF
fi

# --- 3. MFU records -----------------------------------------------------------
if [ ! -s MFU_r04.json ]; then
    stage mfu-fit 1200 python scripts/mfu.py fit \
        2>&1 | tee /tmp/mfu_fit_r04.log
    stage mfu-fit-512 1200 env BENCH_RASTER_WH=512 python scripts/mfu.py fit \
        2>&1 | tee /tmp/mfu_fit512_r04.log
    stage mfu-predict 1200 python scripts/mfu.py predict \
        2>&1 | tee /tmp/mfu_predict_r04.log
    stage mfu-breakdown 1200 python scripts/mfu.py predict-breakdown \
        2>&1 | tee /tmp/mfu_breakdown_r04.log
    python - <<'EOF'
import json, os
rec = {}
for key, path in [("fit", "/tmp/mfu_fit_r04.log"),
                  ("fit_512", "/tmp/mfu_fit512_r04.log"),
                  ("predict", "/tmp/mfu_predict_r04.log"),
                  ("predict_breakdown", "/tmp/mfu_breakdown_r04.log")]:
    if not os.path.exists(path):
        continue
    lines = [l for l in open(path) if l.startswith("{")]
    if lines:
        rec[key] = json.loads(lines[-1])
if rec:
    json.dump(rec, open("MFU_r04.json", "w"), indent=1)
    print("wrote MFU_r04.json")
EOF
fi

# --- 4. QUALITY_r04 -----------------------------------------------------------
if [ ! -s QUALITY_r04.json ]; then
    stage quality-record 10800 \
        python scripts/quality_record.py --out QUALITY_r04.json \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip ablation_rand_on,ablation_rand_off
fi

# --- 5. Rasterizer sweeps ------------------------------------------------------
if [ ! -s weights/raster_sweep_r04.log ]; then
    for cfg in "8 256 86" "8 256 64" "8 256 128" "16 256 86"; do
        stage "raster-256-$cfg" 600 python scripts/tune_raster.py 256 $cfg \
            2>&1 | tee -a /tmp/raster_sweep_r04.log
    done
    for cfg in "16 128 86" "16 128 64" "32 128 86"; do
        stage "raster-512-$cfg" 600 python scripts/tune_raster.py 512 $cfg \
            2>&1 | tee -a /tmp/raster_sweep_r04.log
    done
    cp /tmp/raster_sweep_r04.log weights/raster_sweep_r04.log 2>/dev/null
fi

log "queue r4d complete"
