#!/bin/bash
# Round-5 opener queue: the known round-4 carryovers, value-ordered and
# idempotent (every stage is output-guarded — safe to relaunch). Review
# round-5 VERDICT.md first and reorder if the judge's priorities differ.
#
#   1. whatever BENCH_r04 secondaries never landed (track/frame) — also
#      warms the compile cache for the driver's official bench
#   2. QUALITY cells missing from QUALITY_r04.json (incremental writes)
#   3. GT-3D fit follow-ups missed in r4 (it200 / lr3e3 / warm20 / clean)
#   4. regressor e2e fine-tune on ProxyNet-extracted proxies (VERDICT r3 #3
#      lever, wired in train/straps.py:extracted_regressor_batch but never
#      TPU-run) + the eval trio, gated on improving the e2e cell
#   5. rasterizer chunk-dimension sweep (unlocked by the r4 lcm face-block
#      fix; if a chunk > 8 wins at the 22-row fit shape, update
#      FitConfig.pallas_chunk/auto and re-run the fit bench)
#   6. warmed MFU breakdown re-measure (r4's breakdown predates the warm
#      fix; absolute walls carry the program-upload artifact)
#
# Run:  R5_DEADLINE=<epoch> nohup bash scripts/tpu_queue_r5.sh > /tmp/tpu_queue_r5.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 10800 ))}

log() { echo "[queue5 $(date +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
wait_dev() { python scripts/probe_tpu.py wait; }
stage() {
    local name="$1" t="$2"; shift 2
    local rem; rem=$(left)
    if [ "$rem" -lt 180 ]; then log "$name: deadline reached; skipping"; return 1; fi
    [ "$t" -gt "$rem" ] && t=$rem
    log "=== $name (timeout ${t}s, ${rem}s to deadline)"
    if ! wait_dev; then log "$name: device never came up; skipping"; return 1; fi
    setsid timeout "$t" "$@" &
    local spid=$!
    wait "$spid"; local rc=$?
    sleep 1
    kill -- "-$spid" 2>/dev/null
    log "$name: rc=$rc"
    return $rc
}

# --- 1. missing bench secondaries ------------------------------------------------
missing=""
grep -q track_value BENCH_r04_queue.json 2>/dev/null || missing="track"
grep -q frame_value BENCH_r04_queue.json 2>/dev/null || missing="$missing,frame"
missing="${missing#,}"
if [ -n "$missing" ]; then
    stage "bench-$missing" 1800 \
        env BENCH_MODE=secondary _BENCH_TRY=9 BENCH_SECONDARY="$missing" \
            BENCH_TIME_BUDGET=1700 python bench.py \
        2>&1 | tee /tmp/bench_secondary_r5.log
    python - <<'EOF'
import json, os
if not os.path.exists("/tmp/bench_secondary_r5.log"):
    raise SystemExit
rec = {}
if os.path.exists("BENCH_r04_queue.json"):
    rec = json.load(open("BENCH_r04_queue.json"))
for line in open("/tmp/bench_secondary_r5.log"):
    line = line.strip()
    if not line.startswith("{"):
        continue
    try:
        r = json.loads(line)
    except ValueError:
        continue
    mode = r.pop("mode", None)
    if mode in ("track", "frame"):
        rec.update({f"{mode}_metric": r.get("metric"),
                    f"{mode}_value": r.get("value"),
                    f"{mode}_unit": r.get("unit")})
        if mode == "track":
            rec["track_player_frames_per_s"] = r.get("player_frames_per_s")
        else:
            rec["frame_crops_per_s"] = r.get("crops_per_s")
        json.dump(rec, open("BENCH_r04_queue.json", "w"), indent=1)
        print("merged", mode)
EOF
fi

# --- 2. missing QUALITY cells ----------------------------------------------------
if ! grep -q regressor_e2e QUALITY_r04.json 2>/dev/null; then
    stage quality-core 4200 \
        python scripts/quality_record.py --out QUALITY_r04.json \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off
fi
if ! grep -q proxynet_512_hard QUALITY_r04.json 2>/dev/null; then
    stage quality-rest 4200 \
        python scripts/quality_record.py --out QUALITY_r04.json \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip proxynet_256_hard,detector_hard,regressor_clean,regressor_corrupt,regressor_e2e
fi

# --- 3. GT-3D fit follow-ups -----------------------------------------------------
BEST="--joints2d-scale 1e6 --conf-weight --betas-prior 0.01 --ortho-prior 0.05"
fit3d() {
    local tag="$1"; shift
    [ -s "weights/fit3d_sweep_r04d/$tag.json" ] && { log "fit3d $tag: cached"; return 0; }
    stage "fit3d-$tag" 2400 \
        python scripts/train_perception.py eval-fit3d \
            --weights weights/regressor_18ch_f16.npz \
            --eval-batches 2 --batch 8 --wh 512 --fit-iters 100 \
            --json "weights/fit3d_sweep_r04d/$tag.json" $@
}
fit3d it200   $BEST --fit-iters 200
fit3d lr3e3   $BEST --fit-lr 3e-3
fit3d warm20  $BEST --silh-warmup 20
fit3d clean   $BEST --no-corrupt
python - <<'EOF'
import glob, json, os, shutil
best_path, best_gain = None, -1.0
for path in glob.glob("weights/fit3d_sweep_r04d/*.json"):
    name = os.path.basename(path)[:-5]
    if name in ("clean", "BEST"):
        continue
    try:
        r = json.load(open(path))
    except ValueError:
        continue
    if "init_mpjpe_pa_mm" not in r or r["fit_silh_iou"] <= r["init_silh_iou"]:
        continue
    g = r["init_mpjpe_pa_mm"] - r["fit_mpjpe_pa_mm"]
    if g > best_gain:
        best_path, best_gain = path, g
if best_path:
    shutil.copy(best_path, "weights/fit3d_benchmark_r04d.json")
    json.dump({"best": os.path.basename(best_path)[:-5],
               "mpjpe_pa_gain_mm": best_gain},
              open("weights/fit3d_sweep_r04d/BEST.json", "w"), indent=1)
    print("promoted", best_path, round(best_gain, 2))
EOF

# --- 4. regressor e2e fine-tune (gated repack) -------------------------------------
if [ ! -f weights/regressor_r05/weights_last.npz ]; then
    mkdir -p weights/regressor_warm
    cp -n weights/regressor_18ch_f16.npz weights/regressor_warm/weights_last.npz
    stage regressor-e2e-finetune 9000 \
        python scripts/train_perception.py drive-regressor --steps 1500 \
            --batch 16 --wh 256 --lr 3e-5 --segment 100 \
            --via-proxynet weights/proxynet_256_f16.npz \
            --finetune-from weights/regressor_warm --segment-timeout 900 \
            --ckpt-dir weights/regressor_r05
fi
if [ -f weights/regressor_r05/weights_last.npz ] && \
   [ ! -s weights/regressor_r05/e2e_eval.json ]; then
    stage regressor-e2e-eval 2400 \
        python scripts/train_perception.py eval-regressor --wh 256 \
            --weights weights/regressor_r05/weights_last.npz \
            --via-proxynet weights/proxynet_256_f16.npz \
            --eval-batches 4 --batch 16 \
            --json weights/regressor_r05/e2e_eval.json
    # Repack gate: only replace the committed artifact if e2e MPJPE improves.
    python - <<'EOF'
import json, os
new = "weights/regressor_r05/e2e_eval.json"
if os.path.exists(new):
    n = json.load(open(new))
    cur = json.load(open("weights/regressor_18ch_e2e.json"))
    if n.get("mpjpe_mm", 1e9) < cur.get("mpjpe_mm", 1e9):
        print("FINE-TUNE WINS: e2e MPJPE %.1f -> %.1f; repack the artifact "
              "(pack-regressor) and refresh the eval trio + QUALITY cell"
              % (cur.get("mpjpe_mm", -1), n.get("mpjpe_mm", -1)))
    else:
        print("fine-tune did not improve e2e MPJPE (%.1f vs %.1f); keep "
              "the committed artifact"
              % (n.get("mpjpe_mm", -1), cur.get("mpjpe_mm", -1)))
EOF
fi

# --- 5. rasterizer chunk sweep ------------------------------------------------------
if ! grep -q "bh=" weights/raster_sweep_r04.log 2>/dev/null; then
    : > /tmp/raster_sweep_r5.log
    for cfg in "8 256 8" "8 256 16" "8 256 32" "8 256 64" "8 256 86" "8 256 128"; do
        stage "raster-256-$cfg" 600 python scripts/tune_raster.py 256 $cfg \
            2>&1 | tee -a /tmp/raster_sweep_r5.log
    done
    for cfg in "32 128 8" "32 128 16" "32 128 64"; do
        stage "raster-512-$cfg" 600 python scripts/tune_raster.py 512 $cfg \
            2>&1 | tee -a /tmp/raster_sweep_r5.log
    done
    grep -q "bh=" /tmp/raster_sweep_r5.log 2>/dev/null && \
        cp /tmp/raster_sweep_r5.log weights/raster_sweep_r04.log
fi

# --- 6. warmed MFU breakdown ---------------------------------------------------------
stage mfu-breakdown 1200 python scripts/mfu.py predict-breakdown \
    2>&1 | tee /tmp/mfu_breakdown_r5.log
stage mfu-fit 1200 python scripts/mfu.py fit 2>&1 | tee /tmp/mfu_fit_r5.log
python - <<'EOF'
import json, os
rec = {}
if os.path.exists("MFU_r04.json"):
    rec = json.load(open("MFU_r04.json"))
changed = False
for key, path in [("predict_breakdown", "/tmp/mfu_breakdown_r5.log"),
                  ("fit", "/tmp/mfu_fit_r5.log")]:
    if not os.path.exists(path):
        continue
    lines = [l for l in open(path) if l.startswith("{")]
    if lines:
        rec[key] = json.loads(lines[-1])
        changed = True
if changed:
    rec["note"] = ("all cells measured with warmed timing loops "
                   "(see timing_methodology)")
    json.dump(rec, open("MFU_r04.json", "w"), indent=1)
    print("merged MFU_r04.json")
EOF

log "queue r5 complete ($(left)s unspent)"
