#!/bin/bash
# Round-4 follow-up queue (run AFTER tpu_queue_r4.sh):
#   A. rasterizer sweep at the bench config (measures the divide-hoist
#      micro-opt + chunk/band variants at 256² and 512²)
#   B. MFU re-characterization: fit at the SHIPPED chunk (the r3 record
#      measured chunk=8, nothing ships that), predict, predict-breakdown
#   C. ProxyNet 256² low-lr continuation (warm from the committed
#      artifact), improve-gated repack
#   D. QUALITY_r04.json assembly from the committed artifacts
#
# Run:  nohup bash scripts/tpu_queue_r4b.sh > /tmp/tpu_queue_r4b.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

log() { echo "[queue4b $(date +%H:%M:%S)] $*"; }
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

# --- A. Rasterizer sweeps (one process per config: new kernel configs can
#        fault the worker) ---------------------------------------------------
for cfg in "8 256 86" "8 256 64" "8 256 128" "16 256 86" "8 256 43"; do
    stage "raster-256-$cfg" 600 python scripts/tune_raster.py 256 $cfg \
        2>&1 | tee -a /tmp/raster_sweep_r04.log
done
for cfg in "16 128 86" "16 128 64" "32 128 86" "16 128 128"; do
    stage "raster-512-$cfg" 600 python scripts/tune_raster.py 512 $cfg \
        2>&1 | tee -a /tmp/raster_sweep_r04.log
done

# --- B. MFU records ---------------------------------------------------------
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

# --- C. ProxyNet low-lr continuation (kp accuracy is the e2e bottleneck) ----
if [ ! -f weights/proxynet_warm/state.npz ]; then
    mkdir -p weights/proxynet_warm
    cp weights/proxynet_256_f16.npz weights/proxynet_warm/weights_last.npz
fi
stage proxynet-continue 10800 \
    python scripts/train_perception.py drive-proxynet --steps 2500 \
        --batch 16 --wh 256 --lr 2e-4 --segment 400 --save-every 100 \
        --eval-batches 4 \
        --finetune-from weights/proxynet_warm \
        --ckpt-dir weights/proxynet_r04

# Improve-gated repack vs the committed artifact on the SAME eval set
# (batch 16 = the artifact json's set).
if [ -f weights/proxynet_r04/best.json ]; then
    stage proxynet-artifact-eval 1200 \
        python scripts/train_perception.py eval-proxynet \
            --weights weights/proxynet_256_f16.npz --wh 256 \
            --eval-batches 4 --batch 16 \
            --json /tmp/proxynet_artifact_r4.json
    NEW=$(python -c "import json;print(json.load(open('weights/proxynet_r04/best.json'))['score'])" 2>/dev/null || echo 0)
    OLD=$(python -c "import json;j=json.load(open('/tmp/proxynet_artifact_r4.json'));print(j.get('kp_pck@0.10bbox',0)+j.get('mask_mean_iou',0))" 2>/dev/null || echo 9)
    if python -c "import sys; sys.exit(0 if float('$NEW') > float('$OLD') else 1)"; then
        log "proxynet improved ($OLD -> $NEW); repacking"
        stage proxynet-pack 600 \
            python scripts/pack_weights.py \
                weights/proxynet_r04/weights_best.npz \
                /tmp/proxynet_256_f16_r4.npz
        stage proxynet-artifact-recheck 1200 \
            python scripts/train_perception.py eval-proxynet \
                --weights /tmp/proxynet_256_f16_r4.npz --wh 256 \
                --eval-batches 4 --batch 16 \
                --json /tmp/proxynet_256_f16_r4.json \
        && mv /tmp/proxynet_256_f16_r4.npz weights/proxynet_256_f16.npz \
        && python - <<'EOF'
import json
rec = json.load(open("/tmp/proxynet_256_f16_r4.json"))
rec["weights"] = "weights/proxynet_256_f16.npz"
rec["provenance"] = "pack of weights/proxynet_r04/weights_best.npz (r4 low-lr continuation)"
json.dump(rec, open("weights/proxynet_256_f16.json", "w"), indent=1)
print("proxynet artifact repacked + json updated")
EOF
    else
        log "proxynet did not improve ($OLD -> $NEW); keeping artifact"
    fi
fi

# --- C2. Regressor artifact repack if the e2e fine-tune delivered -----------
# Gate: e2e MPJPE (the metric the fine-tune exists for) must improve AND the
# clean-proxy MPJPE must not regress by more than 10 mm (don't trade the
# clean cell away for the deployment cell).
if [ -f weights/regressor_r04/e2e.json ] && [ -f weights/regressor_r04/clean.json ]; then
    if python - <<'EOF'
import json, sys
new_e2e = json.load(open("weights/regressor_r04/e2e.json"))["mpjpe_mm"]
old_e2e = json.load(open("weights/regressor_18ch_e2e.json"))["mpjpe_mm"]
new_clean = json.load(open("weights/regressor_r04/clean.json"))["mpjpe_mm"]
old_clean = json.load(open("weights/regressor_18ch_f16.json"))["mpjpe_mm"]
ok = new_e2e < old_e2e and new_clean < old_clean + 10.0
print(f"e2e {old_e2e:.1f}->{new_e2e:.1f}, clean {old_clean:.1f}->{new_clean:.1f}: {'repack' if ok else 'keep'}")
sys.exit(0 if ok else 1)
EOF
    then
        log "regressor improved; repacking"
        stage regressor-pack 600 \
            python scripts/pack_weights.py \
                weights/regressor_r04/weights_last.npz \
                /tmp/regressor_18ch_f16_r4.npz \
        && mv /tmp/regressor_18ch_f16_r4.npz weights/regressor_18ch_f16.npz \
        && python - <<'EOF'
import json
for src, dst in [("weights/regressor_r04/clean.json", "weights/regressor_18ch_f16.json"),
                 ("weights/regressor_r04/e2e.json", "weights/regressor_18ch_e2e.json"),
                 ("weights/regressor_r04/corrupt.json", "weights/regressor_18ch_f16_corrupt.json")]:
    try:
        rec = json.load(open(src))
    except FileNotFoundError:
        continue
    rec["weights"] = "weights/regressor_18ch_f16.npz"
    rec["provenance"] = "pack of weights/regressor_r04/weights_last.npz (r4 e2e fine-tune on ProxyNet-extracted proxies)"
    json.dump(rec, open(dst, "w"), indent=1)
print("regressor artifact + sidecars updated")
EOF
    fi
fi

# --- D. QUALITY_r04 record over the committed artifacts ---------------------
stage quality-record 14400 \
    python scripts/quality_record.py --out QUALITY_r04.json \
        --eval-batches 4 --batch 16 --suffix _64img_tpu \
        --skip ablation_rand_on,ablation_rand_off

log "queue r4b complete"
