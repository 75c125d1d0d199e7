#!/bin/bash
# Round-5c TPU queue: the capability work VERDICT r4 ordered, rebuilt after
# the mid-round worker reset wiped /tmp (the r5b run only got through the
# smoke-scale distill + relation training before dying). Differences vs
# r5b: make-data runs on the TPU (this worker has ONE host core — CPU
# rasterization of 32 scenes is hours), the distill train applies the
# teacher-quality gate (--filter-px), the eval records per-stage teacher
# diagnostics (--stage-diag), and the stage order is strictly VERDICT
# priority so a deadline cut loses the least-valuable tail.
#
# Run:  R5C_DEADLINE=<epoch> nohup bash scripts/tpu_queue_r5c.sh > /tmp/tpu_queue_r5c.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=${R5C_DEADLINE:-$(( $(date +%s) + 28800 ))}
DISTILL_ROOT=${DISTILL_ROOT:-/tmp/distill_r05}

log() { echo "[queue5c $(date +%H:%M:%S)] $*"; }
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

# Wait for r5a to finish (it owns the device until then).
while [ ! -f /tmp/queue_r5a.done ]; do
    if [ "$(left)" -lt 600 ]; then log "r5a never finished; proceeding anyway"; break; fi
    sleep 60
done
log "starting r5c ($(left)s to deadline)"

# --- 1. distillation circle (VERDICT #1) -------------------------------------------
if [ ! -f "$DISTILL_ROOT/scenes/game7/scene3/ball.xml" ]; then
    stage distill-data 2400 python scripts/distill_circle.py make-data \
        --root "$DISTILL_ROOT" --no-images
fi
if [ ! -s "$DISTILL_ROOT/MINT_SUMMARY.json" ] || \
   ! grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json"; then
    # Stage drivers are resumable (skip_existing / summary guards).
    for _try in 1 2 3 4; do
        stage distill-mint 4500 python scripts/distill_circle.py mint \
            --root "$DISTILL_ROOT" --batch 16
        grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json" 2>/dev/null && break
    done
fi
if grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json" 2>/dev/null; then
    if [ ! -s "$DISTILL_ROOT/ckpt/DONE" ]; then
        stage distill-train 3600 python scripts/distill_circle.py train \
            --root "$DISTILL_ROOT" --epochs 20 --lr 3e-5 --filter-px 10 \
            && touch "$DISTILL_ROOT/ckpt/DONE"
    fi
    if [ -s "$DISTILL_ROOT/ckpt/DONE" ]; then
        stage distill-eval 1800 python scripts/distill_circle.py eval \
            --root "$DISTILL_ROOT" --stage-diag
    fi
    # VERDICT #1 names this exact artifact path.
    [ -s weights/distill_r05/regressor_18ch_distilled.npz ] && \
        cp -f weights/distill_r05/regressor_18ch_distilled.npz \
            weights/regressor_18ch_distilled.npz
fi

# --- 2. relation-module execution over the minted tree (VERDICT #6) ----------------
if grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json" 2>/dev/null; then
    [ ! -s weights/relate_eval_v0.json ] && \
        stage relate-v0 1800 python scripts/train_relation.py relate \
            --root "$DISTILL_ROOT"
    [ ! -s weights/relate_eval_v1.json ] && \
        stage relate-v1 1800 python scripts/train_relation.py relate \
            --root "$DISTILL_ROOT" --v1
fi

# --- 3. GT-3D multi-view + track cells (VERDICT #4) --------------------------------
BEST="--joints2d-scale 1e6 --conf-weight --betas-prior 0.01 --ortho-prior 0.05"
mkdir -p weights/fit3d_r05
if [ ! -s weights/fit3d_r05/multiview.json ]; then
    stage fit3d-mv 3000 python scripts/train_perception.py eval-fit3d-mv \
        --weights weights/regressor_18ch_f16.npz \
        --eval-batches 2 --batch 8 --views 3 --wh 512 --fit-iters 100 \
        $BEST --json weights/fit3d_r05/multiview.json
fi
if [ ! -s weights/fit3d_r05/track.json ]; then
    stage fit3d-track 3000 python scripts/train_perception.py eval-fit3d-track \
        --weights weights/regressor_18ch_f16.npz \
        --eval-batches 2 --batch 4 --frames 8 --wh 512 --fit-iters 100 \
        $BEST --json weights/fit3d_r05/track.json
fi

# --- 4. frame classifier (VERDICT #9; e2e rehearsal consumes it) -------------------
if [ ! -s weights/frame_classifier.npz ]; then
    stage classifier-train 3000 python scripts/train_classifier.py \
        --frames 512 --eval-frames 128 --epochs 10
fi

# --- 5. one-clip dress rehearsal (VERDICT #10) -------------------------------------
if [ ! -s weights/e2e_r05/summary.json ] || \
   ! grep -q calc_metrics weights/e2e_r05/summary.json; then
    stage e2e-rehearsal 4500 python scripts/e2e_rehearsal.py \
        --root /tmp/e2e_r05
fi

# --- 6. QUALITY_r05 core matrix (VERDICT #7) ---------------------------------------
NEWCELLS="regressor_iuv21_clean,regressor_iuv21_corrupt,regressor_iuv20_clean,regressor_iuv20_corrupt,regressor_iuv21_e2e"
if ! grep -q regressor_e2e QUALITY_r05.json 2>/dev/null; then
    stage quality-core 4800 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off,$NEWCELLS"
fi

# --- 7. IUV-input regressors (VERDICT #5) ------------------------------------------
for ch in 21 20; do
    warm="weights/regressor_iuv${ch}_warm"
    ckpt="weights/regressor_iuv${ch}"
    if [ ! -s "$ckpt/weights_last.npz" ]; then
        mkdir -p "$warm"
        python - <<EOF
from soccerplayershapepose_tpu.train.straps import expand_regressor_channels
import os
if not os.path.exists("$warm/weights_last.npz"):
    expand_regressor_channels("weights/regressor_18ch_f16.npz",
                              "$warm/weights_last.npz", $ch)
    print("expanded 18 -> $ch")
EOF
        stage "iuv${ch}-train" 4500 \
            python scripts/train_perception.py drive-regressor --steps 1200 \
                --batch 16 --wh 256 --lr 5e-5 --segment 200 \
                --proxy-channels "$ch" --finetune-from "$warm" \
                --segment-timeout 1200 --eval-batches 0 --ckpt-dir "$ckpt"
    fi
    if [ -s "$ckpt/weights_last.npz" ] && [ ! -s "$ckpt/clean_eval.json" ]; then
        stage "iuv${ch}-eval" 1800 \
            python scripts/train_perception.py eval-regressor --wh 512 \
                --proxy-channels "$ch" --weights "$ckpt/weights_last.npz" \
                --eval-batches 4 --batch 16 --json "$ckpt/clean_eval.json"
    fi
done
# IUV cells into the QUALITY record once the artifacts exist.
if [ -s weights/regressor_iuv21/clean_eval.json ] && \
   ! grep -q regressor_iuv21_clean QUALITY_r05.json 2>/dev/null; then
    stage quality-iuv 3600 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "regressor_e2e,detector_hard,proxynet_256_hard,regressor_clean,regressor_corrupt,proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off,regressor_distilled_clean,regressor_distilled_e2e"
fi

# --- 8. MFU re-measure (VERDICT weak #5) -------------------------------------------
if ! grep -q predict_breakdown MFU_r05.json 2>/dev/null; then
    stage mfu-breakdown 1500 bash -c \
        "python scripts/mfu.py predict-breakdown 2>&1 | tee /tmp/mfu_breakdown_r5.log"
    stage mfu-predict 1200 bash -c \
        "python scripts/mfu.py predict 2>&1 | tee /tmp/mfu_predict_r5.log"
    stage mfu-fit 1200 bash -c \
        "python scripts/mfu.py fit 2>&1 | tee /tmp/mfu_fit_r5.log"
    python - <<'EOF'
import json, os
rec = {}
if os.path.exists("MFU_r05.json"):
    try:
        rec = json.load(open("MFU_r05.json"))
    except ValueError:
        pass
changed = False
for key, path in [("predict_breakdown", "/tmp/mfu_breakdown_r5.log"),
                  ("predict", "/tmp/mfu_predict_r5.log"),
                  ("fit", "/tmp/mfu_fit_r5.log")]:
    if not os.path.exists(path):
        continue
    lines = [l for l in open(path) if l.startswith("{")]
    if lines:
        rec[key] = json.loads(lines[-1])
        changed = True
if changed:
    rec["note"] = ("all cells measured with warmed timing loops "
                   "(post r4 warm-loop fix)")
    tmp = "MFU_r05.json.tmp"
    json.dump(rec, open(tmp, "w"), indent=1)
    os.replace(tmp, "MFU_r05.json")
    print("wrote MFU_r05.json")
EOF
fi

# --- 9. detector recall continuation (VERDICT #8) ----------------------------------
if [ ! -s weights/detector_r05/weights_last.npz ]; then
    mkdir -p weights/detector_warm
    cp -n weights/detector_256x448_f16.npz weights/detector_warm/weights_last.npz
    stage detector-train 5400 \
        python scripts/train_perception.py drive-detector --steps 3000 \
            --batch 8 --lr 3e-4 --segment 300 --segment-timeout 1200 \
            --finetune-from weights/detector_warm --eval-batches 2 \
            --ckpt-dir weights/detector_r05
fi

# --- 10. QUALITY_r05 remaining cells -----------------------------------------------
if ! grep -q proxynet_512_hard QUALITY_r05.json 2>/dev/null; then
    stage quality-rest 7200 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "proxynet_256_hard,detector_hard,regressor_clean,regressor_corrupt,regressor_e2e,regressor_distilled_clean,regressor_distilled_e2e,$NEWCELLS"
fi

log "queue r5c complete ($(left)s unspent)"
touch /tmp/queue_r5c.done
