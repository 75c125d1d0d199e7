#!/bin/bash
# Round-5d: re-run of r5c's agenda after its distill stages starved.
# What happened: a stray early /tmp/queue_r5a.done let r5c start while the
# e2e fine-tune still owned the device; distill-data sat behind the
# fine-tune's compile storm for its whole 2400 s window (rc=124, zero
# scenes), then mint crashed on the empty tree and the train/eval guards
# skipped silently. The fit3d mv/track cells DID land (committed).
# Changes here: distill stages loop-until-done like mint always did, the
# tree roots get existence asserts before dependent stages, and the stage
# order restores VERDICT priority for what remains.
#
# Run:  R5D_DEADLINE=<epoch> nohup bash scripts/tpu_queue_r5d.sh > /tmp/tpu_queue_r5d.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
DEADLINE=${R5D_DEADLINE:-$(( $(date +%s) + 14400 ))}
DISTILL_ROOT=${DISTILL_ROOT:-/tmp/distill_r05}

log() { echo "[queue5d $(date +%H:%M:%S)] $*"; }
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

# --- 1. distillation circle (VERDICT #1) -------------------------------------------
for _try in 1 2 3; do
    [ -f "$DISTILL_ROOT/scenes/game7/scene3/ball.xml" ] && break
    stage distill-data 2400 python scripts/distill_circle.py make-data \
        --root "$DISTILL_ROOT" --no-images
done
if [ -f "$DISTILL_ROOT/scenes/game7/scene3/ball.xml" ]; then
    for _try in 1 2 3 4; do
        grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json" 2>/dev/null && break
        stage distill-mint 4500 python scripts/distill_circle.py mint \
            --root "$DISTILL_ROOT" --batch 16
    done
fi
if grep -q broad "$DISTILL_ROOT/MINT_SUMMARY.json" 2>/dev/null; then
    for _try in 1 2 3; do
        [ -s "$DISTILL_ROOT/ckpt/DONE" ] && break
        stage distill-train 3600 python scripts/distill_circle.py train \
            --root "$DISTILL_ROOT" --epochs 20 --lr 3e-5 --filter-px 10 \
            && touch "$DISTILL_ROOT/ckpt/DONE"
    done
    if [ -s "$DISTILL_ROOT/ckpt/DONE" ]; then
        stage distill-eval 1800 python scripts/distill_circle.py eval \
            --root "$DISTILL_ROOT" --stage-diag
    fi
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

# --- 3. frame classifier (VERDICT #9; the rehearsal consumes it) -------------------
if [ ! -s weights/frame_classifier.npz ]; then
    stage classifier-train 3000 python scripts/train_classifier.py \
        --frames 512 --eval-frames 128 --epochs 10
fi

# --- 4. one-clip dress rehearsal (VERDICT #10) -------------------------------------
if [ ! -s weights/e2e_r05/summary.json ] || \
   ! grep -q calc_metrics weights/e2e_r05/summary.json; then
    stage e2e-rehearsal 4500 python scripts/e2e_rehearsal.py \
        --root /tmp/e2e_r05
fi

# --- 5. texture-from-IUV quality probe (VERDICT weak #7) ---------------------------
if [ ! -s weights/texture_quality.json ]; then
    stage texture-probe 1500 python scripts/texture_probe.py
fi

# --- 6. QUALITY_r05 core matrix (VERDICT #7) ---------------------------------------
NEWCELLS="regressor_iuv21_clean,regressor_iuv21_corrupt,regressor_iuv20_clean,regressor_iuv20_corrupt,regressor_iuv21_e2e"
if ! grep -q regressor_e2e QUALITY_r05.json 2>/dev/null; then
    stage quality-core 4800 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off,$NEWCELLS"
fi

# --- 7. MFU re-measure (VERDICT weak #5) -------------------------------------------
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

# --- 8. IUV-input regressor, 21-ch first (VERDICT #5) ------------------------------
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
                --segment-timeout 2000 --eval-batches 0 --ckpt-dir "$ckpt"
    fi
    if [ -s "$ckpt/weights_last.npz" ] && [ ! -s "$ckpt/clean_eval.json" ]; then
        stage "iuv${ch}-eval" 1800 \
            python scripts/train_perception.py eval-regressor --wh 512 \
                --proxy-channels "$ch" --weights "$ckpt/weights_last.npz" \
                --eval-batches 4 --batch 16 --json "$ckpt/clean_eval.json"
    fi
done
if [ -s weights/regressor_iuv21/clean_eval.json ] && \
   ! grep -q regressor_iuv21_clean QUALITY_r05.json 2>/dev/null; then
    stage quality-iuv 3600 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "regressor_e2e,detector_hard,proxynet_256_hard,regressor_clean,regressor_corrupt,proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off,regressor_distilled_clean,regressor_distilled_e2e,regressor_e2eft_clean,regressor_e2eft_e2e"
fi

# --- 9. QUALITY_r05 remaining cells ------------------------------------------------
if ! grep -q proxynet_512_hard QUALITY_r05.json 2>/dev/null; then
    stage quality-rest 7200 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "proxynet_256_hard,detector_hard,regressor_clean,regressor_corrupt,regressor_e2e,regressor_distilled_clean,regressor_distilled_e2e,regressor_e2eft_clean,regressor_e2eft_e2e,$NEWCELLS"
fi

# --- 10. detector recall continuation (VERDICT #8) ---------------------------------
if [ ! -s weights/detector_r05/weights_last.npz ]; then
    mkdir -p weights/detector_warm
    cp -n weights/detector_256x448_f16.npz weights/detector_warm/weights_last.npz
    stage detector-train 5400 \
        python scripts/train_perception.py drive-detector --steps 3000 \
            --batch 8 --lr 3e-4 --segment 300 --segment-timeout 2000 \
            --finetune-from weights/detector_warm --eval-batches 2 \
            --ckpt-dir weights/detector_r05
fi

log "queue r5d complete ($(left)s unspent)"
touch /tmp/queue_r5d.done
