#!/bin/bash
# Round-5e: r5d's remainder, reordered for the ~1h of device time left
# before the driver's official bench needs the chip. QUALITY-core moves
# ahead of the one-clip rehearsal (VERDICT #7 vs #10: the cell matrix
# carries round-over-round trend tracking and the new-artifact cells;
# the rehearsal is a doc artifact). Classifier first — it is quick and
# the rehearsal's harvest gate consumes it if both land.
#
# Run:  R5E_DEADLINE=<epoch> nohup bash scripts/tpu_queue_r5e.sh > /tmp/tpu_queue_r5e.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

DEADLINE=${R5E_DEADLINE:-$(( $(date +%s) + 3600 ))}
log() { echo "[queue5e $(date +%H:%M:%S)] $*"; }
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

# --- 1. frame classifier (VERDICT #9) ----------------------------------------------
if [ ! -s weights/frame_classifier.npz ]; then
    stage classifier-train 2400 python scripts/train_classifier.py \
        --frames 384 --eval-frames 96 --epochs 10
fi

# --- 2. QUALITY_r05 core matrix (VERDICT #7) ---------------------------------------
NEWCELLS="regressor_iuv21_clean,regressor_iuv21_corrupt,regressor_iuv20_clean,regressor_iuv20_corrupt,regressor_iuv21_e2e"
if ! grep -q regressor_e2e QUALITY_r05.json 2>/dev/null; then
    stage quality-core 4800 \
        python scripts/quality_record.py --out QUALITY_r05.json --round 5 \
            --eval-batches 4 --batch 16 --suffix _64img_tpu \
            --skip "proxynet_256_easy,proxynet_256_hard_tta,proxynet_512_hard,proxynet_512_hard_tta,detector_hard_tta,ablation_rand_on,ablation_rand_off,$NEWCELLS"
fi

# --- 3. texture-from-IUV probe (VERDICT weak #7) -----------------------------------
if [ ! -s weights/texture_quality.json ]; then
    stage texture-probe 1500 python scripts/texture_probe.py
fi

# --- 4. one-clip dress rehearsal (VERDICT #10) -------------------------------------
if [ ! -s weights/e2e_r05/summary.json ] || \
   ! grep -q calc_metrics weights/e2e_r05/summary.json; then
    stage e2e-rehearsal 4500 python scripts/e2e_rehearsal.py \
        --root /tmp/e2e_r05
fi

# --- 5. MFU re-measure (VERDICT weak #5) -------------------------------------------
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

log "queue r5e complete ($(left)s unspent)"
touch /tmp/queue_r5e.done
