#!/bin/bash
# Round-3 TPU queue, part C — ProxyNet improvement pass, to chain after
# tpu_queue_r3b.sh. The r03 proxynet run's optimizer state is gone with
# the workspace, so this warm-starts a low-lr continuation from the
# COMMITTED f16 artifact (same trick as r3b's detector stage) and
# repacks only on held-out improvement (score = pck@0.1 + mask IoU,
# the same formula best.json and the committed sibling .json use).
#
# Run:  nohup bash scripts/tpu_queue_r3c.sh > /tmp/tpu_queue_c.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

log() { echo "[queue $(date +%H:%M:%S)] $*"; }

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

# --- Track bench retry: the config-5 subprocess failed invisibly inside
#     the r3b bench stage (its output is captured, not logged). Re-run it
#     alone with the log visible and merge into the committed record. ------
stage bench-track 2400 \
    env BENCH_MODE=track python bench.py 2>&1 | tee /tmp/bench_track_r03.log
python - <<'EOF'
import json, os
lines = [l for l in open("/tmp/bench_track_r03.log") if l.startswith("{")]
if lines and os.path.exists("BENCH_r03_queue.json"):
    track = json.loads(lines[-1])
    with open("BENCH_r03_queue.json") as f:
        rec = json.load(f)
    rec["track_metric"] = track["metric"]
    rec["track_value"] = track["value"]
    rec["track_unit"] = track["unit"]
    rec["track_player_frames_per_s"] = track.get("player_frames_per_s")
    with open("BENCH_r03_queue.json", "w") as f:
        json.dump(rec, f, indent=1)
    print("merged track fields into BENCH_r03_queue.json")
EOF

mkdir -p weights/proxynet_warm
cp weights/proxynet_256_f16.npz weights/proxynet_warm/weights_last.npz
stage proxynet-continue 14400 \
    python scripts/train_perception.py drive-proxynet --steps 4000 \
        --lr 5e-4 --seed 2 --save-every 100 --segment 400 \
        --finetune-from weights/proxynet_warm \
        --ckpt-dir weights/proxynet_r03c

if python - <<'EOF'
import json, sys
try:
    best = json.load(open("weights/proxynet_r03c/best.json"))
    cur = json.load(open("weights/proxynet_256_f16.json"))
except OSError:
    sys.exit(1)
cur_score = cur.get("score") or (cur["kp_pck@0.10bbox"] + cur["mask_mean_iou"])
sys.exit(0 if best["score"] > cur_score + 1e-6 else 1)
EOF
then
    log "continuation improved the held-out score; repacking"
    stage proxynet-pack 600 \
        python scripts/pack_weights.py weights/proxynet_r03c/weights_best.npz \
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
    log "continuation did not beat the committed artifact; keeping it"
fi

log "queue c complete"
