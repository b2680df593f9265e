#!/bin/bash
# Round-4 hardware queue, phase L:
#  110. redo the saturated-t32 pieces+binpieces decomposition (step 100
#       crashed on a probe-signature drift before reaching binpieces).
#  111. OLS_BLEND_CHUNK=128 stage-7 A/B at the production regime
#       (untested since round 2's 512-negative; at tile 32 the scan is
#       7 vs 8 Hillis-Steele steps but chunk count doubles). Bucket
#       221184 is a multiple of 8*chunk for BOTH chunk sizes; the
#       chunk-256 baseline at 219648 is 30.4-31.2 ms.
#  112. chunk-256 control at the SAME 221184 bucket (fair A/B).
#  113. 120-frame replica-scale run (3x the pinned gate) — long-horizon
#       evidence: more keyframes, bigger map, anti-forgetting visits.
#       --no-gates: the pinned thresholds are calibrated for 40 frames;
#       this run reports, the 40-frame gate locks.
#
# Usage: bash tools/hw_queue_r4l.sh [logdir] (default /tmp/hwq_r4l —
# FRESH dir per run.)
set -u
LOG=${1:-/tmp/hwq_r4l}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -25 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 110_binpieces_sat 3600 env OLS_TILE=32 python tools/kernel_probe.py \
  --variants pieces,binpieces --n 200000 --cap $((1<<20))

step 111_stage7_c128_prod 3600 env OLS_BLEND_CHUNK=128 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --tile 32 --max-instances 221184

step 112_stage7_c256_ctrl 3600 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --tile 32 --max-instances 221184

step 113_gate120 7200 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --out "$LOG/gate120.json"

echo "=== r4l queue done ($(date -u +%FT%TZ)) ==="
