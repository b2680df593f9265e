#!/bin/bash
# Round-4 hardware queue, phase J (SLAM-side decomposition + gate under
# the flipped extractor defaults):
#  90. stage-7 component probe at the PRODUCTION regime (tile 32, n15k,
#      demand-sized 219648 bucket) — within-session baseline (r4d: 31.2).
#  91. stage-9 tracking-iteration probe, same regime: whole-frame
#      dispatch ms/iter vs bare pose-grad render fwd+bwd — where do the
#      gate's 31 ms/tracking-iter actually go?
#  92. 40-frame replica-scale gate, warm — end-to-end validation of the
#      OLS_GELU=tanh default (extraction path) + quality locks.
#
# Usage: bash tools/hw_queue_r4j.sh [logdir] (default /tmp/hwq_r4j —
# FRESH dir per run.)
set -u
LOG=${1:-/tmp/hwq_r4j}
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

step 90_stage7_t32 3600 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --tile 32 --max-instances 219648

step 91_stage9_t32 3600 python tools/tpu_scale_check.py \
  --stage 9 --n 15000 --tile 32 --max-instances 219648

step 92_gate40_warm 3600 python tools/replica_scale_gate.py --max-frames 40

echo "=== r4j queue done ($(date -u +%FT%TZ)) ==="
