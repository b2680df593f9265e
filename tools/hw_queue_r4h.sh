#!/bin/bash
# Round-4 hardware queue, phase H:
#  73. trunk_bisect (fixed bf16-init carry bug from the r4g run):
#      per-stage + block-component ablations of the ConvNeXt-L trunk.
#  74. extractor stage profile under OLS_GELU=tanh — the full-program
#      A/B for the erf→tanh GELU swap (cosine parity pinned at 0.9999
#      by tests/test_language_models.py::TestGELUKnob). r4g baseline:
#      full_xla 14.36 ms / bench 67.17 FPS.
#  75. bench.py under OLS_GELU=tanh (scanned throughput measure).
#
# Usage: bash tools/hw_queue_r4h.sh [logdir] (default /tmp/hwq_r4h —
# FRESH dir per run.)
set -u
LOG=${1:-/tmp/hwq_r4h}
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

step 73_trunk_bisect 5400 python tools/trunk_bisect.py

OLS_GELU=tanh step 74_profile_tanh 5400 python tools/extractor_profile.py \
  --json "$LOG/extractor_profile_tanh.json"

OLS_GELU=tanh step 75_bench_tanh 5400 python bench.py

echo "=== r4h queue done ($(date -u +%FT%TZ)) ==="
