#!/bin/bash
# Round-4 hardware queue, phase I (extractor: stem + combined-best A/B):
#  80. extractor stage profile under OLS_STEM=s2d — the 4×4/s4 stem as
#      space-to-depth + one 48→192 matmul (the conv lowering ran at
#      ~1 TFLOP/s / 0.67 ms in trunk_bisect r4h; parity pinned by
#      tests/test_language_models.py::TestStemKnob).
#  81. extractor stage profile under OLS_STEM=s2d + OLS_GELU=tanh (the
#      combined best-candidate config; r4h measures tanh alone).
#  82. bench.py under the combined config (scanned throughput measure).
#
# Usage: bash tools/hw_queue_r4i.sh [logdir] (default /tmp/hwq_r4i —
# FRESH dir per run.)
set -u
LOG=${1:-/tmp/hwq_r4i}
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

OLS_STEM=s2d step 80_profile_stem 5400 python tools/extractor_profile.py \
  --json "$LOG/extractor_profile_stem.json"

OLS_STEM=s2d OLS_GELU=tanh step 81_profile_best 5400 \
  python tools/extractor_profile.py --json "$LOG/extractor_profile_best.json"

OLS_STEM=s2d OLS_GELU=tanh step 82_bench_best 5400 python bench.py

echo "=== r4i queue done ($(date -u +%FT%TZ)) ==="
