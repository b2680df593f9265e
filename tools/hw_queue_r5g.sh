#!/bin/bash
# Round-5 hardware queue, phase G — long-horizon drift DIAGNOSIS.
# Phase E's gate120 at the quality knobs (cv + keep_best) measured ATE
# 0.0582 — 2.5x WORSE than round 4's static-init 120-frame run (0.0229)
# — so the knobs are not the fix and the failure needs a root cause,
# not more A/Bs. Two isolating runs (both with the new ate_curve):
#   70. 120-frame STATIC init, no keep_best — the exact r4 config at
#       HEAD: reproduces the r4 baseline, proves the grow_bucket fix at
#       the config that crashed r4's retest, and records WHERE the
#       drift accumulates (gradual vs jump).
#   71. 120-frame with GROUND-TRUTH poses — no tracking error at all:
#       isolates mapping quality (densify/prune/map LRs) from the
#       tracking-drift feedback loop. If PSNR stays low here, mapping
#       itself is the bottleneck; if it recovers, drift is tracking-fed.
set -u
LOG=${1:-/tmp/hwq_r5g}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
echo "head: $(git rev-parse --short HEAD)"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 70_gate120_static 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --tag gate120_static_r4replay \
  --motion-model static --track-best off --out "$LOG/gate.jsonl"

step 71_gate120_gtpose 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --tag gate120_gtpose \
  --use-gt-pose --out "$LOG/gate.jsonl"

echo "=== r5g queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
