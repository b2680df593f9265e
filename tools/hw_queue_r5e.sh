#!/bin/bash
# Round-5 hardware queue, phase E — the phase-B agenda reordered by
# priority after the VM restart lost /tmp (the r5b queue never ran).
# Most important first, so relay degradation can't starve the round's
# #1 target:
#   50. 120-frame GATED run at the quality config (cv + keep_best) —
#       VERDICT #1/#3: the r4 120-frame run failed PSNR 8.35/ATE 0.0229
#       and its retest crashed on the grow_bucket NameError (fixed
#       f1c9a8d + frontend-arm overflow test).
#   51. replica-scale mIoU WITH gates (9-class GT, >=8 queries/frames,
#       0.7 lock) — VERDICT #6.
#   52. bench.py (BENCH_r05 input, warms the extractor cache too).
#   53/54. 40-frame A/Bs: keep_best alone, keep_best+plateau 1e-3
#       (isolate the two quality knobs vs the r5a cv arm).
#   55. 300-frame long-horizon drift record (no gates).
# Kernel/extractor probes (r5c steps 26/27) run separately.
set -u
LOG=${1:-/tmp/hwq_r5e}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
echo "head: $(git rev-parse --short HEAD)"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 50_gate120 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --tag gate120_quality \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

step 51_miou_gated 10800 python tools/synthetic_miou_gate.py \
  --config configs/synthetic/replica_scale.yaml --stage 2 \
  --max-frames 120 --every 8 --out "$LOG/miou_replica.json"

step 52_bench 3600 python bench.py

step 53_gate40_keepbest 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag cvpre_keepbest \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

step 54_gate40_plateau 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag cvpre_keepbest_plateau \
  --motion-model cv --track-best on --plateau 0.001 \
  --out "$LOG/gate.jsonl"

step 55_gate300 14400 python tools/replica_scale_gate.py \
  --max-frames 300 --no-gates --tag long300 \
  --config configs/synthetic/replica_long.yaml \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

echo "=== r5e queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
