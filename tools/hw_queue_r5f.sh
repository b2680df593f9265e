#!/bin/bash
# Round-5 hardware queue, phase F — the r5c tail lost to the VM restart:
# extractor head profiling (VERDICT r4 #8). Run AFTER phase E so the
# long quality runs keep relay priority.
#   60. extractor stage profile at defaults — reports tower_full and
#       head_diff (the r4 "head 9.9 ms standalone" row timed the WHOLE
#       tower; true head cost is tower_full - trunk).
#   61. OLS_HEAD=flat A/B: reshape the per-location CLIP-head MLP input
#       to one (N*H*W, C) GEMM (exact; parity-tested on CPU).
set -u
LOG=${1:-/tmp/hwq_r5f}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
echo "head: $(git rev-parse --short HEAD)"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -8 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 60_extractor_head 3600 python tools/extractor_profile.py \
  --json "$LOG/extractor_base.json"

step 61_extractor_headflat 3600 env OLS_HEAD=flat \
  python tools/extractor_profile.py --json "$LOG/extractor_flat.json"

echo "=== r5f queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
