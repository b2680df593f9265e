#!/bin/bash
# Round-4 hardware queue, phase G (extractor push toward 70+ FPS):
#  70. ping.
#  71. bench.py with the NEW on-device scanned throughput measure
#      (lax.map over 16 stacked frames, ONE dispatch — the old
#      16-dispatch loop paid ~3 ms/frame of relay overhead: 56.75 FPS
#      dispatched vs 69.6 FPS on-chip, r4f profile). Also warms the
#      scanned program into .jax_cache for the driver's end-of-round
#      bench run.
#  72. trunk_bisect: per-stage + stage-2 block-component ablations of
#      the ConvNeXt-L trunk (13.6 ms @ 59.5 TFLOP/s = ~30% MFU) —
#      locates the non-MXU time (dw conv / LN / erf GELU / stem) to
#      pick the next kernel-level lever.
#
# Usage: bash tools/hw_queue_r4g.sh [logdir] (default /tmp/hwq_r4g —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4g}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -15 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 70_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 71_bench 5400 python bench.py

step 72_trunk_bisect 5400 python tools/trunk_bisect.py

echo "=== r4g queue done ($(date -u +%FT%TZ)) ==="
