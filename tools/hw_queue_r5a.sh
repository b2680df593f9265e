#!/bin/bash
# Round-5 hardware queue, phase A — un-confound the round-4 last-hour loop
# changes (VERDICT r5 #2) from ONE fixed tree, warm cache, same session:
#  01. HEAD defaults cold (cv + prefetch + c256) — warms the compile cache.
#  02. baseline replay: static init, no prefetch, chunk 256 (the r4f
#      0.1035-FPS configuration) — the control every arm compares against.
#  03. +cv only        04. +prefetch only        05. +c128 only
#  06. HEAD defaults warm (cv + prefetch + c256).
# Every run records tag/head/motion_model/prefetch/blend_chunk in its JSON.
#
# Usage: bash tools/hw_queue_r5a.sh [logdir] (default /tmp/hwq_r5a)
set -u
LOG=${1:-/tmp/hwq_r5a}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 01_gate40_head_cold 7200 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag head_cold --out "$LOG/gate40.jsonl"

step 02_gate40_base 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag base_static_nopre_c256 \
  --motion-model static --no-prefetch --out "$LOG/gate40.jsonl"

step 03_gate40_cv 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag cv_only \
  --motion-model cv --no-prefetch --out "$LOG/gate40.jsonl"

step 04_gate40_pre 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag prefetch_only \
  --motion-model static --out "$LOG/gate40.jsonl"

step 05_gate40_c128 5400 env OLS_BLEND_CHUNK=128 \
  python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag c128_only \
  --motion-model static --no-prefetch --out "$LOG/gate40.jsonl"

step 06_gate40_head_warm 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag head_warm --out "$LOG/gate40.jsonl"

echo "=== r5a queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
