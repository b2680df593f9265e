#!/bin/bash
# Round-4 hardware queue, phase B: end-to-end numbers AFTER the phase-A
# decision (hw_queue_r4b: multiseg/scan_mxu/emission/CHUNK=512 all
# NEGATIVE — defaults unchanged, see PERF.md "Round-4 hardware
# verdicts"). Bench first (cheap relay-health probe + the new latency
# line), then init/mapping chunk-timing decomposition, the 40-frame
# gate cold+warm, and the first hardware-scale synthetic mIoU run.
#
# Usage: bash tools/hw_queue_r4c.sh [logdir]   (default /tmp/hwq_r4c —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4c}
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

step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

# 1. Headline bench (was 59.03 FPS) + the NEW single-frame latency line.
step 09_bench 2400 python bench.py

# 2. Init/mapping chunk-phase decomposition (where do init's 0.32 s/iter
#    and map's 0.53 s/iter actually go?).
OLS_CHUNK_TIMING=1 step 06_chunk_timing 3600 \
  python tools/replica_scale_gate.py --max-frames 4 --no-gates

# 3. 40-frame gate, cold then warm (round-3 best: 0.027 cold / 0.036 warm).
step 07_gate40_cold 5400 python tools/replica_scale_gate.py --max-frames 40
step 08_gate40_warm 5400 python tools/replica_scale_gate.py --max-frames 40

# 4. First hardware-scale synthetic mIoU: full 1200x680 protocol
#    (the 30-px LERF blur is proportionally the reference's), 2-stage.
#    --no-gates: this run PINS the number; the gate threshold follows.
step 21_miou_replica 7200 python tools/synthetic_miou_gate.py \
  --config configs/synthetic/replica_scale.yaml --max-frames 16 \
  --feat-hw 192 --every 5 --no-gates --out "$LOG/miou_replica.json"

echo "=== phase B done ($(date -u +%FT%TZ)); logs in $LOG ==="
