#!/bin/bash
# Round-4 hardware queue, phase N — loop-level A/B + long-horizon retest.
# Phase M's gate runs (124/125) measure c128 + cv-init + camera-prefetch
# COMBINED (the working tree moved under the queue); this phase isolates:
#  130. gate40 at chunk 256 with cv+prefetch → separates the loop changes
#       (motion model, camera prefetcher) from the kernel chunk flip.
#       Compare vs r4f's 0.1035 FPS (static init, no cam prefetch, c256).
#  131. 120-frame run under the full new config (c128+cv+prefetch) →
#       re-test the long-horizon drift (r4l: PSNR 8.35, ATE 0.0229,
#       budget_hit 0.84 with static init).
#
# Usage: bash tools/hw_queue_r4n.sh [logdir] (default /tmp/hwq_r4n)
set -u
LOG=${1:-/tmp/hwq_r4n}
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

step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 130_gate40_c256_cvpre 7200 python tools/replica_scale_gate.py \
  --max-frames 40 --out "$LOG/gate40_c256_cvpre.json"

step 131_gate120_c128_cvpre 10800 env OLS_BLEND_CHUNK=128 \
  python tools/replica_scale_gate.py --max-frames 120 --no-gates \
  --out "$LOG/gate120_c128_cvpre.json"

echo "=== r4n queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
