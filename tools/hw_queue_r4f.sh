#!/bin/bash
# Round-4 hardware queue, phase F (after the extend_points jit +
# extractor-profile 413 fix, commit b4783cc):
#  60. ping.
#  61. extractor stage profile + OLS_HR_CONVT xla-vs-phase A/B — r4e
#      step 54 died on HTTP 413 (weights baked as HLO constants); now
#      they ride as jit args. Decides OLS_HR_CONVT and feeds the
#      VERDICT-#5 roofline.
#  62. 12-frame chunk decomposition with the NEW [submit]
#      stage/prep/dispatch timers — attributes the ~3.2 s/chunk
#      non-wait host time seen in r4e step 51 — and the jitted
#      extend_points ([add_kf] extend was 26-36 s eager; expect ~1 s
#      warm).
#  63/64. 40-frame gate, TWICE back to back: 63 eats any residual
#      compiles (extend_points program, new shapes), 64 is the true
#      warm-warm number. r4e warm was 0.0631 with kf 41.4 s + data
#      106 s of compiles; post-fix target >=0.08.
#  65. MAP_CHUNK=32 gate re-run on the warm cache (r4e step 53:
#      0.0594 with 222 s of data compiles; decide vs 64).
#
# Usage: bash tools/hw_queue_r4f.sh [logdir] (default /tmp/hwq_r4f —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4f}
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

step 60_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 61_extractor_profile 3600 python tools/extractor_profile.py \
  --json "$LOG/extractor_profile.json"

OLS_CHUNK_TIMING=1 step 62_chunk_decomp 3600 \
  python tools/replica_scale_gate.py --max-frames 12 --no-gates

step 63_gate40_warm1 5400 python tools/replica_scale_gate.py --max-frames 40

step 64_gate40_warm2 5400 python tools/replica_scale_gate.py --max-frames 40

OLS_MAP_CHUNK=32 step 65_gate40_mc32 5400 \
  python tools/replica_scale_gate.py --max-frames 40

echo "=== r4f queue done ($(date -u +%FT%TZ)) ==="
