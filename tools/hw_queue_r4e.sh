#!/bin/bash
# Round-4 hardware queue, phase E (run AFTER hw_queue_r4d.sh drains):
#  51. 12-frame chunk decomposition — r4c's probe (4 frames) only
#      exercised INIT chunks; 12 frames include real mapping chunks.
#      New [chunk] stage/submit/wait_fetch prints + [add_kf]/[kf]
#      sub-phase prints attribute add_next_kf's 45.5 s and the per-chunk
#      non-compute ~1.3 s, now under the DEPTH-2 PIPELINED map loop.
#  52. 40-frame gate WARM with the pipelined backend (r4c warm baseline:
#      595 s / 0.0672 FPS; map 291.5 track 136 init 125 kf 31). The
#      deterministic loop must reproduce PSNR 11.27 / ATE 0.00828 /
#      L1 0.00052 EXACTLY — that IS the pipelining-equivalence check.
#  53. MAP_CHUNK=32 A/B (16-iter chunks ran 5.1 s at gate scale — 32 is
#      safely under the ~30 s worker-kill line and halves dispatches).
#  54. extractor stage profile + OLS_HR_CONVT A/B (r4d step 31 crashed
#      on a sys.path bug — fixed).
#  55-57. tile A/B re-runs (r4d steps 33/34 died on a TPU worker
#      restart): t16 demand, then each tile at its demand-sized bucket.
#      t32 demand was 2,302,371 instances (r4d step 32: fwd+bwd 79.9 ms
#      at the default bucket) → sized bucket 2878464.
#
# Usage: bash tools/hw_queue_r4e.sh [logdir]  (default /tmp/hwq_r4e —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4e}
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

step 50_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

OLS_CHUNK_TIMING=1 step 51_chunk_decomp 3600 \
  python tools/replica_scale_gate.py --max-frames 12 --no-gates

step 52_gate40_warm 5400 python tools/replica_scale_gate.py --max-frames 40

OLS_MAP_CHUNK=32 step 53_gate40_mc32 5400 \
  python tools/replica_scale_gate.py --max-frames 40

step 54_extractor_profile 3600 python tools/extractor_profile.py \
  --json "$LOG/extractor_profile.json"

step 55_t16_demand 1800 python tools/tpu_scale_check.py --stage 7
bucket_for() {
  python - "$1" <<'EOF'
import re, sys
txt = open(sys.argv[1]).read()
m = re.search(r"num_instances: (\d+)", txt)
if not m:
    print(1048576); raise SystemExit
n = int(m.group(1))
snap = 8 * 256
print(((int(n * 1.25) + snap - 1) // snap) * snap)
EOF
}
B16=$(bucket_for "$LOG/55_t16_demand.log")
echo "tile16 bucket: $B16"
step 56_t16_sized 1800 python tools/tpu_scale_check.py \
  --stage 7 --max-instances "$B16"
OLS_TILE=32 step 57_t32_sized 3600 python tools/tpu_scale_check.py \
  --stage 7 --max-instances 2878464

echo "=== phase E done ($(date -u +%FT%TZ)); logs in $LOG ==="
