#!/bin/bash
# Round-4 hardware queue, phase M — validate OLS_BLEND_CHUNK=128 before
# flipping the default (phase L pinned 25.7 vs 29.3 ms fwd+bwd at the
# production regime, same 221184 bucket):
#  120. golden parity at tile 32 + chunk 128 (compiled Pallas, real chip).
#  121/122. saturated-occupancy A/B at tile 32: demand-sized bucket,
#       c128 vs c256 (phase L only probed production occupancy; round 2's
#       c512 negative was at tile 16 saturation).
#  123/124. 40-frame gate under c128: first run eats the blend-program
#       recompiles, second run is the measurement (compare vs r4f's
#       0.1035 FPS warm / PSNR 11.41 / ATE 0.0077).
#
# Usage: bash tools/hw_queue_r4m.sh [logdir] (default /tmp/hwq_r4m —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4m}
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

step 120_parity_c128 3600 env OLS_TILE=32 OLS_BLEND_CHUNK=128 \
  python tools/tpu_raster_parity.py --goldens tests/goldens_t32

# Saturated tile-32 A/B: discover demand, snap to a bucket divisible by
# 8*256 (also divides 8*128), then time both chunk sizes at that bucket.
step 121_sat_demand 3600 env OLS_TILE=32 python tools/tpu_scale_check.py \
  --stage 7
BSAT=$(python - "$LOG/121_sat_demand.log" <<'EOF'
import re, sys
m = re.search(r"num_instances: (\d+)", open(sys.argv[1]).read())
snap = 8 * 256
print(((int(int(m.group(1)) * 1.25) + snap - 1) // snap) * snap)
EOF
) || BSAT=2875392
echo "saturated tile32 bucket: $BSAT"
step 122_sat_c128 3600 env OLS_TILE=32 OLS_BLEND_CHUNK=128 \
  python tools/tpu_scale_check.py --stage 7 --max-instances "$BSAT"
step 123_sat_c256 3600 env OLS_TILE=32 \
  python tools/tpu_scale_check.py --stage 7 --max-instances "$BSAT"

step 124_gate40_c128_compile 7200 env OLS_BLEND_CHUNK=128 \
  python tools/replica_scale_gate.py --max-frames 40 \
  --out "$LOG/gate40_c128_compile.json"
step 125_gate40_c128_warm 7200 env OLS_BLEND_CHUNK=128 \
  python tools/replica_scale_gate.py --max-frames 40 \
  --out "$LOG/gate40_c128_warm.json"

echo "=== r4m queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
