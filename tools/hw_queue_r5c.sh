#!/bin/bash
# Round-5 hardware queue, phase C — kernel + extractor A/Bs (VERDICT r5
# #5/#8). Quick probes (~30 min total); run between phase A (loop A/Bs)
# and phase B (long quality runs) so phase B can carry the winning flags.
#
#  20/21. stage-7 at PRODUCTION regime (tile 32, n15k, demand-sized
#         221184 bucket): baseline vs OLS_MULTISEG=bwd-hybrid. The full
#         "hybrid" lost on hardware (+6% saturated — fwd vectorization
#         overhead outweighs its lean per-segment body); bwd-hybrid keeps
#         the baseline forward and collapses only the backward's heavier
#         per-segment work (gdot + wG scan + dalpha + geom rows + dfeat).
#  22/23. same A/B at the saturated probe (n200k, 1M bucket).
#  24/25. golden parity under bwd-hybrid on hardware (tile 16 + tile 32).
#  26/27. extractor stage profile: head_diff (the r4 "head 9.9 ms" row
#         timed the WHOLE tower) + OLS_HEAD=flat GEMM-reshape A/B.
#
# Usage: OLS_BLEND_CHUNK=<phase-A winner> bash tools/hw_queue_r5c.sh [logdir]
set -u
LOG=${1:-/tmp/hwq_r5c}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export OLS_BLEND_CHUNK=${OLS_BLEND_CHUNK:-128}
echo "blend chunk: $OLS_BLEND_CHUNK"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -8 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 20_stage7_prod_base 2400 python tools/tpu_scale_check.py \
  --stage 7 --tile 32 --n 15000 --max-instances 221184

step 21_stage7_prod_bwdhyb 2400 env OLS_MULTISEG=bwd-hybrid \
  python tools/tpu_scale_check.py \
  --stage 7 --tile 32 --n 15000 --max-instances 221184

step 22_stage7_sat_base 2400 python tools/tpu_scale_check.py \
  --stage 7 --tile 32 --n 200000

step 23_stage7_sat_bwdhyb 2400 env OLS_MULTISEG=bwd-hybrid \
  python tools/tpu_scale_check.py \
  --stage 7 --tile 32 --n 200000

step 24_parity_bwdhyb_t16 3600 env OLS_MULTISEG=bwd-hybrid \
  python tools/tpu_raster_parity.py

step 25_parity_bwdhyb_t32 3600 env OLS_MULTISEG=bwd-hybrid \
  python tools/tpu_raster_parity.py --goldens tests/goldens_t32

step 26_extractor_head 3600 python tools/extractor_profile.py \
  --json "$LOG/extractor_base.json"

step 27_extractor_headflat 3600 env OLS_HEAD=flat \
  python tools/extractor_profile.py --json "$LOG/extractor_flat.json"

echo "=== r5c queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
