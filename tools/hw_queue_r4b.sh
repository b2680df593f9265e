#!/bin/bash
# Round-4 hardware queue, phase A': decision data with the fixed tree
# (the r4a run hit two artifacts of a mid-edit working tree — a missing
# scan_mxu kwarg in the stage-7 steps, and the Mosaic concat lowering
# failure in the factored geometry grads, both fixed since).
#
# Changes vs hw_queue_r4a.sh:
#   * emission-order steps dropped — the r4a kernel probe decided it:
#     PROD scatter-add 18.77 ms vs PROD emission segmented-scan 147.61
#     ms (/tmp/hwq_r4/01_probe_scatter.log). OLS_GRAD_REDUCE stays
#     "scatter".
#   * OLS_SCAN_MXU A/Bs added (triangular-dot prefix scans: bwd / all,
#     alone and combined with multiseg).
#
# Usage: bash tools/hw_queue_r4b.sh [logdir]   (default /tmp/hwq_r4b —
# a FRESH dir per ADVICE r3: never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4b}
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

# 0. Tunnel sanity (tiny matmul).
step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

# 1. Fast Mosaic-lowering + numeric smoke (multiseg x scan_mxu cases,
#    each cross-checked against the off/off baseline).
step 10a_ms_smoke 1800 python tools/ms_smoke.py

# 2. Saturated stage-7 matrix.
step 02_stage7_base 2400 python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid step 11_stage7_multiseg 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_SCAN_MXU=bwd step 16_stage7_scan_bwd 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_SCAN_MXU=all step 17_stage7_scan_all 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid OLS_SCAN_MXU=all step 18_stage7_ms_scan 2400 \
  python tools/tpu_scale_check.py --stage 7

# 3. Production-occupancy regime (~540k demand in the 1M bucket).
step 13_stage7_n15k_base 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000
OLS_MULTISEG=hybrid OLS_SCAN_MXU=all step 14_stage7_n15k_best 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000

# 4. CHUNK=512 under the vectorized path (round-2 negative may invert:
#    one full-block pass per chunk regardless of segment count).
OLS_MULTISEG=hybrid OLS_BLEND_CHUNK=512 step 15_stage7_ms_c512 2400 \
  python tools/tpu_scale_check.py --stage 7

# 5. Golden parity replays for every candidate mode.
step 04_parity_base 2400 python tools/tpu_raster_parity.py
OLS_MULTISEG=hybrid step 10_parity_multiseg 2400 \
  python tools/tpu_raster_parity.py
OLS_SCAN_MXU=all step 19_parity_scan_all 2400 \
  python tools/tpu_raster_parity.py
OLS_MULTISEG=hybrid OLS_SCAN_MXU=all step 20_parity_ms_scan 2400 \
  python tools/tpu_raster_parity.py

echo "=== phase A' done ($(date -u +%FT%TZ)); logs in $LOG ==="
echo "Next: python tools/hw_decide.py $LOG  -> flip defaults -> phase B"
