#!/bin/bash
# Round-4 hardware queue, phase K (binning decomposition + dynamic
# jump-carry A/B):
#  100. binning stage decomposition at the SATURATED t32 regime (n200k,
#       1M bucket) — where do the 28.7 ms go? Includes the jump-carry
#       DYN row (the OLS_BIN_DYN candidate).
#  101. same at the PRODUCTION regime (n15k, 221184 bucket).
#  102. scatter-reduction variant table at t32 saturated (the r4a table
#       was measured at t16 and its logs are gone; this re-pins the
#       per-row cost + set-vs-add + width sensitivity for the grad
#       scatter decision).
#  103/104. stage-7 fwd+bwd under OLS_BIN_DYN=1 at both regimes
#       (baselines: 30.4 ms production / 79.9 ms saturated, r4j/r4d).
#  105. golden parity replay with OLS_BIN_DYN=1 (value-identical by
#       construction + CPU test; this proves the while_loop+switch
#       lowering on real Mosaic/XLA-TPU).
#
# Usage: bash tools/hw_queue_r4k.sh [logdir] (default /tmp/hwq_r4k —
# FRESH dir per run.)
set -u
LOG=${1:-/tmp/hwq_r4k}
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

step 100_binpieces_sat 3600 env OLS_TILE=32 python tools/kernel_probe.py \
  --variants pieces,binpieces --n 200000 --cap $((1<<20))

step 101_binpieces_prod 3600 env OLS_TILE=32 python tools/kernel_probe.py \
  --variants binpieces --n 15000 --cap 221184

step 102_scatter_sat 3600 env OLS_TILE=32 python tools/kernel_probe.py \
  --variants scatter --n 200000 --cap $((1<<20))

step 103_stage7_dyn_prod 3600 env OLS_BIN_DYN=1 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --tile 32 --max-instances 219648

step 104_stage7_dyn_sat 3600 env OLS_BIN_DYN=1 python tools/tpu_scale_check.py \
  --stage 7 --tile 32

step 105_parity_dyn 3600 env OLS_BIN_DYN=1 python tools/tpu_raster_parity.py

echo "=== r4k queue done ($(date -u +%FT%TZ)) ==="
