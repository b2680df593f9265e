#!/bin/bash
# Trimmed round-3 continuation queue (tunnel back after 14h outage,
# cold cache, ~1h budget). Order: bench cache warm first (driver runs
# bench at round end), then the multiseg Mosaic smoke, then the A/Bs
# that decide default flips, then parity.
set -u
# Fresh default dir per invocation: mixing runs' logs in one decision
# dir lets hw_decide.py pick up stale verdicts (ADVICE r3).
LOG=${1:-/tmp/hwq_r3c_$(date -u +%m%d%H%M)}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%T) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc end $(date -u +%T)"
  tail -6 "$LOG/$name.log"
}

step 09_bench 2400 python bench.py

step 10a_ms_smoke 1200 python tools/ms_smoke.py

step 02_stage7_scatter 2400 python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid step 11_stage7_multiseg 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_GRAD_REDUCE=emission step 03_stage7_emission 2400 \
  python tools/tpu_scale_check.py --stage 7

step 04_parity_scatter 2400 python tools/tpu_raster_parity.py
OLS_MULTISEG=hybrid step 10_parity_multiseg 2400 \
  python tools/tpu_raster_parity.py

step 13_stage7_n15k_base 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000
OLS_MULTISEG=hybrid step 14_stage7_n15k_ms 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000

OLS_MULTISEG=hybrid OLS_GRAD_REDUCE=emission step 12_stage7_ms_emission \
  2400 python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid OLS_BLEND_CHUNK=512 step 15_stage7_ms_c512 2400 \
  python tools/tpu_scale_check.py --stage 7

step 01_probe_scatter 1800 python tools/kernel_probe.py --variants scatter

echo "=== trimmed queue done $(date -u +%T); logs in $LOG ==="
