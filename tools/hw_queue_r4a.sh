#!/bin/bash
# Round-4 hardware queue, phase A: DECISION data first (the round-3 queue
# never ran past step 09 — relay outage). Order: cheap lowering smoke,
# grad-reduce micro, stage-7 A/Bs (scatter/emission x off/hybrid multiseg,
# chunk 512, production occupancy), golden parity for every candidate.
# Gates + bench run in phase B AFTER defaults are decided (hw_decide.py).
#
# Usage: bash tools/hw_queue_r4a.sh [logdir]   (default /tmp/hwq_r4 — a
# FRESH dir per ADVICE r3: never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4}
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

# 1. Fast Mosaic-lowering + numeric smoke for the vectorized multiseg
#    bodies (now also cross-checks on/hybrid against the off baseline).
step 10a_ms_smoke 1200 python tools/ms_smoke.py

# 2. Grad-reduction micro A/B on real binning data.
step 01_probe_scatter 1800 python tools/kernel_probe.py --variants scatter

# 3. Saturated stage-7 matrix: baseline, emission, hybrid, hybrid+emission.
step 02_stage7_scatter 2400 python tools/tpu_scale_check.py --stage 7
OLS_GRAD_REDUCE=emission step 03_stage7_emission 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid step 11_stage7_multiseg 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid OLS_GRAD_REDUCE=emission step 12_stage7_ms_emission \
  2400 python tools/tpu_scale_check.py --stage 7

# 4. Production-occupancy regime (~540k demand in the 1M bucket).
step 13_stage7_n15k_base 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000
OLS_MULTISEG=hybrid step 14_stage7_n15k_ms 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000

# 5. CHUNK=512 under hybrid (round-2 negative may invert for the
#    vectorized path — one full-block pass per chunk regardless).
OLS_MULTISEG=hybrid OLS_BLEND_CHUNK=512 step 15_stage7_ms_c512 2400 \
  python tools/tpu_scale_check.py --stage 7

# 6. Golden parity replays for every candidate mode.
step 04_parity_scatter 2400 python tools/tpu_raster_parity.py
OLS_GRAD_REDUCE=emission step 05_parity_emission 2400 \
  python tools/tpu_raster_parity.py
OLS_MULTISEG=hybrid step 10_parity_multiseg 2400 \
  python tools/tpu_raster_parity.py

echo "=== phase A done ($(date -u +%FT%TZ)); logs in $LOG ==="
echo "Next: python tools/hw_decide.py $LOG  -> flip defaults -> phase B"
