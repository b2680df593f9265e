#!/bin/bash
# Round-4 hardware queue, phase C (run AFTER hw_queue_r4c.sh drains):
#  1. bench with the FIXED latency probe (the r4c attempt crashed: the
#     old jit(sum(run(f))) recompiled the whole pipeline and blew the
#     relay's request-body limit, HTTP 413).
#  2. extractor stage profile + ConvTranspose lowering A/B
#     (OLS_HR_CONVT=xla vs phase) — VERDICT #5.
#  3. Tile-size A/B (OLS_TILE=32 vs 16): the instance-array costs
#     (binning 17.6 + pack 10.6 + scatter 18 ms of the 97.1 ms saturated
#     stage-7 total) all scale with the (Gaussian, tile) instance count;
#     tile 32 needs ~2-4x fewer instances for multi-tile splats. Each
#     tile size runs at its OWN demand-sized bucket (that IS the win).
#  4. Tile-32 golden parity vs freshly generated tile-32 CPU-oracle
#     goldens (pre-generated into /tmp/goldens_t32 — tile size changes
#     rect-cull semantics, so the pinned tile-16 anchors don't apply).
#
# Usage: bash tools/hw_queue_r4d.sh [logdir]  (default /tmp/hwq_r4d —
# FRESH dir per run; never mix runs' logs in one decision dir.)
set -u
LOG=${1:-/tmp/hwq_r4d}
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

step 30_bench 2400 python bench.py

step 31_extractor_profile 3600 python tools/extractor_profile.py \
  --json "$LOG/extractor_profile.json"

# --- tile-size A/B ---------------------------------------------------------
# Discover each tile's instance demand at the stage-7 probe scene, then
# time stage 7 with a demand-sized bucket (x1.25, snapped to 8*CHUNK).
bucket_for() {
  python - "$1" <<'EOF'
import re, sys
txt = open(sys.argv[1]).read()
m = re.search(r"num_instances: (\d+)", txt)
n = int(m.group(1))
snap = 8 * 256
print(((int(n * 1.25) + snap - 1) // snap) * snap)
EOF
}

OLS_TILE=32 step 32_t32_demand 3600 python tools/tpu_scale_check.py --stage 7
B32=$(bucket_for "$LOG/32_t32_demand.log") || B32=1048576
echo "tile32 bucket: $B32"
OLS_TILE=32 step 33_t32_sized 3600 python tools/tpu_scale_check.py \
  --stage 7 --max-instances "$B32"

step 34_t16_demand 1800 python tools/tpu_scale_check.py --stage 7
B16=$(bucket_for "$LOG/34_t16_demand.log") || B16=1048576
echo "tile16 bucket: $B16"
step 35_t16_sized 1800 python tools/tpu_scale_check.py \
  --stage 7 --max-instances "$B16"

# Production-occupancy variant (n=15000 gaussians).
OLS_TILE=32 step 36_t32_n15k 3600 python tools/tpu_scale_check.py \
  --stage 7 --n 15000
B32S=$(bucket_for "$LOG/36_t32_n15k.log") || B32S=1048576
OLS_TILE=32 step 37_t32_n15k_sized 3600 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --max-instances "$B32S"
step 38_t16_n15k 1800 python tools/tpu_scale_check.py --stage 7 --n 15000
B16S=$(bucket_for "$LOG/38_t16_n15k.log") || B16S=1048576
step 39_t16_n15k_sized 1800 python tools/tpu_scale_check.py \
  --stage 7 --n 15000 --max-instances "$B16S"

# Golden parity at tile 32 (real chip, compiled Pallas).
OLS_TILE=32 step 40_t32_parity 3600 python tools/tpu_raster_parity.py \
  --goldens /tmp/goldens_t32

echo "=== phase C done ($(date -u +%FT%TZ)); logs in $LOG ==="
