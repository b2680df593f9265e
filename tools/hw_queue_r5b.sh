#!/bin/bash
# Round-5 hardware queue, phase B — quality at horizon (VERDICT r5 #1/#3)
# plus the evidence items (#6 gated mIoU, bench). Run AFTER phase A
# (hw_queue_r5a.sh) and pass the chunk default it decided:
#   OLS_BLEND_CHUNK=128 bash tools/hw_queue_r5b.sh [logdir]
#
#  10. 40-frame: cv + prefetch + keep_best      (isolates keep_best vs A-06)
#  11. 40-frame: + plateau exit 1e-3            (isolates the plateau exit)
#  12. 120-frame GATED at the best quality config — the round's #1 target
#      (the r4 120-frame run failed PSNR 8.35 / ATE 0.0229 and its retest
#      crashed on the grow_bucket NameError).
#  13. replica-scale mIoU WITH gates (9-class GT, >=8 queries/frames,
#      0.7 lock) — VERDICT #6.
#  14. bench.py (BENCH_r05 input).
#  15. 300-frame long-horizon curve (no gates; drift record).
set -u
LOG=${1:-/tmp/hwq_r5b}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export OLS_BLEND_CHUNK=${OLS_BLEND_CHUNK:-128}
echo "blend chunk: $OLS_BLEND_CHUNK"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

step 00_ping 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

step 10_gate40_best 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag cvpre_keepbest \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

step 11_gate40_plateau 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --no-gates --tag cvpre_keepbest_plateau \
  --motion-model cv --track-best on --plateau 0.001 \
  --out "$LOG/gate.jsonl"

step 12_gate120 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --tag gate120_quality \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

step 13_miou_gated 10800 python tools/synthetic_miou_gate.py \
  --config configs/synthetic/replica_scale.yaml --stage 2 \
  --max-frames 120 --every 8 --out "$LOG/miou_replica.json"

step 14_bench 3600 python bench.py

step 15_gate300 14400 python tools/replica_scale_gate.py \
  --max-frames 300 --no-gates --tag long300 \
  --config configs/synthetic/replica_long.yaml \
  --motion-model cv --track-best on --out "$LOG/gate.jsonl"

echo "=== r5b queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
