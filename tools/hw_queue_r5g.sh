#!/bin/bash
# Round-5 hardware queue, phase G — long-horizon drift DIAGNOSIS + fix.
# Phase E's gate120 at the quality knobs (cv + keep_best) measured ATE
# 0.0582 — 2.5x WORSE than round 4's static-init 120-frame run (0.0229)
# — so the knobs are not the fix and the failure needs a root cause.
# Ordered by information value under a degraded relay (all runs record
# the new per-keyframe ate_curve):
#   71. 120-frame with GROUND-TRUTH poses — no tracking error at all:
#       isolates mapping quality (densify/prune/map LRs) from the
#       tracking-drift feedback loop. If PSNR stays low here, mapping
#       itself is the bottleneck; if it recovers, drift is tracking-fed.
#       Also the cheapest run (gt-pose tracks with max_iters=1).
#   72. the fix candidate: reduce-lr-on-plateau tracking (static init,
#       plateau_rtol 1e-3 + lr_decay 0.5 — full-lr travel while the loss
#       improves, geometric step collapse once it plateaus, so the
#       ‖tau‖<1e-4 exit fires and committed poses stop carrying lr-scale
#       noise into the map).
#   73. 40-frame GATED at the same config: the headline row at HEAD and
#       the check that the decay does not regress the short horizon.
#   74. 40-frame GATED headline combo, plateau-EXIT semantics (cv +
#       keep_best + plateau 1e-3, lr_decay 1): phase E step 54 measured
#       0.1219 FPS gates-green at cd67e01 under the OLD |Δloss| plateau
#       criterion — this re-validates the FPS champion under the new
#       improvement-vs-best criterion at HEAD.
#   75. 40-frame GATED headline combo with reduce-lr-on-plateau (cv +
#       keep_best + plateau 1e-3 + lr_decay 0.5): the quality variant of
#       74 (committed pose = basin minimum, not last lr-orbit sample).
#   76. GATED replica-scale mIoU (120 frames, every 8): phase E's run
#       OOM-killed at 130 GB host RSS — one eager (H·W,768) matmul per
#       query per pass; retried now that decode→relevancy is one fused
#       jitted program and the CLIP map never reaches the host.
#   70. 120-frame STATIC init, no keep_best — the exact r4 config at
#       HEAD: replays the r4 baseline (ATE 0.0229 / PSNR 8.35) with the
#       drift curve recorded. Last: lowest marginal value (phase E's
#       step 50 already proved the grow_bucket fix survives 120 frames).
set -u
LOG=${1:-/tmp/hwq_r5g}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
echo "head: $(git rev-parse --short HEAD)"

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -6 "$LOG/$name.log"
  echo "--- $name exit=$rc ($(date -u +%FT%TZ))"
}

# Cheap 40-frame gates FIRST (~10 min each): the headline must be
# reproducible at HEAD (VERDICT r4 #9) and the plateau-criterion change
# (|Δloss| → improvement-vs-best) needs revalidation before the long
# runs consume the session.
step 74_gate40_plateau_head 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --tag gate40_plateau_head \
  --motion-model cv --track-best on --plateau 0.001 \
  --out "$LOG/gate.jsonl"

step 75_gate40_lrdecay_combo 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --tag gate40_lrdecay_combo \
  --motion-model cv --track-best on --plateau 0.001 \
  --lr-decay 0.5 --out "$LOG/gate.jsonl"

step 73_gate40_lrdecay 5400 python tools/replica_scale_gate.py \
  --max-frames 40 --tag gate40_lrdecay \
  --motion-model static --track-best off --plateau 0.001 \
  --lr-decay 0.5 --out "$LOG/gate.jsonl"

step 71_gate120_gtpose 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --tag gate120_gtpose \
  --use-gt-pose --out "$LOG/gate.jsonl"

step 72_gate120_lrdecay 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --tag gate120_lrdecay \
  --motion-model static --track-best off --plateau 0.001 \
  --lr-decay 0.5 --out "$LOG/gate.jsonl"

step 76_miou_gated 10800 python tools/synthetic_miou_gate.py \
  --config configs/synthetic/replica_scale.yaml --stage 2 \
  --max-frames 120 --every 8 --out "$LOG/miou_replica.json"

step 70_gate120_static 10800 python tools/replica_scale_gate.py \
  --max-frames 120 --no-gates --tag gate120_static_r4replay \
  --motion-model static --track-best off --out "$LOG/gate.jsonl"

echo "=== r5g queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
