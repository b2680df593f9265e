#!/usr/bin/env python
"""End-to-end open-vocabulary mIoU gate on the synthetic scene (VERDICT
r3 #4): SLAM with known-geometry class-embedding language supervision →
rendered 15-d maps → (1- or 2-stage) decode → LERF relevancy → IoU /
localization, through the production eval entry points
(eval/lerf_eval.py — the reference protocol,
/root/reference/eval/evaluate_onlinelangslam.py:305-352).

Usage:
  python tools/synthetic_miou_gate.py                 # smoke scale, 2-stage
  python tools/synthetic_miou_gate.py --stage 1
  python tools/synthetic_miou_gate.py --config configs/synthetic/replica_scale.yaml \
      --max-frames 40 --feat-hw 192 --min-miou 0.5    # hardware scale

Gates are REGRESSION LOCKS at the given scale, not quality claims: at
smoke scale (96×64) the protocol's 30-px box blur dominates the small
floor region, capping even a perfect map's floor IoU (~0.7); at the
1200×680 replica scale the blur is proportionally the same as the
reference's eval resolution.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Pinned smoke-scale results (CPU + TPU deterministic loop): stage 1
# measured 0.367, stage 2 measured 0.522, localization 1.0.
# Hardware replica scale (1200×680, 2-stage, 16 frames, real TPU,
# 2026-08-19 /tmp/hwq_r4c/miou_replica.json): mIoU 0.882, localization
# 1.0, AE round-trip cos 0.9975. Replica-scale runs default to the 0.7
# regression lock + >=8 distinct queries / >=8 scored frames (wired below
# from the config path — VERDICT r4 #6).
DEFAULT_MIN_MIOU = {1: 0.25, 2: 0.35}
REPLICA_SCALE_MIN_MIOU = 0.7
DEFAULT_MIN_LOC = 0.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/smoke.yaml")
    ap.add_argument("--stage", type=int, default=2, choices=(1, 2))
    ap.add_argument("--max-frames", type=int, default=12)
    ap.add_argument("--every", type=int, default=3,
                    help="eval/annotation cadence (non-KF frames)")
    ap.add_argument("--feat-hw", type=int, default=24)
    ap.add_argument("--ae-steps", type=int, default=300)
    ap.add_argument("--min-miou", type=float, default=None)
    ap.add_argument("--min-loc", type=float, default=DEFAULT_MIN_LOC)
    ap.add_argument("--min-queries", type=int, default=None,
                    help="minimum distinct queries scored (default 8 at "
                    "replica scale, 1 at smoke scale)")
    ap.add_argument("--min-frames", type=int, default=None,
                    help="minimum frames evaluated (default 8 at replica "
                    "scale, 2 at smoke scale)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-gates", action="store_true")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a JAX platform (CPU runs avoid the "
                    "remote TPU relay for protocol-only checks)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(
        REPO / (".jax_cache_cpu" if args.platform == "cpu" else ".jax_cache")
    ))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from online_lang_splatting_tpu.eval.synthetic_miou import (
        run_synthetic_miou,
    )
    from online_lang_splatting_tpu.slam.config import load_config

    config = load_config(str(REPO / args.config))
    config["language"]["feat_hw"] = args.feat_hw
    config["language"]["allow_zero_supervision"] = False

    t0 = time.time()
    result = run_synthetic_miou(
        config, max_frames=args.max_frames, every=args.every,
        stage=args.stage, train_steps=args.ae_steps,
    )
    # Replica-scale runs carry the pinned 0.7 regression lock plus the
    # reference-protocol breadth requirements (>=8 queries / >=8 frames,
    # evaluate_onlinelangslam.py:305-352 scores many frames x many
    # queries) — smoke-scale runs keep the blur-capped per-stage locks.
    replica_scale = "replica_scale" in args.config
    min_miou = (
        args.min_miou if args.min_miou is not None
        else (REPLICA_SCALE_MIN_MIOU if replica_scale
              else DEFAULT_MIN_MIOU[args.stage])
    )
    min_queries = (
        args.min_queries if args.min_queries is not None
        else (8 if replica_scale else 1)
    )
    min_frames = (
        args.min_frames if args.min_frames is not None
        else (8 if replica_scale else 2)
    )
    result.update(
        wall_s=round(time.time() - t0, 1),
        config=args.config,
        gates={"min_miou": min_miou, "min_loc": args.min_loc,
               "min_queries": min_queries, "min_frames": min_frames},
    )
    ok = (result["miou"] >= min_miou
          and result["localization_acc"] >= args.min_loc
          and result["distinct_queries"] >= min_queries
          and result["frames_scored"] >= min_frames)
    result["gates_ok"] = bool(ok)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    if not ok and not args.no_gates:
        print("MIOU GATES FAILED", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
