#!/usr/bin/env python
"""Replica-scale whole-run benchmark WITH quality gates (VERDICT r2 #8).

Runs the replica-scale synthetic SLAM config on the real chip, records
phase wall-clock + per-frame tracking-iteration stats, and gates on
PSNR / ATE / language-map L1 with pinned thresholds so perf work cannot
silently trade off quality. Emits one JSON line (appended to PERF data).

Usage: python tools/replica_scale_gate.py [--max-frames 40] [--out FILE]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Pinned quality gates for the synthetic replica-scale scene: REGRESSION
# LOCKS against the measured healthy runs (40 frames, reference budgets;
# the loop is deterministic — round-4 tile-32 runs all reproduce
# PSNR 11.41, ATE 0.0077, lang_l1 0.0005 exactly, PERF.md), not quality
# claims. PSNR on this scene is coverage-limited: non-keyframe eval views
# see orbit-edge regions no keyframe observed, which render background.
# Tightened r4 (was 10.0 / 0.02 / 0.005) to lock the achieved level.
GATE_PSNR = 11.0       # rendered non-KF frames vs gt
GATE_ATE = 0.012       # m, keyframe ATE RMSE (scene scale ~5 m)
GATE_LANG_L1 = 0.001   # rendered language map L1 vs supervision cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-frames", type=int, default=40)
    ap.add_argument("--config", type=str,
                    default="configs/synthetic/replica_scale.yaml")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--no-gates", action="store_true",
                    help="record metrics without failing on thresholds")
    ap.add_argument("--motion-model", choices=["static", "cv"], default=None,
                    help="override Training.motion_model (loop A/Bs from "
                    "one fixed tree — VERDICT r4 #2)")
    ap.add_argument("--no-prefetch", action="store_true",
                    help="disable dataset+camera prefetch threads")
    ap.add_argument("--track-best", choices=["on", "off"], default=None,
                    help="override Training.tracking_best_pose (commit "
                    "the argmin-loss tracking iterate)")
    ap.add_argument("--plateau", type=float, default=None,
                    help="override Training.tracking_plateau_rtol (loss-"
                    "plateau tracking exit; 0 = reference parity)")
    ap.add_argument("--tag", type=str, default=None,
                    help="label recorded in the result JSON")
    ap.add_argument("--lr-decay", type=float, default=None,
                    help="override Training.tracking_lr_decay (per-"
                    "iteration tracking Adam lr decay; 1.0 = reference "
                    "parity fixed lr)")
    ap.add_argument("--use-gt-pose", action="store_true",
                    help="track with ground-truth poses (drift diagnosis: "
                    "isolates mapping quality from tracking error)")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("OLS_PLATFORM"):
        # Honor an explicit CPU request (the axon sitecustomize
        # force-registers the TPU) — lets the gate protocol run CPU-side
        # drift studies (configs/synthetic/smoke_drift.yaml) during
        # tunnel outages.
        jax.config.update("jax_platforms", os.environ["OLS_PLATFORM"])
        jax.config.update(
            "jax_compilation_cache_dir", str(REPO / ".jax_cache_cpu")
        )
    else:
        jax.config.update(
            "jax_compilation_cache_dir", str(REPO / ".jax_cache")
        )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from online_lang_splatting_tpu.slam import evaluation
    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.system import SLAM

    config = load_config(args.config)
    if args.motion_model is not None:
        config["Training"]["motion_model"] = args.motion_model
    if args.no_prefetch:
        config["Dataset"]["prefetch"] = False
    if args.track_best is not None:
        config["Training"]["tracking_best_pose"] = args.track_best == "on"
    if args.plateau is not None:
        config["Training"]["tracking_plateau_rtol"] = args.plateau
    if args.lr_decay is not None:
        config["Training"]["tracking_lr_decay"] = args.lr_decay
    if args.use_gt_pose:
        config["Training"]["use_gt_pose"] = True
    t0 = time.time()
    slam = SLAM(config)
    slam.run(max_frames=args.max_frames)
    wall = time.time() - t0

    fe, be = slam.frontend, slam.backend
    n_frames = args.max_frames

    # --- quality ---------------------------------------------------------
    metrics = evaluation.eval_rendering(slam)
    psnr = metrics["mean_psnr"]
    ate = float(evaluation.eval_ate(fe.cameras, fe.kf_indices))
    # Drift curve: ATE over keyframe PREFIXES (each its own umeyama
    # alignment) — shows whether long-horizon error grows gradually
    # (accumulating tracking drift) or jumps (a tracking failure / map
    # event). Pure host math on recorded poses; no device cost.
    kfs_sorted = sorted(fe.kf_indices)
    ate_curve = [
        [int(kfs_sorted[k - 1]),
         round(float(evaluation.eval_ate(fe.cameras, kfs_sorted[:k])), 5)]
        for k in range(3, len(kfs_sorted) + 1)
    ]

    # Language-map L1: render each keyframe's 15-d map and compare to its
    # cached supervision (resized), like the mapping loss does.
    from online_lang_splatting_tpu.models.convnext_clip import resize_bilinear
    from online_lang_splatting_tpu.slam.renderer import activate, render

    inputs = activate(be.params, be.aux.active)
    lang_l1 = []
    for idx in fe.kf_indices:
        cam = be.viewpoints.get(idx)
        if cam is None or cam.gt_lang_feat is None:
            continue
        view = jnp.asarray(cam.world_view_transform)
        out = render(inputs, view, slam.proj, be.settings)
        if out.language.shape[0] == 0:
            continue
        gt = jnp.asarray(cam.gt_lang_feat)
        gt_hw = resize_bilinear(
            jnp.transpose(gt, (1, 2, 0))[None], (cam.height, cam.width)
        )[0]
        lang_l1.append(
            float(jnp.abs(out.language - jnp.transpose(gt_hw, (2, 0, 1)))
                  .mean())
        )
    lang_l1_mean = float(np.mean(lang_l1)) if lang_l1 else float("nan")

    # --- tracking-budget analysis (VERDICT r2 weak #2) ------------------
    iters = np.asarray(fe.track_iters, np.int64)
    track_stats = {
        "frames": int(iters.size),
        "mean_iters": float(iters.mean()) if iters.size else None,
        "median_iters": float(np.median(iters)) if iters.size else None,
        "p90_iters": float(np.percentile(iters, 90)) if iters.size else None,
        "budget": config["Training"]["tracking_itr_num"],
        "budget_hit_frac": float(
            (iters >= config["Training"]["tracking_itr_num"]).mean()
        ) if iters.size else None,
    }

    import os
    import subprocess

    result = {
        "tag": args.tag,
        "head": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True
        ).stdout.strip(),
        "motion_model": config["Training"].get("motion_model", "static"),
        "prefetch": not args.no_prefetch,
        "track_best": bool(
            config["Training"].get("tracking_best_pose", False)
        ),
        "plateau_rtol": float(
            config["Training"].get("tracking_plateau_rtol", 0.0)
        ),
        "lr_decay": float(
            config["Training"].get("tracking_lr_decay", 1.0)
        ),
        "blend_chunk": __import__(
            "online_lang_splatting_tpu.ops.raster.config",
            fromlist=["BLEND_CHUNK"],
        ).BLEND_CHUNK,
        "frames": n_frames,
        "keyframes": len(fe.kf_indices),
        "gaussians": int(np.asarray(be.aux.active).sum()),
        "wall_s": round(wall, 1),
        "fps": round(n_frames / wall, 4),
        "phase_times": {k: round(v, 1)
                        for k, v in slam.phase_times.items()},
        "use_gt_pose": bool(args.use_gt_pose),
        "psnr": round(psnr, 2),
        "ate": round(ate, 5),
        "ate_curve": ate_curve,
        "lang_l1": round(lang_l1_mean, 5),
        "tracking": track_stats,
        "gates": {
            "psnr_min": GATE_PSNR, "ate_max": GATE_ATE,
            "lang_l1_max": GATE_LANG_L1,
        },
    }
    ok = (psnr > GATE_PSNR and ate < GATE_ATE
          and (np.isnan(lang_l1_mean) or lang_l1_mean < GATE_LANG_L1))
    result["gates_ok"] = bool(ok)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    if not ok and not args.no_gates:
        print("QUALITY GATES FAILED", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
