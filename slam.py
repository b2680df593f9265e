#!/usr/bin/env python
"""Online Language Splatting SLAM — TPU-native CLI.

Same interface as the reference driver (/root/reference/slam.py:257-303):

    python slam.py --config configs/rgbd/replicav2/room0.yaml [--eval]

Runs RGB-D Gaussian-splatting SLAM with online language mapping on
JAX/XLA/Pallas. `--eval` forces evaluation settings (save results, no GUI,
eval rendering) like the reference.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime
from pathlib import Path

import numpy as np
import yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--weights-dir", type=str, default=None,
                        help="directory of converted .npz model weights")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        help="save a resumable SLAM snapshot every N frames")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume from a ckpt_*.npz snapshot")
    args = parser.parse_args(argv)

    if os.environ.get("OLS_PLATFORM"):
        # The axon sitecustomize force-registers the TPU; honor an explicit
        # CPU request (useful for dev machines / CI).
        import jax

        jax.config.update("jax_platforms", os.environ["OLS_PLATFORM"])

    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.system import SLAM

    config = load_config(args.config)
    if args.eval:
        print("Running MonoGS in Evaluation Mode")
        config["Results"]["save_results"] = True
        config["Results"]["use_gui"] = False
        config["Results"]["eval_rendering"] = True

    save_dir = None
    if config.get("Results", {}).get("save_results", False):
        stamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        base = config["Results"].get("save_dir", "results")
        save_dir = Path(base) / stamp
        save_dir.mkdir(parents=True, exist_ok=True)
        with open(save_dir / "config.yml", "w") as f:
            yaml.dump(config, f)

    lang_extractor = None
    online_ae = None
    if config.get("language", {}).get("language_train", False):
        from online_lang_splatting_tpu.models.checkpoints import (
            load_extractor_from_dir,
        )

        lang_extractor, online_ae = load_extractor_from_dir(
            args.weights_dir, config
        )

    t0 = time.time()
    slam = SLAM(config, lang_extractor=lang_extractor, online_ae=online_ae,
                save_dir=save_dir)
    start_frame = 0
    if args.resume:
        from online_lang_splatting_tpu.slam import checkpoint

        start_frame = checkpoint.load_state(slam, args.resume)
        print(f"Resumed from {args.resume} at frame {start_frame}")
    slam.run(max_frames=args.max_frames, start_frame=start_frame,
             checkpoint_every=args.checkpoint_every)
    print(f"Total FPS: {slam.fps:.2f}")
    if getattr(slam, "phase_times", None):
        total = sum(slam.phase_times.values())
        breakdown = ", ".join(
            f"{k} {v:.1f}s" for k, v in slam.phase_times.items()
        )
        print(f"Phase wall-clock ({total:.1f}s accounted): {breakdown}")
        print(f"Keyframes: {len(slam.frontend.kf_indices)}, "
              f"gaussians: {int(slam.backend.aux.active.sum())}")

    if config.get("Results", {}).get("eval_rendering", False):
        from online_lang_splatting_tpu.slam import evaluation
        from online_lang_splatting_tpu.utils.ply import save_gaussians_ply

        metrics = evaluation.evaluate_run(slam, save_dir)
        print(metrics)
        if save_dir is not None:
            save_gaussians_ply(
                save_dir / "gaussians_final.ply",
                slam.backend.params, slam.backend.aux,
            )
        # 26 000 iterations like the reference (slam_backend.py:769);
        # overridable for smoke runs / quick evals.
        refine_iters = config.get("Results", {}).get(
            "color_refinement_iters", 26000
        )
        slam.finalize(color_refinement_iters=refine_iters)
        metrics_after = evaluation.evaluate_run(slam, save_dir, tag="after_opt")
        print(metrics_after)
        if save_dir is not None:
            save_gaussians_ply(
                save_dir / "gaussians_final_after_opt.ply",
                slam.backend.params, slam.backend.aux,
            )
            if slam.backend.online_ae is not None:
                np.savez(
                    save_dir / "online_ae.npz",
                    **{f"params/{k1}/{k2}": np.asarray(v)
                       for k1, sub in slam.backend.online_ae.params.items()
                       for k2, v in sub.items()},
                )
    return slam


if __name__ == "__main__":
    main()
