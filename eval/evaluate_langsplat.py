#!/usr/bin/env python
"""LangSplat-baseline 2D language eval: mIoU + localization accuracy.

Counterpart of /root/reference/eval/evaluate_langsplat.py (440 LoC): runs
the paper's comparison protocol on LangSplat outputs — three feature
levels rendered to per-frame .npy maps ((H, W, code) layout,
`renders_npy`), decoded to 768-d CLIP space through the offline
autoencoder decoder, then scored with the shared LERF relevancy protocol
(mask threshold 0.4, per the reference defaults).

    python eval/evaluate_langsplat.py \
        --root-dir /data/langsplat/room0 --dataset-name room0 \
        --weights-dir <npz dir> [--label-name label] [--mask-thresh 0.4]

or with explicit level dirs:

    python eval/evaluate_langsplat.py \
        --feat-dirs lvl1 lvl2 lvl3 --ann labels/ --weights-dir <npz dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root-dir", default=None,
                   help="LangSplat run root (reference layout: "
                        "<root>/<name>_{1,2,3}/train/ours_None/renders_npy)")
    p.add_argument("--dataset-name", default=None)
    p.add_argument("--label-name", default="label")
    p.add_argument("--feat-dirs", nargs="+", default=None,
                   help="explicit per-level feature dirs (overrides "
                        "--root-dir)")
    p.add_argument("--ann", default=None,
                   help="annotation json or labelme folder (default: "
                        "<root>/<label-name>)")
    p.add_argument("--weights-dir", required=True,
                   help="converted npz weights (autoencoder + clip_text)")
    p.add_argument("--mask-thresh", type=float, default=0.4)
    p.add_argument("--eval-h", type=int, default=480)
    p.add_argument("--eval-w", type=int, default=640)
    p.add_argument("--chw", action="store_true",
                   help="feature .npy stored (C, H, W) instead of "
                        "LangSplat's (H, W, C)")
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.feat_dirs:
        feat_dirs = args.feat_dirs
    else:
        assert args.root_dir and args.dataset_name, (
            "--feat-dirs or (--root-dir + --dataset-name) required"
        )
        feat_dirs = [
            os.path.join(args.root_dir, f"{args.dataset_name}_{i}",
                         "train/ours_None/renders_npy")
            for i in range(1, 4)
        ]
    ann = args.ann or os.path.join(args.root_dir, args.label_name)

    from online_lang_splatting_tpu.eval.lerf_eval import (
        evaluate_scene_multilevel,
    )
    from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy
    from online_lang_splatting_tpu.models.checkpoints import (
        load_extractor_from_dir, load_npz_tree,
    )
    from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer

    extractor, _ = load_extractor_from_dir(
        args.weights_dir, {"language": {"single_stage": True}}
    )
    text_params = load_npz_tree(Path(args.weights_dir) / "clip_text.npz")
    relevancy = CLIPRelevancy(text_params, SimpleTokenizer())

    metrics = evaluate_scene_multilevel(
        feat_dirs, ann, extractor.decode_codes, relevancy,
        eval_size=(args.eval_h, args.eval_w),
        mask_thresh=args.mask_thresh, hwc=not args.chw,
    )
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
