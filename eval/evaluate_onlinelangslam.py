#!/usr/bin/env python
"""2D language eval (two-stage pipeline): mIoU + localization accuracy.

Interface mirrors /root/reference/eval/evaluate_onlinelangslam.py: decodes
rendered 15-d language maps through the online 15→32 decoder and the
offline 32→768 decoder, then runs the LERF relevancy protocol against
annotated ground truth.

    python eval/evaluate_onlinelangslam.py --feat-dir run/lang \
        --ann ann.json --weights-dir <npz dir> --online-ae online_ae.npz
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(single_stage: bool = False):
    p = argparse.ArgumentParser()
    p.add_argument("--feat-dir", required=True,
                   help="directory of rendered lang/{idx}.npy maps")
    p.add_argument("--ann", required=True, help="annotation json")
    p.add_argument("--weights-dir", required=True)
    p.add_argument("--online-ae", default=None)
    p.add_argument("--mask-thresh", type=float, default=0.5)
    p.add_argument("--eval-h", type=int, default=480)
    p.add_argument("--eval-w", type=int, default=640)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from online_lang_splatting_tpu.eval.lerf_eval import evaluate_scene
    from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy
    from online_lang_splatting_tpu.models.checkpoints import (
        load_extractor_from_dir, load_npz_tree,
    )
    from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer

    extractor, _ = load_extractor_from_dir(
        args.weights_dir, {"language": {"single_stage": single_stage}}
    )
    online_ae = None
    if not single_stage and args.online_ae:
        from online_lang_splatting_tpu.models.checkpoints import OnlineAETrainer
        import jax.numpy as jnp

        online_ae = OnlineAETrainer()
        tree = load_npz_tree(args.online_ae)
        online_ae.params = tree["params"]

    text_params = load_npz_tree(Path(args.weights_dir) / "clip_text.npz")
    relevancy = CLIPRelevancy(text_params, SimpleTokenizer())

    metrics = evaluate_scene(
        args.feat_dir, args.ann, extractor, relevancy, online_ae,
        eval_size=(args.eval_h, args.eval_w), mask_thresh=args.mask_thresh,
    )
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
