#!/usr/bin/env python
"""PCA compression baseline — round-trip evaluation + query heatmaps.

Counterpart of /root/reference/language/autoencoder/pca/test_pca.py:
load the trained PCA model, compress→reconstruct saved 768-d feature
maps, report reconstruction error, and (given converted CLIP text
weights) save turbo relevancy heatmaps for a text query on the
reconstructed features.

    python language/autoencoder/pca/test_pca.py --model pca_model_23.npz \
        --features <dir> [--query vase --weights-dir <npz dir>] --out out/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--every", type=int, default=10)
    p.add_argument("--query", default=None)
    p.add_argument("--weights-dir", default=None,
                   help="converted clip_text.npz dir (for --query heatmaps)")
    p.add_argument("--out", default="pca_eval")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    model = np.load(args.model)
    mean, components = model["mean"], model["components"]

    text_emb = None
    if args.query and args.weights_dir:
        from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy
        from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
        from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer

        rel = CLIPRelevancy(
            load_npz_tree(Path(args.weights_dir) / "clip_text.npz"),
            SimpleTokenizer(),
        )
        text_emb = np.asarray(rel._encode([args.query]))[0]
        text_emb = text_emb / np.linalg.norm(text_emb)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.features, "*.npy")))[:: args.every]
    mses, coss = [], []
    for f in files:
        fm = np.load(f).astype(np.float32)
        c, h, w = fm.shape if fm.ndim == 3 else (fm.shape[1], 0, 0)
        flat = fm.reshape(c, -1).T if fm.ndim == 3 else fm
        z = (flat - mean) @ components.T
        rec = z @ components + mean
        mses.append(float(np.mean((rec - flat) ** 2)))
        denom = (
            np.linalg.norm(rec, axis=-1) * np.linalg.norm(flat, axis=-1) + 1e-9
        )
        coss.append(float(np.mean(np.sum(rec * flat, -1) / denom)))
        print(f"{Path(f).name}: mse {mses[-1]:.5f} cos {coss[-1]:.4f}")
        if text_emb is not None and h:
            sim = rec / (np.linalg.norm(rec, axis=-1, keepdims=True) + 1e-9)
            sim = (sim @ text_emb).reshape(h, w)
            sim = (sim - sim.min()) / max(sim.max() - sim.min(), 1e-9)
            sys.path.insert(
                0, str(Path(__file__).resolve().parents[3] / "eval")
            )
            from colormaps import ColormapOptions, colormap_saving

            colormap_saving(
                sim, ColormapOptions("turbo"),
                out / f"{Path(f).stem}_heatmap.png",
            )
    print(f"\nmean mse {np.mean(mses):.5f}  mean cos {np.mean(coss):.4f} "
          f"over {len(files)} files")


if __name__ == "__main__":
    main()
