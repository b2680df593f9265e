#!/usr/bin/env python
"""PCA compression baseline — training.

Counterpart of /root/reference/language/autoencoder/pca/train_pca.py:
fit an n-component PCA (default 23, the reference's choice) on saved
768-d CLIP feature labels and save the model. sklearn/joblib are
replaced by the repo's own IncrementalPCA (models/autoencoder.py) and a
plain npz — no extra dependencies and streaming-friendly (the reference
loads every file into RAM at once).

    python language/autoencoder/pca/train_pca.py \
        --feat-dirs dirA dirB --every 9 --components 23 \
        --out pca_model_23.npz
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
    p.add_argument("--feat-dirs", nargs="+", required=True)
    p.add_argument("--every", type=int, default=9,
                   help="use every Nth feature file (reference default)")
    p.add_argument("--components", type=int, default=23)
    p.add_argument("--out", default="pca_model_23.npz")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from online_lang_splatting_tpu.models.autoencoder import IncrementalPCA

    files = []
    for d in args.feat_dirs:
        lst = sorted(glob.glob(os.path.join(d, "*.npy")))[:: args.every]
        files.extend(lst)
        print(f"{d}: {len(lst)} files")
    if not files:
        raise FileNotFoundError("no feature files found")

    pca = IncrementalPCA(n_components=args.components)
    for i, f in enumerate(files):
        fm = np.load(f)  # (768, H, W) or (N, 768)
        feats = fm.reshape(fm.shape[0], -1).T if fm.ndim == 3 else fm
        pca.partial_fit(feats.astype(np.float32))
        if i % 10 == 0:
            print(f"fitted {i + 1}/{len(files)}")

    np.savez(
        args.out,
        mean=np.asarray(pca.mean),
        components=np.asarray(pca.components),
        n_components=args.components,
    )
    print(f"saved PCA model to {args.out}")


if __name__ == "__main__":
    main()
