#!/usr/bin/env python
"""Generate 768-d dense CLIP feature labels for a folder of images.

Equivalent of the reference label generator
(/root/reference/language/save_labels.py:83-318): runs the SED dense
encoder + HR refinement over every image and saves {stem}_f.npy feature
maps (768, 192, 192) for offline autoencoder training, plus optional PCA
previews.

    python language/save_labels.py --input-dir imgs/ --output-dir labels/ \
        --weights-dir <converted npz dir> [--every 1] [--visualize]
"""

from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--every", type=int, default=1)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from online_lang_splatting_tpu.models.checkpoints import (
        load_extractor_from_dir,
    )

    extractor, _ = load_extractor_from_dir(
        args.weights_dir, {"language": {"single_stage": True}}
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = sorted(
        glob.glob(f"{args.input_dir}/*.png") + glob.glob(f"{args.input_dir}/*.jpg")
    )[:: args.every]
    for i, path in enumerate(paths):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32)
        feat = extractor.hr_features(jnp.asarray(img))  # (192, 192, 768)
        stem = Path(path).stem
        np.save(out_dir / f"{stem}_f.npy", np.asarray(feat).transpose(2, 0, 1))
        if args.visualize:
            from language.language_features import pca_colormap

            pca = (pca_colormap(np.asarray(feat)) * 255).astype(np.uint8)
            Image.fromarray(pca).save(out_dir / f"{stem}_pca.png")
        if i % 20 == 0:
            print(f"{i + 1}/{len(paths)}")
    print(f"wrote {len(paths)} labels to {out_dir}")


if __name__ == "__main__":
    main()
