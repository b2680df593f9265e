#!/usr/bin/env python
"""Plug-and-play dense language feature extraction demo.

Same interface as the reference demo
(/root/reference/language/language_features.py:344-421):

    python language/language_features.py \
        --high-res-model <hr_net.npz> --lang-model <weights_dir> \
        --input sample/demo_room.jpg --query-text vase \
        [--output-dir out] [--no-visualize]

Loads the fused extractor (ConvNeXt-L dense CLIP → HR head), extracts the
192×192×768 feature map, saves it as .npy, and renders a PCA
visualization plus a text-query relevancy heatmap through the CLIP text
tower (requires converted text weights + the BPE vocab asset).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pca_colormap(feat: np.ndarray) -> np.ndarray:
    """(H, W, C) features → (H, W, 3) PCA projection in [0, 1] via the
    shared eval colormaps module (reference eval/colormaps.py:176-215)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "eval"))
    from colormaps import apply_pca_colormap

    return apply_pca_colormap(feat)


def main():
    p = argparse.ArgumentParser(description="Language Feature Visualization Tool")
    p.add_argument("--high-res-model", type=str, default=None,
                   help="converted hr_net.npz (or a weights dir)")
    p.add_argument("--lang-model", type=str, default=None,
                   help="directory of converted npz weights")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--query-text", type=str, default="teddybear")
    p.add_argument("--no-visualize", action="store_true")
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--bf16", action="store_true",
                   help="half-precision conv towers (~1.8x throughput)")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
    from online_lang_splatting_tpu.models.sed import LangFeatureExtractor

    weights_dir = args.lang_model
    visual = hr = ae = None
    if weights_dir and Path(weights_dir).is_dir():
        d = Path(weights_dir)
        if (d / "clip_visual.npz").exists():
            visual = load_npz_tree(d / "clip_visual.npz")
        if (d / "autoencoder.npz").exists():
            ae = load_npz_tree(d / "autoencoder.npz")
    if args.high_res_model and Path(args.high_res_model).exists():
        hr_path = Path(args.high_res_model)
        if hr_path.is_dir():
            hr_path = hr_path / "hr_net.npz"
        hr = load_npz_tree(hr_path)
    if visual is None:
        print("[language_features] no converted weights; using random init "
              "(feature maps will be untrained)")

    import jax.numpy as _jnp

    extractor = LangFeatureExtractor(
        visual_params=visual, hr_variables=hr, ae_variables=ae,
        compute_dtype=_jnp.bfloat16 if args.bf16 else None,
    )

    img = np.asarray(Image.open(args.input).convert("RGB"), np.float32)
    t0 = time.time()
    hr_feat = extractor.hr_features(jnp.asarray(img))
    hr_feat.block_until_ready()
    print(f"Extracted {tuple(hr_feat.shape)} features in "
          f"{(time.time() - t0) * 1000:.1f} ms (incl. compile)")
    t0 = time.time()
    hr_feat = extractor.hr_features(jnp.asarray(img))
    hr_feat.block_until_ready()
    dt = time.time() - t0
    print(f"Steady-state: {dt * 1000:.1f} ms ({1 / dt:.1f} FPS)")

    out_dir = Path(args.output_dir or Path(args.input).parent)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.input).stem
    np.save(out_dir / f"{stem}_f.npy",
            np.asarray(hr_feat).transpose(2, 0, 1))
    print(f"Saved features to {out_dir / f'{stem}_f.npy'}")

    if not args.no_visualize:
        pca = (pca_colormap(np.asarray(hr_feat)) * 255).astype(np.uint8)
        Image.fromarray(pca).save(out_dir / f"{stem}_pca.png")
        print(f"Saved PCA visualization to {out_dir / f'{stem}_pca.png'}")

        # Text-query heatmap (needs text tower weights + BPE vocab).
        text_path = weights_dir and Path(weights_dir) / "clip_text.npz"
        try:
            from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy
            from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer

            if text_path and text_path.exists():
                text_params = load_npz_tree(text_path)
            else:
                # Bare checkout: random-init text tower so the demo's
                # full pipeline (tokenize → encode → relevancy → heatmap)
                # still runs; the heatmap is untrained noise until real
                # converted weights are supplied.
                print("No clip_text.npz — heatmap uses a random-init "
                      "text tower (untrained)")
                from online_lang_splatting_tpu.models.text_tower import (
                    TextTower,
                )

                text_params = TextTower().init(
                    jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
                )["params"]
            rel = CLIPRelevancy(text_params, SimpleTokenizer())
            rel.set_positives([args.query_text])
            feat_n = np.asarray(hr_feat)
            feat_n = feat_n / np.maximum(
                np.linalg.norm(feat_n, axis=-1, keepdims=True), 1e-9
            )
            relev = np.asarray(rel.get_max_across(feat_n[None]))[0, 0]
            heat = (relev - relev.min()) / (np.ptp(relev) + 1e-9)
            Image.fromarray((heat * 255).astype(np.uint8)).save(
                out_dir / f"{stem}_heatmap_{args.query_text}.png"
            )
            print(f"Saved '{args.query_text}' heatmap")
        except FileNotFoundError as e:
            print(f"Skipping heatmap: {e}")


if __name__ == "__main__":
    main()
