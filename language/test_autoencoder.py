#!/usr/bin/env python
"""Autoencoder round-trip checker.

Counterpart of /root/reference/language/test_autoencoder.py (275 LoC):
load an autoencoder checkpoint, push saved 768-d CLIP feature labels
(*_f.npy, (768, H, W) or flat (N, 768)) through encode→decode, and report
reconstruction quality — per-file L2 and cosine similarity, plus optional
side-by-side PCA visualizations of the original vs reconstructed maps.
Two-stage mode additionally round-trips through the online 32↔15 codec.

    python language/test_autoencoder.py --weights-dir <npz dir> \
        --features labels/  [--online-ae online_ae.npz] [--viz out/]
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
    p.add_argument("--weights-dir", required=True,
                   help="directory with autoencoder.npz (convert_weights.py)")
    p.add_argument("--features", required=True,
                   help="directory of 768-d feature .npy labels")
    p.add_argument("--online-ae", default=None,
                   help="two-stage: online 32<->15 codec npz")
    p.add_argument("--limit", type=int, default=16)
    p.add_argument("--viz", default=None,
                   help="write original/reconstructed PCA PNGs here")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models.checkpoints import (
        OnlineAETrainer, load_extractor_from_dir, load_npz_tree,
    )

    single_stage = args.online_ae is None
    extractor, _ = load_extractor_from_dir(
        args.weights_dir, {"language": {"single_stage": single_stage}}
    )
    online = None
    if args.online_ae:
        online = OnlineAETrainer()
        online.params = load_npz_tree(args.online_ae)["params"]

    files = sorted(glob.glob(str(Path(args.features) / "*.npy")))[: args.limit]
    if not files:
        raise FileNotFoundError(f"no .npy under {args.features}")

    from online_lang_splatting_tpu.models.autoencoder import AutoencoderMLP

    def roundtrip(flat768):
        codes = extractor.ae.apply(
            extractor.ae_variables, jnp.asarray(flat768),
            method=AutoencoderMLP.encode,
        )
        if online is not None:
            # Two-stage: 768→32 offline, 32→15→32 online codec, 32→768.
            from online_lang_splatting_tpu.models.autoencoder import (
                EncoderDecoderOnline,
            )

            low15 = online.model.apply(
                {"params": online.params}, codes,
                method=EncoderDecoderOnline.encode,
            )
            codes = online.decode(low15)
        rec = extractor.decode_codes(codes)
        return np.asarray(rec)

    l2s, coss = [], []
    for i, f in enumerate(files):
        arr = np.load(f).astype(np.float32)
        if arr.ndim == 3:  # (768, H, W)
            c, h, w = arr.shape
            flat = arr.reshape(c, -1).T
        else:
            flat = arr
            h = w = None
        rec = roundtrip(flat)
        l2 = float(np.mean(np.sum((rec - flat) ** 2, -1)))
        denom = (
            np.linalg.norm(rec, axis=-1) * np.linalg.norm(flat, axis=-1) + 1e-9
        )
        cos = float(np.mean(np.sum(rec * flat, -1) / denom))
        l2s.append(l2)
        coss.append(cos)
        print(f"{Path(f).name}: l2 {l2:.5f}  cos {cos:.4f}")
        if args.viz and h is not None:
            import cv2

            sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "eval"))
            from colormaps import apply_pca_colormap

            out = Path(args.viz)
            out.mkdir(parents=True, exist_ok=True)
            both = np.concatenate([
                apply_pca_colormap(flat.reshape(h, w, -1)),
                apply_pca_colormap(rec.reshape(h, w, -1)),
            ], axis=1)
            cv2.imwrite(
                str(out / f"{Path(f).stem}_roundtrip.png"),
                (both[..., ::-1] * 255).astype(np.uint8),
            )

    print(f"\nmean l2 {np.mean(l2s):.5f}  mean cos {np.mean(coss):.4f} "
          f"over {len(files)} files")
    return {"mean_l2": float(np.mean(l2s)), "mean_cos": float(np.mean(coss))}


if __name__ == "__main__":
    main()
