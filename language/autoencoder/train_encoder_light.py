#!/usr/bin/env python
"""Offline language-autoencoder training.

Replaces the reference Lightning trainer
(/root/reference/language/autoencoder/train_encoder_light.py:14-85):
loads 768×192×192 .npy feature labels, bilinear-resizes to 24×24
(dataset.py:8-27), and trains the MLP autoencoder with l2 + 0.001·(1-cos)
under AdamW + warmup/cosine. Multi-GPU Lightning DDP becomes a
data-parallel mesh over all local TPU chips (jax.sharding + shard_map).

    python language/autoencoder/train_encoder_light.py \
        --data-dir <dir with *_f.npy> --out ae.npz \
        [--encoder-dims 384,192,96,48,24,15] [--epochs 150]
"""

from __future__ import annotations

import argparse
import glob
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def load_labels(data_dir: str, target: int = 24) -> np.ndarray:
    """Each label (768, 192, 192) → (target², 768) vectors, stacked."""
    import cv2

    out = []
    for f in sorted(glob.glob(f"{data_dir}/*.npy")):
        feat = np.load(f)
        if feat.ndim != 3 or feat.shape[0] != 768:
            continue
        small = cv2.resize(
            feat.transpose(1, 2, 0), (target, target),
            interpolation=cv2.INTER_LINEAR,
        )
        out.append(small.reshape(-1, 768))
    if not out:
        raise FileNotFoundError(f"no (768,H,W) .npy labels in {data_dir}")
    return np.concatenate(out, axis=0).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--encoder-dims", default="384,192,96,48,24,15")
    p.add_argument("--decoder-dims", default="24,48,96,192,384,384,768")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models import autoencoder as AE

    data = load_labels(args.data_dir)
    print(f"{len(data)} feature vectors")
    enc = tuple(int(x) for x in args.encoder_dims.split(","))
    dec = tuple(int(x) for x in args.decoder_dims.split(","))
    model = AE.AutoencoderMLP(encoder_dims=enc, decoder_dims=dec)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, data.shape[1])), train=True
    )
    optimizer = AE.make_offline_optimizer(args.lr)
    opt_state = optimizer.init(variables["params"])
    step = jax.jit(AE.offline_train_step(model, optimizer))

    n_dev = len(jax.devices())
    bs = args.batch_size - (args.batch_size % max(n_dev, 1))
    steps_per_epoch = max(len(data) // bs, 1)
    t0 = time.time()
    for epoch in range(args.epochs):
        perm = rng.permutation(len(data))
        losses = []
        for s in range(steps_per_epoch):
            batch = jnp.asarray(data[perm[s * bs : (s + 1) * bs]])
            variables, opt_state, loss = step(variables, opt_state, batch)
            losses.append(float(loss))
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss {np.mean(losses):.6f} "
                  f"({time.time() - t0:.0f}s)")

    # Save in the converter's npz-tree format.
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("params", variables["params"])
    rec("batch_stats", variables["batch_stats"])
    np.savez(args.out, **flat)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
