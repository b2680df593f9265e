#!/usr/bin/env python
"""Colorize Replica GT semantic-class renders for the 3D evaluation.

Counterpart of /root/reference/tsdf-fusion/save_semantic_colors_gt.py:
assign a deterministic random color per semantic id, save the color code
table (color_code.npy, consumed by the 3D eval to map mesh colors back to
class indices) and per-frame colorized PNGs.

    python tsdf-fusion/save_semantic_colors_gt.py \
        --semantic-class-dir <scene>/imap/00/semantic_class --out <dir>
"""

from __future__ import annotations

import argparse
import glob
import os
import random
from pathlib import Path

import numpy as np


def generate_random_colors(n: int, seed: int = 0) -> np.ndarray:
    rng = random.Random(seed)
    return np.array(
        [[rng.randint(0, 255) for _ in range(3)] for _ in range(n)],
        np.uint8,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--semantic-class-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-classes", type=int, default=225)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import cv2

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    colors = generate_random_colors(args.num_classes, args.seed)
    np.save(out.parent / "color_code.npy", colors)

    files = sorted(
        glob.glob(os.path.join(args.semantic_class_dir, "semantic_class_*.png"))
    )
    for f in files:
        sem = cv2.imread(f, cv2.IMREAD_UNCHANGED).astype(int)
        colored = colors[np.clip(sem, 0, args.num_classes - 1)]
        name = Path(f).name.replace("semantic_class", "semantic_color")
        cv2.imwrite(str(out / name), colored[..., ::-1])  # RGB -> BGR
    print(f"colorized {len(files)} frames into {out}; "
          f"color code at {out.parent / 'color_code.npy'}")


if __name__ == "__main__":
    main()
