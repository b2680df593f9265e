#!/usr/bin/env python
"""Generate the vendored `sample/demo_room.jpg` demo asset.

The reference ships an in-repo test photo (`sample/replica_room0.jpg`,
reference README.md:81) that its feature-demo command runs on. This repo
vendors an ORIGINAL image instead: a frame of the synthetic analytic
room scene (slam/datasets.py SyntheticDataset — textured wall + floor),
rendered at the Replica camera geometry (1200x680), so the documented
`language/language_features.py` example works in a bare checkout with no
external data or licensing concerns.

Deterministic: re-running reproduces the committed asset byte-for-byte
(fixed seed, fixed PIL JPEG encoder settings).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from online_lang_splatting_tpu.slam.datasets import SyntheticDataset


def main() -> None:
    cfg = {
        "Dataset": {
            "dataset_path": "<synthetic>",
            "num_frames": 8,
            "seed": 7,
            "Calibration": {
                # Replica camera geometry (reference configs).
                "fx": 600.0, "fy": 600.0, "cx": 599.5, "cy": 339.5,
                "width": 1200, "height": 680,
                "depth_scale": 6553.5, "distorted": False,
            },
        },
    }
    ds = SyntheticDataset(cfg)
    color, _depth, _pose, _gt, _mask = ds[3]  # mid-orbit view: both surfaces
    img = (np.clip(np.transpose(color, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
    out = Path(__file__).resolve().parents[1] / "sample" / "demo_room.jpg"
    out.parent.mkdir(exist_ok=True)
    Image.fromarray(img).save(out, quality=92)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
