#!/usr/bin/env python
"""Create GT query annotations from Replica semantic renderings.

Port of the reference tooling (/root/reference/eval/create_replica_labels.py
+ replica_save_labels.py): picks the fixed seed frames, reads
semantic_class_{i}.png label images, selects the top-K most frequent
classes of the scene, and writes per-frame masks + bboxes for the LERF
2D evaluation.

Output: <out>/ann.json  — {frame: {class: {mask_file, bboxes}}} with
per-class boolean masks stored as .npy next to it (labelme-polygon JSONs
don't round-trip large masks well; evaluate_scene consumes this format).

    python eval/create_replica_labels.py \
        --semantic-config <scene>/semantic_config.yaml \
        --frames 5,20,120,270,... --out labels/room0
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Reference seed frames (create_replica_labels.py:57-58).
DEFAULT_FRAMES = [5, 20, 120, 270, 340, 410, 490, 560, 630, 700, 780, 850,
                  920, 1050, 1410, 1850]


def load_class_names(semantic_config: str) -> dict[int, str]:
    import yaml

    with open(semantic_config) as f:
        cfg = yaml.safe_load(f)
    names = {}
    for cls in cfg.get("classes", []):
        names[int(cls["id"])] = cls["name"]
    return names


def get_top_labels(class_names, seg_dir: Path, k: int = 10,
                   ignore=("wall", "floor", "ceiling", "undefined", "")):
    counts: Counter = Counter()
    for f in sorted(seg_dir.glob("semantic_class_*.png"))[::10]:
        import cv2

        seg = cv2.imread(str(f), cv2.IMREAD_UNCHANGED)
        ids, c = np.unique(seg, return_counts=True)
        for i, n in zip(ids, c):
            name = class_names.get(int(i), "")
            if name not in ignore:
                counts[int(i)] += int(n)
    return [cid for cid, _ in counts.most_common(k)]


def masks_to_bboxes(mask: np.ndarray, min_area: int = 64) -> list[list[int]]:
    import cv2

    n, comp = cv2.connectedComponents(mask.astype(np.uint8))
    boxes = []
    for i in range(1, n):
        ys, xs = np.nonzero(comp == i)
        if len(xs) < min_area:
            continue
        boxes.append([int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())])
    return boxes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--semantic-config", required=True)
    p.add_argument("--frames", default=",".join(map(str, DEFAULT_FRAMES)))
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import cv2

    seg_dir = Path(args.semantic_config).parent / "semantic_class"
    class_names = load_class_names(args.semantic_config)
    top = get_top_labels(class_names, seg_dir, args.top_k)
    print("top classes:", [class_names[i] for i in top])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ann = {}
    for idx in (int(x) for x in args.frames.split(",")):
        f = seg_dir / f"semantic_class_{idx}.png"
        if not f.exists():
            continue
        seg = cv2.imread(str(f), cv2.IMREAD_UNCHANGED).astype(np.int32)
        frame_key = f"{idx:05d}"
        frame_ann = {}
        for cid in top:
            mask = seg == cid
            if mask.sum() < 256:
                continue
            name = class_names[cid]
            mask_file = f"{frame_key}_{name}.npy"
            np.save(out / mask_file, mask)
            frame_ann[name] = {
                "mask_file": mask_file,
                "bboxes": masks_to_bboxes(mask),
            }
        if frame_ann:
            ann[frame_key] = frame_ann
    (out / "ann.json").write_text(json.dumps(ann, indent=2))
    print(f"wrote {len(ann)} annotated frames to {out / 'ann.json'}")


if __name__ == "__main__":
    main()
