#!/usr/bin/env python
"""Labelme-style GT annotation tooling for Replica semantic renderings.

Counterpart of /root/reference/eval/replica_save_labels.py: reads the
vMAP-layout semantic_config.yaml (id → class name) and semantic_class_*.png
label images, selects the scene's most frequent classes, extracts
per-class contours, and writes labelme-format JSONs
({"info": {...}, "objects": [{category, segmentation, bbox, area}, ...]})
— the format the LERF eval scripts' eval_gt_lerfdata loader consumes
(evaluate_langsplat.py:52-94). `create_replica_labels.py` remains the
mask-npy variant; both formats are accepted by
online_lang_splatting_tpu.eval.lerf_eval.load_annotations.

    python eval/replica_save_labels.py \
        --semantic-config <scene>/imap/00/semantic_config.yaml \
        --frames 5,20,120 --out labels/room0_labelme
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Reference background semantic ids (replica_save_labels.py:10).
BACKGROUND_CLS = [126, 0, 95]


def load_labels(seg_file: str) -> dict[int, str]:
    """semantic_config.yaml → {id: name} (replica_save_labels.py:71-81)."""
    import yaml

    with open(seg_file) as f:
        cfg = yaml.safe_load(f)
    return {int(item["id"]): item["name"] for item in cfg["classes"]}


def get_segmentation_mask(seg_label: np.ndarray):
    masks = []
    for sem_id in np.unique(seg_label):
        if sem_id == 0 or sem_id in BACKGROUND_CLS:
            continue
        masks.append((int(sem_id), seg_label == sem_id))
    return masks


def create_labelme_annotation(seg_label: np.ndarray, id_to_name: dict,
                              user_label_ids=None) -> list[dict]:
    """Per-class contour polygons + bboxes (replica_save_labels.py:32-57)."""
    import cv2

    annotations = []
    for sem_id, mask in get_segmentation_mask(seg_label):
        if user_label_ids is not None and sem_id not in user_label_ids:
            continue
        contours, _ = cv2.findContours(
            mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        for contour in contours:
            segmentation = [pt[0].tolist() for pt in contour]
            x, y, w, h = cv2.boundingRect(contour)
            annotations.append({
                "category": id_to_name[sem_id],
                "group": 1,
                "segmentation": [segmentation],
                "area": float(cv2.contourArea(contour)),
                "bbox": [x, y, x + w, y + h],
                "iscrowd": 0,
                "note": "",
            })
    return annotations


def save_annotations_to_json(info: dict, annotations: list, json_file):
    Path(json_file).parent.mkdir(parents=True, exist_ok=True)
    with open(json_file, "w") as f:
        json.dump({"info": info, "objects": annotations}, f, indent=4)


def get_top_labels(seg_file: str, label_folder: str, top_num: int = 10):
    """Most common classes over every 10th frame
    (replica_save_labels.py:83-110)."""
    import cv2

    id_to_name = load_labels(seg_file)
    counter: Counter = Counter()
    paths = sorted(glob.glob(os.path.join(label_folder, "semantic*.png")))[::10]
    for p in paths:
        seg = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        counter.update(np.unique(seg).tolist())
    out = []
    for label_id, _count in counter.most_common(top_num):
        if label_id in BACKGROUND_CLS:
            continue
        out.append((int(label_id), id_to_name.get(int(label_id), "Unknown")))
    return out


def save_json_labels(seg_file, seg_label, output_json, img_name, img_idx,
                     user_label_names=None) -> bool:
    id_to_name = load_labels(seg_file)
    user_label_ids = None
    if user_label_names is not None:
        user_label_ids = [
            i for i, n in id_to_name.items() if n in user_label_names
        ]
    info = {
        "name": f"{img_name}_{img_idx}.jpg",
        "width": int(seg_label.shape[1]),
        "height": int(seg_label.shape[0]),
        "depth": 3,
        "note": "",
    }
    annotations = create_labelme_annotation(seg_label, id_to_name, user_label_ids)
    if not annotations:
        return False
    save_annotations_to_json(info, annotations, output_json)
    return True


def polygon_to_mask(img_shape, points_list) -> np.ndarray:
    """Rasterize labelme polygons (reference eval/utils.py:83-89)."""
    import cv2

    mask = np.zeros(img_shape, np.uint8)
    for pts in points_list:
        cv2.fillPoly(mask, [np.asarray(pts, np.int32)], 1)
    return mask


def stack_mask(mask_base: np.ndarray, mask_add: np.ndarray) -> np.ndarray:
    return np.logical_or(mask_base, mask_add).astype(mask_base.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--semantic-config", required=True)
    p.add_argument("--label-folder", default=None,
                   help="folder of semantic_class_*.png (default: sibling "
                        "semantic_class/ of the config)")
    p.add_argument("--frames", required=True,
                   help="comma-separated frame indices to annotate")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--scene-name", default="frame")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import cv2

    folder = args.label_folder or str(
        Path(args.semantic_config).parent / "semantic_class"
    )
    top = get_top_labels(args.semantic_config, folder, args.top_k)
    names = [n for _i, n in top]
    print("top classes:", names)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    written = 0
    for idx in (int(x) for x in args.frames.split(",")):
        f = Path(folder) / f"semantic_class_{idx}.png"
        if not f.exists():
            continue
        seg = cv2.imread(str(f), cv2.IMREAD_UNCHANGED)
        ok = save_json_labels(
            args.semantic_config, seg,
            out / f"frame_{idx:05d}.json", args.scene_name, idx,
            user_label_names=names,
        )
        written += int(ok)
    print(f"wrote {written} labelme JSONs to {out}")


if __name__ == "__main__":
    main()
