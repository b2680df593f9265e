"""LERF-protocol 2D evaluation: query IoU + localization accuracy.

Port of the reference evaluation pipeline
(/root/reference/eval/evaluate_onlinelangslam.py:107-237 and
evaluate_langslam.py): rendered low-dim language maps are decoded back to
768-d CLIP space (1-stage AE decode, or 15→32 online decode then 32→768),
relevancy maps are computed per query, 30×30 box-blur smoothed and
0.5-blended, normalized to [-1, 1]-clipped masks at `thresh`, mode-filter
smoothed, and scored as IoU vs GT masks; localization checks whether the
smoothed-activation argmax lands in a GT bbox.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .relevancy import CLIPRelevancy


def box_blur(x: np.ndarray, scale: int = 30) -> np.ndarray:
    """cv2.filter2D equivalent (reflect_101 border, uniform kernel)."""
    import cv2

    kernel = np.ones((scale, scale), np.float32) / (scale * scale)
    return cv2.filter2D(x.astype(np.float32), -1, kernel)


def mode_smooth(mask: np.ndarray, scale: int = 3) -> np.ndarray:
    """Majority filter over (2·scale+1) neighborhoods (reference
    eval/utils.py smooth; vectorized)."""
    import cv2

    k = 2 * scale + 1
    # Binary mask: majority vote == box filter > 0.5 (faster than bincount).
    counts = cv2.boxFilter(
        mask.astype(np.float32), -1, (k, k), normalize=True,
        borderType=cv2.BORDER_CONSTANT,
    )
    return (counts > 0.5).astype(np.uint8)


def activate_stream(
    sem_map: np.ndarray,
    relevancy: CLIPRelevancy,
    img_ann: dict,
    thresh: float = 0.5,
):
    """sem_map (levels, H, W, 768) → (per-query IoU list, chosen levels)."""
    # np.array (copy): np.asarray of a device array is a READ-ONLY view,
    # and this function writes the blur blend back into valid_map.
    valid_map = np.array(relevancy.get_max_across(sem_map))
    n_head, n_prompt, h, w = valid_map.shape
    chosen_iou, chosen_lvl = [], []
    for k in range(n_prompt):
        iou_lvl = np.zeros(n_head)
        for i in range(n_head):
            avg = box_blur(valid_map[i, k])
            valid_map[i, k] = 0.5 * (avg + valid_map[i, k])
            output = valid_map[i, k] - valid_map[i, k].min()
            output = output / (output.max() + 1e-9)
            output = np.clip(output * 2.0 - 1.0, 0, 1)
            mask_pred = mode_smooth((output > thresh).astype(np.uint8))
            mask_gt = _resize_mask(
                img_ann[relevancy.positives[k]]["mask"].astype(np.uint8), w, h
            )
            intersection = np.logical_and(mask_gt, mask_pred).sum()
            union = np.logical_or(mask_gt, mask_pred).sum()
            iou_lvl[i] = intersection / max(union, 1)
        score_lvl = valid_map[:, k].reshape(n_head, -1).max(axis=1)
        lvl = int(np.argmax(score_lvl))
        chosen_iou.append(iou_lvl[lvl])
        chosen_lvl.append(lvl)
    return chosen_iou, chosen_lvl


def lerf_localization(sem_map: np.ndarray, relevancy: CLIPRelevancy,
                      img_ann: dict) -> int:
    """Count queries whose smoothed-relevancy argmax lies in a GT bbox."""
    valid_map = np.asarray(relevancy.get_max_across(sem_map))
    n_head, n_prompt, h, w = valid_map.shape
    acc_num = 0
    positives = list(img_ann.keys())
    for k in range(n_prompt):
        avg = np.stack(
            [box_blur(valid_map[i, k]) for i in range(n_head)], axis=-1
        )
        score_lvl = avg.reshape(-1, n_head).max(axis=0)
        head = int(np.argmax(score_lvl))
        m = avg[..., head]
        coords = np.argwhere(m == m.max())[:, ::-1]  # (x, y)
        # Bboxes are in the annotation's native pixel coordinates; the
        # relevancy map is at the (possibly different) eval resolution —
        # rescale boxes into map coordinates before the containment test.
        ann_h, ann_w = np.asarray(img_ann[positives[k]]["mask"]).shape[:2]
        sx, sy = w / max(ann_w, 1), h / max(ann_h, 1)
        hit = False
        for box in np.asarray(img_ann[positives[k]]["bboxes"]).reshape(-1, 4):
            x1, y1, x2, y2 = box[0] * sx, box[1] * sy, box[2] * sx, box[3] * sy
            x_min, x_max = min(x1, x2), max(x1, x2)
            y_min, y_max = min(y1, y2), max(y1, y2)
            for cx, cy in coords:
                if x_min <= cx <= x_max and y_min <= cy <= y_max:
                    acc_num += 1
                    hit = True
                    break
            if hit:
                break
    return acc_num


def _resize_mask(mask, w, h):
    import cv2

    return cv2.resize(mask, (w, h))


def decode_lang_map(lang_map: np.ndarray, extractor, online_ae=None,
                    out_hw=None):
    """(L, H, W) rendered low-dim map → (H', W', 768) CLIP-space map.

    1-stage: AE decode 15→768. 2-stage: online decode 15→32 then AE
    decode 32→768 (evaluate_onlinelangslam.py:267-275)."""
    import jax.numpy as jnp

    l, h, w = lang_map.shape
    flat = jnp.asarray(lang_map).reshape(l, -1).T  # (HW, L)
    if online_ae is not None:
        flat = online_ae.decode(flat)
    dec = extractor.decode_codes(flat)  # (HW, 768)
    out = np.asarray(dec).reshape(h, w, -1)
    if out_hw is not None and out_hw != (h, w):
        import cv2

        out = cv2.resize(out, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    return out


def load_annotations(ann_path) -> dict:
    """Load GT annotations from either supported format:

    * our consolidated `ann.json` ({frame: {label: {mask_file|mask,
      bboxes}}}, eval/create_replica_labels.py), or
    * a folder of labelme-style `frame_XXXXX.json` files with polygon
      segmentations (eval/replica_save_labels.py — the reference
      eval_gt_lerfdata input, evaluate_langsplat.py:52-94).

    Returns {frame_key: {label: {"mask": bool (H,W), "bboxes": (N,4)}}}.
    """
    ann_path = Path(ann_path)
    if ann_path.is_dir():
        anns: dict = {}
        for js in sorted(ann_path.glob("*.json")):
            data = json.loads(js.read_text())
            if "objects" not in data:
                continue
            h, w = data["info"]["height"], data["info"]["width"]
            name = data["info"]["name"]
            idx = int(name.split("_")[-1].split(".")[0])
            frame: dict = {}
            for obj in data["objects"]:
                label = obj["category"]
                mask = _polygons_to_mask((h, w), obj["segmentation"])
                box = np.asarray(obj["bbox"], np.float32).reshape(-1, 4)
                if label in frame:
                    frame[label]["mask"] = np.logical_or(
                        frame[label]["mask"], mask
                    )
                    frame[label]["bboxes"] = np.concatenate(
                        [frame[label]["bboxes"], box]
                    )
                else:
                    frame[label] = {"mask": mask.astype(bool), "bboxes": box}
            anns[f"{idx:05d}"] = frame
        return anns
    anns = json.loads(ann_path.read_text())
    for frame_ann in anns.values():
        for q in frame_ann.values():
            if "mask_file" in q and "mask" not in q:
                q["mask"] = np.load(ann_path.parent / q["mask_file"])
            q["mask"] = np.asarray(q["mask"])
            q["bboxes"] = np.asarray(q["bboxes"])
    return anns


def _polygons_to_mask(shape, points_list):
    import cv2

    mask = np.zeros(shape, np.uint8)
    for pts in points_list:
        cv2.fillPoly(mask, [np.asarray(pts, np.int32)], 1)
    return mask


def evaluate_scene(
    lang_dir: str,
    ann_path: str,
    extractor,
    relevancy: CLIPRelevancy,
    online_ae=None,
    eval_size=(480, 640),
    mask_thresh: float = 0.5,
):
    """Scene-level mIoU / localization accuracy over annotated frames.

    lang_dir holds rendered {idx}.npy (L, H, W) maps; ann_path holds
    annotations in either supported format (see load_annotations)."""
    lang_dir = Path(lang_dir)
    anns = load_annotations(ann_path)
    iou_all, acc, total = [], 0, 0
    distinct, frames_scored = set(), 0
    for frame_name, img_ann in anns.items():
        f = lang_dir / f"{frame_name}.npy"
        if not f.exists():
            continue
        lang_map = np.load(f)
        clip_map = decode_lang_map(lang_map, extractor, online_ae, eval_size)
        sem_map = clip_map[None]  # single level
        relevancy.set_positives(list(img_ann.keys()))
        ious, _ = activate_stream(sem_map, relevancy, img_ann, mask_thresh)
        iou_all.extend(ious)
        acc += lerf_localization(sem_map, relevancy, img_ann)
        total += len(img_ann)
        distinct.update(img_ann.keys())
        frames_scored += 1
    return {
        "miou": float(np.mean(iou_all)) if iou_all else float("nan"),
        "localization_acc": acc / max(total, 1),
        "num_queries": total,
        "distinct_queries": len(distinct),
        "frames_scored": frames_scored,
    }


def evaluate_scene_multilevel(
    feat_dirs,
    ann_path: str,
    decode_fn,
    relevancy: CLIPRelevancy,
    eval_size=(480, 640),
    mask_thresh: float = 0.4,
    hwc: bool = True,
):
    """LangSplat-protocol eval: one rendered-feature dir PER LEVEL
    (reference evaluate_langsplat.py:227-290). Each frame's levels are
    decoded to CLIP space via `decode_fn((HW, code) → (HW, 768))`, stacked
    into (levels, H, W, 768), and scored with the shared LERF relevancy
    protocol; `hwc` selects LangSplat's (H, W, C) .npy layout vs our
    (C, H, W)."""
    import cv2

    anns = load_annotations(ann_path)
    feat_dirs = [Path(d) for d in feat_dirs]
    h, w = eval_size
    iou_all, acc, total = [], 0, 0
    distinct, frames_scored = set(), 0
    for frame_name, img_ann in anns.items():
        levels = []
        for d in feat_dirs:
            f = d / f"{frame_name}.npy"
            if not f.exists():
                f = d / f"{int(frame_name)}.npy"
            if not f.exists():
                break
            arr = np.load(f)
            if not hwc:
                arr = arr.transpose(1, 2, 0)
            if arr.shape[:2] != (h, w):
                arr = cv2.resize(arr, (w, h), interpolation=cv2.INTER_LINEAR)
            dec = np.asarray(decode_fn(arr.reshape(-1, arr.shape[-1])))
            levels.append(dec.reshape(h, w, -1))
        if len(levels) != len(feat_dirs):
            continue
        sem_map = np.stack(levels)
        relevancy.set_positives(list(img_ann.keys()))
        ious, _ = activate_stream(sem_map, relevancy, img_ann, mask_thresh)
        iou_all.extend(ious)
        acc += lerf_localization(sem_map, relevancy, img_ann)
        total += len(img_ann)
        distinct.update(img_ann.keys())
        frames_scored += 1
    return {
        "miou": float(np.mean(iou_all)) if iou_all else float("nan"),
        "localization_acc": acc / max(total, 1),
        "num_queries": total,
        "distinct_queries": len(distinct),
        "frames_scored": frames_scored,
    }
