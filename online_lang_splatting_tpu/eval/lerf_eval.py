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
    valid_map: np.ndarray | None = None,
):
    """sem_map (levels, H, W, 768) → (per-query IoU list, chosen levels).

    `valid_map` (levels, prompts, H, W), if given, skips the relevancy
    recompute — callers that also run `lerf_localization` on the same
    frame compute it once (see `relevancy_from_code_map`)."""
    # np.array (copy): np.asarray of a device array is a READ-ONLY view,
    # and this function writes the blur blend back into valid_map.
    if valid_map is None:
        valid_map = relevancy.get_max_across(sem_map)
    valid_map = np.array(valid_map)
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
                      img_ann: dict,
                      valid_map: np.ndarray | None = None) -> int:
    """Count queries whose smoothed-relevancy argmax lies in a GT bbox."""
    if valid_map is None:
        valid_map = relevancy.get_max_across(sem_map)
    valid_map = np.asarray(valid_map)
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


def make_fused_relevancy(decode_fn, block: int = 65536):
    """One jitted chunked program: low-dim code map → CLIP decode →
    all-prompt relevancy, (prompts, H, W) out. The (H·W, 768) CLIP map
    never reaches the host: at replica scale it is 2.5 GB per frame, and
    the unfused path additionally launched one EAGER (H·W, 768) matmul
    per query per pass through the remote relay — the round-5 gated mIoU
    run OOM-killed at 130 GB host RSS doing exactly that.

    `decode_fn ((N, code) → (N, 768))` must be JAX-traceable (the
    production AE decoders are); returns
    `fn(flat_codes (N, code), relevancy, h, w) -> np (prompts, h, w)`.
    One compile per (frame shape, prompt count); frames of a scene share
    it."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(flat, pos, neg):
        n_pos = pos.shape[0]
        phrases_t = jnp.concatenate([pos, neg], axis=0).T  # (768, P+G)

        def body(chunk):
            emb = decode_fn(chunk)  # (B, 768)
            out = emb @ phrases_t
            p, g = out[:, :n_pos], out[:, n_pos:]
            sims = jnp.stack(
                [
                    jnp.broadcast_to(p[:, :, None], (*p.shape, g.shape[1])),
                    jnp.broadcast_to(g[:, None, :], (*p.shape, g.shape[1])),
                ],
                axis=-1,
            )  # (B, P, G, 2) — pairwise softmax(10·sim), hardest negative
            pos_prob = jax.nn.softmax(10 * sims, axis=-1)[..., 0]
            return jnp.min(pos_prob, axis=-1)  # (B, P)

        nb = flat.shape[0] // block
        res = jax.lax.map(body, flat.reshape(nb, block, flat.shape[1]))
        return res.reshape(-1, n_pos).T  # (P, N)

    # Per-block-size jit cache (tiny test maps fit in one block; frames
    # of a scene all land on the same size).
    _runs = {block: run}

    def fn(flat_codes: np.ndarray, relevancy: CLIPRelevancy, h: int,
           w: int) -> np.ndarray:
        n, c = flat_codes.shape
        b = min(block, n)
        if b not in _runs:
            _runs[b] = make_fused_relevancy(decode_fn, block=b)._run
        npad = -(-n // b) * b
        padded = np.zeros((npad, c), np.float32)
        padded[:n] = np.asarray(flat_codes, np.float32)
        out = np.asarray(_runs[b](jnp.asarray(padded), relevancy.pos_embeds,
                                  relevancy.neg_embeds))
        return out[:, :n].reshape(-1, h, w)

    fn._run = run
    return fn


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

    def _decode(flat):
        z = online_ae.decode(flat) if online_ae is not None else flat
        return extractor.decode_codes(z)

    fused = make_fused_relevancy(_decode)
    for frame_name, img_ann in anns.items():
        f = lang_dir / f"{frame_name}.npy"
        if not f.exists():
            continue
        lang_map = np.load(f)
        relevancy.set_positives(list(img_ann.keys()))
        l, h, w = lang_map.shape
        if (h, w) == tuple(eval_size):
            # Fused decode→relevancy, computed ONCE per frame and shared
            # by IoU + localization: the (H·W, 768) CLIP map never hits
            # the host (2.5 GB/frame at replica scale — see
            # make_fused_relevancy).
            valid = fused(lang_map.reshape(l, -1).T, relevancy, h, w)[None]
            sem_map = None
        else:
            # eval_size ≠ map size: the protocol resizes the DECODED
            # 768-d map (bilinear in CLIP space), which the fused path
            # cannot reproduce — keep the reference-exact order.
            clip_map = decode_lang_map(
                lang_map, extractor, online_ae, eval_size
            )
            sem_map = clip_map[None]  # single level
            valid = None
        ious, _ = activate_stream(sem_map, relevancy, img_ann, mask_thresh,
                                  valid_map=valid)
        iou_all.extend(ious)
        acc += lerf_localization(sem_map, relevancy, img_ann,
                                 valid_map=valid)
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
    # Fused decode→relevancy needs the standard embedding-based relevancy;
    # custom relevancy objects (only get_max_across) take the unfused path.
    can_fuse = hasattr(relevancy, "neg_embeds")
    fused = make_fused_relevancy(decode_fn) if can_fuse else None
    for frame_name, img_ann in anns.items():
        # This protocol resizes the CODE map before decoding
        # (evaluate_langsplat.py semantics), so the fused decode→relevancy
        # program is exact here — one (prompts, H, W) map per level, the
        # (H·W, 768) CLIP map stays on device.
        relevancy.set_positives(list(img_ann.keys()))
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
            if fused is not None:
                levels.append(
                    fused(arr.reshape(-1, arr.shape[-1]), relevancy, h, w)
                )
            else:
                dec = np.asarray(decode_fn(arr.reshape(-1, arr.shape[-1])))
                levels.append(dec.reshape(h, w, -1))
        if len(levels) != len(feat_dirs):
            continue
        if fused is not None:
            valid = np.stack(levels)  # (levels, prompts, H, W)
            sem_map = None
        else:
            sem_map = np.stack(levels)  # (levels, H, W, 768)
            valid = None
        ious, _ = activate_stream(sem_map, relevancy, img_ann, mask_thresh,
                                  valid_map=valid)
        iou_all.extend(ious)
        acc += lerf_localization(sem_map, relevancy, img_ann,
                                 valid_map=valid)
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
