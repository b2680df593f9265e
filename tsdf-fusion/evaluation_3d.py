#!/usr/bin/env python
"""3D semantic evaluation: per-class Chamfer + EMD against GT point cloud.

Equivalent of /root/reference/tsdf-fusion/
3d_evaluation_and_visualize_langslam_dim15.py:235-432: decode per-point
15-d codes to 768-d CLIP space, classify by text-embedding argmax, and
for each class compute Chamfer distance and approximate EMD between the
predicted and ground-truth class point clouds.

    python tsdf-fusion/evaluation_3d.py --pred semantic_pc.ply \
        --gt gt_pc.ply --classes "wall,floor,chair,..." \
        --weights-dir <npz dir> [--online-ae online_ae.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="semantic_pc.ply (15-d codes)")
    p.add_argument("--gt", required=True,
                   help="GT ply with x,y,z,label int columns")
    p.add_argument("--classes", required=True, help="comma-separated labels")
    p.add_argument("--weights-dir", required=True)
    p.add_argument("--online-ae", default=None)
    p.add_argument("--max-points", type=int, default=4096,
                   help="per-class subsample for EMD")
    p.add_argument("--with-negatives", action="store_true",
                   help="append LERF negatives to the semantic argmax "
                        "(the LangSplat 3D-eval protocol)")
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy
    from online_lang_splatting_tpu.models.checkpoints import (
        load_extractor_from_dir, load_npz_tree,
    )
    from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer
    from online_lang_splatting_tpu.ops.chamfer import chamfer_distance
    from online_lang_splatting_tpu.ops.emd import earth_mover_distance
    from online_lang_splatting_tpu.utils.ply import read_ply

    classes = [c.strip() for c in args.classes.split(",")]
    single = args.online_ae is None
    extractor, _ = load_extractor_from_dir(
        args.weights_dir, {"language": {"single_stage": single}}
    )
    online_ae = None
    if not single:
        from online_lang_splatting_tpu.models.checkpoints import OnlineAETrainer

        online_ae = OnlineAETrainer()
        online_ae.params = load_npz_tree(args.online_ae)["params"]

    pred = read_ply(args.pred)
    pts = np.stack([pred["x"], pred["y"], pred["z"]], -1)
    codes = np.stack(
        [pred[k] for k in sorted(pred) if k.startswith("f_")], -1
    )
    flat = jnp.asarray(codes)
    if online_ae is not None:
        flat = online_ae.decode(flat)
    clip_feats = extractor.decode_codes(flat)

    text_params = load_npz_tree(Path(args.weights_dir) / "clip_text.npz")
    rel = CLIPRelevancy(text_params, SimpleTokenizer())
    rel.set_semantics(classes)
    labels = np.asarray(
        rel.get_semantic_map(
            clip_feats[None, None, :, :],
            with_negatives=args.with_negatives,
        )
    ).reshape(-1)

    gt = read_ply(args.gt)
    gt_pts = np.stack([gt["x"], gt["y"], gt["z"]], -1)
    gt_labels = gt["label"]

    rng = np.random.default_rng(0)
    results = {}
    for ci, cname in enumerate(classes):
        pm = labels == ci
        gm = gt_labels == ci
        if pm.sum() < 10 or gm.sum() < 10:
            continue
        a = pts[pm]
        b = gt_pts[gm]
        cd = chamfer_distance(jnp.asarray(a), jnp.asarray(b))

        def sub(x):
            if len(x) > args.max_points:
                x = x[rng.choice(len(x), args.max_points, replace=False)]
            return jnp.asarray(x)

        emd = float(earth_mover_distance(sub(a), sub(b)))
        results[cname] = {"chamfer": cd["chamfer"], "emd": emd,
                          "n_pred": int(pm.sum()), "n_gt": int(gm.sum())}
        print(f"{cname}: chamfer {cd['chamfer']:.4f} emd {emd:.4f}")

    summary = {
        "per_class": results,
        "mean_chamfer": float(np.mean([r["chamfer"] for r in results.values()]))
        if results else float("nan"),
        "mean_emd": float(np.mean([r["emd"] for r in results.values()]))
        if results else float("nan"),
    }
    print(json.dumps(summary["per_class"], indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
