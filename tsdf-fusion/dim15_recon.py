#!/usr/bin/env python
"""Fuse rendered 15-d language maps + depths into a semantic point cloud.

Equivalent of /root/reference/tsdf-fusion/dim15_recon.py:20-96: estimate
volume bounds from the depth frustums, integrate every Nth frame of
rendered lang/{idx}.npy + depth into a 15-channel TSDF volume, export
semantic_pc.ply with per-point language codes.

    python tsdf-fusion/dim15_recon.py --run-dir results/<stamp> \
        --dataset-config configs/rgbd/replicav2/room0.yaml \
        [--voxel 0.02] [--every 5]
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
    p.add_argument("--run-dir", required=True,
                   help="run directory containing <tag>/lang/*.npy and poses")
    p.add_argument("--dataset-config", required=True)
    p.add_argument("--tag", default="before_opt")
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--out", default=None)
    p.add_argument("--mesh", action="store_true",
                   help="also export semantic_mesh.ply (Surface Nets)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.datasets import load_dataset
    from online_lang_splatting_tpu.tsdf.fusion import TSDFVolume, estimate_bounds
    from online_lang_splatting_tpu.utils.ply import write_ply

    config = load_config(args.dataset_config)
    dataset = load_dataset(config)
    intr = (dataset.fx, dataset.fy, dataset.cx, dataset.cy)

    lang_dir = Path(args.run_dir) / args.tag / "lang"
    lang_files = {
        int(Path(f).stem): f for f in glob.glob(str(lang_dir / "*.npy"))
    }
    frames = sorted(lang_files)[:: max(args.every // 5, 1)]
    if not frames:
        raise FileNotFoundError(f"no lang maps under {lang_dir}")

    depths, poses = [], []
    for idx in frames:
        _, depth, pose, _, _ = dataset[idx]
        depths.append(depth)
        poses.append(pose)
    bounds = estimate_bounds(depths, intr, poses)
    print("volume bounds:", bounds.tolist())

    lang0 = np.load(lang_files[frames[0]])
    vol = TSDFVolume(bounds, args.voxel, n_channels=lang0.shape[0])
    import cv2

    for i, idx in enumerate(frames):
        lang = np.load(lang_files[idx])  # (15, h, w)
        h, w = depths[i].shape
        if lang.shape[1:] != (h, w):
            lang = cv2.resize(
                lang.transpose(1, 2, 0), (w, h),
                interpolation=cv2.INTER_LINEAR,
            ).transpose(2, 0, 1)
        vol.integrate(lang, depths[i], intr, poses[i])
        if i % 10 == 0:
            print(f"integrated {i + 1}/{len(frames)}")

    pts, feats = vol.get_point_cloud()
    print(f"surface points: {len(pts)}")
    out = args.out or str(Path(args.run_dir) / "semantic_pc.ply")
    fields = {c: pts[:, j].astype(np.float32) for j, c in enumerate("xyz")}
    for j in range(feats.shape[1]):
        fields[f"f_{j}"] = feats[:, j].astype(np.float32)
    write_ply(out, fields)
    print(f"wrote {out}")

    if args.mesh:
        from online_lang_splatting_tpu.tsdf.meshing import (
            extract_mesh, write_mesh_ply,
        )

        verts, faces, vfeat = extract_mesh(vol)
        mesh_out = str(Path(out).with_name("semantic_mesh.ply"))
        # First three feature channels as vertex colors (PCA for >3).
        if vfeat.shape[1] > 3:
            c = vfeat - vfeat.mean(0)
            _, _, vt = np.linalg.svd(c[:: max(len(c) // 5000, 1)],
                                     full_matrices=False)
            c = c @ vt[:3].T
            c = (c - c.min(0)) / np.maximum(c.max(0) - c.min(0), 1e-9)
        else:
            c = vfeat[:, :3]
        write_mesh_ply(mesh_out, verts, faces, colors=c)
        print(f"wrote {mesh_out} ({len(verts)} verts, {len(faces)} tris)")


if __name__ == "__main__":
    main()
