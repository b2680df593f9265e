#!/usr/bin/env python
"""Fuse rendered (or colorized) 3-channel maps + depth into a TSDF mesh.

Counterpart of /root/reference/tsdf-fusion/dim3_recon.py (which fuses
semantic-color / rendered 3-d images with fusion2's 3-channel volume and
hardcoded paths): estimate volume bounds from the depth frustums,
integrate every Nth frame, export semantic_mesh.ply + semantic_pc.ply.

    python tsdf-fusion/dim3_recon.py \
        --color-dir <dir of {i}.npy (3,H,W) | *.png> \
        --dataset-config configs/rgbd/replicav2/room0.yaml --out out/
"""

from __future__ import annotations

import argparse
import glob
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_color(path: str, hw) -> np.ndarray:
    """(3, H, W) float in [0,1] from .npy (3,H,W)/(H,W,3) or an image."""
    import cv2

    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 3 and arr.shape[0] in (3,) and arr.shape[0] < arr.shape[-1]:
            pass  # already (3, H, W)
        elif arr.ndim == 3 and arr.shape[-1] == 3:
            arr = arr.transpose(2, 0, 1)
        if arr.max() > 1.5:
            arr = arr / 255.0
    else:
        img = cv2.imread(path, cv2.IMREAD_COLOR)[..., ::-1]
        arr = img.astype(np.float32).transpose(2, 0, 1) / 255.0
    h, w = hw
    if arr.shape[1:] != (h, w):
        arr = cv2.resize(
            arr.transpose(1, 2, 0), (w, h), interpolation=cv2.INTER_NEAREST
        ).transpose(2, 0, 1)
    return arr


def numeric_key(path: str) -> int:
    nums = re.findall(r"\d+", Path(path).stem)
    return int(nums[-1]) if nums else 0


def run(color_files: dict, args, gt_tag: str = ""):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.datasets import load_dataset
    from online_lang_splatting_tpu.tsdf.fusion import TSDFVolume, estimate_bounds
    from online_lang_splatting_tpu.tsdf.meshing import extract_mesh, write_mesh_ply
    from online_lang_splatting_tpu.utils.ply import write_ply

    config = load_config(args.dataset_config)
    dataset = load_dataset(config)
    intr = (dataset.fx, dataset.fy, dataset.cx, dataset.cy)
    frames = sorted(color_files)[:: args.every]
    if not frames:
        raise FileNotFoundError("no color frames found")

    depths, poses = [], []
    for idx in frames:
        _, depth, pose, _, _ = dataset[idx]
        depths.append(depth)
        poses.append(pose)
    bounds = estimate_bounds(depths, intr, poses)
    print("volume bounds:", bounds.tolist())

    vol = TSDFVolume(bounds, args.voxel, n_channels=3)
    for i, idx in enumerate(frames):
        color = load_color(color_files[idx], depths[i].shape)
        vol.integrate(color, depths[i], intr, poses[i])
        if i % 20 == 0:
            print(f"integrated {i + 1}/{len(frames)}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    pts, feats = vol.get_point_cloud()
    fields = {c: pts[:, j].astype(np.float32) for j, c in enumerate("xyz")}
    for j, c in enumerate(("red", "green", "blue")):
        fields[c] = (np.clip(feats[:, j], 0, 1) * 255).astype(np.uint8)
    write_ply(str(out / f"{gt_tag}semantic_pc.ply"), fields)

    verts, faces, vfeat = extract_mesh(vol)
    write_mesh_ply(
        str(out / f"{gt_tag}semantic_mesh.ply"), verts, faces,
        colors=np.clip(vfeat[:, :3], 0, 1),
    )
    print(f"wrote {out}/{gt_tag}semantic_mesh.ply "
          f"({len(verts)} verts, {len(faces)} tris)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--color-dir", required=True,
                   help="dir of 3-channel maps: {i}.npy or *.png")
    p.add_argument("--dataset-config", required=True)
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    files = glob.glob(str(Path(args.color_dir) / "*.npy")) or glob.glob(
        str(Path(args.color_dir) / "*.png")
    )
    run({numeric_key(f): f for f in files}, args)


if __name__ == "__main__":
    main()
