#!/usr/bin/env python
"""Fuse the DATASET's ground-truth semantic-color frames into a TSDF mesh.

Counterpart of /root/reference/tsdf-fusion/dim3_recon_gt.py: same pipeline
as dim3_recon.py but reading the scene's GT semantic_color_*.png renders
(vMAP Replica layout) with GT poses — produces the GT_semantic_mesh.ply
that the 3D evaluation compares against.

    python tsdf-fusion/dim3_recon_gt.py \
        --semantic-color-dir <scene>/imap/00/semantic_color \
        --dataset-config configs/rgbd/replicav2/room0.yaml --out out/
"""

from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dim3_recon import numeric_key, run  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--semantic-color-dir", required=True)
    p.add_argument("--dataset-config", required=True)
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    files = glob.glob(str(Path(args.semantic_color_dir) / "*.png")) or (
        glob.glob(str(Path(args.semantic_color_dir) / "*.npy"))
    )
    args.color_dir = args.semantic_color_dir
    run({numeric_key(f): f for f in files}, args, gt_tag="GT_")


if __name__ == "__main__":
    main()
