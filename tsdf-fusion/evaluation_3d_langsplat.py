#!/usr/bin/env python
"""3D semantic evaluation for LANGSPLAT outputs.

Counterpart of /root/reference/tsdf-fusion/
3d_evaluation_and_visualize_langsplat.py — the same Chamfer/EMD pipeline
as evaluation_3d.py but with the LangSplat protocol differences baked in:
single-stage 15→768 decode (no online codec) and LERF negatives included
in the per-point semantic argmax.

    python tsdf-fusion/evaluation_3d_langsplat.py --pred semantic_pc.ply \
        --gt gt_pc.ply --classes "wall,chair,..." --weights-dir <npz dir>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from evaluation_3d import main  # noqa: E402

if __name__ == "__main__":
    sys.argv.append("--with-negatives")
    main()
