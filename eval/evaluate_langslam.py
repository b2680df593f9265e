#!/usr/bin/env python
"""2D language eval (single-stage pipeline): mIoU + localization accuracy.

Mirrors /root/reference/eval/evaluate_langslam.py — identical protocol to
the two-stage eval but decoding 15→768 directly through the offline
autoencoder (no online decoder).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from evaluate_onlinelangslam import main  # noqa: E402

if __name__ == "__main__":
    main(single_stage=True)
