"""Instance-pool overflow: both tracking and mapping must detect raster
overflow, grow the bucket, and REPLAY (never commit truncated results)."""

import numpy as np

from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.system import SLAM


def test_snug_bucket_grows_and_run_completes():
    config = load_config("configs/synthetic/smoke.yaml")
    # Force overflow: the scene needs thousands of instances.
    config["max_instances_init"] = 256
    config["Training"]["init_itr_num"] = 8
    config["Training"]["mapping_itr_num"] = 3
    config["Training"]["tracking_itr_num"] = 6
    slam = SLAM(config)
    slam.run(max_frames=4)
    assert slam.backend.settings.max_instances > 256
    assert slam.frontend.settings.max_instances == (
        slam.backend.settings.max_instances
    )
    # The run still produced a sane map + finite poses after replays.
    assert int(slam.backend.aux.active.sum()) > 50
    for cam in slam.frontend.cameras.values():
        assert np.isfinite(cam.t).all()
