"""Dual-thread frontend/backend mode (single_thread: False)."""

import numpy as np
import pytest

from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.system import SLAM

pytestmark = pytest.mark.slow


def test_threaded_run_matches_protocol():
    config = load_config("configs/synthetic/smoke.yaml")
    config["Training"]["single_thread"] = False
    config["Training"]["init_itr_num"] = 15
    config["Training"]["mapping_itr_num"] = 5
    config["Training"]["tracking_itr_num"] = 15
    slam = SLAM(config)
    slam.run(max_frames=8)
    assert len(slam.frontend.kf_indices) >= 1
    assert int(slam.backend.aux.active.sum()) > 100
    # Tracking produced finite poses.
    for cam in slam.frontend.cameras.values():
        assert np.isfinite(cam.t).all()
    # Frontend received at least one backend snapshot.
    assert slam.frontend.render_inputs is not None
    # Async semantics: the frontend kept TRACKING while a keyframe request
    # was in flight (reference slam_frontend.py:614-618) instead of
    # blocking until mapping finished.
    assert slam.tracked_while_kf_in_flight >= 1
