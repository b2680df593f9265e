"""Mid-run SLAM checkpoint / resume (slam/checkpoint.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from online_lang_splatting_tpu.slam import checkpoint
from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.system import SLAM

pytestmark = pytest.mark.slow


def test_checkpoint_roundtrip_and_resume(tmp_path):
    config = load_config("configs/synthetic/smoke.yaml")
    slam = SLAM(config)
    slam.run(max_frames=6)
    path = tmp_path / "ckpt.npz"
    checkpoint.save_state(slam, path, 6)

    # Restore into a fresh system: state must round-trip exactly.
    slam2 = SLAM(config)
    start = checkpoint.load_state(slam2, path)
    assert start == 6
    for a, b in zip(
        jax.tree.leaves(slam.backend.params),
        jax.tree.leaves(slam2.backend.params),
    ):
        if a.size:
            assert float(jnp.abs(a - b).max()) == 0.0
    assert slam2.backend.iteration_count == slam.backend.iteration_count
    assert sorted(slam2.backend.viewpoints) == sorted(slam.backend.viewpoints)
    assert slam2.backend.current_window == slam.backend.current_window
    for i, cam in slam.backend.viewpoints.items():
        cam2 = slam2.backend.viewpoints[i]
        np.testing.assert_allclose(cam2.r, cam.r, atol=1e-7)
        np.testing.assert_allclose(cam2.t, cam.t, atol=1e-7)
        assert cam2.exposure_a == pytest.approx(cam.exposure_a)
    for i, occ in slam.backend.occ_aware_visibility.items():
        np.testing.assert_array_equal(
            slam2.backend.occ_aware_visibility[i], occ
        )

    # Continue the run from the checkpoint: completes with a sane map.
    slam2.run(max_frames=10, start_frame=start)
    assert int(slam2.backend.aux.active.sum()) > 100
    for cam in slam2.frontend.cameras.values():
        assert np.isfinite(cam.t).all()
