"""Constant-velocity tracking initialization (frontend.cv_extrapolate).

The reference always restarts tracking from the previous frame's pose
(/root/reference/utils/slam_frontend.py:592-594); `motion_model: cv`
extrapolates one frame ahead instead. These tests pin the prediction
math and the end-to-end effect on the smoke scene: fewer tracking
iterations with no quality loss.
"""

import numpy as np
import pytest

from online_lang_splatting_tpu.ops import lie
from online_lang_splatting_tpu.slam.frontend import cv_extrapolate


def _pose(tau):
    return np.asarray(lie.se3_exp(np.asarray(tau, np.float32)))


def test_cv_exact_on_constant_twist():
    """On a constant-twist trajectory V_t = D @ V_{t-1}, the prediction
    reproduces the next pose exactly."""
    rng = np.random.default_rng(0)
    v0 = _pose(rng.normal(scale=0.3, size=6))
    d = _pose(rng.normal(scale=0.05, size=6))
    v1 = d @ v0
    v2 = d @ v1
    pred = cv_extrapolate(v1, v0)
    np.testing.assert_allclose(pred, v2, atol=1e-5)


def test_cv_identity_when_static():
    v = _pose([0.1, -0.2, 0.3, 0.02, -0.01, 0.03])
    pred = cv_extrapolate(v, v)
    np.testing.assert_allclose(pred, v, atol=1e-6)


def test_cv_prediction_is_rigid():
    """The predicted rotation block stays orthonormal (det +1)."""
    rng = np.random.default_rng(1)
    v1 = _pose(rng.normal(scale=0.5, size=6))
    v2 = _pose(rng.normal(scale=0.5, size=6))
    pred = cv_extrapolate(v1, v2)
    r = pred[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) > 0.99
    np.testing.assert_allclose(pred[3], [0, 0, 0, 1], atol=1e-6)


@pytest.mark.slow
def test_cv_reduces_tracking_iterations():
    """Smoke-scene A/B: cv init must not regress pose quality and should
    cut tracking iterations on the smooth synthetic trajectory."""
    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.system import SLAM

    def run(mode):
        config = load_config("configs/synthetic/smoke.yaml")
        config["Training"]["motion_model"] = mode
        slam = SLAM(config)
        slam.run(max_frames=8)
        fe = slam.frontend
        errs = [np.linalg.norm(c.t - c.t_gt) for c in fe.cameras.values()]
        return np.mean(fe.track_iters), float(np.median(errs))

    iters_cv, err_cv = run("cv")
    iters_static, err_static = run("static")
    assert err_cv < max(2 * err_static, 0.15), (err_cv, err_static)
    assert iters_cv <= iters_static + 1, (iters_cv, iters_static)
