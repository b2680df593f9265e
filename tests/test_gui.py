"""GUI logic that runs headless: ellipsoid geometry extraction, the
Packet_vis2main pause protocol, and the interactive→headless fallback."""

import numpy as np

import jax.numpy as jnp

from online_lang_splatting_tpu.gui.slam_gui import (
    Packet_vis2main, ellipsoid_geometry,
)
from online_lang_splatting_tpu.slam.renderer import RenderInputs


def _inputs(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return RenderInputs(
        xyz=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        opacity=jnp.asarray(
            np.where(np.arange(n) % 4 == 0, 0.01, 0.8), jnp.float32
        ),
        scales=jnp.asarray(rng.uniform(0.01, 0.2, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        shs=jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32),
        language=jnp.zeros((n, 0), jnp.float32),
    )


def test_ellipsoid_geometry_filters_and_colors():
    inputs = _inputs(32)
    xyz, rgb, scales, quats = ellipsoid_geometry(inputs)
    assert len(xyz) == 24  # opacity <= 0.05 filtered (8 of 32)
    assert rgb.shape == (24, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert scales.shape == (24, 3) and quats.shape == (24, 4)


def test_interactive_gui_falls_back_headless(tmp_path):
    """Without open3d installed, use_gui: 'interactive' must degrade to the
    HeadlessViewer instead of crashing."""
    import pytest

    pytest.importorskip("yaml")
    try:
        import open3d  # noqa: F401

        pytest.skip("open3d present; fallback path not reachable")
    except ImportError:
        pass

    from online_lang_splatting_tpu.gui.viewer import HeadlessViewer
    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.system import SLAM

    config = load_config("configs/synthetic/smoke.yaml")
    config["Results"]["use_gui"] = "interactive"
    config["Results"]["save_dir"] = str(tmp_path)
    slam = SLAM(config, save_dir=None)
    assert isinstance(slam.viewer, HeadlessViewer)
    slam.viewer.close()


def test_gui_pause_protocol():
    from online_lang_splatting_tpu.slam.config import load_config
    from online_lang_splatting_tpu.slam.system import SLAM

    config = load_config("configs/synthetic/smoke.yaml")
    slam = SLAM(config)
    # pause followed by resume already queued: _check_gui_pause must
    # consume both and return unpaused (no deadlock).
    slam.q_vis2main.put(Packet_vis2main(flag_pause=True))
    slam.q_vis2main.put(Packet_vis2main(flag_pause=False))
    slam._check_gui_pause()
    assert slam._gui_paused is False


def test_orbit_camera_view_matrix_orthonormal():
    from online_lang_splatting_tpu.gui.orbit import OrbitCamera

    cam = OrbitCamera(target=(0.5, -0.2, 3.0), radius=2.0)
    cam.rotate(0.7, 0.3)
    cam.zoom(1.5)
    cam.pan(0.2, -0.1)
    v = cam.view_matrix()
    r = v[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r) > 0.99
    # The target projects onto the optical axis at positive depth.
    t_cam = r @ cam.target + v[:3, 3]
    assert t_cam[2] > 0
    np.testing.assert_allclose(t_cam[:2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(t_cam[2]), cam.radius, atol=1e-6)


def test_orbit_camera_elevation_clamped():
    from online_lang_splatting_tpu.gui.orbit import OrbitCamera

    cam = OrbitCamera()
    cam.rotate(0.0, 10.0)
    assert cam.elevation < np.pi / 2
    cam.rotate(0.0, -20.0)
    assert cam.elevation > -np.pi / 2


def test_frustum_overlay_draws_visible_keyframes():
    from online_lang_splatting_tpu.gui.orbit import (
        FRUSTUM_LINES, draw_frustums, frustum_points,
    )

    # A keyframe at the origin looking down +z; viewer 2m behind it.
    kf = np.eye(4)
    pts = frustum_points(kf, 0.5, 0.4, scale=0.2)
    assert pts.shape == (5, 3)
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-9)  # apex = camera center
    assert FRUSTUM_LINES.shape == (8, 2)

    viewer = np.eye(4)
    viewer[2, 3] = 2.0  # W2C translation: world origin at z=+2 in cam frame
    img = np.zeros((48, 64, 3))
    draw_frustums(
        img, viewer, [kf], fx=60.0, fy=60.0, cx=32.0, cy=24.0,
        tanfovx=0.5, tanfovy=0.4,
    )
    assert img.sum() > 0, "frustum overlay drew nothing"
    # Behind-camera keyframes are skipped, not crash.
    kf_behind = np.eye(4)
    kf_behind[2, 3] = 10.0  # its center sits far behind the viewer
    img2 = np.zeros((48, 64, 3))
    draw_frustums(
        img2, np.eye(4), [kf_behind], fx=60.0, fy=60.0, cx=32.0, cy=24.0,
        tanfovx=0.5, tanfovy=0.4,
    )


def test_gt_thumbnail_strip():
    """The packet's gt color/depth/language thumbnails render as a side
    strip (reference GaussianPacket side panels, gui/gui_utils.py:77-147)."""
    import numpy as np

    from online_lang_splatting_tpu.gui.viewer import (
        GaussianPacket, gt_thumbnail_strip,
    )

    rng = np.random.default_rng(0)
    pkt = GaussianPacket(
        gtcolor=rng.uniform(0, 1, (3, 24, 32)).astype(np.float32),
        gtdepth=rng.uniform(0.5, 3.0, (24, 32)).astype(np.float32),
        gtlanguage=rng.normal(size=(15, 12, 16)).astype(np.float32),
    )
    strip = gt_thumbnail_strip(pkt, 96)
    assert strip.shape[0] == 96 and strip.shape[2] == 3
    assert np.isfinite(strip).all() and strip.max() <= 1.0 + 1e-9
    # All three thumbnails present: each third is non-constant.
    for i in range(3):
        sec = strip[i * 32:(i + 1) * 32]
        assert sec.std() > 0

    assert gt_thumbnail_strip(GaussianPacket(), 96) is None
