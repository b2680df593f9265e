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
