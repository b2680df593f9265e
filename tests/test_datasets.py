"""Dataset loader parity: TUM 32 FPS association subsampling, undistort
remap preprocessing, EuRoC rectified-SGBM depth sanity."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402

from online_lang_splatting_tpu.slam.datasets import (  # noqa: E402
    EuRoCDataset, TUMDataset,
)


def _write_png(path, arr):
    Image.fromarray(arr).save(path)


def _tum_scene(tmp_path, n=90, hz=90.0):
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = i / hz
        _write_png(tmp_path / "rgb" / f"{i}.png",
                   np.full((8, 10, 3), i % 255, np.uint8))
        _write_png(tmp_path / "depth" / f"{i}.png",
                   np.full((8, 10), 1000, np.uint16))
        rgb_lines.append(f"{t:.6f} rgb/{i}.png")
        depth_lines.append(f"{t:.6f} depth/{i}.png")
        gt_lines.append(f"{t:.6f} 0 0 {i * 0.01} 0 0 0 1")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines))
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines))


def _config(path, extra_calib=None, dtype="tum"):
    calib = {
        "fx": 80.0, "fy": 80.0, "cx": 5.0, "cy": 4.0,
        "width": 10, "height": 8, "depth_scale": 1000.0,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
        "distorted": False,
    }
    calib.update(extra_calib or {})
    return {
        "Dataset": {"type": dtype, "dataset_path": str(path),
                    "Calibration": calib},
    }


def test_tum_frame_rate_subsampling(tmp_path):
    """90 Hz input subsampled at 32 FPS: the reference keeps a frame only
    when >1/32 s elapsed since the last kept frame (dataset.py:129-133)."""
    _tum_scene(tmp_path, n=90, hz=90.0)
    ds = TUMDataset(_config(tmp_path))
    # Reference loop on the same timestamps.
    t = np.arange(90) / 90.0
    kept = [0]
    for i in range(1, 90):
        if t[i] - t[kept[-1]] > 1.0 / 32.0:
            kept.append(i)
    assert len(ds) == len(kept)
    # Full-rate association (no subsample) would keep all 90.
    ds_full = TUMDataset(_config(tmp_path), frame_rate=1e9)
    assert len(ds_full) == 90
    # Pose parity: translation z = 0.01*i, W2C inverts it.
    color, depth, pose, _, _ = ds[1]
    assert color.shape == (3, 8, 10)
    assert np.allclose(depth, 1.0)
    i = kept[1]
    assert np.isclose(pose[2, 3], -0.01 * i, atol=1e-6)


def test_undistort_matches_cv2_reference(tmp_path):
    """A distorted calib must reproduce cv2.initUndistortRectifyMap+remap
    exactly (reference dataset.py:269-276)."""
    _tum_scene(tmp_path, n=5, hz=90.0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(8, 10, 3), dtype=np.uint8)
    _write_png(tmp_path / "rgb" / "0.png", img)
    calib = {"distorted": True, "k1": -0.28, "k2": 0.07, "p1": 2e-4,
             "p2": 2e-5}
    ds = TUMDataset(_config(tmp_path, calib))
    color, _, _, _, _ = ds[0]

    k = np.array([[80.0, 0, 5.0], [0, 80.0, 4.0], [0, 0, 1]])
    d = np.array([-0.28, 0.07, 2e-4, 2e-5, 0.0])
    m1, m2 = cv2.initUndistortRectifyMap(
        k, d, np.eye(3), k, (10, 8), cv2.CV_32FC1
    )
    expect = cv2.remap(img, m1, m2, cv2.INTER_LINEAR)
    got = (color.transpose(1, 2, 0) * 255).round().astype(np.uint8)
    assert np.array_equal(got, expect)


def _euroc_scene(tmp_path, left, right, n=3):
    cam0 = tmp_path / "mav0/cam0/data"
    cam1 = tmp_path / "mav0/cam1/data"
    gt_dir = tmp_path / "mav0/state_groundtruth_estimate0"
    cam0.mkdir(parents=True)
    cam1.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rows = ["#ts,px,py,pz,qw,qx,qy,qz"]
    for i in range(n):
        ts = 1000000000 + i * 50000000
        _write_png(cam0 / f"{ts}.png", left)
        _write_png(cam1 / f"{ts}.png", right)
        rows.append(f"{ts},0,0,{0.01 * i},1,0,0,0")
    (gt_dir / "data.csv").write_text("\n".join(rows))


def test_euroc_rectification_and_depth(tmp_path, monkeypatch):
    """Rectify maps must be built from the cam0/cam1 calib exactly as the
    reference (dataset.py:416-447) and applied BEFORE SGBM, and the
    disparity→depth conversion must follow dataset.py:453-458
    (disp==0 → 1e10 sentinel, depth = baseline_fx/disp, negatives → 0).
    SGBM itself is stubbed to a known disparity so the test pins OUR
    pipeline, not OpenCV's matcher."""
    rng = np.random.default_rng(1)
    h, w = 64, 96
    left = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    right = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    _euroc_scene(tmp_path, left, right)

    raw = {"fx": 90.0, "fy": 90.0, "cx": 48.0, "cy": 32.0,
           "k1": -0.28, "k2": 0.07, "p1": 1e-4, "p2": 1e-5, "k3": 0.0}
    opt = {"fx": 80.0, "fy": 80.0, "cx": 5.0, "cy": 4.0}
    rot = cv2.Rodrigues(np.array([0.0, 0.01, 0.0]))[0]
    cam = {"raw": raw, "opt": opt, "R": {"data": rot.reshape(-1).tolist()}}
    cfg = _config(tmp_path, {
        "width": w, "height": h, "distorted": True,
        "cam0": dict(cam), "cam1": dict(cam),
    }, dtype="euroc")
    cfg["Dataset"]["baseline_fx"] = 48.0

    captured = {}

    class StubSGBM:
        def setUniquenessRatio(self, r):
            captured["uniq"] = r

        def compute(self, li, ri):
            captured["left"], captured["right"] = li.copy(), ri.copy()
            disp = np.zeros((h, w), np.int16)
            disp[:, :32] = 4 * 16     # disparity 4  -> depth 12
            disp[:, 32:64] = 0        # invalid      -> sentinel 1e10
            disp[:, 64:] = -16        # negative     -> clamped to 0
            return disp

    monkeypatch.setattr(
        cv2, "StereoSGBM_create", lambda **kw: StubSGBM()
    )
    ds = EuRoCDataset(cfg)
    assert len(ds) == 3
    color, depth, pose, _, _ = ds[0]

    # SGBM consumed the RECTIFIED images (reference remaps first).
    k_raw = np.array([[90.0, 0, 48.0], [0, 90.0, 32.0], [0, 0, 1]])
    d = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
    k_new = np.array([[80.0, 0, 5.0], [0, 80.0, 4.0], [0, 0, 1]])
    m1, m2 = cv2.initUndistortRectifyMap(k_raw, d, rot, k_new, (w, h),
                                         cv2.CV_32FC1)
    assert np.array_equal(captured["left"], cv2.remap(left, m1, m2,
                                                      cv2.INTER_LINEAR))
    assert np.array_equal(captured["right"], cv2.remap(right, m1, m2,
                                                       cv2.INTER_LINEAR))
    assert captured["uniq"] == 40  # reference dataset.py:450

    assert np.allclose(depth[:, :32], 12.0)
    assert np.allclose(depth[:, 32:64], 48.0 / 1e10)
    assert np.allclose(depth[:, 64:], 0.0)


def test_upload_u8_camera_exact():
    """Dataset.upload_u8 ships frame pixels as uint8 and divides on
    device — within 1 ulp of the f32 upload when the source pixels are
    u8/255 (every real RGB dataset; XLA lowers /255 to a reciprocal
    multiply, 1-ulp vs numpy's divide), 4x less tunnel traffic."""
    import jax.numpy as jnp

    from online_lang_splatting_tpu.slam.camera import Camera

    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, size=(3, 12, 16), dtype=np.uint8)
    color = u8.astype(np.float32) / 255.0
    depth = np.ones((12, 16), np.float32)
    pose = np.eye(4, dtype=np.float32)

    class _Stub:
        fx = fy = 10.0
        cx = 8.0
        cy = 6.0
        fovx = fovy = 1.0
        height = 12
        width = 16

        def __init__(self, upload_u8):
            self.upload_u8 = upload_u8

        def __getitem__(self, idx):
            return color, depth, pose, None, None

    cam_f32 = Camera.from_dataset(_Stub(False), 0)
    cam_u8 = Camera.from_dataset(_Stub(True), 0)
    a, b = np.asarray(cam_u8.image), np.asarray(cam_f32.image)
    assert np.abs(a - b).max() <= 6e-8  # 1 ulp at [0, 1] scale
    assert jnp.issubdtype(cam_u8.image.dtype, jnp.floating)
