"""Native (C++) frame decoder + async prefetcher."""

import numpy as np
import pytest

from PIL import Image

from online_lang_splatting_tpu import native
from online_lang_splatting_tpu.slam.prefetch import PrefetchDataset


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native decoder not buildable in this environment")


def test_png_rgb_exact(tmp_path, lib_ok):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(tmp_path / "c.png")
    got = native.decode_rgb(str(tmp_path / "c.png"), 40, 56)
    ref = rgb.astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_png_depth16_exact(tmp_path, lib_ok):
    rng = np.random.default_rng(1)
    depth = rng.integers(0, 60000, size=(40, 56)).astype(np.uint16)
    Image.fromarray(depth).save(tmp_path / "d.png")
    got = native.decode_depth(str(tmp_path / "d.png"), 40, 56, 1000.0)
    np.testing.assert_allclose(got, depth / 1000.0, atol=1e-5)


def test_jpeg_rgb_close_to_pil(tmp_path, lib_ok):
    rng = np.random.default_rng(2)
    base = rng.integers(0, 255, size=(10, 14, 3), dtype=np.uint8)
    rgb = np.kron(base, np.ones((4, 4, 1))).astype(np.uint8)  # smooth-ish
    Image.fromarray(rgb).save(tmp_path / "c.jpg", quality=95)
    got = native.decode_rgb(str(tmp_path / "c.jpg"), 40, 56)
    ref = (
        np.asarray(Image.open(tmp_path / "c.jpg").convert("RGB"))
        .astype(np.float32).transpose(2, 0, 1) / 255.0
    )
    # Different IDCT implementations may differ by a couple of levels.
    assert np.abs(got - ref).max() < 5 / 255.0


def test_wrong_size_rejected(tmp_path, lib_ok):
    rgb = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(rgb).save(tmp_path / "c.png")
    assert native.decode_rgb(str(tmp_path / "c.png"), 16, 16) is None


def test_dataset_native_matches_pil(tmp_path, lib_ok, monkeypatch):
    """BaseDataset must produce identical frames through the native and
    PIL decode paths."""
    from online_lang_splatting_tpu.slam.datasets import TUMDataset

    rng = np.random.default_rng(3)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb = rng.integers(0, 255, size=(8, 10, 3), dtype=np.uint8)
    depth = rng.integers(500, 3000, size=(8, 10)).astype(np.uint16)
    Image.fromarray(rgb).save(tmp_path / "rgb" / "0.png")
    Image.fromarray(depth).save(tmp_path / "depth" / "0.png")
    (tmp_path / "rgb.txt").write_text("0.0 rgb/0.png")
    (tmp_path / "depth.txt").write_text("0.0 depth/0.png")
    (tmp_path / "groundtruth.txt").write_text("0.0 0 0 0 0 0 0 1")
    cfg = {"Dataset": {"type": "tum", "dataset_path": str(tmp_path),
                       "Calibration": {
                           "fx": 80.0, "fy": 80.0, "cx": 5.0, "cy": 4.0,
                           "width": 10, "height": 8, "depth_scale": 1000.0,
                           "distorted": False}}}
    ds = TUMDataset(cfg)
    c_native, d_native, _, _, _ = ds[0]
    monkeypatch.setattr(native, "available", lambda: False)
    c_pil, d_pil, _, _, _ = ds[0]
    np.testing.assert_allclose(c_native, c_pil, atol=1e-6)
    np.testing.assert_allclose(d_native, d_pil, atol=1e-6)


def test_prefetch_dataset_sequential_equivalence():
    class Toy:
        fx = 1.0

        def __len__(self):
            return 20

        def __getitem__(self, i):
            return i * 10

    pf = PrefetchDataset(Toy(), lookahead=3)
    assert pf.fx == 1.0
    assert len(pf) == 20
    got = [pf[i] for i in range(20)]
    assert got == [i * 10 for i in range(20)]
    # Random access still works (falls through to the dataset).
    assert pf[5] == 50
    pf.close()
