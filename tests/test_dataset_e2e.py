"""Real-data-path end-to-end coverage (VERDICT r2 #5): generate tiny
on-disk dataset trees (Replica-v2 vMAP layout and TUM layout) from the
synthetic raytracer, then drive the REAL CLI path — slam.main() → config →
dataset parser → native C++ PNG decoder → SLAM → evaluate_run — with smoke
quality gates. Matches /root/reference/utils/dataset.py:47-79 (v2 layout)
and :81-156 (TUM association) + slam.py:257-303.
"""

import copy

import numpy as np
import pytest
import yaml

from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.datasets import SyntheticDataset

pytestmark = pytest.mark.slow

N_FRAMES = 10


def _synthetic_frames(config):
    ds = SyntheticDataset(config)
    frames = []
    for i in range(N_FRAMES):
        color, depth, pose, _, _ = ds[i]
        frames.append((color, depth, pose))
    return frames


def _write_png_rgb(path, chw):
    from PIL import Image

    arr = (np.clip(chw, 0, 1).transpose(1, 2, 0) * 255.0).round().astype(
        np.uint8
    )
    Image.fromarray(arr).save(path)


def _write_png_depth16(path, depth, scale):
    from PIL import Image

    arr = np.clip(depth * scale, 0, 65535).round().astype(np.uint16)
    Image.fromarray(arr, mode="I;16").save(path)


DEPTH_SCALE = 5000.0


def _base_config():
    config = load_config("configs/synthetic/smoke.yaml")
    config["Dataset"]["num_frames"] = N_FRAMES
    return config


def _make_replicav2_tree(root, config):
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    lines = []
    for i, (color, depth, pose) in enumerate(_synthetic_frames(config)):
        _write_png_rgb(root / "rgb" / f"rgb_{i}.png", color)
        _write_png_depth16(
            root / "depth" / f"depth_{i}.png", depth, DEPTH_SCALE
        )
        lines.append(" ".join(f"{v:.9f}" for v in np.asarray(pose).reshape(-1)))
    (root / "traj_w_c.txt").write_text("\n".join(lines) + "\n")


def _make_tum_tree(root, config):
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_rows, depth_rows, gt_rows = [], [], []
    for i, (color, depth, pose) in enumerate(_synthetic_frames(config)):
        t = 1000.0 + i  # 1 s apart: passes the 32 FPS subsampler
        _write_png_rgb(root / "rgb" / f"{t:.6f}.png", color)
        _write_png_depth16(root / "depth" / f"{t:.6f}.png", depth, DEPTH_SCALE)
        rgb_rows.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_rows.append(f"{t:.6f} depth/{t:.6f}.png")
        c2w = np.linalg.inv(pose)
        # Rotation → quaternion (w last, TUM order qx qy qz qw).
        r = c2w[:3, :3]
        w = np.sqrt(max(1.0 + r[0, 0] + r[1, 1] + r[2, 2], 1e-12)) / 2
        qx = (r[2, 1] - r[1, 2]) / (4 * w)
        qy = (r[0, 2] - r[2, 0]) / (4 * w)
        qz = (r[1, 0] - r[0, 1]) / (4 * w)
        tx, ty, tz = c2w[:3, 3]
        gt_rows.append(
            f"{t:.6f} {tx:.9f} {ty:.9f} {tz:.9f} "
            f"{qx:.9f} {qy:.9f} {qz:.9f} {w:.9f}"
        )
    (root / "rgb.txt").write_text("# ts path\n" + "\n".join(rgb_rows) + "\n")
    (root / "depth.txt").write_text(
        "# ts path\n" + "\n".join(depth_rows) + "\n"
    )
    (root / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_rows) + "\n"
    )


def _run_cli(tmp_path, config, dataset_type, dataset_path, eval_mode):
    import slam as slam_cli

    cfg = copy.deepcopy(config)
    cfg["Dataset"]["type"] = dataset_type
    cfg["Dataset"]["dataset_path"] = str(dataset_path)
    cfg["Dataset"]["Calibration"]["depth_scale"] = DEPTH_SCALE
    cfg["Results"]["save_dir"] = str(tmp_path / "results")
    cfg["Results"]["color_refinement_iters"] = 32
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    argv = ["--config", str(cfg_path), "--max-frames", str(N_FRAMES)]
    if eval_mode:
        argv.append("--eval")
    return slam_cli.main(argv)


def test_replicav2_tree_cli_e2e(tmp_path):
    """slam.py --config <replicav2 tree> --eval: full CLI path incl. the
    native PNG decoder, undistort-free v2 parser and evaluate_run."""
    config = _base_config()
    data_root = tmp_path / "room_smoke"
    _make_replicav2_tree(data_root, config)

    from online_lang_splatting_tpu import native

    assert native.available(), "native decoder must drive this path"

    slam = _run_cli(tmp_path, config, "replicav2", data_root, eval_mode=True)

    # Dataset really came from disk through the v2 parser (the system
    # wraps it in the prefetching decorator).
    inner = getattr(slam.dataset, "_dataset", slam.dataset)
    assert type(inner).__name__ == "ReplicaV2Dataset"
    assert len(slam.dataset) == N_FRAMES
    # 16-bit PNG round trip of depth (native decoder applies 1/scale).
    _, depth0, pose0, _, _ = slam.dataset[0]
    ds = SyntheticDataset(config)
    _, depth_ref, pose_ref, _, _ = ds[0]
    assert np.allclose(depth0, depth_ref, atol=2.0 / DEPTH_SCALE)
    assert np.allclose(pose0, pose_ref, atol=1e-6)

    # Smoke quality gates (same class as tests/test_slam_e2e.py).
    from online_lang_splatting_tpu.slam import evaluation

    assert len(slam.frontend.kf_indices) >= 2
    ate = evaluation.eval_ate(slam.frontend.cameras, slam.frontend.kf_indices)
    assert np.isfinite(ate) and ate < 0.1, ate
    metrics = evaluation.eval_rendering(slam)
    assert metrics["mean_psnr"] > 9.0, metrics

    # --eval wrote run artifacts.
    runs = list((tmp_path / "results").iterdir())
    assert runs, "save_dir empty"
    names = {p.name for p in runs[0].iterdir()}
    assert "config.yml" in names
    assert any(n.startswith("gaussians_final") for n in names)


def test_tum_tree_cli_e2e(tmp_path):
    """slam.py over a TUM-layout tree: timestamp association + quaternion
    poses + 16-bit depth through the same CLI."""
    config = _base_config()
    data_root = tmp_path / "tum_smoke"
    _make_tum_tree(data_root, config)

    slam = _run_cli(tmp_path, config, "tum", data_root, eval_mode=False)
    inner = getattr(slam.dataset, "_dataset", slam.dataset)
    assert type(inner).__name__ == "TUMDataset"
    assert len(slam.dataset) == N_FRAMES

    # Association preserved the synthetic poses (quaternion round trip).
    ds = SyntheticDataset(config)
    for i in (0, N_FRAMES - 1):
        _, _, pose_ref, _, _ = ds[i]
        assert np.allclose(slam.dataset.poses[i], pose_ref, atol=1e-6)

    from online_lang_splatting_tpu.slam import evaluation

    assert len(slam.frontend.kf_indices) >= 2
    ate = evaluation.eval_ate(slam.frontend.cameras, slam.frontend.kf_indices)
    assert np.isfinite(ate) and ate < 0.1, ate
