"""Eval-surface tooling: labelme annotation round trip, unified loader,
multi-level (LangSplat-protocol) evaluation, shared colormaps."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "eval"))


def _fake_scene(tmp_path):
    """Semantic config + two semantic_class pngs with two labeled blobs."""
    import yaml

    cfg = {"classes": [{"id": 7, "name": "vase"}, {"id": 9, "name": "sofa"},
                       {"id": 126, "name": "background"}]}
    cfg_file = tmp_path / "semantic_config.yaml"
    cfg_file.write_text(yaml.dump(cfg))
    seg_dir = tmp_path / "semantic_class"
    seg_dir.mkdir()
    seg = np.zeros((60, 80), np.uint8)
    seg[10:30, 10:30] = 7
    seg[35:55, 40:70] = 9
    for i in (0, 5):
        cv2.imwrite(str(seg_dir / f"semantic_class_{i}.png"), seg)
    return cfg_file, seg_dir, seg


def test_labelme_roundtrip(tmp_path):
    from replica_save_labels import get_top_labels, save_json_labels

    from online_lang_splatting_tpu.eval.lerf_eval import load_annotations

    cfg_file, seg_dir, seg = _fake_scene(tmp_path)
    top = get_top_labels(str(cfg_file), str(seg_dir), top_num=5)
    names = {n for _i, n in top}
    assert {"vase", "sofa"} <= names

    out = tmp_path / "labels"
    ok = save_json_labels(
        str(cfg_file), seg, out / "frame_00005.json", "frame", 5,
        user_label_names=list(names),
    )
    assert ok
    anns = load_annotations(out)
    assert "00005" in anns
    frame = anns["00005"]
    assert set(frame) == {"vase", "sofa"}
    # Polygon mask must cover (approximately) the original blob.
    mask = frame["vase"]["mask"]
    gt = seg == 7
    inter = np.logical_and(mask, gt).sum()
    assert inter / gt.sum() > 0.8
    x1, y1, x2, y2 = frame["vase"]["bboxes"][0]
    assert x1 <= 10 and y1 <= 10 and x2 >= 29 and y2 >= 29


def test_multilevel_eval(tmp_path):
    """LangSplat-protocol eval drives end-to-end on synthetic features:
    3 levels of 4-d codes, a linear 'decoder' to an 8-d CLIP space, and a
    relevancy stub — the query blob must be found (IoU > 0.3, loc hit)."""
    from online_lang_splatting_tpu.eval.lerf_eval import (
        evaluate_scene_multilevel,
    )

    h, w, code = 48, 64, 4
    rng = np.random.default_rng(0)
    target_code = np.array([1.0, 0, 0, 0], np.float32)
    bg_code = np.array([0, 1.0, 0, 0], np.float32)
    feats = np.broadcast_to(bg_code, (h, w, code)).copy()
    feats[8:24, 8:24] = target_code
    for lvl in range(1, 4):
        d = tmp_path / f"lvl{lvl}"
        d.mkdir()
        noisy = feats + rng.normal(size=feats.shape).astype(np.float32) * 0.05
        np.save(d / "00000.npy", noisy)

    mask = np.zeros((h, w), bool)
    mask[8:24, 8:24] = True
    ann = {"00000": {"thing": {
        "mask": mask.tolist(),
        "bboxes": [[8, 8, 23, 23]],
    }}}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))

    proj = rng.normal(size=(code, 8)).astype(np.float32)

    def decode_fn(flat):
        return flat @ proj

    class StubRelevancy:
        positives = ["thing"]

        def set_positives(self, p):
            self.positives = p

        def get_max_across(self, sem_map):
            # Relevancy = similarity to the decoded target code.
            q = target_code @ proj
            q = q / np.linalg.norm(q)
            s = sem_map / (
                np.linalg.norm(sem_map, axis=-1, keepdims=True) + 1e-9
            )
            rel = (s @ q)[:, None]  # (levels, 1, H, W)
            return rel

    metrics = evaluate_scene_multilevel(
        [tmp_path / f"lvl{i}" for i in (1, 2, 3)], ann_file,
        decode_fn, StubRelevancy(), eval_size=(h, w), mask_thresh=0.4,
    )
    assert metrics["num_queries"] == 1
    assert metrics["miou"] > 0.3
    assert metrics["localization_acc"] == 1.0


def test_pca_baseline_clis(tmp_path):
    """train_pca / test_pca round trip: a rank-limited feature set must be
    reconstructed near-exactly by a PCA with enough components."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(4)
    feats = tmp_path / "feats"
    feats.mkdir()
    basis = rng.normal(size=(6, 32)).astype(np.float32)
    for i in range(4):
        coef = rng.normal(size=(6, 8 * 8)).astype(np.float32)
        fm = (basis.T @ coef).reshape(32, 8, 8)
        np.save(feats / f"{i}_f.npy", fm)
    subprocess.run(
        [_sys.executable, "language/autoencoder/pca/train_pca.py",
         "--feat-dirs", str(feats), "--every", "1", "--components", "6",
         "--out", str(tmp_path / "pca.npz"), "--cpu"],
        check=True, cwd=str(REPO),
    )
    model = np.load(tmp_path / "pca.npz")
    assert model["components"].shape == (6, 32)
    # Round trip through the saved model: rank-6 data, 6 components →
    # reconstruction should be near-exact.
    fm = np.load(feats / "0_f.npy").reshape(32, -1).T
    z = (fm - model["mean"]) @ model["components"].T
    rec = z @ model["components"] + model["mean"]
    assert np.abs(rec - fm).max() < 1e-3
    out = subprocess.run(
        [_sys.executable, "language/autoencoder/pca/test_pca.py",
         "--model", str(tmp_path / "pca.npz"), "--features", str(feats),
         "--every", "1", "--out", str(tmp_path / "eval"), "--cpu"],
        check=True, cwd=str(REPO), capture_output=True, text=True,
    )
    assert "mean cos" in out.stdout


def test_colormaps():
    from colormaps import (
        ColormapOptions, apply_colormap, apply_pca_colormap,
    )

    rng = np.random.default_rng(1)
    feat = rng.normal(size=(16, 20, 24)).astype(np.float32)
    rgb = apply_pca_colormap(feat)
    assert rgb.shape == (16, 20, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1

    scalar = rng.uniform(size=(16, 20)).astype(np.float32)
    out = apply_colormap(scalar, ColormapOptions(normalize=True))
    assert out.shape == (16, 20, 3)
    assert np.isfinite(out).all()
