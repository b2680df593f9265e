"""End-to-end open-vocabulary mIoU on the synthetic scene (VERDICT r3 #4):
the FULL chain — class-embedding supervision → real AutoencoderMLP
compression → splat fusion → rendered maps → (two-stage) decode →
CLIPRelevancy → lerf_eval IoU/localization — through the production
file-based eval entry points. Mirrors the reference's headline protocol
(/root/reference/eval/evaluate_onlinelangslam.py:305-352) with ground
truth from the scene's exact geometry.
"""

import numpy as np
import pytest

from online_lang_splatting_tpu.slam.config import load_config

pytestmark = pytest.mark.slow


def _smoke_config(feat_hw: int = 24):
    config = load_config("configs/synthetic/smoke.yaml")
    config["language"]["feat_hw"] = feat_hw
    config["language"]["allow_zero_supervision"] = False
    return config


def test_nine_class_partition_geometry():
    """semantic_classes: 9 subdivides the analytic surfaces into world-x
    wall bands + world-z floor bands (>=8-query replica-scale eval,
    VERDICT r4 #6); the partition must be exhaustive, consistent with the
    2-class geometry, and every class must appear somewhere in the run."""
    from online_lang_splatting_tpu.slam.datasets import load_dataset

    config = load_config("configs/synthetic/replica_scale.yaml")
    ds9 = load_dataset(config)
    assert len(ds9.SEMANTIC_LABELS) == 9
    config2 = load_config("configs/synthetic/replica_scale.yaml")
    config2["Dataset"]["semantic_classes"] = 2
    ds2 = load_dataset(config2)
    seen = set()
    for idx in (0, 60, 119):
        sem9 = ds9.gt_semantics(idx)
        sem2 = ds2.gt_semantics(idx)
        assert sem9.min() >= 0 and sem9.max() <= 8
        # Band refinement: wall pixels carry wall-band classes (0-4),
        # floor pixels floor-band classes (5-8).
        np.testing.assert_array_equal(sem9 <= 4, sem2 == 0)
        seen.update(np.unique(sem9).tolist())
        # Each present class is a substantial region (protocol box blur
        # is 30 px; bands were sized from measured world-x/z quantiles).
        counts = np.bincount(sem9.ravel(), minlength=9)
        assert (counts[counts > 0] > 500).all(), counts
    assert seen == set(range(9))


def test_two_stage_miou_end_to_end(tmp_path):
    from online_lang_splatting_tpu.eval.synthetic_miou import (
        run_synthetic_miou,
    )

    res = run_synthetic_miou(
        _smoke_config(), max_frames=12, every=3, stage=2,
        train_steps=300, out_dir=tmp_path,
    )
    # Pinned regression locks (measured 0.52 mIoU / 1.0 loc at this
    # scale; the 30-px protocol blur caps small regions at 96×64 —
    # see tools/synthetic_miou_gate.py).
    assert res["num_queries"] >= 4
    assert res["frames_evaluated"] >= 2
    assert res["ae_roundtrip_cos"] > 0.98
    assert res["miou"] >= 0.35, res
    assert res["localization_acc"] >= 0.75, res
    # The real eval artifacts exist: per-frame rendered maps + the
    # consolidated annotation file the file-based loader consumed.
    assert (tmp_path / "ann" / "ann.json").exists()
    assert list((tmp_path / "miou" / "lang").glob("*.npy"))


def test_perfect_map_protocol_ceiling():
    """activate_stream on the exact class-embedding map: wall IoU must be
    near-perfect; this pins the scoring protocol itself (blur, threshold,
    mode smoothing) independent of SLAM map quality."""
    from online_lang_splatting_tpu.eval.lerf_eval import activate_stream
    from online_lang_splatting_tpu.eval.synthetic_miou import (
        SyntheticLangExtractor,
    )
    from online_lang_splatting_tpu.slam.datasets import load_dataset

    config = _smoke_config()
    ds = load_dataset(config)
    ext = SyntheticLangExtractor(ds, lang_hw=(24, 24), train_steps=50)
    rel = ext.relevancy()
    idx = 7
    sem = ds.gt_semantics(idx)
    img_ann = {}
    for ci, label in enumerate(ext.labels):
        m = sem == ci
        rows, cols = np.where(m)
        img_ann[label] = {
            "mask": m,
            "bboxes": np.array(
                [[cols.min(), rows.min(), cols.max(), rows.max()]]
            ),
        }
    rel.set_positives(list(img_ann.keys()))
    ious, _ = activate_stream(ext.class_embeds[sem][None], rel, img_ann)
    assert ious[0] > 0.9, ious   # wall (large region)
    assert ious[1] > 0.5, ious   # floor (blur-limited at this scale)
