"""End-to-end language supervision through the PRODUCTION path: the real
ConvNeXt-L extractor (random weights, reduced input resolution) → online
32→15 autoencoder → mapping supervision — asserting the rendered language
maps move toward the extractor's codes, not toward zeros (VERDICT r1 #9).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.system import SLAM

pytestmark = pytest.mark.slow


def test_extractor_online_ae_supervision_moves_language_maps():
    import jax

    from online_lang_splatting_tpu.models.autoencoder import (
        TWO_STAGE_DEC, TWO_STAGE_ENC,
    )
    from online_lang_splatting_tpu.models.checkpoints import OnlineAETrainer
    from online_lang_splatting_tpu.models.sed import LangFeatureExtractor

    config = load_config("configs/synthetic/smoke.yaml")
    config["Dataset"]["num_frames"] = 8
    config["Training"]["init_itr_num"] = 40
    config["Training"]["mapping_itr_num"] = 10
    config["Training"]["tracking_itr_num"] = 10
    config["language"]["single_stage"] = False
    config["language"]["allow_zero_supervision"] = False
    # Full ConvNeXt-L channel dims, reduced input resolution: 96² → the
    # os32 dense map is 3×3 (no HR head — reference hr_model=None path).
    config["language"]["hr_model"] = False
    config["language"]["feat_hw"] = 3

    extractor = LangFeatureExtractor(
        use_hr=False, clip_resolution=(96, 96),
        encoder_dims=TWO_STAGE_ENC, decoder_dims=TWO_STAGE_DEC,
        rng=jax.random.key(0),
    )
    online_ae = OnlineAETrainer()
    slam = SLAM(config, lang_extractor=extractor, online_ae=online_ae)
    slam.run(max_frames=6)

    be = slam.backend
    # At least one keyframe got real (non-zero) extractor supervision.
    sup = [
        np.asarray(c.gt_lang_feat)
        for c in be.viewpoints.values()
        if c.gt_lang_feat is not None
    ]
    assert sup, "no keyframe received language supervision"
    assert any(np.abs(s).max() > 1e-3 for s in sup), (
        "supervision is all zeros — the zero-fallback leaked in"
    )
    # The online AE actually trained (its params moved from init).
    fresh = OnlineAETrainer()
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree.leaves(online_ae.params), jax.tree.leaves(fresh.params)
        )
    )
    assert moved > 1e-6, "online AE never took a training step"

    # Rendered language maps moved TOWARD the supervision: for the first
    # keyframe, |render - gt| must beat the zero-map baseline |gt|.
    from online_lang_splatting_tpu.models.convnext_clip import resize_bilinear
    from online_lang_splatting_tpu.slam.renderer import activate, render

    idx = sorted(be.viewpoints)[0]
    cam = be.viewpoints[idx]
    inputs = activate(be.params, be.aux.active)
    out = render(
        inputs, jnp.asarray(cam.world_view_transform), slam.proj, be.settings
    )
    gt = jnp.asarray(cam.gt_lang_feat)  # (15, 3, 3)
    gt_hw = resize_bilinear(
        jnp.transpose(gt, (1, 2, 0))[None], (cam.height, cam.width)
    )[0]
    gt_chw = jnp.transpose(gt_hw, (2, 0, 1))
    err = float(jnp.abs(out.language - gt_chw).mean())
    err_zero = float(jnp.abs(gt_chw).mean())
    assert np.isfinite(err)
    assert err < 0.8 * err_zero, (err, err_zero)

    # --- Continuous online-AE training cadence (VERDICT r2 #4) ---------
    # Reference schedule (slam_backend.py:397-407, 562-572, 640-648):
    # one step per new-KF extraction, one per 5th init iteration, one per
    # random anti-forgetting keyframe visit (2/mapping iteration). With
    # init_itr_num=40 the init phase alone contributes 7 replay steps on
    # top of extraction, so a per-extraction-only codec (the round-2
    # behavior: exactly n_kf steps) fails this bound.
    n_kf = len(be.viewpoints)
    init_steps = len([i for i in range(40) if i % 5 == 0 and i != 0])
    assert online_ae.step_count >= n_kf + init_steps, (
        online_ae.step_count, n_kf, init_steps
    )
    # Upper bound: extraction + init cadence + 2 visits per mapping
    # iteration (prune iterations run without lang).
    max_steps = n_kf + init_steps + 2 * be.iteration_count
    assert online_ae.step_count <= max_steps, (
        online_ae.step_count, max_steps
    )
    # Codec reconstruction loss decreases across the run.
    hist = np.asarray([float(x) for x in online_ae.loss_history])
    assert len(hist) == online_ae.step_count
    early = hist[: max(3, len(hist) // 5)].mean()
    late = hist[-max(3, len(hist) // 5):].mean()
    assert late < early, (early, late)
