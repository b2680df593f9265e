"""End-to-end open-vocabulary mIoU on the synthetic scene (no real data).

The reference's headline language metric is LERF-protocol mIoU /
localization accuracy computed from rendered low-dim language maps
(/root/reference/eval/evaluate_onlinelangslam.py:305-352). Real Replica
data and real CLIP weights don't exist in this environment, so this
harness pins the FULL chain's mechanics instead, with analytically known
ground truth:

  synthetic per-pixel "CLIP" class embeddings (wall/floor, from the
  scene's exact ray-cast geometry — SyntheticDataset.gt_semantics)
  → REAL AutoencoderMLP compression (768→15, or 768→32 + the online
    32→15 codec trained inside the SLAM loop)
  → splat language fusion through the production rasterizer
  → eval_rendering's saved lang/{idx}.npy maps
  → decode_lang_map (1- or 2-stage) → CLIPRelevancy → lerf_eval IoU +
    localization, through the same file-based entry points the real
    protocol uses.

Every stage is the production implementation except the SED/HR conv
towers, which are replaced by the class-embedding lookup (their numerics
are pinned separately by the weight-port parity suite,
tests/test_weight_port.py).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

from .relevancy import NEGATIVES, CLIPRelevancy


def _unit_rows(rng, n: int, d: int) -> np.ndarray:
    v = rng.normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _frame_key(img_hwc_255: np.ndarray) -> str:
    q = np.floor(np.asarray(img_hwc_255, np.float32) + 0.5).astype(np.uint8)
    return hashlib.md5(q.tobytes()).hexdigest()


def _nearest_resize_mask(mask: np.ndarray, hw) -> np.ndarray:
    h, w = mask.shape
    mh, mw = hw
    ys = np.minimum((np.arange(mh) * h) // mh, h - 1)
    xs = np.minimum((np.arange(mw) * w) // mw, w - 1)
    return mask[np.ix_(ys, xs)]


class SyntheticLangExtractor:
    """Drop-in `lang_extractor` whose 768-d features are class embeddings
    derived from the synthetic scene's exact geometry.

    Implements the two methods the SLAM backend and the eval scripts use
    from the real fused extractor (models/sed.py LangFeatureExtractor):
    `encode_frame(rgb_hwc_255) -> (H, W, code)` and
    `decode_codes((N, code)) -> (N, 768)`. The compressor is the REAL
    AutoencoderMLP (reference model.py:15-62 semantics), trained here on
    the synthetic embedding manifold — `stage=1` compresses 768→15
    directly; `stage=2` compresses 768→32, leaving the 32→15 step to the
    online codec exactly like the reference two-stage path
    (slam_backend.py:559-572).
    """

    def __init__(self, dataset, *, lang_hw=(192, 192), clip_dim: int = 768,
                 stage: int = 1, seed: int = 0, train_steps: int = 300,
                 batch: int = 256, noise: float = 0.05):
        import jax
        import jax.numpy as jnp

        from ..models.autoencoder import (
            ONE_STAGE_DEC, ONE_STAGE_ENC, TWO_STAGE_DEC, TWO_STAGE_ENC,
            AutoencoderMLP, make_offline_optimizer, offline_train_step,
        )

        assert stage in (1, 2), stage
        self.labels = list(dataset.SEMANTIC_LABELS)
        self.lang_hw = tuple(lang_hw)
        self.clip_dim = clip_dim
        self.dataset = dataset
        rng = np.random.default_rng(seed)
        self.class_embeds = _unit_rows(rng, len(self.labels), clip_dim)
        self.neg_embeds = _unit_rows(rng, len(NEGATIVES), clip_dim)

        self._idx_of = {}
        for i in range(len(dataset)):
            color = np.asarray(dataset[i][0])  # (3, H, W) float 0..1
            img = np.transpose(color, (1, 2, 0)).astype(np.float32)
            img = img * np.float32(255.0)
            self._idx_of[_frame_key(img)] = i

        enc, dec = (
            (ONE_STAGE_ENC, ONE_STAGE_DEC) if stage == 1
            else (TWO_STAGE_ENC, TWO_STAGE_DEC)
        )
        self.model = AutoencoderMLP(tuple(enc), tuple(dec))
        variables = self.model.init(
            jax.random.key(seed), jnp.zeros((1, clip_dim)), train=False
        )
        opt = make_offline_optimizer()
        opt_state = opt.init(variables["params"])
        step = jax.jit(offline_train_step(self.model, opt))
        base = np.concatenate([self.class_embeds, self.neg_embeds], axis=0)
        for _ in range(train_steps):
            # Noisy samples around each embedding plus pairwise blends —
            # rendered maps alpha-composite latents, so the decoder must
            # be faithful on mixtures, not just at the class points.
            idx = rng.integers(0, len(base), size=batch)
            jdx = rng.integers(0, len(base), size=batch)
            t = rng.uniform(0.0, 1.0, size=(batch, 1)).astype(np.float32)
            t = np.where(rng.uniform(size=(batch, 1)) < 0.5, 0.0, t)
            x = (1.0 - t) * base[idx] + t * base[jdx]
            x = x + rng.normal(size=(batch, clip_dim)) * noise
            x = x / np.linalg.norm(x, axis=-1, keepdims=True)
            variables, opt_state, _ = step(
                variables, opt_state, jnp.asarray(x, jnp.float32)
            )
        self.variables = variables
        self._encode_j = jax.jit(
            lambda v, x: self.model.apply(
                v, x, train=False, method=AutoencoderMLP.encode
            )
        )
        self._decode_j = jax.jit(
            lambda v, z: self.model.apply(
                v, z, method=AutoencoderMLP.decode
            )
        )
        # Round-trip cosine on the class embeddings — the ceiling the
        # rendered maps can reach through this codec.
        rec = np.asarray(self.decode_codes(self._encode_j(
            self.variables, jnp.asarray(self.class_embeds)
        )))
        self.roundtrip_cos = float(
            np.mean(np.sum(rec * self.class_embeds, axis=-1))
        )

    def frame_index(self, rgb_hwc_255) -> int:
        key = _frame_key(np.asarray(rgb_hwc_255, np.float32))
        if key not in self._idx_of:
            raise KeyError(
                "frame not recognized — the extractor hashes frames of the "
                "dataset it was built with; pass the same config/seed"
            )
        return self._idx_of[key]

    def class_map(self, idx: int, hw=None) -> np.ndarray:
        mask = self.dataset.gt_semantics(idx)
        return _nearest_resize_mask(mask, hw or self.lang_hw)

    def encode_frame(self, rgb_hwc_255):
        import jax.numpy as jnp

        idx = self.frame_index(rgb_hwc_255)
        small = self.class_map(idx)
        feats = self.class_embeds[small]  # (mh, mw, clip_dim)
        codes = self._encode_j(
            self.variables, jnp.asarray(feats.reshape(-1, self.clip_dim))
        )
        return codes.reshape(small.shape[0], small.shape[1], -1)

    def decode_codes(self, codes):
        import jax.numpy as jnp

        return self._decode_j(self.variables, jnp.asarray(codes))

    def relevancy(self) -> CLIPRelevancy:
        """Relevancy scorer whose 'text' embeddings are the synthetic
        class/negative embeddings, keyed by label name."""
        table = {l: e for l, e in zip(self.labels, self.class_embeds)}
        table.update({n: e for n, e in zip(NEGATIVES, self.neg_embeds)})
        return CLIPRelevancy(embed_table=table)


class OnlineDecoder:
    """`decode(z15) -> z32` adapter over a trained OnlineAETrainer, the
    `online_ae` object decode_lang_map/evaluate_scene expect (reference
    EncoderDecoderOnline.decode, evaluate_onlinelangslam.py:267-275)."""

    def __init__(self, trainer):
        self._trainer = trainer

    def decode(self, z):
        from ..models.autoencoder import EncoderDecoderOnline

        return self._trainer.model.apply(
            {"params": self._trainer.params}, z,
            method=EncoderDecoderOnline.decode,
        )


def write_annotations(extractor, frame_indices, out_dir) -> Path:
    """Consolidated ann.json + mask .npy files (the format
    lerf_eval.load_annotations consumes) from the scene's exact geometry:
    per eval frame, one full-resolution mask + bbox per class."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    anns = {}
    for idx in frame_indices:
        sem = extractor.dataset.gt_semantics(idx)
        frame = {}
        for ci, label in enumerate(extractor.labels):
            mask = sem == ci
            if not mask.any():
                continue
            rows, cols = np.where(mask)
            mask_file = f"mask_{idx:05d}_{label}.npy"
            np.save(out_dir / mask_file, mask)
            frame[label] = {
                "mask_file": mask_file,
                "bboxes": [[int(cols.min()), int(rows.min()),
                            int(cols.max()), int(rows.max())]],
            }
        anns[f"{idx:05d}"] = frame
    path = out_dir / "ann.json"
    path.write_text(json.dumps(anns))
    return path


def run_synthetic_miou(config, *, max_frames=None, every: int = 5,
                       out_dir=None, stage: int | None = None,
                       train_steps: int = 300, seed: int = 0) -> dict:
    """Run SLAM on the synthetic scene with class-embedding language
    supervision, then score rendered maps with the production LERF eval.

    Returns the evaluate_scene result dict plus run context. `stage`
    defaults to the config's language.single_stage."""
    import tempfile

    from ..models.checkpoints import OnlineAETrainer
    from ..slam import evaluation
    from ..slam.datasets import load_dataset
    from ..slam.system import SLAM
    from .lerf_eval import evaluate_scene

    lang_cfg = config.setdefault("language", {})
    lang_cfg["language_train"] = True
    lang_cfg.setdefault("lang_code_size", 15)
    if stage is None:
        stage = 1 if lang_cfg.get("single_stage", True) else 2
    lang_cfg["single_stage"] = stage == 1
    fh = lang_cfg.get("feat_hw", 192)
    lang_hw = tuple(fh) if isinstance(fh, (list, tuple)) else (fh, fh)

    dataset = load_dataset(config)
    extractor = SyntheticLangExtractor(
        dataset, lang_hw=lang_hw, stage=stage, seed=seed,
        train_steps=train_steps,
    )
    online_ae = OnlineAETrainer() if stage == 2 else None
    slam = SLAM(config, lang_extractor=extractor, online_ae=online_ae)
    slam.run(max_frames=max_frames)

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="ols_miou_")
    out_dir = Path(out_dir)
    evaluation.eval_rendering(slam, save_dir=out_dir, tag="miou",
                              every=every)
    lang_dir = out_dir / "miou" / "lang"
    saved = sorted(int(p.stem) for p in lang_dir.glob("*.npy"))
    ann_path = write_annotations(extractor, saved, out_dir / "ann")

    h, w = dataset.height, dataset.width
    dec = OnlineDecoder(online_ae) if online_ae else None
    result = evaluate_scene(
        str(lang_dir), str(ann_path), extractor, extractor.relevancy(),
        online_ae=dec, eval_size=(h, w),
    )
    # Score the same maps through the LangSplat multilevel entry point
    # (one level here — the reference's per-level dirs,
    # evaluate_langsplat.py:227-290) so the gated run exercises BOTH
    # production protocols end to end.
    from .lerf_eval import evaluate_scene_multilevel

    def _decode_flat(flat):
        import jax.numpy as jnp

        z = jnp.asarray(flat)
        if dec is not None:
            z = dec.decode(z)
        return extractor.decode_codes(z)

    ml = evaluate_scene_multilevel(
        [str(lang_dir)], str(ann_path), _decode_flat,
        extractor.relevancy(), eval_size=(h, w), hwc=False,
    )
    result.update(
        stage=stage,
        frames_evaluated=len(saved),
        ae_roundtrip_cos=extractor.roundtrip_cos,
        keyframes=len(slam.frontend.kf_indices),
        multilevel={k: ml[k] for k in
                    ("miou", "localization_acc", "num_queries")},
    )
    return result
