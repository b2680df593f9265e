"""Loading converted .npz parameter trees back into Flax structures."""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def load_npz_tree(path) -> dict:
    """Inverse of tools/convert_weights._save_tree: 'a/b/c' keys → nested."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


def load_extractor_from_dir(weights_dir, config):
    """Build the fused language extractor (+ optional online AE trainer)
    from a directory of converted checkpoints. Missing files fall back to
    random init with a warning — the pipeline stays runnable end-to-end."""
    from .autoencoder import (
        ONE_STAGE_DEC, ONE_STAGE_ENC, TWO_STAGE_DEC, TWO_STAGE_ENC,
        EncoderDecoderOnline, make_online_optimizer, online_train_step,
    )
    from .sed import LangFeatureExtractor

    lang_cfg = config.get("language", {})
    single_stage = lang_cfg.get("single_stage", True)
    enc = ONE_STAGE_ENC if single_stage else TWO_STAGE_ENC
    dec = ONE_STAGE_DEC if single_stage else TWO_STAGE_DEC

    visual = hr = ae = None
    if weights_dir:
        d = Path(weights_dir)

        def maybe(name):
            p = d / name
            return load_npz_tree(p) if p.exists() else None

        visual = maybe("clip_visual.npz")
        hr = maybe("hr_net.npz")
        ae = maybe("autoencoder.npz")
        for name, v in [("clip_visual", visual), ("hr_net", hr),
                        ("autoencoder", ae)]:
            if v is None:
                print(f"[checkpoints] {name}.npz not found in {d}; "
                      "using random init")
    else:
        print("[checkpoints] no --weights-dir; language models random-init")

    extractor = LangFeatureExtractor(
        visual_params=visual, hr_variables=hr, ae_variables=ae,
        encoder_dims=enc, decoder_dims=dec,
        use_hr=lang_cfg.get("hr_model", True),
    )

    online_ae = None
    if not single_stage:
        online_ae = OnlineAETrainer()
    return extractor, online_ae


class OnlineAETrainer:
    """Two-stage online 32→15 compressor trained during SLAM
    (slam_backend.train_online_autoencoder semantics)."""

    def __init__(self, steps_per_call: int = 1, lr: float = 1e-3):
        import jax

        from .autoencoder import (
            EncoderDecoderOnline, make_online_optimizer, online_train_step,
        )

        self.model = EncoderDecoderOnline()
        self.params = self.model.init(
            jax.random.key(0), jnp.zeros((1, 32))
        )["params"]
        self.optimizer = make_online_optimizer(lr)
        self.opt_state = self.optimizer.init(self.params)
        self._step = None
        self.steps_per_call = steps_per_call

    def train_and_encode(self, codes32):
        import jax

        from .autoencoder import EncoderDecoderOnline, online_train_step

        if self._step is None:
            self._step = jax.jit(online_train_step(self.model, self.optimizer))
        for _ in range(self.steps_per_call):
            self.params, self.opt_state, _ = self._step(
                self.params, self.opt_state, codes32
            )
        return self.model.apply(
            {"params": self.params}, codes32, method=EncoderDecoderOnline.encode
        )

    def decode(self, codes15):
        from .autoencoder import EncoderDecoderOnline

        return self.model.apply(
            {"params": self.params}, codes15, method=EncoderDecoderOnline.decode
        )
