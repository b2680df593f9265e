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
    """Two-stage online 32→15 compressor trained continuously during SLAM.

    Mirrors the reference's train_online_autoencoder cadence
    (/root/reference/utils/slam_backend.py:266-323): one gradient step on a
    keyframe's cached 32-d codes (l1 + 0.6·(1−cos)) at every new-keyframe
    feature extraction (:562-572), every 5 init iterations (:397-407), and
    on every random anti-forgetting keyframe visit during mapping
    (:640-648). The per-iteration visits are replayed at mapping-chunk
    boundaries as ONE jitted lax.scan over the visited stack rows — the
    same step count and data order, without per-iteration host dispatches.
    """

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
        self._scan = {}
        self.steps_per_call = steps_per_call
        self.step_count = 0
        self.last_loss = None
        self.loss_history = []  # device scalars, one per gradient step

    def train_and_encode(self, codes32):
        import jax

        from .autoencoder import EncoderDecoderOnline, online_train_step

        if self._step is None:
            self._step = jax.jit(online_train_step(self.model, self.optimizer))
        for _ in range(self.steps_per_call):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, codes32
            )
            self.step_count += 1
            self.last_loss = loss
            self.loss_history.append(loss)
        return self.model.apply(
            {"params": self.params}, codes32, method=EncoderDecoderOnline.encode
        )

    def train_rows(self, rows, cocos):
        """Run one gradient step per entry of `rows` (stack-row indices
        into `cocos` (cap, N, 32)), in order, as one scanned dispatch.
        Returns the per-step losses (device array, (len(rows),))."""
        import jax
        import jax.numpy as jnp_

        from .autoencoder import online_train_step

        if not len(rows):
            return None
        n = len(rows)
        # Pad to a power-of-2 bucket (marker -1 = no-op step) so scan
        # lengths don't multiply compile variants.
        m = 1
        while m < n:
            m *= 2
        idx = np.full((m,), -1, np.int32)
        idx[:n] = rows
        key = (m, cocos.shape)
        if key not in self._scan:
            step = online_train_step(self.model, self.optimizer)

            def scan_fn(params, opt_state, idx, cocos):
                def body(carry, i):
                    p, s = carry
                    p2, s2, loss = step(p, s, cocos[jnp_.maximum(i, 0)])
                    keep = i >= 0
                    p = jax.tree.map(
                        lambda a, b: jnp_.where(keep, b, a), p, p2
                    )
                    s = jax.tree.map(
                        lambda a, b: jnp_.where(keep, b, a), s, s2
                    )
                    return (p, s), jnp_.where(keep, loss, jnp_.nan)

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), idx
                )
                return params, opt_state, losses

            self._scan[key] = jax.jit(scan_fn)
        self.params, self.opt_state, losses = self._scan[key](
            self.params, self.opt_state, jnp_.asarray(idx), cocos,
        )
        self.step_count += n
        self.last_loss = losses[n - 1]
        self.loss_history.extend(losses[i] for i in range(n))
        return losses[:n]

    def decode(self, codes15):
        from .autoencoder import EncoderDecoderOnline

        return self.model.apply(
            {"params": self.params}, codes15, method=EncoderDecoderOnline.decode
        )
