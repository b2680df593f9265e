"""Language-feature autoencoders + training steps — Flax/optax.

Behavioral match of the reference autoencoders
(/root/reference/language/autoencoder/model.py):

* `AutoencoderMLP` (:15-62): Linear / [BatchNorm1d→ReLU→Linear]* encoder,
  Linear / [ReLU→Linear]* decoder, latent and output L2-normalized.
  One-stage dims 768→[384,192,96,48,24,15], decode [24,...,768]; offline
  two-stage uses 768→[512,256,128,64,32] / [192,...,768].
* `EncoderDecoderOnline` (:314-367): tiny 32→24→15 / 15→24→32 MLP with
  normalized outputs, trained online during SLAM.

Training matches the reference losses/optimizers:
* offline (`AutoencoderLight.training_step`, :205-291): l2 + 0.001·(1−cos),
  AdamW 4e-4, 50-step linear warmup then cosine to T_max=6000.
* online (`slam_backend.train_online_autoencoder`, :266-323): l1 + 0.6·(1−cos),
  Adam (lr 1e-3).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

ONE_STAGE_ENC = (384, 192, 96, 48, 24, 15)
ONE_STAGE_DEC = (24, 48, 96, 192, 384, 384, 768)
TWO_STAGE_ENC = (512, 256, 128, 64, 32)
TWO_STAGE_DEC = (192, 256, 384, 512, 768)


def _l2n(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class MLPEncoder(nn.Module):
    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, d in enumerate(self.hidden_dims):
            if i > 0:
                x = nn.BatchNorm(
                    use_running_average=not train, epsilon=1e-5, momentum=0.9,
                    name=f"bn{i}",
                )(x)
                x = nn.relu(x)
            x = nn.Dense(d, name=f"fc{i}")(x)
        return _l2n(x)


class MLPDecoder(nn.Module):
    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.hidden_dims):
            if i > 0:
                x = nn.relu(x)
            x = nn.Dense(d, name=f"fc{i}")(x)
        return _l2n(x)


class AutoencoderMLP(nn.Module):
    """clip_dim → low-dim → clip_dim with normalized latent and output."""

    encoder_dims: Sequence[int] = ONE_STAGE_ENC
    decoder_dims: Sequence[int] = ONE_STAGE_DEC

    def setup(self):
        self.encoder = MLPEncoder(self.encoder_dims)
        self.decoder = MLPDecoder(self.decoder_dims)

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train))

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode(self, z):
        return self.decoder(z)


class EncoderDecoderOnline(nn.Module):
    """Second-stage online compressor (32 ↔ 15 by default)."""

    input_dim: int = 32
    compressed_dim: int = 15
    hidden: int = 24

    def setup(self):
        self.enc1 = nn.Dense(self.hidden, name="enc1")
        self.enc2 = nn.Dense(self.compressed_dim, name="enc2")
        self.dec1 = nn.Dense(self.hidden, name="dec1")
        self.dec2 = nn.Dense(self.input_dim, name="dec2")

    def __call__(self, x):
        return self.decode(self.encode(x))

    def encode(self, x):
        return _l2n(self.enc2(nn.relu(self.enc1(x))))

    def decode(self, z):
        return _l2n(self.dec2(nn.relu(self.dec1(z))))


# ---------------------------------------------------------------------------
# Losses / training


class IncrementalPCA:
    """Streaming PCA (reference EncoderDecoderOnline 'pca' mode, which
    wrapped sklearn.IncrementalPCA — "we found mlp autoencoder is better
    than PCA", model.py:336). Mean/covariance accumulate across
    partial_fit batches; components from an eigendecomposition."""

    def __init__(self, n_components: int = 15):
        self.n_components = n_components
        self.count = 0
        self.mean = None
        self.cov_sum = None
        self.components = None

    def partial_fit(self, x):
        import numpy as np

        x = np.asarray(x, np.float64)
        if self.mean is None:
            self.mean = np.zeros(x.shape[1])
            self.cov_sum = np.zeros((x.shape[1], x.shape[1]))
        n_new = len(x)
        total = self.count + n_new
        delta = x.mean(axis=0) - self.mean
        xc = x - x.mean(axis=0)
        self.cov_sum += xc.T @ xc + np.outer(delta, delta) * (
            self.count * n_new / total
        )
        self.mean += delta * n_new / total
        self.count = total
        w, v = np.linalg.eigh(self.cov_sum / max(self.count - 1, 1))
        self.components = v[:, ::-1][:, : self.n_components].T

    @property
    def is_fitted(self):
        return self.components is not None

    def transform(self, x):
        import numpy as np

        return (np.asarray(x) - self.mean) @ self.components.T

    def inverse_transform(self, z):
        import numpy as np

        return np.asarray(z) @ self.components + self.mean


def offline_loss(pred, target, cos_weight: float = 0.001):
    l2 = jnp.mean(jnp.square(pred - target))
    cos = jnp.mean(1.0 - jnp.sum(_l2n(pred) * _l2n(target), axis=-1))
    return l2 + cos_weight * cos


def online_loss(pred, target, cos_weight: float = 0.6):
    l1 = jnp.mean(jnp.abs(pred - target))
    cos = jnp.mean(1.0 - jnp.sum(_l2n(pred) * _l2n(target), axis=-1))
    return l1 + cos_weight * cos


def offline_schedule(lr: float = 4e-4, warmup: int = 50, t_max: int = 6000):
    """Linear warmup then cosine decay (reference model.py:265-291)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup),
            optax.cosine_decay_schedule(lr, t_max),
        ],
        [warmup],
    )


def make_offline_optimizer(lr: float = 4e-4):
    return optax.adamw(offline_schedule(lr), weight_decay=0.01)


def make_online_optimizer(lr: float = 1e-3):
    return optax.adam(lr)


def offline_train_step(model: AutoencoderMLP, optimizer):
    """Returns a jittable (params, batch_state, opt_state, x) -> ... step.

    x: (B, clip_dim) feature vectors; trains with batch-norm batch stats.
    """

    def step(variables, opt_state, x):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return offline_loss(out, x), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        upd, opt_state = optimizer.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], upd)
        return {"params": params, "batch_stats": new_bs}, opt_state, loss

    return step


def online_train_step(model: EncoderDecoderOnline, optimizer):
    def step(params, opt_state, x):
        def loss_fn(p):
            return online_loss(model.apply({"params": p}, x), x)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    return step
