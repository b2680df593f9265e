"""CLIP text transformer — Flax.

Behavioral match of the reference's vendored open_clip text branch
(/root/reference/language/sed/open_clip/src/open_clip/model.py:159-212 and
transformer ResidualAttentionBlock): token embedding + learned positional
embedding, 16 pre-LN residual attention blocks (width 768, 12 heads, MLP
4x, exact GELU), causal mask, ln_final, EOT-token pooling through the
text projection. Used for open-vocabulary query embedding at SLAM
startup (backend CLIP text warmup) and in the LERF-protocol evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        y = nn.SelfAttention(
            num_heads=self.heads, qkv_features=self.width,
            deterministic=True, name="attn",
        )(y, mask=mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * self.width, name="mlp_c_fc")(y)
        y = _gelu(y)
        y = nn.Dense(self.width, name="mlp_c_proj")(y)
        return x + y


class TextTower(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    heads: int = 12
    layers: int = 16
    embed_dim: int = 768

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (N, context_length) int32 → (N, embed_dim) embeddings
        (unnormalized, like the reference's encode_text(normalize=False))."""
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb[tokens] + pos_emb[None, :, :]
        causal = jnp.tril(
            jnp.ones((self.context_length, self.context_length), bool)
        )
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblock{i}"
            )(x, causal[None, None])
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (self.width, self.embed_dim),
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ proj
