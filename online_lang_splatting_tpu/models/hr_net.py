"""High-resolution language feature refinement head — Flax/NHWC.

Behavioral match of the reference `HighResLanguageFeatureNet`
(/root/reference/language/supervisedNet.py:45-109): 768→512 3x3 conv,
three ConvTranspose×2 upsampling stages (24→48→96→192), two
AttentionFusion blocks injecting the ConvNeXt res3 (384ch) and res2
(192ch) skip pyramids with sigmoid attention + residual, final 1×1 conv
back to 768 channels. BatchNorms run with stored running statistics
(inference mode — the checkpoint ships frozen stats); training mode uses
batch stats for the offline distillation trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convnext_clip import resize_bilinear


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.transpose:
            # torch ConvTranspose2d(k=4, s=2, p=1) == 2x upsample; flax pad
            # convention is k-1-p_torch = 2 per side (see tests for probe).
            x = nn.ConvTranspose(
                self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                transpose_kernel=True, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                padding=self.kernel // 2, name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9,
            name="bn",
        )(x)
        return nn.relu(x)


class AttentionFusion(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        if low.shape[-1] != self.channels:
            low = nn.Conv(self.channels, (1, 1), name="align")(low)
        fused = jnp.concatenate([high, low], axis=-1)
        fused = ConvBNRelu(self.channels, name="fusion")(fused, train)
        attn = ConvBNRelu(self.channels, name="attn_conv")(fused, train)
        attn = nn.Conv(self.channels, (1, 1), name="attn_proj")(attn)
        attn = jax.nn.sigmoid(attn)
        return fused * attn + fused


class HighResLanguageFeatureNet(nn.Module):
    out_channels: int = 768

    @nn.compact
    def __call__(self, fv, res3, res2, train: bool = False):
        """fv: (N, 24, 24, 768) dense CLIP map; res3: (N, 96, 96, 384);
        res2: (N, 192, 192, 192) ConvNeXt skips. Returns (N, 192, 192, 768)."""
        x = ConvBNRelu(512, name="initial")(fv, train)
        x = ConvBNRelu(512, transpose=True, name="up1")(x, train)
        f3 = resize_bilinear(res3, (x.shape[1], x.shape[2]))
        x = AttentionFusion(512, name="fuse1")(x, f3, train)
        x = ConvBNRelu(256, transpose=True, name="up2")(x, train)
        f2 = resize_bilinear(res2, (x.shape[1], x.shape[2]))
        x = AttentionFusion(256, name="fuse2")(x, f2, train)
        x = ConvBNRelu(128, transpose=True, name="up3")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="final")(x)
