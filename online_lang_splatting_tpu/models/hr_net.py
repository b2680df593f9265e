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

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convnext_clip import resize_bilinear

# ConvTranspose implementation: "phase" decomposes each k4s2 transposed
# conv into 4 polyphase 2x2 convs + interleave — numerically identical,
# but 4x fewer MACs than XLA's input-dilation lowering (which convolves
# densely over the zero-dilated input). "xla" keeps nn.ConvTranspose.
# Default stays "xla" until the hardware A/B (tools/extractor_profile.py)
# shows "phase" faster; read at trace time so the A/B can flip it per run.
def _hr_convt() -> str:
    return os.environ.get("OLS_HR_CONVT", "xla")


class PhaseConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) via polyphase decomposition.

    Parameter-compatible with flax nn.ConvTranspose(transpose_kernel=True)
    — kernel (4, 4, out, in), bias (out,) — so converted checkpoints
    (tools/convert_weights.py:_convbnrelu) load unchanged.

    torch semantics: out[2y+r, 2x+s] = Σ_iy,ix in[iy, ix] · w[ky, kx]
    with ky = (2y+r) − 2·iy + 1 ∈ [0, 4). Phase r=0 therefore uses
    kernel rows [3, 1] over input taps (y−1, y); phase r=1 rows [2, 0]
    over taps (y, y+1); columns likewise. Each phase is one 2x2 conv —
    exactly k²/s² = 4 MACs per output instead of the dilated k² = 16.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (4, 4, self.features, cin),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        # Match flax promotion semantics (raw lax.conv requires equal
        # dtypes): bf16 activations x f32 params compute in f32 at init,
        # bf16 throughout once the tree is pre-cast (models/sed.py).
        cdt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(cdt)
        w = jnp.transpose(kernel, (0, 1, 3, 2)).astype(cdt)  # HWIO
        bias = bias.astype(cdt)
        n, h, wd, _ = x.shape
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (2, 2, cin, self.features), ("NHWC", "HWIO", "NHWC")
        )
        phases = []
        for r in (0, 1):
            row = []
            for s in (0, 1):
                # Kernel rows in ascending-input-tap order (see class
                # docstring): row 3 pairs with the earlier tap.
                ky = (3, 1) if r == 0 else (2, 0)
                kx = (3, 1) if s == 0 else (2, 0)
                pk = w[jnp.array(ky)][:, jnp.array(kx)]
                pad_y = (1, 0) if r == 0 else (0, 1)
                pad_x = (1, 0) if s == 0 else (0, 1)
                row.append(jax.lax.conv_general_dilated(
                    x, pk, window_strides=(1, 1),
                    padding=(pad_y, pad_x), dimension_numbers=dn,
                ))
            phases.append(row)
        # Interleave: out[2y+r, 2x+s] = phases[r][s][y, x].
        out = jnp.stack(
            [jnp.stack(row, axis=3) for row in phases], axis=2
        )  # (n, h, 2, w, 2, c)
        out = out.reshape(n, 2 * h, 2 * wd, self.features)
        return out + bias


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.transpose:
            if _hr_convt() == "phase":
                x = PhaseConvTranspose2x(self.features, name="conv")(x)
            else:
                # torch ConvTranspose2d(k=4, s=2, p=1) == 2x upsample;
                # flax pad convention is k-1-p_torch = 2 per side.
                x = nn.ConvTranspose(
                    self.features, (4, 4), strides=(2, 2),
                    padding=((2, 2), (2, 2)),
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
