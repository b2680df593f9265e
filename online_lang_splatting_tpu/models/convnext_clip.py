"""ConvNeXt-L CLIP visual tower with dense pyramid output — Flax/NHWC.

Re-implements the behavior of the reference's modified open_clip TimmModel
dense forward (/root/reference/language/sed/open_clip/src/open_clip/
timm_model.py:125-146): stem + 4 ConvNeXt stages emit {stem, res2..res5},
then the CLIP projection head (trunk LayerNorm → Linear 1536→1536 → GELU →
Linear 1536→768) is applied **per spatial location** of the os32 feature
map, yielding `clip_vis_dense` (24×24×768 for a 768² input).

Architecture constants are ConvNeXt-Large (timm `convnext_large`):
depths (3, 3, 27, 3), dims (192, 384, 768, 1536), LayerNorm eps 1e-6,
layer-scale gamma, exact (erf) GELU. Everything runs in NHWC so XLA maps
convolutions straight onto the MXU; weights ported from the reference
checkpoint via tools/convert_weights.py.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

DEPTHS = (3, 3, 27, 3)
DIMS = (192, 384, 768, 1536)
EMBED_DIM = 768

# SED/CLIP preprocessing constants (reference language/sed/config.py:67-68;
# RGB order, 0-255 inputs).
CLIP_PIXEL_MEAN = (122.7709383, 116.7460125, 104.09373615)
CLIP_PIXEL_STD = (68.5005327, 66.6321579, 70.3231630)


# OLS_GELU picks the tower's GELU: "tanh" (default) or "erf" (the
# reference-exact form). The erf lowering costs real transcendental VPU
# time at 768² activation volumes: trunk 13.61 ms erf vs 10.02 ms tanh,
# and the FUSED extractor 67.17 → 90.73 FPS (v5e, hwq_r4h) — tanh is the
# production default. Accuracy envelope: full-tower cosine vs erf pinned
# >= 0.9999 (tests/test_language_models.py::TestGELUKnob), well inside
# the bf16/fp16 envelope the reference itself evaluates in
# (eval/openclip_encoder.py precision="fp16"). Torch-oracle parity sites
# construct towers with gelu_mode="erf" explicitly.
GELU_MODE = os.environ.get("OLS_GELU", "tanh")

# OLS_STEM=s2d computes the 4×4/stride-4 patchify stem as space-to-depth
# + ONE 48→192 matmul instead of XLA's convolution lowering (which runs
# at ~1 TFLOP/s on this shape — trunk_bisect, hwq_r4h). The contraction
# is mathematically identical (stride == kernel, VALID padding ⇒ each
# output location sees one disjoint 4×4×3 patch); only the summation
# order differs.
STEM_MODE = os.environ.get("OLS_STEM", "conv")

# OLS_HEAD=flat reshapes the per-location CLIP projection head's input
# (N, 24, 24, 1536) to one (N*576, 1536) matrix so the two Dense layers
# lower as plain GEMMs instead of 1x1 convs over a tiny spatial grid.
# Mathematically identical (Dense contracts only the last dim). Round-5
# A/B: the r4 profile's "head 9.9 ms standalone" row actually timed the
# WHOLE tower (clip_vis_dense depends on res5) — the true in-tower head
# cost is the full-tower minus trunk diff (~sub-ms); this knob checks
# whether even that remainder is lowering-limited.
HEAD_MODE = os.environ.get("OLS_HEAD", "mlp")


def _gelu(x, mode: str = "erf"):
    return jax.nn.gelu(x, approximate=(mode == "tanh"))


class LayerNorm(nn.Module):
    """Channel-last LayerNorm, eps 1e-6 (timm ConvNeXt convention)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-6, name="ln")(x)


class ConvNeXtBlock(nn.Module):
    dim: int
    gelu_mode: str = "erf"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(4 * self.dim, name="mlp_fc1")(y)
        y = _gelu(y, self.gelu_mode)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * y


class _ScanBlock(nn.Module):
    dim: int
    gelu_mode: str = "erf"

    @nn.compact
    def __call__(self, x, _):
        return ConvNeXtBlock(self.dim, self.gelu_mode, name="block")(x), None


class ConvNeXtStage(nn.Module):
    dim: int
    depth: int
    downsample: bool
    gelu_mode: str = "erf"

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            x = nn.LayerNorm(epsilon=1e-6, name="ds_norm")(x)
            x = nn.Conv(self.dim, (2, 2), strides=2, padding="VALID", name="ds_conv")(x)
        # Blocks are identical in shape; scan over stacked parameters keeps
        # the traced program O(1) in depth (compile-time matters: stage 2
        # has 27 blocks).
        blocks = nn.scan(
            _ScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
        )(self.dim, self.gelu_mode, name="blocks")
        x, _ = blocks(x, None)
        return x


class _StemConv(nn.Module):
    """4×4/stride-4 VALID patchify conv, parameter-compatible with
    `nn.Conv` (kernel (4, 4, 3, dim) + bias). mode="s2d" reshapes the
    input into disjoint 4×4 patches and runs one (H/4·W/4, 48)·(48, dim)
    matmul — value-identical to the convolution, MXU-friendly lowering."""

    dim: int
    mode: str = "conv"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, x.shape[-1], self.dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        # flax promote_dtype semantics: inputs and params meet at the
        # promoted dtype (bf16 input + f32 params → f32, not a downcast).
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        bias = bias.astype(dt)
        if self.mode == "s2d":
            n, h, w, c = x.shape
            assert h % 4 == 0 and w % 4 == 0, (h, w)
            xp = x.reshape(n, h // 4, 4, w // 4, 4, c)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)
            return xp @ kernel.reshape(16 * c, self.dim) + bias
        return jax.lax.conv_general_dilated(
            x, kernel, (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias


class ConvNeXtCLIPVisual(nn.Module):
    """Dense visual tower. Input: (N, H, W, 3), already normalized.

    Returns dict with NHWC feature maps:
      stem (os4), res2 (os4), res3 (os8), res4 (os16), res5 (os32),
      clip_vis_dense (os32, EMBED_DIM channels).
    """

    depths: Sequence[int] = DEPTHS
    dims: Sequence[int] = DIMS
    embed_dim: int = EMBED_DIM
    stem_mode: str = STEM_MODE
    gelu_mode: str = GELU_MODE
    head_mode: str = HEAD_MODE

    @nn.compact
    def __call__(self, x):
        out = {}
        x = _StemConv(self.dims[0], self.stem_mode, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        out["stem"] = x
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            x = ConvNeXtStage(
                dim, depth, downsample=i > 0, gelu_mode=self.gelu_mode,
                name=f"stage{i}",
            )(x)
            out[f"res{i + 2}"] = x
        # Per-location CLIP projection head (norm_pre is Identity for
        # convnext_large; the trunk head LayerNorm comes first).
        y = x
        if self.head_mode == "flat":
            n, h, w, c = y.shape
            y = y.reshape(n * h * w, c)
        y = nn.LayerNorm(epsilon=1e-6, name="head_norm")(y)
        y = nn.Dense(2 * self.embed_dim, name="head_fc1")(y)
        y = _gelu(y, self.gelu_mode)
        y = nn.Dense(self.embed_dim, use_bias=False, name="head_fc2")(y)
        if self.head_mode == "flat":
            y = y.reshape(x.shape[0], x.shape[1], x.shape[2], -1)
        out["clip_vis_dense"] = y
        return out


def normalize_image(rgb_0_255: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0, 255] → CLIP-normalized (SED convention)."""
    mean = jnp.asarray(CLIP_PIXEL_MEAN, rgb_0_255.dtype)
    std = jnp.asarray(CLIP_PIXEL_STD, rgb_0_255.dtype)
    return (rgb_0_255 - mean) / std


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize matching torch F.interpolate(align_corners=False,
    antialias=False) exactly — including on downscale, where jax.image.resize
    would apply anti-aliasing the reference does not."""
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x

    def axis_weights(in_len, out_len):
        scale = in_len / out_len
        src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_len - 1)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_len - 1)
        frac = src - i0.astype(jnp.float32)
        return i0, i1, frac

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)
    top = x[:, y0] * (1 - fy)[None, :, None, None] + x[:, y1] * fy[None, :, None, None]
    out = (
        top[:, :, x0] * (1 - fx)[None, None, :, None]
        + top[:, :, x1] * fx[None, None, :, None]
    )
    return out
