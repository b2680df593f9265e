"""SED-style dense language feature extraction — the fused per-frame path.

The reference splits this across detectron2's SED meta-arch
(/root/reference/language/sed/sed_model.py:132-209: normalize → resize to
768² → dense CLIP encode), the HR refinement net (slam_backend.py:537-554)
and the autoencoder encode (slam_backend.py:559). Here the whole
frame → (192, 192, low_dim) pipeline is ONE jitted function — this is the
">40 FPS per chip" kernel of BASELINE.md.

Weights come from `tools/convert_weights.py` outputs (npz trees). With no
checkpoint present, random-initialized parameters keep the pipeline
runnable for tests and benchmarks.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .autoencoder import AutoencoderMLP, EncoderDecoderOnline
from .convnext_clip import ConvNeXtCLIPVisual, normalize_image, resize_bilinear
from .hr_net import HighResLanguageFeatureNet

CLIP_RESOLUTION = (768, 768)


class LangFeatureExtractor:
    """Host-side holder of the visual tower + HR head + AE encoder params."""

    def __init__(
        self,
        visual_params: Any | None = None,
        hr_variables: Any | None = None,
        ae_variables: Any | None = None,
        *,
        encoder_dims=None,
        decoder_dims=None,
        use_hr: bool = True,
        dtype=jnp.float32,
        compute_dtype=None,
        rng: jax.Array | None = None,
        clip_resolution=None,
    ):
        # compute_dtype=jnp.bfloat16 halves HBM traffic and doubles MXU
        # throughput for the conv towers; the reference's own eval encoder
        # runs fp16 (eval/openclip_encoder.py precision="fp16"), so half
        # precision inference is within its accuracy envelope. Outputs are
        # cast back to `dtype`.
        self.compute_dtype = compute_dtype or dtype
        # SED resizes every frame to 768x768 before the dense encode
        # (sed_model.py:98,164); overridable for small-scale tests.
        self.clip_resolution = clip_resolution or CLIP_RESOLUTION
        from .autoencoder import ONE_STAGE_DEC, ONE_STAGE_ENC

        self.visual = ConvNeXtCLIPVisual()
        self.hr = HighResLanguageFeatureNet() if use_hr else None
        self.ae = AutoencoderMLP(
            encoder_dims=tuple(encoder_dims or ONE_STAGE_ENC),
            decoder_dims=tuple(decoder_dims or ONE_STAGE_DEC),
        )
        self.dtype = dtype

        rng = rng if rng is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        if visual_params is None:
            dummy = jnp.zeros((1, 64, 64, 3), dtype)
            visual_params = self.visual.init(k1, dummy)["params"]
        if hr_variables is None and use_hr:
            hr_variables = self.hr.init(
                k2,
                jnp.zeros((1, 2, 2, 768), dtype),
                jnp.zeros((1, 8, 8, 384), dtype),
                jnp.zeros((1, 16, 16, 192), dtype),
            )
        if ae_variables is None:
            ae_variables = self.ae.init(k3, jnp.zeros((1, 768), dtype))
        if self.compute_dtype != dtype:
            # Cast the conv-tower weights ONCE at construction: leaving
            # them in `dtype` makes every jitted frame re-cast the ~200M
            # ConvNeXt-L parameter tree on device (~1.2 GB of HBM traffic
            # per frame). The in-jit _cast then sees arrays already in
            # compute_dtype and folds to identity. The AE stays in
            # `dtype` — its f32 latents are the supervision signal.
            visual_params = self._cast(visual_params)
            hr_variables = self._cast(hr_variables)
        self.visual_params = visual_params
        self.hr_variables = hr_variables
        self.ae_variables = ae_variables

    # -- pure functions (jit-compiled once per shape) -----------------------

    def _cast(self, tree):
        import jax

        if self.compute_dtype == self.dtype:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _dense_features(self, visual_params, rgb):
        """rgb: (H, W, 3) float 0-255 → pyramid dict (NHWC, batch of 1)."""
        x = normalize_image(rgb)[None].astype(self.compute_dtype)
        x = resize_bilinear(x, self.clip_resolution)
        feats = self.visual.apply({"params": self._cast(visual_params)}, x)
        return {k: v.astype(self.dtype) for k, v in feats.items()}

    @functools.partial(jax.jit, static_argnums=0)
    def _hr_features(self, visual_params, hr_variables, rgb):
        hr, feats = self._hr_inner(visual_params, hr_variables, rgb)
        return hr.astype(self.dtype), {
            k: v.astype(self.dtype) for k, v in feats.items()
        }

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_frame(self, visual_params, hr_variables, ae_variables, rgb):
        """Fused frame → (192, 192, low_dim) low-dimensional language map."""
        hr, _ = self._hr_inner(visual_params, hr_variables, rgb)
        n, h, w, c = hr.shape
        # The AE runs in f32: its normalized latents are the supervision
        # signal and are cheap relative to the conv towers.
        flat = hr.reshape(-1, c).astype(self.dtype)
        code = self.ae.apply(ae_variables, flat, method=AutoencoderMLP.encode)
        return code.reshape(h, w, -1)

    def _hr_inner(self, visual_params, hr_variables, rgb):
        x = normalize_image(rgb)[None].astype(self.compute_dtype)
        feats = self.visual.apply(
            {"params": self._cast(visual_params)},
            resize_bilinear(x, self.clip_resolution),
        )
        if self.hr is None:
            # Reference hr_model=None path (slam_backend.py:537-554): the
            # os32 dense CLIP map supervises directly, no refinement.
            return feats["clip_vis_dense"], feats
        hr = self.hr.apply(
            self._cast(hr_variables), feats["clip_vis_dense"], feats["res3"],
            feats["res2"],
        )
        return hr, feats

    # -- public API ---------------------------------------------------------

    def dense_clip(self, rgb) -> dict:
        """Reference `get_lang_feat` equivalent (sed_model.py dense path)."""
        return self._dense_features(self.visual_params, jnp.asarray(rgb, self.dtype))

    def hr_features(self, rgb) -> jax.Array:
        """(192, 192, 768) refined CLIP map (reference hr_model output)."""
        hr, _ = self._hr_features(
            self.visual_params, self.hr_variables, jnp.asarray(rgb, self.dtype)
        )
        return hr[0]

    def encode_frame(self, rgb) -> jax.Array:
        """(192, 192, low_dim) — the full online language supervision map."""
        return self._encode_frame(
            self.visual_params, self.hr_variables, self.ae_variables,
            jnp.asarray(rgb, self.dtype),
        )

    def decode_codes(self, codes) -> jax.Array:
        """(..., low_dim) → (..., 768) through the AE decoder."""
        flat = jnp.asarray(codes, self.dtype).reshape(-1, codes.shape[-1])
        out = self.ae.apply(
            self.ae_variables, flat, method=AutoencoderMLP.decode
        )
        return out.reshape(codes.shape[:-1] + (out.shape[-1],))
