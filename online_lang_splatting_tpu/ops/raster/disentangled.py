"""Disentangle-optim rasterization variant.

The reference's second engine (/root/reference/submodules/
diff-gaussian-rasterization-disentangle-optim/) gives the language
channels their **own geometry**: a separate opacity, scale and rotation
per Gaussian, a separate preprocess, binning pass and blend, returning
duplicated outputs (radii_lang, opacity_lang, n_touched_lang; config.h
uses 3 language channels and 16×16 tiles).

Here that decomposes into two invocations of the shared tiled pipeline —
one for color+depth using the color geometry, one for the language
channels using the language geometry — which is exactly what the CUDA
variant's duplicated kernels compute, without duplicating any code.
Both passes share positions and the SE(3) pose perturbation, so pose
gradients accumulate from both, like the reference's dual dL_dtau
reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import config as C
from .api import RasterSettings, _rasterize_highp


class DisentangledOutput(NamedTuple):
    color: jax.Array
    language: jax.Array
    depth: jax.Array
    opacity: jax.Array
    opacity_lang: jax.Array
    radii: jax.Array
    radii_lang: jax.Array
    n_touched: jax.Array
    n_touched_lang: jax.Array
    final_t: jax.Array
    final_t_lang: jax.Array


def rasterize_disentangled(
    means3d: jax.Array,
    opacities: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities_lang: jax.Array,
    scales_lang: jax.Array,
    quats_lang: jax.Array,
    *,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    settings: RasterSettings,
    shs: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    language_features: jax.Array | None = None,
    bg: jax.Array | None = None,
    cam_trans_delta: jax.Array | None = None,
    cam_rot_delta: jax.Array | None = None,
) -> DisentangledOutput:
    with jax.default_matmul_precision("highest"):
        dtype = means3d.dtype
        if cam_trans_delta is not None or cam_rot_delta is not None:
            rho = cam_trans_delta if cam_trans_delta is not None else jnp.zeros(3, dtype)
            theta = cam_rot_delta if cam_rot_delta is not None else jnp.zeros(3, dtype)
            viewmatrix = lie.se3_exp(jnp.concatenate([rho, theta])) @ viewmatrix

        color_out = _rasterize_highp(
            means3d, opacities, scales, quats,
            viewmatrix=viewmatrix, projmatrix=projmatrix, settings=settings,
            shs=shs, colors_precomp=colors_precomp, cov3d_precomp=None,
            language_features=None, bg=bg,
            cam_trans_delta=None, cam_rot_delta=None, means2d_offset=None,
        )
        p = means3d.shape[0]
        lang = (
            language_features if language_features is not None
            else jnp.zeros((p, 3), dtype)
        )
        lang_out = _rasterize_highp(
            means3d, opacities_lang, scales_lang, quats_lang,
            viewmatrix=viewmatrix, projmatrix=projmatrix, settings=settings,
            shs=None,
            colors_precomp=jnp.zeros((p, 3), dtype),
            cov3d_precomp=None,
            language_features=lang, bg=None,
            cam_trans_delta=None, cam_rot_delta=None, means2d_offset=None,
        )
    return DisentangledOutput(
        color=color_out.color,
        language=lang_out.language,
        depth=color_out.depth,
        opacity=color_out.opacity,
        opacity_lang=lang_out.opacity,
        radii=color_out.radii,
        radii_lang=lang_out.radii,
        n_touched=color_out.n_touched,
        n_touched_lang=lang_out.n_touched,
        final_t=color_out.final_t,
        final_t_lang=lang_out.final_t,
    )
