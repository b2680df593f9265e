"""Bridge from GaussianParams to the rasterizer (reference
gaussian_renderer/__init__.py equivalent): applies activations and builds
per-camera matrices, returning the full render package."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..ops.raster import RasterSettings, rasterize


class RenderInputs(NamedTuple):
    """Activated per-Gaussian tensors (constant during tracking)."""

    xyz: jax.Array
    opacity: jax.Array
    scales: jax.Array
    quats: jax.Array
    shs: jax.Array
    language: jax.Array


def activate(params: G.GaussianParams, aux_active: jax.Array) -> RenderInputs:
    return RenderInputs(
        xyz=params.xyz,
        opacity=jax.nn.sigmoid(params.opacity[:, 0]) * aux_active,
        scales=jnp.exp(params.scaling),
        quats=params.rotation
        / jnp.linalg.norm(params.rotation, axis=-1, keepdims=True),
        shs=jnp.concatenate([params.features_dc, params.features_rest], axis=1),
        language=params.language,
    )


def render(
    inputs: RenderInputs,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    settings: RasterSettings,
    *,
    bg: jax.Array | None = None,
    cam_trans_delta=None,
    cam_rot_delta=None,
    means2d_offset=None,
):
    return rasterize(
        inputs.xyz, inputs.opacity, inputs.scales, inputs.quats,
        shs=inputs.shs, language_features=inputs.language,
        viewmatrix=viewmatrix, projmatrix=projmatrix, settings=settings,
        bg=bg, cam_trans_delta=cam_trans_delta, cam_rot_delta=cam_rot_delta,
        means2d_offset=means2d_offset,
    )
