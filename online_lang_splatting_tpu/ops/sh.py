"""Real spherical harmonics (degree 0..3) for view-dependent color.

Matches the reference's SH convention and constants
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
auxiliary.h:20-39, forward.cu:23-74 and
/root/reference/gaussian_splatting/utils/sh_utils.py). Colors are
`eval + 0.5` clamped at zero; the clamp is differentiable (autodiff
reproduces the reference's `clamped`-mask gradient zeroing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH basis. sh: (..., coeffs, 3), dirs: (..., 3) unit vectors.

    Returns (..., 3) radiance (before the +0.5 shift).
    """
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - SH_C1 * y * sh[..., 1, :]
            + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_color(deg: int, sh: jax.Array, means: jax.Array, campos: jax.Array) -> jax.Array:
    """Per-Gaussian RGB from SH coefficients and viewing direction.

    means: (..., 3); campos: (3,). Clamped to >= 0 like forward.cu:69-74.
    """
    dirs = means - campos
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
    )
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """Inverse of the DC band: (rgb - 0.5) / C0 (sh_utils.py:121)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh_dc: jax.Array) -> jax.Array:
    return sh_dc * SH_C0 + 0.5
