"""Camera matrices (world→view, intrinsics projection) in pure JAX.

Conventions follow the reference scene math
(/root/reference/gaussian_splatting/utils/graphics_utils.py:33-101):
row-major 4x4 matrices, OpenGL-less z-forward projection built directly
from pinhole intrinsics, and the rasterizer's "raw" projection kept
separate from the composed full projection so pose perturbations can be
re-applied (reference settings field `projmatrix_raw`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def world_to_view(r: jax.Array, t: jax.Array) -> jax.Array:
    """W2C homogeneous matrix from rotation R and translation t.

    The reference's getWorld2View2 round-trips through the C2W inverse with
    an optional recentering (translate=0, scale=1 in all SLAM configs),
    which reduces to simply assembling [R | t].
    """
    return jnp.eye(4, dtype=r.dtype).at[:3, :3].set(r).at[:3, 3].set(t)


def projection_matrix(
    znear: float, zfar: float, cx: float, cy: float, fx: float, fy: float,
    width: int, height: int, dtype=jnp.float32,
) -> jax.Array:
    """Intrinsics-based perspective projection (reference getProjectionMatrix2).

    Maps view space to NDC with a principal-point shift; z maps to
    [0, zfar/(zfar-znear)] style depth, w = z_view.
    """
    left = ((2 * cx - width) / width - 1.0) * width / 2.0
    right = ((2 * cx - width) / width + 1.0) * width / 2.0
    top = ((2 * cy - height) / height + 1.0) * height / 2.0
    bottom = ((2 * cy - height) / height - 1.0) * height / 2.0
    left = znear / fx * left
    right = znear / fx * right
    top = znear / fy * top
    bottom = znear / fy * bottom

    p = jnp.zeros((4, 4), dtype=dtype)
    p = p.at[0, 0].set(2.0 * znear / (right - left))
    p = p.at[1, 1].set(2.0 * znear / (top - bottom))
    p = p.at[0, 2].set((right + left) / (right - left))
    p = p.at[1, 2].set((top + bottom) / (top - bottom))
    p = p.at[3, 2].set(1.0)
    p = p.at[2, 2].set(zfar / (zfar - znear))
    p = p.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return p


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def ndc_to_pix(v: jax.Array, size: int) -> jax.Array:
    """NDC [-1,1] -> pixel center coordinate, reference auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def transform_points(points: jax.Array, mat4: jax.Array) -> jax.Array:
    """Apply a homogeneous 4x4 (row-vector convention of the reference CUDA:
    out = M^T · [p;1] with M stored row-major == points @ M[:3,:3]^T ... ).

    The CUDA helpers index the matrix column-major flattened from a torch
    row-major tensor that was already transposed on the Python side, which
    nets out to: out_i = sum_j mat[i, j] * p_j + mat[i, 3].
    points: (..., 3) -> (..., 4) homogeneous result (x, y, z, w).
    """
    ph = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return ph @ mat4.T


def transform_points_3x4(points: jax.Array, mat4: jax.Array) -> jax.Array:
    """Rigid transform ignoring the projective row: (..., 3) -> (..., 3)."""
    return points @ mat4[:3, :3].T + mat4[:3, 3]
