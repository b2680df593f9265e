"""Per-Gaussian screen-space preprocessing — pure JAX, fully differentiable.

Replaces the reference's `preprocessCUDA` / `languagePreprocessCUDA`
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:159-371) and, by virtue of being differentiable, the entire
hand-written preprocess backward (backward.cu:150-676) including the
SE(3) camera-pose Jacobians: the view/projection matrices are traced
functions of a pose perturbation tau through `lie.se3_exp`, so
`jax.grad` w.r.t. tau reproduces `dL_dtau`.

Everything is batched over the Gaussian axis (elementwise + tiny matmuls),
which XLA fuses into a single pass — no Pallas needed here; the MXU/VPU
split happens naturally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import sh as sh_ops
from . import config as C


class Preprocessed(NamedTuple):
    """Screen-space per-Gaussian quantities consumed by the blend kernels."""

    valid: jax.Array      # (P,) bool — survives frustum cull, det != 0, tiles > 0
    xy: jax.Array         # (P, 2) pixel-space mean
    depth: jax.Array      # (P,) view-space z
    conic: jax.Array      # (P, 3) inverse 2D covariance (a, b, c)
    opacity: jax.Array    # (P,)
    color: jax.Array      # (P, 3)
    radius: jax.Array     # (P,) int32 screen radius (0 when culled)
    rect_min: jax.Array   # (P, 2) int32 inclusive tile rect start (x, y)
    rect_max: jax.Array   # (P, 2) int32 exclusive tile rect end (x, y)
    tiles_touched: jax.Array  # (P,) int32


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(…, 4) wxyz quaternion -> (…, 3, 3) rotation. No normalization —
    callers pass activation-normalized quaternions, like the reference."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def compute_cov3d(scales: jax.Array, scale_modifier: float, quats: jax.Array) -> jax.Array:
    """World covariance Sigma = R S^2 R^T; returns (P, 3, 3).

    Written as explicit elementwise algebra: batched (P,3,3) einsums lower
    to P tiny matmuls, which the MXU cannot tile — measured ~6x slower
    than this VPU form at P=200k (tools/kernel_probe.py)."""
    r = quat_to_rotmat(quats)
    s2 = jnp.square(scale_modifier * scales)  # (P, 3)
    # Sigma_ik = sum_j r_ij * s2_j * r_kj — expand over the fixed j axis.
    rs = r * s2[..., None, :]
    return (
        rs[..., :, 0:1] * r[..., None, :, 0]
        + rs[..., :, 1:2] * r[..., None, :, 1]
        + rs[..., :, 2:3] * r[..., None, :, 2]
    )


def compute_cov2d(
    mean3d: jax.Array, cov3d: jax.Array, viewmatrix: jax.Array,
    focal_x: float, focal_y: float, tan_fovx: float, tan_fovy: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """EWA splatting: project world covariance to 2D screen space.

    Returns (P, 3) packed symmetric (cov_xx, cov_xy, cov_yy) with the
    reference's +0.3 px low-pass on the diagonal (forward.cu:77-116).
    `valid` guards the 1/z terms: culled Gaussians would otherwise emit
    inf/NaN whose zero-cotangent products still poison reverse-mode AD.
    """
    t = mean3d @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]
    tz = t[..., 2]
    if valid is not None:
        tz = jnp.where(valid, tz, 1.0)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J @ W has rows jw0 = a·w0 + c·w2 and jw1 = b·w1 + d·w2 where w_i are
    # the (constant) view-rotation rows. Expanding jw Σ jwᵀ over the six
    # constant-row bilinear forms s_ij = w_i Σ w_jᵀ keeps everything
    # elementwise over the Gaussian axis — batched (P,2,3)·(P,3,3) einsums
    # lower to P tiny matmuls the MXU cannot tile (~6x slower at P=200k,
    # tools/kernel_probe.py).
    a = focal_x / tz
    b = focal_y / tz
    c = -(focal_x * tx) / (tz * tz)
    d = -(focal_y * ty) / (tz * tz)
    w_rows = viewmatrix[:3, :3]

    def bilinear(i, j):
        wi, wj = w_rows[i], w_rows[j]
        acc = 0.0
        for k in range(3):
            for l in range(3):
                acc = acc + (wi[k] * wj[l]) * cov3d[..., k, l]
        return acc

    s00 = bilinear(0, 0)
    s01 = bilinear(0, 1)
    s02 = bilinear(0, 2)
    s11 = bilinear(1, 1)
    s12 = bilinear(1, 2)
    s22 = bilinear(2, 2)
    cov_xx = a * a * s00 + 2.0 * a * c * s02 + c * c * s22
    cov_xy = a * b * s01 + a * d * s02 + c * b * s12 + c * d * s22
    cov_yy = b * b * s11 + 2.0 * b * d * s12 + d * d * s22
    return jnp.stack(
        [cov_xx + C.LOWPASS, cov_xy, cov_yy + C.LOWPASS], -1
    )


def preprocess(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    campos: jax.Array,
    *,
    shs: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    tile: int = C.DEFAULT_TILE,
    means2d_offset: jax.Array | None = None,
) -> Preprocessed:
    """Project Gaussians to screen space.

    `viewmatrix` is W2C (4,4) — already perturbed by the pose delta if pose
    gradients are wanted; `projmatrix` is the full P @ W2C product.
    `campos` is treated as a constant (matching the reference, whose
    backward has no campos-pose term).
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile

    p_view = means3d @ viewmatrix[:3, :3].T + viewmatrix[:3, 3]
    depth = p_view[..., 2]
    in_front = depth > C.NEAR_CLIP

    hom = means3d @ projmatrix[:3, :3].T + projmatrix[:3, 3]
    w = means3d @ projmatrix[3, :3].T + projmatrix[3, 3]
    # Guarded divide: for culled points 1/(w+eps) can blow up and its NaN/inf
    # partials leak through zero cotangents in the backward pass.
    w_safe = jnp.where(in_front, w, 1.0)
    p_w = 1.0 / (w_safe + 1e-7)
    p_proj = hom * p_w[..., None]

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scales, scale_modifier, quats)
    cov = compute_cov2d(
        means3d, cov3d, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy,
        valid=in_front,
    )

    det = cov[..., 0] * cov[..., 2] - cov[..., 1] * cov[..., 1]
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov[..., 2] * det_inv, -cov[..., 1] * det_inv, cov[..., 0] * det_inv], -1
    )

    mid = 0.5 * (cov[..., 0] + cov[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))

    px = (p_proj[..., 0] + 1.0) * width * 0.5 - 0.5
    py = (p_proj[..., 1] + 1.0) * height * 0.5 - 0.5
    xy = jnp.stack([px, py], -1)
    if means2d_offset is not None:
        # Zero-valued hook whose cotangent is the screen-space position
        # gradient (the reference's `viewspace_points.grad`, used for
        # densification statistics).
        xy = xy + means2d_offset
        px, py = xy[..., 0], xy[..., 1]

    # Tile rect (auxiliary.h getRect): int-cast toward zero then clamp.
    rect_min_x = jnp.clip(((px - radius) / tile).astype(jnp.int32), 0, tiles_x)
    rect_min_y = jnp.clip(((py - radius) / tile).astype(jnp.int32), 0, tiles_y)
    rect_max_x = jnp.clip(((px + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_x)
    rect_max_y = jnp.clip(((py + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_y)
    tiles_touched = jnp.maximum(rect_max_x - rect_min_x, 0) * jnp.maximum(
        rect_max_y - rect_min_y, 0
    )

    valid = in_front & det_ok & (tiles_touched > 0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_ops.sh_to_color(sh_degree, shs, means3d, jax.lax.stop_gradient(campos))

    zero_i = jnp.zeros_like(tiles_touched)
    return Preprocessed(
        valid=valid,
        xy=xy,
        depth=depth,
        conic=conic,
        opacity=opacities.reshape(-1),
        color=color,
        radius=jnp.where(valid, radius, 0).astype(jnp.int32),
        rect_min=jnp.stack([rect_min_x, rect_min_y], -1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], -1),
        tiles_touched=jnp.where(valid, tiles_touched, zero_i).astype(jnp.int32),
    )
