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
    rect_min: jax.Array   # (P, 2) int32 inclusive EMISSION rect start (x, y)
    rect_max: jax.Array   # (P, 2) int32 exclusive emission rect end — the
                          # 3σ circle rect ∩ the alpha>=ALPHA_MIN ellipse AABB
    tiles_touched: jax.Array  # (P,) int32 emission-rect tile count


def tile_min_power(x, y, ca, cb, cc, x0, y0, tile: int):
    """Exact min of Q(d) = 0.5·(ca·dx² + cc·dy²) + cb·dx·dy over the
    tile's pixel box [x0, x0+tile-1] × [y0, y0+tile-1], with
    d = (x - px, y - py). The blend alpha is op·exp(-Q), so this bounds
    the best alpha any pixel of the tile can see. Exact for PSD conics:
    the min is 0 when the center lies in the box, else it sits on one of
    the 4 edges, where the 1-D restriction is a convex quadratic whose
    clamped vertex is the exact minimizer."""
    hx = x - x0
    lx = x - (x0 + (tile - 1.0))
    hy = y - y0
    ly = y - (y0 + (tile - 1.0))
    inside = (lx <= 0.0) & (hx >= 0.0) & (ly <= 0.0) & (hy >= 0.0)

    def qval(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(dxf):  # dx fixed at a box face, minimize over dy
        dy = jnp.clip(jnp.where(cc != 0.0, -cb * dxf / cc, 0.0), ly, hy)
        return qval(dxf, dy)

    def edge_y(dyf):
        dx = jnp.clip(jnp.where(ca != 0.0, -cb * dyf / ca, 0.0), lx, hx)
        return qval(dx, dyf)

    q = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)),
    )
    return jnp.where(inside, 0.0, q)


def tile_keeps_instance(x, y, ca, cb, cc, op, x0, y0, tile: int):
    """True when some pixel of the tile can see alpha >= ALPHA_MIN from
    this Gaussian — the exact (Gaussian, tile) cull shared by the binning
    expansion and the oracle. Instances failing this are provably inert
    in the blend (every pixel skips them), so dropping them changes no
    output except the n_contrib per-tile indexing. The +1e-3 margin keeps
    borderline instances so per-pixel float rounding in the kernels can
    never disagree with the cull."""
    q = tile_min_power(x, y, ca, cb, cc, x0, y0, tile)
    return q <= jnp.log(jnp.maximum(op, 1e-12) / C.ALPHA_MIN) + 1e-3


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
    # This is the reference's 3σ-circle rect — it alone defines `valid`
    # (radii > 0 visibility semantics) and the `radius` output.
    rect_min_x = jnp.clip(((px - radius) / tile).astype(jnp.int32), 0, tiles_x)
    rect_min_y = jnp.clip(((py - radius) / tile).astype(jnp.int32), 0, tiles_y)
    rect_max_x = jnp.clip(((px + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_x)
    rect_max_y = jnp.clip(((py + radius + tile - 1) / tile).astype(jnp.int32), 0, tiles_y)
    tiles_touched = jnp.maximum(rect_max_x - rect_min_x, 0) * jnp.maximum(
        rect_max_y - rect_min_y, 0
    )

    valid = in_front & det_ok & (tiles_touched > 0)

    # Emission rect: intersect the circle rect with the exact
    # alpha >= ALPHA_MIN ellipse AABB. The blend skips any pixel with
    # alpha = op·exp(-Q) < ALPHA_MIN, and min over dy of Q at offset dx
    # is dx²/(2·cov_xx) — so pixels with |dx| > sqrt(2τ·cov_xx),
    # τ = log(op/ALPHA_MIN), are provably inert (same for dy/cov_yy).
    # Intersecting (never replacing) keeps the emission rect a SUBSET of
    # the reference rect: outputs are pixel-identical, only n_contrib's
    # per-tile indexing shifts. Opacity-aware: faint Gaussians emit far
    # fewer instances; op < ALPHA_MIN emits none. The +tile (not
    # +tile-1) end and +1e-2 px margin keep the AABB conservative — the
    # binning's exact per-tile cull prunes any overhang. PSD guard:
    # indefinite covariances (det < 0) keep the circle rect.
    op_flat = opacities.reshape(-1)
    tau = 2.0 * jnp.log(jnp.maximum(op_flat, 1e-12) / C.ALPHA_MIN)
    psd = det > 0.0
    ex = jnp.sqrt(jnp.maximum(tau * cov[..., 0], 0.0)) + 1e-2
    ey = jnp.sqrt(jnp.maximum(tau * cov[..., 2], 0.0)) + 1e-2
    big = jnp.float32(2.0 * (tiles_x + tiles_y) * tile)
    ex = jnp.where(psd, ex, big)
    ey = jnp.where(psd, ey, big)
    emin_x = jnp.maximum(
        rect_min_x, jnp.clip(((px - ex) / tile).astype(jnp.int32), 0, tiles_x)
    )
    emin_y = jnp.maximum(
        rect_min_y, jnp.clip(((py - ey) / tile).astype(jnp.int32), 0, tiles_y)
    )
    emax_x = jnp.minimum(
        rect_max_x, jnp.clip(((px + ex + tile) / tile).astype(jnp.int32), 0, tiles_x)
    )
    emax_y = jnp.minimum(
        rect_max_y, jnp.clip(((py + ey + tile) / tile).astype(jnp.int32), 0, tiles_y)
    )
    inert = psd & (op_flat < C.ALPHA_MIN)
    emit_touched = jnp.where(
        inert,
        0,
        jnp.maximum(emax_x - emin_x, 0) * jnp.maximum(emax_y - emin_y, 0),
    )

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
        rect_min=jnp.stack([emin_x, emin_y], -1),
        rect_max=jnp.stack([emax_x, emax_y], -1),
        tiles_touched=jnp.where(
            valid, emit_touched, zero_i
        ).astype(jnp.int32),
    )
