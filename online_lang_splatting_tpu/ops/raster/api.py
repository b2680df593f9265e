"""Public differentiable rasterization API.

The functional analogue of the reference's `GaussianRasterizer` /
`LanguageGaussianRasterizer` modules (/root/reference/submodules/
diff-gaussian-rasterization/diff_gaussian_rasterization/__init__.py:405-576).
Inputs are post-activation Gaussian parameters; camera-pose gradients come
from the `cam_rot_delta`/`cam_trans_delta` perturbation (the reference's
theta/rho) which re-derives the view and full-projection matrices through
`lie.se3_exp` inside the traced function.

Backends:
  "oracle" — dense pure-JAX compositor (exact, O(P·H·W); parity tests).
  "tpu"    — tile-binned Pallas pipeline (production path).
  "auto"   — tpu when available, oracle otherwise for tiny inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import config as C
from .oracle import blend_oracle
from .preprocess import preprocess


class RasterSettings(NamedTuple):
    """Static (hashable) rasterization configuration."""

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    sh_degree: int = 3
    scale_modifier: float = 1.0
    tile: int = C.DEFAULT_TILE
    backend: str = "auto"
    # Capacity knobs for the tiled backend (instances = Gaussian×tile dups).
    max_instances: int | None = None
    # Per-Gaussian gradient reduction ("scatter" | "emission"); None takes
    # the OLS_GRAD_REDUCE env default (config.GRAD_REDUCE).
    grad_reduce: str | None = None
    # stats=False skips n_touched/n_contrib kernel bookkeeping (outputs
    # zero) for render loops that never read them (tracking iterations).
    stats: bool = True
    # Blend-kernel segment strategy ("off" | "on" | "hybrid"); None takes
    # the OLS_MULTISEG env default (config.MULTISEG).
    multiseg: str | None = None
    # In-kernel prefix-scan implementation ("off" | "bwd" | "all" — MXU
    # triangular dots vs Hillis-Steele); None takes the OLS_SCAN_MXU env
    # default (config.SCAN_MXU).
    scan_mxu: str | None = None


def grow_bucket(current: int, demand: int, margin: float = 1.25) -> int:
    """Demand-sized instance-bucket growth.

    Every cap-sized cost (pack gather, grad scatter-add, sort, kernel
    grid) scales with the BUCKET, not the live occupancy, so blind
    doubling leaves up to ~50% permanently dead rows. Renders report
    their exact pre-truncation instance demand (`RasterOutput.
    num_instances`); on overflow, land on demand x margin (the margin
    absorbs densification growth within the replayed chunk), but never
    grow by less than 1.5x — each distinct bucket compiles fresh
    programs through the (slow) remote relay, so the growth count must
    stay logarithmic while the final bucket stays snug to the scene.
    Snapped UP to a quarter-power-of-two grid (2^k x {1, 1.25, 1.5,
    1.75}): tracking and mapping grow independently from *different*
    observed demands, and _sync_frontend_state max-merges their buckets —
    a shared coarse grid makes nearby demands land on the SAME rung, so
    the merge rarely mints a third size (every distinct size compiles
    fresh programs through the relay). Grid values >= 2^13 are multiples
    of the blend kernel's 8-chunk quantum. Degenerates to near-doubling
    when demand is stale or unavailable."""
    target = max(int(demand * margin), (current * 3 + 1) // 2,
                 8 * C.BLEND_CHUNK)
    k = max((target - 1).bit_length() - 1, 13)  # 2^k < target <= 2^(k+1)
    for num in (5, 6, 7, 8):
        snapped = (1 << k) * num // 4
        if snapped >= target:
            return snapped
    return 1 << (k + 1)


class RasterOutput(NamedTuple):
    color: jax.Array       # (3, H, W)
    language: jax.Array    # (F, H, W)
    depth: jax.Array       # (1, H, W)
    opacity: jax.Array     # (1, H, W)
    radii: jax.Array       # (P,) int32
    n_touched: jax.Array   # (P,) int32
    final_t: jax.Array     # (H, W)
    n_contrib: jax.Array   # (H, W) int32 — last contributing position in
                           # the pixel's tile range (forward.cu n_contrib)
    num_instances: jax.Array  # () int32 — Gaussian-tile instances this frame
    overflow: jax.Array       # () bool — instance capacity exceeded (output
                              # truncated; re-render with a larger bucket)


def rasterize(
    means3d: jax.Array,
    opacities: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    *,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    settings: RasterSettings,
    shs: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
    language_features: jax.Array | None = None,
    bg: jax.Array | None = None,
    cam_trans_delta: jax.Array | None = None,
    cam_rot_delta: jax.Array | None = None,
    means2d_offset: jax.Array | None = None,
) -> RasterOutput:
    """Differentiable splat render.

    viewmatrix: (4,4) W2C. projmatrix: (4,4) intrinsics projection P (the
    reference's `projmatrix_raw`); the full transform P @ W2C is formed
    here so pose perturbations flow through it.
    """
    with jax.default_matmul_precision("highest"):
        return _rasterize_highp(
            means3d, opacities, scales, quats,
            viewmatrix=viewmatrix, projmatrix=projmatrix, settings=settings,
            shs=shs, colors_precomp=colors_precomp,
            cov3d_precomp=cov3d_precomp, language_features=language_features,
            bg=bg, cam_trans_delta=cam_trans_delta,
            cam_rot_delta=cam_rot_delta, means2d_offset=means2d_offset,
        )


def _rasterize_highp(
    means3d, opacities, scales, quats, *, viewmatrix, projmatrix, settings,
    shs, colors_precomp, cov3d_precomp, language_features, bg,
    cam_trans_delta, cam_rot_delta, means2d_offset,
) -> RasterOutput:
    # Geometry math (point/covariance projection) is precision-critical:
    # the default bf16 MXU passes shift screen positions by ~0.1 px and
    # break parity with the reference; the matmuls here are tiny, so f32
    # ("highest") costs nothing. Callers go through `rasterize`, which
    # pins the precision context.
    dtype = means3d.dtype
    if bg is None:
        bg = jnp.zeros((3,), dtype)
    if cam_trans_delta is not None or cam_rot_delta is not None:
        rho = cam_trans_delta if cam_trans_delta is not None else jnp.zeros(3, dtype)
        theta = cam_rot_delta if cam_rot_delta is not None else jnp.zeros(3, dtype)
        tau = jnp.concatenate([rho, theta])
        viewmatrix = lie.se3_exp(tau) @ viewmatrix
    full_proj = projmatrix @ viewmatrix
    # Reference camera center: inverse W2C translation, constant w.r.t. pose
    # deltas (the CUDA backward carries no campos term).
    w2c0 = jax.lax.stop_gradient(viewmatrix)
    campos = -w2c0[:3, :3].T @ w2c0[:3, 3]

    prep = preprocess(
        means3d, scales, quats, opacities,
        viewmatrix, full_proj, campos,
        shs=shs, colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        sh_degree=settings.sh_degree, scale_modifier=settings.scale_modifier,
        width=settings.image_width, height=settings.image_height,
        tan_fovx=settings.tanfovx, tan_fovy=settings.tanfovy,
        tile=settings.tile, means2d_offset=means2d_offset,
    )

    backend = settings.backend
    if backend == "auto":
        backend = "tpu"
    if backend == "oracle":
        out = blend_oracle(
            prep, language_features, bg,
            width=settings.image_width, height=settings.image_height,
            tile=settings.tile,
        )
    else:
        from .tiled import blend_tiled

        out = blend_tiled(
            prep, language_features, bg,
            width=settings.image_width, height=settings.image_height,
            tile=settings.tile, max_instances=settings.max_instances,
            grad_reduce=settings.grad_reduce, stats=settings.stats,
            multiseg=settings.multiseg, scan_mxu=settings.scan_mxu,
        )
    return RasterOutput(
        color=out.color,
        language=out.language,
        depth=out.depth,
        opacity=out.opacity,
        radii=prep.radius,
        n_touched=out.n_touched,
        final_t=out.final_t,
        n_contrib=out.n_contrib,
        num_instances=out.num_instances,
        overflow=out.overflow,
    )
