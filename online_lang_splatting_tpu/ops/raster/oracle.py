"""Dense pure-JAX alpha-compositing oracle.

Numerically exact re-statement of the reference blend kernels
(`language_renderCUDA`, /root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/forward.cu:377-513): front-to-back compositing in global
depth order with the alpha clamp at 0.99, the 1/255 skip, the T<1e-4
early-stop (the stopping Gaussian does NOT contribute), per-pixel
`n_contrib`, per-Gaussian `n_touched` (test_T > 0.5), and — crucially —
the tile-rect visibility cut: a Gaussian only affects pixels whose tile
lies inside its screen rect, reproducing the tile binning exactly.

O(P · H · W) — this is the parity oracle and autodiff reference for the
Pallas production kernel, not a fast path. Differentiable end-to-end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import config as C
from .preprocess import Preprocessed, tile_keeps_instance


class BlendOutput(NamedTuple):
    color: jax.Array      # (3, H, W)
    language: jax.Array   # (F, H, W) — zero-size F when no language features
    depth: jax.Array      # (1, H, W)
    opacity: jax.Array    # (1, H, W)
    final_t: jax.Array    # (H, W)
    n_contrib: jax.Array  # (H, W) int32
    n_touched: jax.Array  # (P,) int32
    num_instances: jax.Array = None  # () int32 (tiled backend)
    overflow: jax.Array = None       # () bool (tiled backend)


def blend_oracle(
    prep: Preprocessed,
    language_features: jax.Array | None,
    bg: jax.Array,
    *,
    width: int,
    height: int,
    tile: int = C.DEFAULT_TILE,
) -> BlendOutput:
    p = prep.xy.shape[0]
    feats = prep.color
    lang = (
        language_features
        if language_features is not None
        else jnp.zeros((p, 0), dtype=feats.dtype)
    )
    f_lang = lang.shape[1]

    # Global stable depth sort (mirrors the per-tile radix order: depth
    # ascending, ties by Gaussian index).
    sort_depth = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)

    xy = prep.xy[order]
    conic = prep.conic[order]
    op = prep.opacity[order]
    col = feats[order]
    lng = lang[order]
    dep = prep.depth[order]
    valid = prep.valid[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(feats.dtype)  # (N, 2)
    tile_xy = (pix / tile).astype(jnp.int32)
    n_pix = pix.shape[0]

    def step(carry, g):
        t, done, acc_c, acc_l, acc_d, n_contrib, range_pos = carry
        (g_xy, g_conic, g_op, g_col, g_lng, g_dep, g_valid, g_rmin, g_rmax) = g

        in_rect = (
            (tile_xy[:, 0] >= g_rmin[0])
            & (tile_xy[:, 0] < g_rmax[0])
            & (tile_xy[:, 1] >= g_rmin[1])
            & (tile_xy[:, 1] < g_rmax[1])
            & g_valid
        )
        # The binning culls (Gaussian, tile) instances no pixel of the
        # tile can see at alpha >= ALPHA_MIN (exact, shared helper) —
        # mirror it so per-tile instance sequences (n_contrib) match.
        if C.PER_TILE_CULL:
            in_rect = in_rect & tile_keeps_instance(
                g_xy[0], g_xy[1], g_conic[0], g_conic[1], g_conic[2], g_op,
                (tile_xy[:, 0] * tile).astype(jnp.float32),
                (tile_xy[:, 1] * tile).astype(jnp.float32),
                tile,
            )
        d = g_xy[None, :] - pix  # (N, 2)
        power = (
            -0.5 * (g_conic[0] * d[:, 0] ** 2 + g_conic[2] * d[:, 1] ** 2)
            - g_conic[1] * d[:, 0] * d[:, 1]
        )
        alpha = jnp.minimum(C.ALPHA_MAX, g_op * jnp.exp(power))
        skip = (power > 0.0) | (alpha < C.ALPHA_MIN) | ~in_rect
        alpha = jnp.where(skip, 0.0, alpha)

        test_t = t * (1.0 - alpha)
        stop_now = ~skip & (test_t < C.T_EPS) & ~done
        contrib = ~skip & ~done & ~stop_now

        w = jnp.where(contrib, alpha * t, 0.0)  # (N,)
        acc_c = acc_c + w[:, None] * g_col[None, :]
        acc_l = acc_l + w[:, None] * g_lng[None, :]
        acc_d = acc_d + w * g_dep
        touched = jnp.sum((contrib & (test_t > C.N_TOUCHED_T)).astype(jnp.int32))
        # CUDA `contributor` counts positions within the pixel's TILE range
        # (every in-rect Gaussian, skipped or not; forward.cu:441-447), and
        # n_contrib records the last position that actually contributed.
        range_pos = range_pos + in_rect.astype(jnp.int32)
        n_contrib = jnp.where(contrib, range_pos, n_contrib)
        t = jnp.where(contrib, test_t, t)
        done = done | stop_now
        return (t, done, acc_c, acc_l, acc_d, n_contrib, range_pos), touched

    init = (
        jnp.ones((n_pix,), feats.dtype),
        jnp.zeros((n_pix,), bool),
        jnp.zeros((n_pix, 3), feats.dtype),
        jnp.zeros((n_pix, f_lang), feats.dtype),
        jnp.zeros((n_pix,), feats.dtype),
        jnp.zeros((n_pix,), jnp.int32),
        jnp.zeros((n_pix,), jnp.int32),
    )
    (t, _, acc_c, acc_l, acc_d, n_contrib, _), touched_sorted = jax.lax.scan(
        step, init, (xy, conic, op, col, lng, dep, valid, rect_min, rect_max)
    )

    n_touched = jnp.zeros((p,), jnp.int32).at[order].set(
        touched_sorted.astype(jnp.int32)
    )

    color = (acc_c + t[:, None] * bg[None, :]).T.reshape(3, height, width)
    language = acc_l.T.reshape(f_lang, height, width)
    depth = acc_d.reshape(1, height, width)
    opacity = (1.0 - t).reshape(1, height, width)
    return BlendOutput(
        color=color,
        language=language,
        depth=depth,
        opacity=opacity,
        final_t=t.reshape(height, width),
        n_contrib=n_contrib.reshape(height, width),
        n_touched=n_touched,
        num_instances=jnp.sum(prep.tiles_touched),
        overflow=jnp.zeros((), bool),
    )
