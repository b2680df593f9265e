"""Tile-sharded (band-parallel) rasterization over a device mesh.

Multi-chip parallelism for a SINGLE render: the image's tile rows are
split into per-device horizontal bands; each chip preprocesses (cheap,
replicated), bins and blends only its own band with the standard Pallas
pipeline, and per-Gaussian gradients psum over ICI in the shard_map
transpose. This is the TPU-native analogue of the reference CUDA
rasterizer's tile-level block parallelism
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:216-362) stretched across chips — it makes
latency-critical *tracking* (one camera, one render) scale with chip
count, complementing the keyframe-sharded mapping in `parallel.mesh`.

Band decomposition is exact: per-band tile rects are the full-frame rects
intersected with the band (truncation-toward-zero only ever differs from
floor for arguments that clip to 0 anyway), depth ordering within a tile
is unchanged, and banded losses are computed as masked SUMS psum-reduced
and divided by full-frame denominators — so results match the
single-device path to float accumulation order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import lie
from ..ops.raster import RasterSettings
from ..ops.raster import config as C
from ..ops.raster.preprocess import Preprocessed, preprocess
from ..slam.renderer import RenderInputs


def band_layout(height: int, tile: int, n: int):
    """Split `height` into n tile-row bands. Returns (band_tiles_y,
    band_h, padded_h)."""
    tiles_y = (height + tile - 1) // tile
    tiles_y_pad = -(-tiles_y // n) * n
    band_tiles_y = tiles_y_pad // n
    band_h = band_tiles_y * tile
    return band_tiles_y, band_h, band_h * n


def crop_band(prep: Preprocessed, y0, *, band_h: int, tile: int,
              tiles_x: int) -> Preprocessed:
    """Restrict full-frame preprocessed Gaussians to the band starting at
    pixel row y0: shift screen y and intersect the FULL-FRAME tile rect
    (which already encodes the image clipping) with the band's tile rows —
    so the per-tile instance set is exactly the single-device one."""
    band_tiles_y = band_h // tile
    k_tiles = jnp.asarray(y0, jnp.int32) // tile
    xy = prep.xy - jnp.stack(
        [jnp.zeros_like(jnp.asarray(y0, jnp.float32)),
         jnp.asarray(y0, jnp.float32)]
    )
    rect_min_y = jnp.clip(prep.rect_min[:, 1] - k_tiles, 0, band_tiles_y)
    rect_max_y = jnp.clip(prep.rect_max[:, 1] - k_tiles, 0, band_tiles_y)
    rect_min = jnp.stack([prep.rect_min[:, 0], rect_min_y], -1)
    rect_max = jnp.stack([prep.rect_max[:, 0], rect_max_y], -1)
    tiles_touched = jnp.maximum(
        prep.rect_max[:, 0] - prep.rect_min[:, 0], 0
    ) * jnp.maximum(rect_max_y - rect_min_y, 0)
    tiles_touched = jnp.where(prep.valid, tiles_touched, 0)
    return prep._replace(
        valid=prep.valid & (tiles_touched > 0),
        xy=xy,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched.astype(jnp.int32),
        radius=prep.radius,
    )


def _band_blend(inputs: RenderInputs, view, proj, settings: RasterSettings,
                band_idx, *, band_h: int, bg=None,
                cam_trans_delta=None, cam_rot_delta=None):
    """Preprocess (full frame) + band crop + Pallas blend for one band.
    Runs inside shard_map; returns the band BlendOutput + radii."""
    from ..ops.raster.tiled import blend_tiled

    with jax.default_matmul_precision("highest"):
        dtype = inputs.xyz.dtype
        if bg is None:
            bg = jnp.zeros((3,), dtype)
        if cam_trans_delta is not None or cam_rot_delta is not None:
            rho = (cam_trans_delta if cam_trans_delta is not None
                   else jnp.zeros(3, dtype))
            theta = (cam_rot_delta if cam_rot_delta is not None
                     else jnp.zeros(3, dtype))
            view = lie.se3_exp(jnp.concatenate([rho, theta])) @ view
        full_proj = proj @ view
        w2c0 = jax.lax.stop_gradient(view)
        campos = -w2c0[:3, :3].T @ w2c0[:3, 3]

        prep = preprocess(
            inputs.xyz, inputs.scales, inputs.quats, inputs.opacity,
            view, full_proj, campos,
            shs=inputs.shs, sh_degree=settings.sh_degree,
            scale_modifier=settings.scale_modifier,
            width=settings.image_width, height=settings.image_height,
            tan_fovx=settings.tanfovx, tan_fovy=settings.tanfovy,
            tile=settings.tile,
        )
        band = crop_band(
            prep, band_idx * band_h, band_h=band_h, tile=settings.tile,
            tiles_x=(settings.image_width + settings.tile - 1) // settings.tile,
        )
        out = blend_tiled(
            band, inputs.language, bg,
            width=settings.image_width, height=band_h, tile=settings.tile,
            max_instances=settings.max_instances,
            # The boundary band's lower rows fall outside the image; the
            # dynamic row limit keeps n_touched identical to a full-frame
            # render's `py < height` mask.
            py_limit=jnp.clip(
                settings.image_height - band_idx * band_h, 0, band_h
            ),
            grad_reduce=settings.grad_reduce, stats=settings.stats,
            multiseg=settings.multiseg, scan_mxu=settings.scan_mxu,
        )
        return out, prep.radius


class BandedOutput(NamedTuple):
    color: jax.Array
    language: jax.Array
    depth: jax.Array
    opacity: jax.Array
    radii: jax.Array
    n_touched: jax.Array
    final_t: jax.Array
    overflow: jax.Array


@functools.lru_cache(maxsize=None)
def make_banded_render(mesh: Mesh, settings: RasterSettings, lang_dim: int):
    """jitted (inputs, view, proj) -> BandedOutput with the full-frame
    image assembled from per-chip bands (heights padded to the band grid
    then cropped). Differentiable; Gaussian grads psum over the mesh."""
    n = mesh.size
    h, w = settings.image_height, settings.image_width
    band_tiles_y, band_h, padded_h = band_layout(h, settings.tile, n)

    def local(inputs, view, proj):
        k = jax.lax.axis_index("dp")
        out, radii = _band_blend(
            inputs, view, proj, settings, k, band_h=band_h
        )
        return (
            out.color, out.language, out.depth, out.opacity,
            radii[None], jax.lax.psum(out.n_touched, "dp")[None],
            out.final_t[None],
            jnp.any(
                jax.lax.all_gather(out.overflow, "dp")
            ).reshape(1),
        )

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(
            P(None, "dp", None), P(None, "dp", None), P(None, "dp", None),
            P(None, "dp", None), P("dp"), P("dp"), P("dp"), P("dp"),
        ),
        check_rep=False,
    )

    def fn(inputs, view, proj):
        color, lang, depth, opac, radii, n_touched, final_t, ovf = sharded(
            inputs, view, proj
        )
        return BandedOutput(
            color=color[:, :h, :],
            language=lang[:, :h, :],
            depth=depth[:, :h, :],
            opacity=opac[:, :h, :],
            radii=radii[0],
            n_touched=n_touched[0],
            final_t=final_t[0, :h, :],
            overflow=ovf[0],
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def make_banded_tracking_run(mesh: Mesh, settings: RasterSettings,
                             max_iters: int, alpha: float = 0.95,
                             rgb_threshold: float = 0.01,
                             plateau_patience: int = 5,
                             keep_best: bool = False):
    """Band-parallel whole-frame tracking: the same one-dispatch
    while_loop as slam.frontend.tracking_run (render → masked loss →
    pose/exposure Adam → SE(3) retraction, exit on ‖tau‖<1e-4 or the
    optional loss-plateau criterion), with each
    chip rendering + differentiating its own tile band and pose gradients
    psum over ICI. gt frames enter replicated and are band-sliced on
    device. Returns (view, ea, eb, n_iters, loss, median_depth,
    visibility, overflow, demand) like tracking_run."""
    n = mesh.size
    h, w = settings.image_height, settings.image_width
    band_tiles_y, band_h, padded_h = band_layout(h, settings.tile, n)
    # Real-pixel denominators (the reference's .mean() over (C,H,W)).
    denom_rgb = 3.0 * h * w
    denom_depth = 1.0 * h * w

    # Loop renders never read n_touched — skip that kernel bookkeeping;
    # the final render (visibility psum) keeps it.
    loop_settings = settings._replace(stats=False)

    def band_loss(inputs, rho, theta, ea, eb, view, proj,
                  gt_image_p, gt_depth_p, grad_mask_p, k):
        out, _ = _band_blend(
            inputs, view, proj, loop_settings, k, band_h=band_h,
            cam_trans_delta=rho, cam_rot_delta=theta,
        )
        y0 = k * band_h
        gt_image = jax.lax.dynamic_slice_in_dim(gt_image_p, y0, band_h, 1)
        gt_depth = jax.lax.dynamic_slice_in_dim(gt_depth_p, y0, band_h, 1)
        grad_mask = jax.lax.dynamic_slice_in_dim(grad_mask_p, y0, band_h, 1)
        image_ab = jnp.exp(ea) * out.color + eb
        rgb_mask = (jnp.sum(gt_image, axis=0) > rgb_threshold)[None]
        rgb_mask = rgb_mask * grad_mask
        l1_rgb = jnp.sum(
            out.opacity * jnp.abs(image_ab * rgb_mask - gt_image * rgb_mask)
        )
        depth_mask = (gt_depth > 0.01) & (out.opacity > 0.95)
        l1_depth = jnp.sum(
            jnp.abs(out.depth * depth_mask - gt_depth * depth_mask)
        )
        loss = (alpha * l1_rgb / denom_rgb
                + (1 - alpha) * l1_depth / denom_depth)
        return jax.lax.psum(loss, "dp"), (out.overflow, out.num_instances)

    def local(inputs, view, proj, gt_image_p, gt_depth_p, grad_mask_p,
              exposure_a, exposure_b, lrs, plateau_rtol, lr_decay):
        k = jax.lax.axis_index("dp")
        zeros3 = jnp.zeros(3, jnp.float32)
        lr_list = [lrs[0], lrs[1], lrs[2], lrs[2]]
        b1, b2, eps = 0.9, 0.999, 1e-8

        def body(state):
            (view, ea, eb, m, v, t, _, loss_prev, ovf, dem, cnt, lr_scale,
             best) = state
            (loss, (o, nd)), grads = jax.value_and_grad(
                lambda rho, theta, ea, eb, view: band_loss(
                    inputs, rho, theta, ea, eb, view, proj,
                    gt_image_p, gt_depth_p, grad_mask_p, k,
                ),
                argnums=(0, 1, 2, 3), has_aux=True,
            )(zeros3, zeros3, ea, eb, view)
            # Improvement-vs-best plateau signal (frontend.tracking_run
            # docstring); loss is psum'd, so it is chip-identical.
            improved = loss < best[0] * (1 - plateau_rtol)
            # Running argmin-loss iterate (frontend.tracking_run keep_best
            # docstring); loss is psum'd, so the argmin is chip-identical.
            better = loss < best[0]
            best = (
                jnp.where(better, loss, best[0]),
                jnp.where(better, view, best[1]),
                jnp.where(better, ea, best[2]),
                jnp.where(better, eb, best[3]),
            )
            # Loss is already psum'd; its gradient w.r.t. the local band
            # contribution is per-chip partial — psum makes the pose step
            # identical on every chip.
            grads = jax.lax.psum(grads, "dp")
            ovf = ovf | jnp.any(jax.lax.all_gather(o, "dp"))
            # Peak per-band instance demand (bands bin independently, each
            # against the full bucket) — drives demand-sized growth.
            dem = jnp.maximum(dem, jnp.max(jax.lax.all_gather(nd, "dp")))
            t = t + 1
            new_m, new_v, steps = [], [], []
            for g, mi, vi, lr in zip(grads, m, v, lr_list):
                mi = b1 * mi + (1 - b1) * g
                vi = b2 * vi + (1 - b2) * g * g
                steps.append(
                    -lr * lr_scale * (mi / (1 - b1**t))
                    / (jnp.sqrt(vi / (1 - b2**t)) + eps)
                )
                new_m.append(mi)
                new_v.append(vi)
            trans_d, rot_d, d_ea, d_eb = steps
            tau = jnp.concatenate([trans_d, rot_d])
            view = lie.se3_exp(tau) @ view
            # Loss-plateau exit / reduce-lr-on-plateau
            # (frontend.tracking_run docstring); the loss is psum'd, so
            # counter and lr_scale advance identically on every chip.
            cnt = jnp.where(improved, 0, cnt + 1)
            trigger = (plateau_rtol > 0) & (cnt >= plateau_patience)
            cut = trigger & (lr_decay < 1)
            lr_scale = jnp.where(cut, lr_scale * lr_decay, lr_scale)
            cnt = jnp.where(cut, 0, cnt)
            converged = (jnp.linalg.norm(tau) < 1e-4) | (
                trigger & (lr_decay >= 1)
            )
            return (view, ea + d_ea, eb + d_eb, tuple(new_m), tuple(new_v),
                    t, converged, loss, ovf, dem, cnt, lr_scale, best)

        def cond(state):
            t, converged = state[5], state[6]
            return (t < max_iters) & ~converged

        z3 = jnp.zeros(3)
        zs = jnp.zeros(())
        init = (
            view, exposure_a, exposure_b,
            (z3, z3, zs, zs), (z3, z3, zs, zs),
            jnp.zeros((), jnp.float32), jnp.array(False), jnp.zeros(()),
            jnp.array(False), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.ones((), jnp.float32),
            (jnp.full((), jnp.inf, jnp.float32), view, exposure_a,
             exposure_b),
        )
        (view, ea, eb, _, _, n_iters, _, loss, ovf,
         dem, _, _, best) = jax.lax.while_loop(cond, body, init)
        if keep_best:
            loss, view, ea, eb = best
        # Final render at the converged pose (band), assembled outside.
        out, _ = _band_blend(inputs, view, proj, settings, k, band_h=band_h)
        n_touched = jax.lax.psum(out.n_touched, "dp")
        ovf = ovf | jnp.any(jax.lax.all_gather(out.overflow, "dp"))
        dem = jnp.maximum(
            dem, jnp.max(jax.lax.all_gather(out.num_instances, "dp"))
        )
        return (view[None], ea[None], eb[None], n_iters[None], loss[None],
                out.depth, out.opacity, n_touched[None], ovf[None],
                dem[None])

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
            P(None, "dp", None), P(None, "dp", None), P("dp"), P("dp"),
            P("dp"),
        ),
        check_rep=False,
    )

    def fn(inputs: RenderInputs, view, proj, gt_image, gt_depth, grad_mask,
           exposure_a, exposure_b, lrs, plateau_rtol=0.0, lr_decay=1.0):
        # Language channels dropped like tracking_run (loss never reads
        # them) and gt frames padded to the band grid (padding rows carry
        # zero gt → masked out of every loss term).
        track_inputs = inputs._replace(
            language=jnp.zeros((inputs.language.shape[0], 0), jnp.float32)
        )
        pad = padded_h - h

        def padh(x):
            return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        (view, ea, eb, n_iters, loss, depth, opac, n_touched, ovf,
         dem) = sharded(
            track_inputs, view, proj, padh(gt_image),
            padh(gt_depth), padh(grad_mask),
            exposure_a, exposure_b, jnp.asarray(lrs, jnp.float32),
            jnp.asarray(plateau_rtol, jnp.float32),
            jnp.asarray(lr_decay, jnp.float32),
        )
        from ..slam import losses as L

        med = L.median_depth(depth[:, :h, :], opac[:, :h, :])
        return (view[0], ea[0], eb[0], n_iters[0], loss[0], med,
                n_touched[0] > 0, ovf.any(), jnp.max(dem))

    return jax.jit(fn)
