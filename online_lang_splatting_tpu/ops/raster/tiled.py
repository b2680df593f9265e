"""Tiled Pallas blend — the production rasterization path.

TPU-first redesign of the reference CUDA blend kernels
(`language_renderCUDA` forward, forward.cu:377-513; blend backward,
backward.cu:707-1203). Key design decisions, none of which mirror CUDA:

* The grid is a **flat sequence of instance chunks** (128 sorted
  Gaussian-instances each), chunk-aligned per tile by the binning pass.
  TPU grids execute sequentially on a core, so per-tile compositing state
  (transmittance T, done mask, accumulators) carries across grid steps in
  VMEM scratch / the revisited output block; Pallas double-buffers the
  HBM→VMEM instance streaming automatically via BlockSpecs. No atomics,
  no shared-memory staging, no warp reductions.

* Within a chunk, compositing is **vectorized, not sequential**: alpha for
  all 128 instances × 256 pixels at once, exclusive-prefix transmittance
  via a strictly-lower-triangular matmul in log space (MXU), early-stop
  via a triangular cummax. Channel accumulation is one (F×128)·(128×256)
  matmul per chunk — RGB + language + depth ride the MXU together.

* The backward runs **forward** over the same chunk sequence: the suffix
  sums the CUDA back-to-front rewalk needs are obtained as
  (total − forward prefix), with the totals taken from the saved forward
  outputs. No reverse iteration, no T/(1-alpha) divisions.

Per-Gaussian gradients leave the kernel per-instance and are segment-summed
outside (XLA scatter-add), mirroring gather/scatter duality.

Data layout: instance arrays are stored transposed — geometry (8, S) and
features (F_pad, S) — so every streamed block is a native (sublane×128)
tile and the channel dimension feeds the MXU directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config as C
from .binning import Binning, bin_gaussians
from .preprocess import Preprocessed

CHUNK = 256

# geom rows: x, y, conic_a, conic_b, conic_c, opacity, valid, (pad)
GEOM_ROWS = 8

# n_touched rows per output block (TPU blocks need >= 8 sublanes).
NT_ROWS = 8


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pix_pad(tile: int) -> int:
    return ((tile * tile + 127) // 128) * 128


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _shift_down(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows down by s (row i <- row i-s), filling the top with `fill`."""
    rolled = pltpu.roll(x, s, axis=0)
    return jnp.where(_row_iota(x.shape) >= s, rolled, fill)


def _prefix_scan(x: jax.Array, op, fill: float) -> jax.Array:
    """Inclusive Hillis-Steele prefix scan along axis 0 (log2 steps on the
    VPU — exact f32, unlike an MXU triangular matmul)."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = op(x, _shift_down(x, s, fill))
        s *= 2
    return x


def _prefix_prod_excl(x: jax.Array) -> jax.Array:
    """Exclusive prefix product along axis 0."""
    return _prefix_scan(_shift_down(x, 1, 1.0), jnp.multiply, 1.0)


def _prefix_sum_incl(x: jax.Array) -> jax.Array:
    return _prefix_scan(x, jnp.add, 0.0)


def _prefix_max_incl(x: jax.Array) -> jax.Array:
    return _prefix_scan(x, jnp.maximum, 0.0)


def _pixel_coords(tile_id, tiles_x: int, tile: int, pix: int):
    """Per-lane pixel coordinates of this tile; (1, pix) float32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    px = tx * tile + lane % tile
    py = ty * tile + lane // tile
    in_tile = lane < tile * tile
    return px.astype(jnp.float32), py.astype(jnp.float32), in_tile


def _chunk_alpha(geom, tile_id, tiles_x: int, tile: int, pix: int):
    """Shared fwd/bwd per-chunk alpha computation.

    geom: (GEOM_ROWS, CHUNK). Returns dict of (CHUNK, pix)/(CHUNK, 1) arrays.
    """
    gt = geom.T  # (CHUNK, GEOM_ROWS)
    x, y = gt[:, 0:1], gt[:, 1:2]
    ca, cb, cc = gt[:, 2:3], gt[:, 3:4], gt[:, 4:5]
    op = gt[:, 5:6]
    gvalid = gt[:, 6:7] > 0.5

    px, py, in_tile = _pixel_coords(tile_id, tiles_x, tile, pix)
    dx = x - px  # (CHUNK, pix)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_raw = op * jnp.exp(power)
    alpha_cl = jnp.minimum(C.ALPHA_MAX, alpha_raw)
    skip = (power > 0.0) | (alpha_cl < C.ALPHA_MIN) | ~gvalid
    alpha = jnp.where(skip, 0.0, alpha_cl)
    return dict(
        alpha=alpha, skip=skip, power=power, alpha_raw=alpha_raw,
        dx=dx, dy=dy, in_tile=in_tile, px=px, py=py,
    )


def _composite(alpha, skip, t_prev, done_prev):
    """Prefix-product transmittance + stop handling for one chunk.

    t_prev/done_prev: (1, pix). Returns (cum_t, test_t, contrib, w,
    t_new, done_new) with contrib/w zeroed after any stop.
    """
    one_minus = 1.0 - alpha  # >= 0.01 (alpha clamped at 0.99)
    cum_t = t_prev * _prefix_prod_excl(one_minus)
    test_t = cum_t * one_minus
    stop = jnp.where(~skip & (test_t < C.T_EPS), 1.0, 0.0)
    stopped_incl = _prefix_max_incl(stop) > 0.5
    live = done_prev < 0.5  # (1, pix)
    contrib = (~skip) & (~stopped_incl) & live
    w = jnp.where(contrib, alpha * cum_t, 0.0)
    # reduce_prod is unimplemented in Mosaic; take the last row of an
    # inclusive prefix product instead.
    contrib_prod = _prefix_scan(
        jnp.where(contrib, one_minus, 1.0), jnp.multiply, 1.0
    )
    t_new = t_prev * contrib_prod[-1:, :]
    done_new = jnp.maximum(done_prev, jnp.max(stop, axis=0, keepdims=True))
    return cum_t, test_t, contrib, w, t_new, done_new


def _fwd_kernel(
    # scalar prefetch
    ct_ref, cf_ref, cl_ref, lim_ref,
    # inputs
    geom_ref, feat_ref,
    # outputs
    acc_ref, nt_ref,
    # scratch
    t_s, done_s, acc_s, nt_s, nc_s, off_s,
    *, tiles_x: int, num_tiles: int, tile: int, pix: int, f_pad: int,
    f_out: int, width: int, height: int,
):
    # NOTE on buffering: Pallas double-buffers output blocks, and with
    # scalar-prefetch-driven index maps it cannot prove consecutive steps
    # revisit the same block — so accumulating *into* an output ref reads
    # the stale sibling buffer. All cross-chunk state therefore lives in
    # VMEM scratch, and every output block is written exactly once (at the
    # tile's last chunk / the nt block's last row).
    c = pl.program_id(0)
    tile_id = ct_ref[c]
    active = tile_id < num_tiles
    nt_row = jax.lax.rem(c, NT_ROWS)

    @pl.when(cf_ref[c] == 1)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        t_s[...] = jnp.ones_like(t_s)
        done_s[...] = jnp.zeros_like(done_s)
        nc_s[...] = jnp.zeros_like(nc_s)
        off_s[0, 0] = 0

    @pl.when(active)
    def _():
        a = _chunk_alpha(geom_ref[...], tile_id, tiles_x, tile, pix)
        cum_t, test_t, contrib, w, t_new, done_new = _composite(
            a["alpha"], a["skip"], t_s[...], done_s[...]
        )
        acc_s[...] += jax.lax.dot_general(
            feat_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # py limit is DYNAMIC (scalar prefetch): a band-parallel caller
        # renders a band_h-tall strip whose valid-row count depends on the
        # band index (parallel/tile_shard.py); single-device callers pass
        # the static image height.
        pix_ok = (
            a["in_tile"] & (a["px"] < width)
            & (a["py"] < lim_ref[0].astype(jnp.float32))
        )
        touched = contrib & (test_t > C.N_TOUCHED_T) & pix_ok
        nt_s[pl.ds(nt_row, 1), :] = jnp.sum(
            touched, axis=1, dtype=jnp.int32
        ).reshape(1, CHUNK)
        # last-contributor index within the tile's instance sequence
        # (1-based, 0 = no contributor) — the CUDA kernels' n_contrib.
        glob = (
            _row_iota(contrib.shape) + 1 + off_s[0, 0]
        ).astype(jnp.float32)
        cand = jnp.max(
            jnp.where(contrib, glob, 0.0), axis=0, keepdims=True
        )
        nc_s[...] = jnp.maximum(nc_s[...], cand)
        off_s[0, 0] = off_s[0, 0] + CHUNK
        t_s[...] = t_new
        done_s[...] = done_new

    @pl.when(~active)
    def _():
        nt_s[pl.ds(nt_row, 1), :] = jnp.zeros((1, CHUNK), jnp.int32)

    @pl.when(cl_ref[c] == 1)
    def _():
        # final_T rides as channel row f_out of the accumulator tile and
        # n_contrib as row f_out+1.
        acc_s[pl.ds(f_out, 1), :] = t_s[...]
        acc_s[pl.ds(f_out + 1, 1), :] = nc_s[...]
        acc_ref[...] = acc_s[...][None]

    @pl.when(nt_row == NT_ROWS - 1)
    def _():
        nt_ref[...] = nt_s[...]


def _bwd_kernel(
    ct_ref, cf_ref, cl_ref, lim_ref,
    geom_ref, feat_ref, gacc_ref, acc_res_ref,
    dgeom_ref, dfeat_ref,
    t_s, done_s, carry_ref,
    *, tiles_x: int, num_tiles: int, tile: int, pix: int, f_pad: int,
    f_out: int, width: int, height: int,
):
    c = pl.program_id(0)
    tile_id = ct_ref[c]
    active = tile_id < num_tiles

    @pl.when(cf_ref[c] == 1)
    def _():
        t_s[...] = jnp.ones_like(t_s)
        done_s[...] = jnp.zeros_like(done_s)
        # total_S = sum_f g_f * A_f (per pixel) — row f_out holds
        # (T_end, gT_end), so the final-transmittance term is included.
        carry_ref[...] = jnp.sum(
            gacc_ref[0] * acc_res_ref[0], axis=0, keepdims=True
        )

    dgeom = jnp.zeros((CHUNK, GEOM_ROWS), jnp.float32)
    dfeat = jnp.zeros((f_pad, CHUNK), jnp.float32)

    @pl.when(active)
    def _():
        a = _chunk_alpha(geom_ref[...], tile_id, tiles_x, tile, pix)
        alpha, skip = a["alpha"], a["skip"]
        cum_t, test_t, contrib, w, t_new, done_new = _composite(
            alpha, skip, t_s[...], done_s[...]
        )
        g_img = gacc_ref[0]  # (f_pad, pix)
        # G_j[p] = sum_f feat[f, j] * g[f, p]
        gdot = jax.lax.dot_general(
            feat_ref[...], g_img, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CHUNK, pix)
        wg = w * gdot
        prefix_incl = _prefix_sum_incl(wg)
        suffix = carry_ref[...] - prefix_incl  # S_j = future wG + T_end*gT_end
        dalpha = jnp.where(
            contrib, cum_t * gdot - suffix / (1.0 - alpha), 0.0
        )
        not_clamped = a["alpha_raw"] < C.ALPHA_MAX
        dpower = jnp.where(not_clamped, dalpha * alpha, 0.0)
        expp = jnp.exp(a["power"])
        dop = jnp.sum(jnp.where(not_clamped, dalpha * expp, 0.0), axis=1)
        dx, dy = a["dx"], a["dy"]
        gt = geom_ref[...].T
        ca, cb, cc = gt[:, 2:3], gt[:, 3:4], gt[:, 4:5]
        dca = jnp.sum(dpower * (-0.5) * dx * dx, axis=1)
        dcb = jnp.sum(dpower * (-dx * dy), axis=1)
        dcc = jnp.sum(dpower * (-0.5) * dy * dy, axis=1)
        dxg = jnp.sum(dpower * (-(ca * dx + cb * dy)), axis=1)
        dyg = jnp.sum(dpower * (-(cc * dy + cb * dx)), axis=1)
        zeros = jnp.zeros_like(dop)
        dg = jnp.stack([dxg, dyg, dca, dcb, dcc, dop, zeros, zeros], axis=1)
        df = jax.lax.dot_general(
            g_img, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (f_pad, CHUNK)
        dgeom_ref[...] = dg.T
        dfeat_ref[...] = df
        carry_ref[...] = carry_ref[...] - jnp.sum(wg, axis=0, keepdims=True)
        t_s[...] = t_new
        done_s[...] = done_new

    @pl.when(~active)
    def _():
        dgeom_ref[...] = dgeom.T
        dfeat_ref[...] = dfeat


class _BlendAux(NamedTuple):
    binning: Binning
    tiles_x: int
    tiles_y: int
    tile: int
    width: int
    height: int


def _pack_instances(xy, conic, opacity, color, lang, depth, point_list):
    """Gather per-Gaussian data into transposed per-instance arrays.

    One wide-row gather: per-column gathers cost ~log-free but scalar-width
    HBM access each; a single (P, D)-row gather moves the same bytes an
    order of magnitude faster on TPU."""
    s = point_list.shape[0]
    ids = jnp.maximum(point_list, 0)
    valid = (point_list >= 0).astype(jnp.float32)
    f_lang = lang.shape[1]
    f_out = 3 + f_lang + 1
    # Reserve two extra rows: final_T rides as channel f_out and the
    # per-pixel last-contributor index (n_contrib, forward.cu:515-644
    # semantics) as channel f_out+1.
    f_pad = ((f_out + 2 + 7) // 8) * 8
    table = jnp.concatenate(
        [
            xy, conic, opacity[:, None],          # geom rows 0..5
            color, lang, depth[:, None],          # feat rows 0..f_out-1
        ],
        axis=1,
    ).astype(jnp.float32)  # (P, 6 + f_out)
    rows = table[ids].T  # (6 + f_out, S) — single gather + one relayout
    geom = jnp.concatenate(
        [rows[:6], valid[None, :], jnp.zeros((1, s), jnp.float32)], axis=0
    )
    feat = jnp.pad(rows[6:], ((0, f_pad - f_out), (0, 0))) * valid[None, :]
    return geom, feat, f_pad, f_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _blend_core(xy, conic, opacity, color, lang, depth, point_list, chunk_tile,
                chunk_first, chunk_last, tile_counts, py_limit,
                tile, width, height):
    out, _ = _blend_fwd_impl(
        xy, conic, opacity, color, lang, depth, point_list, chunk_tile,
        chunk_first, chunk_last, tile_counts, py_limit, tile, width, height
    )
    return out


def _blend_fwd_impl(xy, conic, opacity, color, lang, depth, point_list,
                    chunk_tile, chunk_first, chunk_last, tile_counts,
                    py_limit, tile, width, height):
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    pix = _pix_pad(tile)
    num_chunks = chunk_tile.shape[0]

    geom, feat, f_pad, f_out = _pack_instances(
        xy, conic, opacity, color, lang, depth, point_list
    )

    kern = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles, tile=tile, pix=pix,
        f_pad=f_pad, f_out=f_out, width=width, height=height,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((f_pad, CHUNK), lambda c, *_: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, f_pad, pix),
                         lambda c, ct, cf, cl, lim: (ct[c], 0, 0)),
            pl.BlockSpec(
                (NT_ROWS, CHUNK), lambda c, *_: (c // NT_ROWS, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((f_pad, pix), jnp.float32),
            pltpu.VMEM((NT_ROWS, CHUNK), jnp.int32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    acc, n_touched = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles + 1, f_pad, pix), jnp.float32),
            jax.ShapeDtypeStruct((num_chunks, CHUNK), jnp.int32),
        ],
        interpret=_interpret(),
    )(chunk_tile, chunk_first, chunk_last, py_limit, geom, feat)

    # Sanitize tiles no chunk ever visited (empty tiles + the dummy row):
    # zero accumulators, final_T (channel row f_out) = 1.
    tile_live = jnp.concatenate([tile_counts > 0, jnp.zeros((1,), bool)])
    empty = jnp.zeros((f_pad, pix), acc.dtype).at[f_out].set(1.0)
    acc = jnp.where(tile_live[:, None, None], acc, empty[None])
    out = (acc, n_touched)
    residuals = (
        xy, conic, opacity, color, lang, depth, acc,
        point_list, chunk_tile, chunk_first, chunk_last, tile_counts,
        py_limit,
    )
    return out, residuals


def _blend_fwd(xy, conic, opacity, color, lang, depth, point_list, chunk_tile,
               chunk_first, chunk_last, tile_counts, py_limit,
               tile, width, height):
    return _blend_fwd_impl(
        xy, conic, opacity, color, lang, depth, point_list, chunk_tile,
        chunk_first, chunk_last, tile_counts, py_limit, tile, width, height
    )


def _blend_bwd(tile, width, height, residuals, cotangents):
    (xy, conic, opacity, color, lang, depth, acc_res,
     point_list, chunk_tile, chunk_first, chunk_last, tile_counts,
     py_limit) = residuals
    g_acc, _ = cotangents  # n_touched is int — no cotangent
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    pix = _pix_pad(tile)
    num_chunks = chunk_tile.shape[0]

    geom, feat, f_pad, f_out = _pack_instances(
        xy, conic, opacity, color, lang, depth, point_list
    )
    f_lang = lang.shape[1]

    kern = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles, tile=tile, pix=pix,
        f_pad=f_pad, f_out=f_out, width=width, height=height,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((f_pad, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((1, f_pad, pix),
                         lambda c, ct, cf, cl, lim: (ct[c], 0, 0)),
            pl.BlockSpec((1, f_pad, pix),
                         lambda c, ct, cf, cl, lim: (ct[c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((f_pad, CHUNK), lambda c, *_: (0, c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
        ],
    )
    dgeom, dfeat = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((GEOM_ROWS, point_list.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct((f_pad, point_list.shape[0]), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_tile, chunk_first, chunk_last, py_limit, geom, feat, g_acc,
      acc_res)

    # Segment-sum per-instance grads back to per-Gaussian grads as ONE
    # wide-row scatter-add (six narrow scatters each pay full random-access
    # cost; a single (S, D) row scatter moves the same bytes far faster).
    p = xy.shape[0]
    ids = jnp.where(point_list >= 0, point_list, p)
    rows = jnp.concatenate([dgeom[0:6], dfeat[: 3 + f_lang + 1]], axis=0).T
    table = jnp.zeros((p, rows.shape[1]), xy.dtype).at[ids].add(
        rows, mode="drop"
    )
    d_xy = table[:, 0:2]
    d_conic = table[:, 2:5]
    d_op = table[:, 5]
    d_color = table[:, 6:9]
    d_lang = table[:, 9 : 9 + f_lang]
    d_depth = table[:, 9 + f_lang]
    return (d_xy, d_conic, d_op, d_color, d_lang, d_depth,
            None, None, None, None, None, None)


_blend_core.defvjp(_blend_fwd, _blend_bwd)


def blend_tiled(
    prep: Preprocessed,
    language_features: jax.Array | None,
    bg: jax.Array,
    *,
    width: int,
    height: int,
    tile: int = C.DEFAULT_TILE,
    max_instances: int | None = None,
    chunk: int = CHUNK,
    py_limit: jax.Array | None = None,
):
    """Full tiled pipeline: bin → Pallas blend → image assembly.

    Returns the same BlendOutput as the oracle. Gradients flow to every
    preprocessed quantity through the custom VJP; binning indices are
    non-differentiable by construction.
    """
    from .oracle import BlendOutput

    p = prep.xy.shape[0]
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    if max_instances is None:
        max_instances = max(8 * p, 1 << 14)
    max_instances = ((max_instances + chunk - 1) // chunk) * chunk

    binning = bin_gaussians(
        prep, tiles_x=tiles_x, tiles_y=tiles_y,
        max_instances=max_instances, chunk=chunk,
    )
    lang = (
        language_features
        if language_features is not None
        else jnp.zeros((p, 0), jnp.float32)
    )
    f_lang = lang.shape[1]

    if py_limit is None:
        py_limit = jnp.full((1,), height, jnp.int32)
    else:
        py_limit = jnp.asarray(py_limit, jnp.int32).reshape(1)
    acc, nt_chunks = _blend_core(
        prep.xy, prep.conic, prep.opacity, prep.color, lang,
        jnp.where(prep.valid, prep.depth, 0.0),
        binning.point_list, binning.chunk_tile, binning.chunk_first,
        binning.chunk_last, binning.tile_counts, py_limit,
        tile, width, height,
    )

    # n_touched: per-chunk rows -> per-instance -> per-Gaussian.
    ids = jnp.maximum(binning.point_list, 0)
    nt_inst = jnp.where(binning.point_list >= 0, nt_chunks.reshape(-1), 0)
    n_touched = jnp.zeros((p,), jnp.int32).at[ids].add(nt_inst)

    def tiles_to_image(tiles_arr):  # (T+1, k, pix) -> (k, H, W)
        k = tiles_arr.shape[1]
        t = tiles_arr[: tiles_x * tiles_y, :, : tile * tile]
        t = t.reshape(tiles_y, tiles_x, k, tile, tile)
        t = t.transpose(2, 0, 3, 1, 4).reshape(k, tiles_y * tile, tiles_x * tile)
        return t[:, :height, :width]

    f_out = 3 + f_lang + 1
    img = tiles_to_image(acc)
    ft_img = img[f_out]
    color = img[0:3] + ft_img[None] * bg[:, None, None]
    language = img[3 : 3 + f_lang]
    depth_img = img[3 + f_lang : 4 + f_lang]
    opacity_img = (1.0 - ft_img)[None]
    # Row f_out+1 carries the per-pixel last-contributor index (int-valued
    # f32; stop_gradient-by-cast like the CUDA n_contrib buffer).
    n_contrib = img[f_out + 1].astype(jnp.int32)
    return BlendOutput(
        color=color,
        language=language,
        depth=depth_img,
        opacity=opacity_img,
        final_t=ft_img,
        n_contrib=n_contrib,
        n_touched=n_touched,
        num_instances=binning.num_instances,
        overflow=binning.overflow,
    )
