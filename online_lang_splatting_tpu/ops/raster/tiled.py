"""Tiled Pallas blend — the production rasterization path.

TPU-first redesign of the reference CUDA blend kernels
(`language_renderCUDA` forward, forward.cu:377-513; blend backward,
backward.cu:707-1203). Key design decisions, none of which mirror CUDA:

* Instance arrays stay in COMPACT (tile, depth)-sorted order — no
  chunk-aligned slot padding. The grid is a flat sequence of 256-instance
  chunks of the sorted array; each grid step discovers the tile SEGMENTS
  inside its chunk (usually one; more when tile boundaries cross it) and
  composites each against its own tile's pixel block. Keeping S == cap
  (instead of cap + per-tile padding) shrinks every instance-sized
  pack/gather/scatter and the grid itself by ~30-50% — on this hardware
  those data movements, not the VPU math, dominate (tools/kernel_probe.py).

* Per-tile compositing state (transmittance T, done mask, accumulators)
  carries across grid steps in VMEM scratch; completed tiles are flushed
  to an ANY-memory (HBM) output with an explicit async DMA (staged, waits
  deferred to the next flush). TPU grids execute sequentially on a core,
  so no atomics, no shared-memory staging, no warp reductions.

* Within a segment, compositing is **vectorized, not sequential**: alpha
  for all 256 instances × 256 pixels at once, exclusive-prefix
  transmittance via Hillis-Steele shifts (exact f32), early-stop via a
  prefix max. Channel accumulation is one (F×256)·(256×256) matmul per
  segment — RGB + language + depth ride the MXU together.

* The backward runs **forward** over the same chunk sequence: the suffix
  sums the CUDA back-to-front rewalk needs are obtained as
  (total − forward prefix), with the totals taken from the saved forward
  outputs (DMA'd in per tile). No reverse iteration, no T/(1-alpha)
  divisions.

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
from .binning import SortedBinning, bin_gaussians_sorted
from .preprocess import Preprocessed

CHUNK = C.BLEND_CHUNK

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


def _seg_prefix_scan(x: jax.Array, headf: jax.Array, op):
    """Inclusive SEGMENTED Hillis-Steele scan along axis 0.

    headf: (n, 1) float32, 1.0 marking the first row of each run.
    PRECONDITION: headf[0] == 1 (row 0 starts a run — always true for
    tile segments). That makes both wrap-fills unnecessary: after k
    steps f_i = "any head in (i-2^k, i]", so every wrapped row i < 2^k
    has f_i = 1 (its window contains row 0) and the select discards the
    wrapped operand — bare rolls, no iota masks. Flags ride as f32
    max-scans (Mosaic has no vector bool rolls)."""
    f = headf
    n = x.shape[0]
    s = 1
    while s < n:
        xs = pltpu.roll(x, s, axis=0)
        fs = pltpu.roll(f, s, axis=0)
        x = jnp.where(f > 0.5, x, op(x, xs))
        f = jnp.maximum(f, fs)
        s *= 2
    return x


def _mxu_prefix(mat: jax.Array, x: jax.Array) -> jax.Array:
    """Prefix reduction as triangular-matrix MXU dots (OLS_SCAN_MXU).

    mat is a (CHUNK, CHUNK) f32 0/1 mask (triangular, optionally
    segment-restricted); x is (CHUNK, pix). Replaces a log2(CHUNK)-step
    Hillis-Steele scan (~24 full-block VPU passes) with 3 MXU matmuls +
    ~4 VPU passes. bf16_3x is spelled out by hand, with every operand
    kept in f32 DTYPE but bf16-EXACT in value: x splits into three
    bf16-exact terms (8+8+8 significand bits — the split is exact), so
    Mosaic's default f32 lowering (ONE bf16 MXU pass, measured ~4e-3
    relative on unsplit operands) is exact on each term and on the 0/1
    mask, leaving only f32 accumulation rounding — the same error class
    as the Hillis-Steele scan. Explicit bf16 operands are rejected
    ("Bad lhs type"), Precision.HIGH is unimplemented in the v5e
    lowering, and HIGHEST 128x128 dots hang the remote compile
    (CLAUDE.md)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid

    def dot(v):
        return jax.lax.dot_general(
            mat, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(hi) + dot(mid) + dot(lo)


def _tri_mask(strict: bool, same: jax.Array | None = None) -> jax.Array:
    """(CHUNK, CHUNK) f32 lower-triangular mask: row i sums/products over
    rows j < i (strict) or j <= i. With `same` ((CHUNK, CHUNK) bool —
    instance i and j share a tile segment), the mask is additionally
    segment-restricted (the MXU form of a segmented scan)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    m = (ll < r) if strict else (ll <= r)
    if same is not None:
        m = m & same
    return m.astype(jnp.float32)


def _geom_grad_rows(dalpha, a, gt):
    """(8, CHUNK) geometry-gradient block [dxg, dyg, dca, dcb, dcc, dop,
    0, 0] from the per-(instance, pixel) alpha cotangent.

    Conic entries are per-instance constants, so the position grads
    factor through per-row reductions of full-block products against the
    broadcast conic COLUMNS ((CHUNK, 1) -> (CHUNK, pix)). Every stacked
    row must be the direct output of a (CHUNK, pix) lane reduction: rows
    assembled from scalarized column slices (gt[:, k][:, 0] * sx, or any
    1-D arithmetic on them) keep lane offset k, and Mosaic refuses to
    stack rows with mismatched lane offsets ("result/input offset
    mismatch on non-concat dimension", v5e remote compile)."""
    not_clamped = a["alpha_raw"] < C.ALPHA_MAX
    # In the unclamped region alpha == op*exp(power), so dpower =
    # (dalpha*expp)*op shares one product with dop.
    de = jnp.where(not_clamped, dalpha * a["expp"], 0.0)
    dop = jnp.sum(de, axis=1)
    dpower = de * gt[:, 5:6]
    dx, dy = a["dx"], a["dy"]
    ca, cb, cc = gt[:, 2:3], gt[:, 3:4], gt[:, 4:5]
    ddx = dpower * dx
    ddy = dpower * dy
    dca = -0.5 * jnp.sum(ddx * dx, axis=1)
    dcb = -jnp.sum(ddx * dy, axis=1)
    dcc = -0.5 * jnp.sum(ddy * dy, axis=1)
    dxg = -jnp.sum(ddx * ca + ddy * cb, axis=1)
    dyg = -jnp.sum(ddy * cc + ddx * cb, axis=1)
    zeros = jnp.zeros_like(dop)
    return jnp.stack(
        [dxg, dyg, dca, dcb, dcc, dop, zeros, zeros], axis=0
    )


def _prod_rows(x: jax.Array) -> jax.Array:
    """Product over axis 0 -> (1, cols) via a halving tree: ~2 full-size
    passes of VPU work where a Hillis-Steele scan (whose last row is the
    same reduction) costs log2(n) full-size passes. reduce_prod itself is
    unimplemented in Mosaic; sublane slicing is cheap."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        x = x[:h] * x[h:n]
        n = h
    return x


def _pixel_coords(tile_id, tiles_x: int, tile: int, pix: int):
    """Per-lane pixel coordinates; (·, pix) float32.

    tile_id is either a scalar (one tile for the whole block — the
    per-segment loop path) or a (CHUNK, 1) int32 array of per-ROW tile
    ids (the vectorized multi-segment path), in which case the returned
    px/py are (CHUNK, pix) with each row in its own tile's frame."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    in_tile = lane < tile * tile
    if isinstance(tile_id, jax.Array) and tile_id.ndim == 2:
        # f32 div/floor: exact for tile ids < 2^23 with quotients < 2^13
        # (int32 div/mod is software-emulated on the VPU).
        tf = tile_id.astype(jnp.float32)
        ty = jnp.floor(tf / tiles_x)
        tx = tf - ty * tiles_x
        px = tx * tile + (lane % tile).astype(jnp.float32)
        py = ty * tile + (lane // tile).astype(jnp.float32)
        return px, py, in_tile
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    px = tx * tile + lane % tile
    py = ty * tile + lane // tile
    return px.astype(jnp.float32), py.astype(jnp.float32), in_tile


def _chunk_alpha(geom, tile_id, tiles_x: int, tile: int, pix: int,
                 row_lo=None, row_hi=None):
    """Shared fwd/bwd per-chunk alpha computation.

    geom: (GEOM_ROWS, CHUNK). With row_lo/row_hi, rows outside
    [row_lo, row_hi) are masked out (segment restriction).
    Returns dict of (CHUNK, pix)/(CHUNK, 1) arrays.
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
    expp = jnp.exp(power)
    alpha_raw = op * expp
    alpha_cl = jnp.minimum(C.ALPHA_MAX, alpha_raw)
    skip = (power > 0.0) | (alpha_cl < C.ALPHA_MIN) | ~gvalid
    if row_lo is not None:
        rows = _row_iota((CHUNK, 1))
        skip = skip | (rows < row_lo) | (rows >= row_hi)
    alpha = jnp.where(skip, 0.0, alpha_cl)
    return dict(
        alpha=alpha, skip=skip, power=power, expp=expp,
        alpha_raw=alpha_raw, dx=dx, dy=dy, in_tile=in_tile, px=px, py=py,
    )


def _composite(alpha, skip, t_prev, done_prev, tri=None):
    """Prefix-product transmittance + stop handling for one chunk.

    t_prev/done_prev: (1, pix). Returns (cum_t, test_t, contrib, w,
    t_new, done_new) with contrib/w zeroed after any stop. With `tri`
    (a strict `_tri_mask`) the exclusive product rides the MXU in log
    space — one_minus >= 0.01 (alpha clamp), and masked rows are exactly
    1.0 so their log is exactly 0.
    """
    one_minus = 1.0 - alpha  # >= 0.01 (alpha clamped at 0.99)
    if tri is not None:
        cum_t = t_prev * jnp.exp(_mxu_prefix(tri, jnp.log(one_minus)))
    else:
        cum_t = t_prev * _prefix_prod_excl(one_minus)
    test_t = cum_t * one_minus
    # test_t is the post-row transmittance, monotone non-increasing along
    # the chunk (skip rows multiply by exactly 1.0), so "some stop fired
    # at or before row i" is simply test_t_i < eps — no prefix-max scan.
    stopped_incl = test_t < C.T_EPS
    stop = jnp.where(~skip & stopped_incl, 1.0, 0.0)
    live = done_prev < 0.5  # (1, pix)
    contrib = (~skip) & (~stopped_incl) & live
    w = jnp.where(contrib, alpha * cum_t, 0.0)
    t_new = t_prev * _prod_rows(jnp.where(contrib, one_minus, 1.0))
    done_new = jnp.maximum(done_prev, jnp.max(stop, axis=0, keepdims=True))
    return cum_t, test_t, contrib, w, t_new, done_new


def _cont_in(c, ct_ref):
    """Does the previous chunk's last tile continue into chunk c?
    (Scalar; derived from the binning's cont flags — chunk c's first
    segment is a continuation iff cont[c-1] == 1.)"""
    return jnp.logical_and(c > 0, ct_ref[jnp.maximum(c - 1, 0)] == 1)


def _vec_chunk_state(geom, tiles, t_prev, done_prev, cont_in,
                     tiles_x: int, tile: int, pix: int, mxu: bool = False):
    """Hoisted full-block state for the vectorized multi-segment body
    (shared by the fwd and bwd kernels): per-row tile origins, ONE
    segmented transmittance scan for every segment of the chunk, and the
    contribution masks. t_prev/done_prev ((1, pix)) apply only to rows
    of the chunk-opening segment and only when cont_in — at grid step 0
    they are uninitialized scratch, consumed exclusively through selects
    whose predicate is then all-false. With mxu, the segmented scan is a
    segment-masked triangular MXU dot in log space (OLS_SCAN_MXU)."""
    tiles_col = tiles.T  # (CHUNK, 1) int32
    headf = (
        tiles_col != _shift_down(tiles_col, 1, -1)
    ).astype(jnp.float32)
    riota = _row_iota((CHUNK, 1))
    # Rows of the chunk-opening segment (the only one that can continue
    # a tile from the previous chunk): everything before the first
    # in-chunk head — a min-reduce, not a scan (exact either way).
    first_head = jnp.min(
        jnp.where((headf > 0.5) & (riota > 0), riota, CHUNK)
    )
    in0 = riota < first_head
    a = _chunk_alpha(geom, tiles_col, tiles_x, tile, pix)
    alpha, skip = a["alpha"], a["skip"]
    one_minus = 1.0 - alpha
    if mxu:
        # Sorted order: equal tile ids are one contiguous run, so
        # "same segment" == "same tile id".
        cum_seg = jnp.exp(_mxu_prefix(
            _tri_mask(True, tiles_col == tiles), jnp.log(one_minus)
        ))
    else:
        # Row 0 is a head, so the roll's wrapped row is discarded by the
        # select — no fill mask needed.
        x0 = jnp.where(
            headf > 0.5, 1.0, pltpu.roll(one_minus, 1, axis=0)
        )
        cum_seg = _seg_prefix_scan(x0, headf, jnp.multiply)
    tpm = jnp.logical_and(in0, cont_in)  # (CHUNK, 1)
    cum_t = jnp.where(tpm, t_prev, 1.0) * cum_seg
    test_t = cum_t * one_minus
    stopped_incl = test_t < C.T_EPS
    live = ~(tpm & (done_prev > 0.5))
    contrib = (~skip) & (~stopped_incl) & live
    return dict(
        headf=headf, riota=riota, a=a, one_minus=one_minus,
        cum_t=cum_t, test_t=test_t, contrib=contrib,
        w=jnp.where(contrib, alpha * cum_t, 0.0),
        om_c=jnp.where(contrib, one_minus, 1.0),
        stop=jnp.where((~skip) & stopped_incl, 1.0, 0.0),
    )


def _vec_tile_state_update(t_s, done_s, seg_rows, om_c, stop, entry_prev):
    """Per-segment T/done carry update (vectorized bodies): the tile's
    entry state is the carried scratch only for a continuing chunk-
    opening segment; fresh tiles start at (T=1, done=0)."""
    pr = _prod_rows(jnp.where(seg_rows, om_c, 1.0))
    t_s[...] = jnp.where(entry_prev, t_s[...], 1.0) * pr
    dm = jnp.max(jnp.where(seg_rows, stop, 0.0), axis=0, keepdims=True)
    done_s[...] = jnp.maximum(
        jnp.where(entry_prev, done_s[...], 0.0), dm
    )


def _dispatch_multiseg(multiseg: str, run_loop, run_vec, tiles, c,
                       ct_ref, num_tiles: int):
    """Select the chunk-processing body for one grid step. "hybrid"
    vectorizes only genuinely multi-segment chunks — single-segment
    chunks keep the loop body's dead-tail skip. Segment count =
    in-chunk tile starts + the continuation segment when the previous
    chunk's tile flows in."""
    if multiseg == "off":
        run_loop()
    elif multiseg == "on":
        run_vec()
    else:
        tiles_col = tiles.T
        heads_real = (
            (tiles_col != _shift_down(tiles_col, 1, -1))
            & (tiles_col < num_tiles)
        ).astype(jnp.float32)
        nseg = jnp.sum(heads_real) + jnp.where(
            _cont_in(c, ct_ref), 1.0, 0.0
        )
        jax.lax.cond(nseg > 1.5, run_vec, run_loop)


def _seg_bounds(tiles, lane, j0, num_tiles: int):
    """Find the segment [j0, j1) and its tile at row j0. tiles/lane are
    (1, CHUNK) i32. Returns (t, j1) scalars; t == num_tiles when no real
    instance remains in the chunk."""
    after = lane >= j0
    t = jnp.min(jnp.where(after, tiles, num_tiles))
    j1 = jnp.min(jnp.where(after & (tiles != t), lane, CHUNK))
    return t, j1


def _fwd_kernel(
    # scalar prefetch
    st_ref, ct_ref, lim_ref,
    # inputs
    geom_ref, feat_ref, tile_ref,
    # outputs
    acc_ref, nt_ref,
    # scratch
    t_s, done_s, acc_s, stage_s, nt_s, nc_s, meta_s, sem,
    *, tiles_x: int, num_tiles: int, tile: int, pix: int, f_pad: int,
    f_out: int, width: int, num_chunks: int, stats: bool, multiseg: str,
    scan_mxu: bool,
):
    c = pl.program_id(0)
    base = c * CHUNK
    nt_row = jax.lax.rem(c, NT_ROWS)
    nt_s[pl.ds(nt_row, 1), :] = jnp.zeros((1, CHUNK), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    lim = lim_ref[0].astype(jnp.float32)

    def flush_wait():
        # Wait out the previously started tile flush (if any) before the
        # stage buffer is reused / the kernel ends.
        @pl.when(meta_s[0] == 1)
        def _():
            pltpu.make_async_copy(
                stage_s, acc_ref.at[meta_s[1]], sem
            ).wait()
            meta_s[0] = 0

    @pl.when(ct_ref[c] >= 0)
    def _():
        tiles = tile_ref[...]  # (1, CHUNK)
        # Hoisted out of the while_loop: built once per grid step.
        tri = _tri_mask(True) if scan_mxu else None

        def body(j0):
            t, j1 = _seg_bounds(tiles, lane, j0, num_tiles)

            def process():
                t_start = st_ref[t]

                @pl.when(base + j0 == t_start)
                def _():
                    acc_s[...] = jnp.zeros_like(acc_s)
                    t_s[...] = jnp.ones_like(t_s)
                    done_s[...] = jnp.zeros_like(done_s)
                    nc_s[...] = jnp.zeros_like(nc_s)

                # Dead-tail skip: once every pixel of the tile has
                # terminated (T < eps), later segments provably contribute
                # nothing (contrib ≡ 0 leaves acc/T/done/nt unchanged) —
                # skip their VPU math. Depth-sorted saturated tiles spend
                # most late chunks in this state.
                @pl.when(jnp.min(done_s[...]) < 0.5)
                def _():
                    a = _chunk_alpha(
                        geom_ref[...], t, tiles_x, tile, pix,
                        row_lo=j0, row_hi=j1,
                    )
                    cum_t, test_t, contrib, w, t_new, done_new = _composite(
                        a["alpha"], a["skip"], t_s[...], done_s[...],
                        tri=tri,
                    )
                    acc_s[...] += jax.lax.dot_general(
                        feat_ref[...], w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    # n_touched/n_contrib bookkeeping is ~7 of the ~40 VPU
                    # passes per segment; callers that never read them
                    # (tracking-loop renders) compile with stats=False.
                    if stats:
                        # py limit is DYNAMIC (scalar prefetch): a
                        # band-parallel caller renders a strip whose
                        # valid-row count depends on the band index
                        # (parallel/tile_shard.py); single-device callers
                        # pass the static image height.
                        pix_ok = (
                            a["in_tile"] & (a["px"] < width)
                            & (a["py"] < lim)
                        )
                        touched = (
                            contrib & (test_t > C.N_TOUCHED_T) & pix_ok
                        )
                        nt_s[pl.ds(nt_row, 1), :] += jnp.sum(
                            touched, axis=1, dtype=jnp.int32
                        ).reshape(1, CHUNK)
                        # last-contributor index within the tile's instance
                        # sequence (1-based, 0 = none) — the CUDA kernels'
                        # n_contrib (forward.cu:515-644).
                        glob = (
                            _row_iota(contrib.shape) + 1 + (base - t_start)
                        ).astype(jnp.float32)
                        cand = jnp.max(
                            jnp.where(contrib, glob, 0.0),
                            axis=0, keepdims=True,
                        )
                        nc_s[...] = jnp.maximum(nc_s[...], cand)
                    t_s[...] = t_new
                    done_s[...] = done_new

                # The tile is complete when the segment ends inside the
                # chunk (sorted order: it never reappears), or at the
                # chunk's end unless it continues into the next chunk.
                finished = (j1 < CHUNK) | (ct_ref[c] == 0)

                @pl.when(finished)
                def _():
                    # final_T rides as channel row f_out of the flushed
                    # tile and n_contrib as row f_out+1.
                    acc_s[pl.ds(f_out, 1), :] = t_s[...]
                    if stats:
                        acc_s[pl.ds(f_out + 1, 1), :] = nc_s[...]
                    flush_wait()
                    stage_s[...] = acc_s[...]
                    pltpu.make_async_copy(
                        stage_s, acc_ref.at[t], sem
                    ).start()
                    meta_s[0] = 1
                    meta_s[1] = t

                return j1

            return jax.lax.cond(
                t < num_tiles, process, lambda: jnp.int32(CHUNK)
            )

        def run_loop():
            jax.lax.while_loop(
                lambda j: j < CHUNK, lambda j: body(j), jnp.int32(0)
            )

        def run_vec():
            # Vectorized multi-segment body: per-row tile origins + ONE
            # segmented transmittance scan handle every segment of the
            # chunk together; the segment loop shrinks to a masked MXU
            # matmul + per-tile state updates. Saves the per-segment
            # full-block alpha chain + scan that the loop body repeats
            # (2.15-3.15 segments/chunk on production-shaped scenes).
            cont_in = _cont_in(c, ct_ref)
            v = _vec_chunk_state(
                geom_ref[...], tiles, t_s[...], done_s[...], cont_in,
                tiles_x, tile, pix, mxu=scan_mxu,
            )
            riota, contrib, w = v["riota"], v["contrib"], v["w"]
            if stats:
                a = v["a"]
                pix_ok = (
                    a["in_tile"] & (a["px"] < width) & (a["py"] < lim)
                )
                touched = (
                    contrib & (v["test_t"] > C.N_TOUCHED_T) & pix_ok
                )
                nt_s[pl.ds(nt_row, 1), :] += jnp.sum(
                    touched, axis=1, dtype=jnp.int32
                ).reshape(1, CHUNK)

            def vseg(j0):
                t, j1 = _seg_bounds(tiles, lane, j0, num_tiles)

                def process():
                    t_start = st_ref[t]

                    @pl.when(base + j0 == t_start)
                    def _():
                        acc_s[...] = jnp.zeros_like(acc_s)
                        nc_s[...] = jnp.zeros_like(nc_s)

                    seg_rows = (riota >= j0) & (riota < j1)
                    acc_s[...] += jax.lax.dot_general(
                        feat_ref[...], jnp.where(seg_rows, w, 0.0),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    _vec_tile_state_update(
                        t_s, done_s, seg_rows, v["om_c"], v["stop"],
                        jnp.logical_and(j0 == 0, cont_in),
                    )
                    if stats:
                        glob = (
                            riota + 1 + (base - t_start)
                        ).astype(jnp.float32)
                        cand = jnp.max(
                            jnp.where(contrib & seg_rows, glob, 0.0),
                            axis=0, keepdims=True,
                        )
                        nc_s[...] = jnp.maximum(nc_s[...], cand)

                    finished = (j1 < CHUNK) | (ct_ref[c] == 0)

                    @pl.when(finished)
                    def _():
                        acc_s[pl.ds(f_out, 1), :] = t_s[...]
                        if stats:
                            acc_s[pl.ds(f_out + 1, 1), :] = nc_s[...]
                        flush_wait()
                        stage_s[...] = acc_s[...]
                        pltpu.make_async_copy(
                            stage_s, acc_ref.at[t], sem
                        ).start()
                        meta_s[0] = 1
                        meta_s[1] = t

                    return j1

                return jax.lax.cond(
                    t < num_tiles, process, lambda: jnp.int32(CHUNK)
                )

            jax.lax.while_loop(
                lambda j: j < CHUNK, lambda j: vseg(j), jnp.int32(0)
            )

        _dispatch_multiseg(
            multiseg, run_loop, run_vec, tiles, c, ct_ref, num_tiles
        )

    @pl.when(nt_row == NT_ROWS - 1)
    def _():
        nt_ref[...] = nt_s[...]

    @pl.when(c == num_chunks - 1)
    def _():
        flush_wait()


def _bwd_kernel(
    st_ref, ct_ref, lim_ref,
    geom_ref, feat_ref, tile_ref, gacc_ref, acc_res_ref,
    dgeom_ref, dfeat_ref,
    *scratch,
    tiles_x: int, num_tiles: int, tile: int, pix: int, f_pad: int,
    f_out: int, width: int, num_chunks: int, multiseg: str,
    scan_mxu: bool,
):
    if multiseg == "off":
        t_s, done_s, carry_s, g_s, ar_s, dg_s, df_s, sem = scratch
        gd_s = tr_s = None
    else:
        (t_s, done_s, carry_s, g_s, ar_s, dg_s, df_s, gd_s, tr_s,
         sem) = scratch
    c = pl.program_id(0)
    base = c * CHUNK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    dg_s[...] = jnp.zeros_like(dg_s)
    df_s[...] = jnp.zeros_like(df_s)

    @pl.when(ct_ref[c] >= 0)
    def _():
        tiles = tile_ref[...]
        # Hoisted out of the while_loop: built once per grid step.
        tri = _tri_mask(True) if scan_mxu else None
        tri_incl = _tri_mask(False) if scan_mxu else None

        def body(j0):
            t, j1 = _seg_bounds(tiles, lane, j0, num_tiles)

            def process():
                t_start = st_ref[t]

                @pl.when(base + j0 == t_start)
                def _():
                    # New tile: pull its image cotangent + saved forward
                    # accumulator from HBM (both in flight before either
                    # wait — the DMA latency is paid once, not twice).
                    cp_g = pltpu.make_async_copy(
                        gacc_ref.at[t], g_s, sem
                    )
                    cp_a = pltpu.make_async_copy(
                        acc_res_ref.at[t], ar_s, sem
                    )
                    cp_g.start()
                    cp_a.start()
                    cp_g.wait()
                    cp_a.wait()
                    t_s[...] = jnp.ones_like(t_s)
                    done_s[...] = jnp.zeros_like(done_s)
                    # total_S = sum_f g_f * A_f (per pixel) — row f_out
                    # holds (T_end, gT_end), so the final-transmittance
                    # term is included.
                    carry_s[...] = jnp.sum(
                        g_s[...] * ar_s[...], axis=0, keepdims=True
                    )

                # Dead-tail skip (matches the forward): fully-terminated
                # tiles yield zero grads and unchanged carry/T/done.
                @pl.when(jnp.min(done_s[...]) < 0.5)
                def _():
                    a = _chunk_alpha(
                        geom_ref[...], t, tiles_x, tile, pix,
                        row_lo=j0, row_hi=j1,
                    )
                    alpha, skip = a["alpha"], a["skip"]
                    cum_t, test_t, contrib, w, t_new, done_new = _composite(
                        alpha, skip, t_s[...], done_s[...], tri=tri,
                    )
                    g_img = g_s[...]  # (f_pad, pix)
                    # G_j[p] = sum_f feat[f, j] * g[f, p]
                    gdot = jax.lax.dot_general(
                        feat_ref[...], g_img, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (CHUNK, pix)
                    wg = w * gdot
                    prefix_incl = (
                        _mxu_prefix(tri_incl, wg) if scan_mxu
                        else _prefix_sum_incl(wg)
                    )
                    suffix = carry_s[...] - prefix_incl  # future wG + T·gT
                    dalpha = jnp.where(
                        contrib, cum_t * gdot - suffix / (1.0 - alpha), 0.0
                    )
                    dg_s[...] += _geom_grad_rows(
                        dalpha, a, geom_ref[...].T
                    )
                    df_s[...] += jax.lax.dot_general(
                        g_img, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (f_pad, CHUNK)
                    # The chunk's wG total is the inclusive prefix sum's
                    # last row — no second full reduction.
                    carry_s[...] = (
                        carry_s[...] - prefix_incl[CHUNK - 1 : CHUNK]
                    )
                    t_s[...] = t_new
                    done_s[...] = done_new
                return j1

            return jax.lax.cond(
                t < num_tiles, process, lambda: jnp.int32(CHUNK)
            )

        def run_loop():
            jax.lax.while_loop(
                lambda j: j < CHUNK, lambda j: body(j), jnp.int32(0)
            )

        def run_vec():
            # Vectorized multi-segment backward (mirrors the forward's
            # run_vec): hoist the alpha chain + segmented transmittance
            # scan out of the segment loop; the loop keeps only the
            # per-tile DMAs and masked matmuls (gdot / feature grads);
            # then ONE full-block pass computes every geometry gradient
            # via a segmented wG prefix sum.
            cont_in = _cont_in(c, ct_ref)
            v = _vec_chunk_state(
                geom_ref[...], tiles, t_s[...], done_s[...], cont_in,
                tiles_x, tile, pix, mxu=scan_mxu,
            )
            riota, contrib, w = v["riota"], v["contrib"], v["w"]
            a, cum_t, one_minus = v["a"], v["cum_t"], v["one_minus"]

            gd_s[...] = jnp.zeros_like(gd_s)
            tr_s[...] = jnp.zeros_like(tr_s)

            def vseg(j0):
                t, j1 = _seg_bounds(tiles, lane, j0, num_tiles)

                def process():
                    t_start = st_ref[t]

                    @pl.when(base + j0 == t_start)
                    def _():
                        cp_g = pltpu.make_async_copy(
                            gacc_ref.at[t], g_s, sem
                        )
                        cp_a = pltpu.make_async_copy(
                            acc_res_ref.at[t], ar_s, sem
                        )
                        cp_g.start()
                        cp_a.start()
                        cp_g.wait()
                        cp_a.wait()
                        carry_s[...] = jnp.sum(
                            g_s[...] * ar_s[...], axis=0, keepdims=True
                        )

                    seg_rows = (riota >= j0) & (riota < j1)
                    # This tile's ENTRY carry rides to its rows for the
                    # full-block suffix phase.
                    tr_s[...] += (
                        seg_rows.astype(jnp.float32) * carry_s[...]
                    )
                    lane_m = (
                        (lane >= j0) & (lane < j1)
                    ).astype(jnp.float32)
                    gd_s[...] += jax.lax.dot_general(
                        feat_ref[...] * lane_m, g_s[...],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    df_s[...] += jax.lax.dot_general(
                        g_s[...], jnp.where(seg_rows, w, 0.0),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    _vec_tile_state_update(
                        t_s, done_s, seg_rows, v["om_c"], v["stop"],
                        jnp.logical_and(j0 == 0, cont_in),
                    )
                    return j1

                return jax.lax.cond(
                    t < num_tiles, process, lambda: jnp.int32(CHUNK)
                )

            jax.lax.while_loop(
                lambda j: j < CHUNK, lambda j: vseg(j), jnp.int32(0)
            )

            # Full-block gradient phase: one pass for all segments.
            gdot = gd_s[...]
            tr = tr_s[...]
            wg = w * gdot
            if scan_mxu:
                prefix_incl = _mxu_prefix(
                    _tri_mask(False, tiles.T == tiles), wg
                )
            else:
                prefix_incl = _seg_prefix_scan(wg, v["headf"], jnp.add)
            suffix = tr - prefix_incl
            dalpha = jnp.where(
                contrib, cum_t * gdot - suffix / one_minus, 0.0
            )
            dg_s[...] += _geom_grad_rows(dalpha, a, geom_ref[...].T)
            # Carry for a continuing last tile: its entry total minus its
            # in-chunk inclusive wG (other tiles' rows reset the scan).
            # Garbage when the chunk ends in padding — the next chunk
            # then starts a fresh tile and never reads it.
            carry_s[...] = (
                tr[CHUNK - 1 : CHUNK, :]
                - prefix_incl[CHUNK - 1 : CHUNK, :]
            )

        _dispatch_multiseg(
            multiseg, run_loop, run_vec, tiles, c, ct_ref, num_tiles
        )

    dgeom_ref[...] = dg_s[...]
    dfeat_ref[...] = df_s[...]


class _BlendAux(NamedTuple):
    binning: SortedBinning
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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20, 21)
)
def _blend_core(xy, conic, opacity, color, lang, depth, s_gid, s_tile,
                starts, cont, tile_counts, s_emit, emit_start, emit_count,
                py_limit, tile, width, height, grad_reduce, stats,
                multiseg, scan_mxu):
    out, _ = _blend_fwd_impl(
        xy, conic, opacity, color, lang, depth, s_gid, s_tile,
        starts, cont, tile_counts, s_emit, emit_start, emit_count,
        py_limit, tile, width, height, grad_reduce, stats, multiseg,
        scan_mxu
    )
    return out


def _blend_fwd_impl(xy, conic, opacity, color, lang, depth, s_gid, s_tile,
                    starts, cont, tile_counts, s_emit, emit_start,
                    emit_count, py_limit, tile, width, height, grad_reduce,
                    stats, multiseg, scan_mxu):
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    pix = _pix_pad(tile)
    cap = s_gid.shape[0]
    num_chunks = cap // CHUNK

    geom, feat, f_pad, f_out = _pack_instances(
        xy, conic, opacity, color, lang, depth, s_gid
    )
    tile_rows = s_tile.reshape(1, cap)

    kern = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles, tile=tile,
        pix=pix, f_pad=f_pad, f_out=f_out, width=width,
        num_chunks=num_chunks, stats=stats,
        # "bwd-hybrid" vectorizes only the backward (config.MULTISEG).
        multiseg=("off" if multiseg == "bwd-hybrid" else multiseg),
        scan_mxu=(scan_mxu == "all"),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
            pl.BlockSpec((f_pad, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
            pl.BlockSpec((1, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (NT_ROWS, CHUNK), lambda c, *_: (c // NT_ROWS, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((f_pad, pix), jnp.float32),
            pltpu.VMEM((f_pad, pix), jnp.float32),
            pltpu.VMEM((NT_ROWS, CHUNK), jnp.int32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
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
    )(starts, cont, py_limit, geom, feat, tile_rows)

    # Sanitize tiles no segment ever flushed (empty tiles + the dummy
    # row — their ANY-memory contents are uninitialized): zero
    # accumulators, final_T (channel row f_out) = 1.
    tile_live = jnp.concatenate([tile_counts > 0, jnp.zeros((1,), bool)])
    empty = jnp.zeros((f_pad, pix), acc.dtype).at[f_out].set(1.0)
    acc = jnp.where(tile_live[:, None, None], acc, empty[None])
    out = (acc, n_touched)
    residuals = (
        xy, conic, opacity, color, lang, depth, acc,
        s_gid, s_tile, starts, cont, tile_counts,
        s_emit, emit_start, emit_count, py_limit,
    )
    return out, residuals


def _blend_fwd(xy, conic, opacity, color, lang, depth, s_gid, s_tile,
               starts, cont, tile_counts, s_emit, emit_start, emit_count,
               py_limit, tile, width, height, grad_reduce, stats,
               multiseg, scan_mxu):
    return _blend_fwd_impl(
        xy, conic, opacity, color, lang, depth, s_gid, s_tile,
        starts, cont, tile_counts, s_emit, emit_start, emit_count,
        py_limit, tile, width, height, grad_reduce, stats, multiseg,
        scan_mxu
    )


def _blend_bwd(tile, width, height, grad_reduce, stats, multiseg,
               scan_mxu, residuals, cotangents):
    (xy, conic, opacity, color, lang, depth, acc_res,
     s_gid, s_tile, starts, cont, tile_counts,
     s_emit, emit_start, emit_count, py_limit) = residuals
    g_acc, _ = cotangents  # n_touched is int — no cotangent
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    pix = _pix_pad(tile)
    cap = s_gid.shape[0]
    num_chunks = cap // CHUNK

    geom, feat, f_pad, f_out = _pack_instances(
        xy, conic, opacity, color, lang, depth, s_gid
    )
    tile_rows = s_tile.reshape(1, cap)
    f_lang = lang.shape[1]

    ms_bwd = "hybrid" if multiseg == "bwd-hybrid" else multiseg
    kern = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles, tile=tile,
        pix=pix, f_pad=f_pad, f_out=f_out, width=width,
        num_chunks=num_chunks, multiseg=ms_bwd,
        scan_mxu=(scan_mxu in ("bwd", "all")),
    )
    # The vectorized multi-segment path needs two full-chunk scratch
    # blocks: the accumulated gdot and the per-row entry carries.
    ms_scratch = (
        [] if ms_bwd == "off"
        else [pltpu.VMEM((CHUNK, pix), jnp.float32),
              pltpu.VMEM((CHUNK, pix), jnp.float32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
            pl.BlockSpec((f_pad, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
            pl.BlockSpec((1, CHUNK),
                         lambda c, st, ct, lim:
                         (0, jnp.where(ct[c] >= 0, c, 0))),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((GEOM_ROWS, CHUNK), lambda c, *_: (0, c)),
            pl.BlockSpec((f_pad, CHUNK), lambda c, *_: (0, c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((1, pix), jnp.float32),
            pltpu.VMEM((f_pad, pix), jnp.float32),
            pltpu.VMEM((f_pad, pix), jnp.float32),
            pltpu.VMEM((GEOM_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((f_pad, CHUNK), jnp.float32),
            *ms_scratch,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dgeom, dfeat = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((GEOM_ROWS, cap), jnp.float32),
            jax.ShapeDtypeStruct((f_pad, cap), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts, cont, py_limit, geom, feat, tile_rows, g_acc, acc_res)

    # Segment-sum per-instance grads back to per-Gaussian grads.
    p = xy.shape[0]
    rows = jnp.concatenate([dgeom[0:6], dfeat[: 3 + f_lang + 1]], axis=0).T
    if grad_reduce == "emission":
        # Permutation scatter-SET into emission order (indices unique by
        # construction — no read-modify-write serialization), then each
        # Gaussian's grad is a cumsum difference over its contiguous
        # emission range. Culled/padding instances carry zero grad rows,
        # so scattering them inside a live range is harmless.
        table = _emission_segment_sum(
            rows, s_emit, emit_start, emit_count, p, num_tiles
        )
    else:
        # ONE wide-row scatter-add over Gaussian ids (six narrow scatters
        # each pay full random-access cost; a single (S, D) row scatter
        # moves the same bytes far faster).
        ids = jnp.where(s_gid >= 0, s_gid, p)
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
            None, None, None, None, None, None, None, None, None)


def _emission_segment_sum(rows, s_emit, emit_start, emit_count, p,
                          num_tiles):
    """Sum per-instance rows (sorted order) per ORIGINAL Gaussian id via
    the emission permutation: scatter-set to emission order (unique
    indices), SEGMENTED prefix sum resetting at each Gaussian's emission
    start, then one gather at each segment's last element.

    A global cumsum + difference would be cheaper but numerically unsafe:
    prefix magnitudes dwarf per-segment sums, so the f32 difference
    cancels catastrophically. The segmented scan keeps summation order
    and error confined within each segment, whose length is bounded by
    tiles_touched <= num_tiles — so the jump-carry needs only
    ceil(log2(num_tiles)) passes, not log2(cap)."""
    cap = s_emit.shape[0]
    emit_rows = (
        jnp.zeros_like(rows)
        .at[s_emit]
        .set(rows, unique_indices=True)
    )
    count = emit_count.astype(jnp.int32)
    start = jnp.clip(emit_start, 0, cap)
    live_start = jnp.where(count > 0, start, cap)
    blocked = (
        jnp.zeros((cap,), bool).at[live_start].set(True, mode="drop")
    )
    x = emit_rows
    f = blocked
    s = 1
    max_run = min(cap, max(num_tiles, 1))
    while s < max_run:
        xs = jnp.pad(x, ((s, 0), (0, 0)))[:cap]
        fs = jnp.pad(f, (s, 0), constant_values=True)[:cap]
        x = jnp.where(f[:, None], x, x + xs)
        f = f | fs
        s *= 2
    last = jnp.clip(start + count - 1, 0, cap - 1)
    # Under capacity overflow a fully-truncated Gaussian (emit_start >=
    # cap) must yield zero, not the straddling Gaussian's partial sum at
    # x[cap-1].
    ok = (count > 0) & (emit_start < cap)
    return jnp.where(ok[:, None], x[last], 0.0)


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
    grad_reduce: str | None = None,
    stats: bool = True,
    multiseg: str | None = None,
    scan_mxu: str | None = None,
):
    """Full tiled pipeline: bin → Pallas blend → image assembly.

    Returns the same BlendOutput as the oracle. Gradients flow to every
    preprocessed quantity through the custom VJP; binning indices are
    non-differentiable by construction. `grad_reduce` picks the
    per-Gaussian gradient reduction ("scatter" | "emission"); None takes
    the OLS_GRAD_REDUCE env default (config.GRAD_REDUCE). With
    `stats=False` the kernel skips n_touched/n_contrib bookkeeping
    (those outputs come back zero) — for render loops that never read
    them, e.g. tracking iterations. `multiseg` picks the kernels'
    segment strategy ("off" | "on" | "hybrid", see config.MULTISEG);
    None takes the OLS_MULTISEG env default. `scan_mxu` picks the
    in-kernel prefix-scan implementation ("off" | "bwd" | "all", see
    config.SCAN_MXU); None takes the OLS_SCAN_MXU env default.
    """
    from .oracle import BlendOutput

    if grad_reduce is None:
        grad_reduce = C.GRAD_REDUCE
    assert grad_reduce in ("scatter", "emission"), grad_reduce
    if multiseg is None:
        multiseg = C.MULTISEG
    assert multiseg in ("off", "on", "hybrid", "bwd-hybrid"), multiseg
    if scan_mxu is None:
        scan_mxu = C.SCAN_MXU
    assert scan_mxu in ("off", "bwd", "all"), scan_mxu
    p = prep.xy.shape[0]
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    if max_instances is None:
        max_instances = max(8 * p, 1 << 14)
    max_instances = ((max_instances + 8 * chunk - 1) // (8 * chunk)) * (
        8 * chunk
    )

    binning = bin_gaussians_sorted(
        prep, tiles_x=tiles_x, tiles_y=tiles_y,
        max_instances=max_instances, chunk=chunk, tile_px=tile,
        emission_order=(grad_reduce == "emission"),
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
    if grad_reduce == "emission":
        s_emit, emit_start = binning.s_emit, binning.emit_start
        emit_count = prep.tiles_touched.astype(jnp.int32)
    else:
        # Size-0 placeholders keep the custom_vjp arity static; the
        # "scatter" trace never touches them.
        s_emit = jnp.zeros((0,), jnp.int32)
        emit_start = jnp.zeros((0,), jnp.int32)
        emit_count = jnp.zeros((0,), jnp.int32)
    acc, nt_chunks = _blend_core(
        prep.xy, prep.conic, prep.opacity, prep.color, lang,
        jnp.where(prep.valid, prep.depth, 0.0),
        binning.s_gid, binning.s_tile, binning.starts, binning.cont,
        binning.tile_counts, s_emit, emit_start, emit_count, py_limit,
        tile, width, height, grad_reduce, stats, multiseg, scan_mxu,
    )

    # n_touched: per-chunk rows -> per-instance -> per-Gaussian.
    nt_inst = jnp.where(binning.s_gid >= 0, nt_chunks.reshape(-1), 0)
    if not stats:
        n_touched = jnp.zeros((p,), jnp.int32)
    elif grad_reduce == "emission":
        # Ints are exact under cumsum, so the cheap global-prefix
        # difference applies (no segmented scan needed).
        cap = s_emit.shape[0]
        emit_nt = (
            jnp.zeros((cap,), jnp.int32)
            .at[s_emit]
            .set(nt_inst, unique_indices=True)
        )
        cs0 = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(emit_nt)]
        )
        start = jnp.clip(emit_start, 0, cap)
        end = jnp.clip(emit_start + emit_count, 0, cap)
        n_touched = cs0[end] - cs0[start]
    else:
        ids = jnp.maximum(binning.s_gid, 0)
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
