"""Tile binning: Gaussian→tile instance duplication + depth ordering.

TPU-native replacement for the reference's cub pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:216-362: InclusiveSum → duplicateWithKeys →
DeviceRadixSort over [tileID|depth-bits] → identifyTileRanges). Instead of
dynamic allocations and 64-bit keys we use static capacities and a
*chunk-aligned* slot layout: every tile's instance run is padded to a
multiple of the blend kernel's chunk size so one grid step never straddles
two tiles. Empty capacity is marked with Gaussian id -1.

Design rules, measured on hardware (tools/kernel_probe.py): XLA sorts are
nearly free (~0.7 ms for 1M u32 keys, ~+2 ms per payload operand) while
random gathers cost ~8-12 ms per million elements — so this pipeline is
organized to avoid instance-sized gathers entirely:

* The P Gaussians are depth-sorted FIRST (P-sized sort), and instances are
  emitted in that order; the instance pass then sorts ONE u32 key
  (tile<<bits | emission index) with the original Gaussian id riding as a
  sort payload (not gathered afterwards). Within a tile, emission order
  equals (depth asc, Gaussian id asc) — exactly the reference's float-bit
  radix order for positive depths with its stable tie-break.
* The sorted-order → chunk-aligned-slot mapping is a SCATTER (sorted
  instance i lands at slot i + shift[tile], where shift = cumulative
  chunk padding — nondecreasing along the sorted order, so it expands with
  one tiny scatter + cummax), not a slot-sized gather.
* Per-chunk metadata is computed directly in chunk space (num_chunks
  elements, ~free).

Everything here is shape-static and jit-compatible; `overflow` reports
when either the instance capacity or the padded slot capacity was
exceeded (results are then truncated and the caller re-jits with a larger
`max_instances`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import config as C
from .preprocess import Preprocessed, tile_keeps_instance


class Binning(NamedTuple):
    point_list: jax.Array    # (S,) int32 Gaussian id per slot, -1 for padding
    slot_tile: jax.Array     # (S,) int32 tile of each slot (num_tiles for pad)
    chunk_tile: jax.Array    # (C,) int32 tile of each chunk (num_tiles sentinel)
    chunk_first: jax.Array   # (C,) int32 1 if first chunk of its tile
    chunk_last: jax.Array    # (C,) int32 1 if last chunk of its tile
    tile_counts: jax.Array   # (T,) int32 real instances per tile
    num_instances: jax.Array # () int32 total real instances
    overflow: jax.Array      # () bool


def slot_capacity(cap: int, num_tiles: int, chunk: int) -> int:
    """Padded slot capacity for an instance capacity `cap`.

    Worst-case per-tile round-up padding is num_tiles*(chunk-1), but that
    allowance would nearly double every instance-sized array (and the
    kernel grid). Real scenes need ~(nonempty_tiles · chunk/2); we
    allocate cap/2 (min 64 chunks), detect `total_padded > slot_cap` as
    overflow, and let the caller's grow-and-replay loop handle the rare
    sparse-scene miss. Rounded so the chunk count is a multiple of 8
    (blend kernel nt-output blocking)."""
    pad = min(num_tiles * chunk, max(cap // 2, 64 * chunk))
    slot_cap = cap + pad
    return ((slot_cap + 8 * chunk - 1) // (8 * chunk)) * (8 * chunk)


class SortedBinning(NamedTuple):
    """Compact (cap-sized, no slot padding) binning for the segments blend
    kernel: instances in (tile, depth, id) order; the kernel discovers
    tile boundaries inside each chunk itself."""

    s_gid: jax.Array     # (cap,) int32 Gaussian id per sorted instance, -1 pad
    s_tile: jax.Array    # (cap,) int32 tile id (num_tiles sentinel for pad)
    starts: jax.Array    # (T,) int32 first sorted index of each tile
    tile_counts: jax.Array  # (T,) int32 real instances per tile
    cont: jax.Array      # (C,) int32 1 if chunk's last tile continues into
                         # the next chunk, 0 if not, -1 if chunk has no
                         # real instances at all
    num_instances: jax.Array  # () int32
    overflow: jax.Array       # () bool
    # Emission-order reduction support (None unless requested): emission
    # index per sorted instance — an exact permutation of [0, cap) — and
    # the first emission index of each ORIGINAL Gaussian id. A Gaussian's
    # instances occupy the contiguous emission range
    # [emit_start[g], emit_start[g] + tiles_touched[g]).
    s_emit: jax.Array | None = None      # (cap,) int32
    emit_start: jax.Array | None = None  # (P,) int32


def _depth_tables(prep: Preprocessed, cap: int):
    """Expansion stage 1: depth pre-sort + per-Gaussian emission offsets +
    the carried-row table (offset, rect_min x/y, rect width, id [, cull
    geometry]) in depth order."""
    p = prep.depth.shape[0]
    tiles_touched = prep.tiles_touched
    d_key = jnp.where(tiles_touched > 0, prep.depth, jnp.inf)
    _, perm = jax.lax.sort(
        (d_key, jnp.arange(p, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    tt_s = tiles_touched[perm]
    cum = jnp.cumsum(tt_s)
    total = cum[-1]
    offsets = (cum - tt_s).astype(jnp.int32)

    gtab_rows = [
        prep.rect_min[:, 0].astype(jnp.float32),
        prep.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1).astype(
            jnp.float32
        ),
        jnp.arange(p, dtype=jnp.float32),
    ]
    if C.PER_TILE_CULL:
        # Geometry for the per-(Gaussian, tile) alpha cull; rides the
        # jump-carry (an instance-sized gather of these would cost
        # ~8-12 ms/M — carrying rows costs ~0.2 ms/M each).
        gtab_rows += [
            prep.xy[:, 0],
            prep.xy[:, 1],
            prep.conic[:, 0],
            prep.conic[:, 1],
            prep.conic[:, 2],
            prep.opacity,
        ]
    gtab = jnp.stack(gtab_rows, axis=1)
    gtab_s = jnp.concatenate(
        [offsets[:, None].astype(jnp.float32), gtab[perm]], axis=1
    )
    return gtab_s, tt_s, offsets, total, perm


def _expand_scatter(gtab_s, tt_s, offsets, cap: int):
    """Expansion stage 2: scatter each live Gaussian's carried rows to its
    first emission slot; every other slot holds -1 (row 0 — the offset —
    is the carry key: it is >= 0 exactly on set slots)."""
    start_idx = jnp.where(tt_s > 0, offsets, cap)
    return jnp.full((gtab_s.shape[1], cap), -1.0, jnp.float32).at[
        :, start_idx
    ].set(gtab_s.T, mode="drop")


def _jump_carry(vals, max_run: int, run_bound=None):
    """Expansion stage 3: manual Hillis-Steele jump-carry (flat
    shift+select passes) filling each slot from the nearest earlier set
    slot. NOT lax.associative_scan: its recursive odd/even lowering hangs
    the TPU compiler at 1M-element scale (reproduced in isolation).

    Passes are bounded by the longest possible run, which is one
    Gaussian's tiles_touched <= num_tiles (rects are screen-clamped), NOT
    cap: ~10-12 passes instead of 20 at the 1M bucket. With `run_bound`
    (a dynamic scalar: the scene's real max run, i.e. max(tiles_touched))
    the passes run inside ONE lax.while_loop switching over the static
    shift table, so a small-splat scene executes only
    ceil(log2(run_bound)) of them — value-identical, the skipped passes
    are provable no-ops. The padding tail past `total` may stay unfilled
    (-1 rows) — every consumer masks it with `inst < total`."""
    cap = vals.shape[1]

    def one_pass(s: int, v):
        shifted = jnp.pad(
            v, ((0, 0), (s, 0)), constant_values=-1.0
        )[:, :cap]
        return jnp.where(v[0:1] >= 0.0, v, shifted)

    shifts = []
    s = 1
    while s < min(cap, max_run):
        shifts.append(s)
        s *= 2
    if run_bound is None:
        for s in shifts:
            vals = one_pass(s, vals)
        return vals
    if not shifts:
        return vals
    branches = [functools.partial(one_pass, s) for s in shifts]
    bound = jnp.asarray(run_bound, jnp.int32)

    def cond(state):
        k, _ = state
        return (k < len(shifts)) & (jnp.left_shift(1, k) < bound)

    def body(state):
        k, v = state
        return k + 1, jax.lax.switch(k, branches, v)

    _, vals = jax.lax.while_loop(cond, body, (jnp.int32(0), vals))
    return vals


def _instance_tiles(vals, total, tiles_x: int, num_tiles: int, cap: int,
                    tile_px: int):
    """Expansion stage 4: per-instance tile id from the carried rect rows
    + the exact per-(Gaussian, tile) alpha cull. Returns (tile, orig) with
    culled/padding instances on the sentinel tile."""
    inst = jnp.arange(cap, dtype=jnp.int32)
    rows = vals.T
    local = inst - rows[:, 0].astype(jnp.int32)
    width = rows[:, 3].astype(jnp.int32)
    if cap < (1 << 22):
        ly = jnp.floor(
            local.astype(jnp.float32) / rows[:, 3]
        ).astype(jnp.int32)
        lx = local - ly * width
    else:
        ly = local // width
        lx = local % width
    tx = rows[:, 1].astype(jnp.int32) + lx
    ty = rows[:, 2].astype(jnp.int32) + ly
    tile_id = ty * tiles_x + tx
    inst_valid = inst < total
    if C.PER_TILE_CULL:
        # Exact per-(Gaussian, tile) alpha cull: the emission rect is the
        # ellipse AABB ∩ circle rect, but AABB corner tiles can still
        # never see alpha >= ALPHA_MIN — provably inert in the blend.
        # Culled instances take the sentinel tile and sort to the end
        # with the padding.
        keep = tile_keeps_instance(
            rows[:, 5], rows[:, 6], rows[:, 7], rows[:, 8], rows[:, 9],
            rows[:, 10],
            (tx * tile_px).astype(jnp.float32),
            (ty * tile_px).astype(jnp.float32),
            tile_px,
        )
        inst_valid = inst_valid & keep
    tile = jnp.where(inst_valid, tile_id, num_tiles)
    orig = jnp.where(inst_valid, rows[:, 4].astype(jnp.int32), -1)
    return tile, orig


def _key_sort(tile, orig, cap: int, num_tiles: int):
    """Expansion stage 5: the single-u32-key tile sort. Within a tile,
    emission order equals (depth asc, Gaussian id asc) — exactly the
    reference's float-bit radix order for positive depths with its stable
    tie-break."""
    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_bits = max((cap - 1).bit_length(), 1)
    if num_tiles + 1 <= (1 << (32 - inst_bits)):
        key = (
            tile.astype(jnp.uint32) << inst_bits
        ) | inst.astype(jnp.uint32)
        s_key, s_gid = jax.lax.sort((key, orig), num_keys=1)
        s_tile = (s_key >> inst_bits).astype(jnp.int32)
        # The key's low bits ARE the emission index — recovering it is a
        # mask, not a payload operand or a gather.
        s_emit = (
            s_key & jnp.uint32((1 << inst_bits) - 1)
        ).astype(jnp.int32)
    else:
        s_tile, s_emit, s_gid = jax.lax.sort((tile, inst, orig), num_keys=2)
    return s_tile, s_gid, s_emit


def _sorted_core(prep: Preprocessed, tiles_x: int, tiles_y: int,
                 cap: int, tile_px: int):
    """Shared front half of both binning layouts: depth pre-sort,
    instance expansion with the exact (Gaussian, tile) alpha cull,
    single-u32-key tile sort, per-tile ranges.
    Returns (s_tile, s_gid, s_emit, starts, counts, total, perm, offsets):
    sorted tile/gid/emission-index arrays, per-tile starts/counts, the
    total instance demand, the depth-sort permutation, and each
    depth-sorted Gaussian's first emission index."""
    num_tiles = tiles_x * tiles_y
    gtab_s, tt_s, offsets, total, perm = _depth_tables(prep, cap)
    vals = _expand_scatter(gtab_s, tt_s, offsets, cap)
    run_bound = jnp.max(tt_s) if C.BIN_DYN else None
    vals = _jump_carry(vals, min(cap, num_tiles), run_bound)
    tile, orig = _instance_tiles(vals, total, tiles_x, num_tiles, cap,
                                 tile_px)
    s_tile, s_gid, s_emit = _key_sort(tile, orig, cap, num_tiles)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts
    return s_tile, s_gid, s_emit, starts, counts, total, perm, offsets


def bin_gaussians_sorted(
    prep: Preprocessed,
    *,
    tiles_x: int,
    tiles_y: int,
    max_instances: int,
    chunk: int = 256,
    tile_px: int = C.DEFAULT_TILE,
    emission_order: bool = False,
) -> SortedBinning:
    """Compact binning (see SortedBinning). `max_instances` must be a
    multiple of 8*chunk (callers round up). With `emission_order`, also
    materialize the emission permutation + per-Gaussian emission starts
    (one extra P-row scatter) for the cumsum-diff gradient reduction."""
    num_tiles = tiles_x * tiles_y
    cap = max_instances
    assert cap % (8 * chunk) == 0, (cap, chunk)
    num_chunks = cap // chunk

    s_tile, s_gid, s_emit, starts, counts, total, perm, offsets = (
        _sorted_core(prep, tiles_x, tiles_y, cap, tile_px)
    )
    emit_start = None
    if not emission_order:
        s_emit = None
    else:
        p = perm.shape[0]
        emit_start = (
            jnp.zeros((p,), jnp.int32)
            .at[perm]
            .set(offsets, unique_indices=True)
        )

    bounds = jnp.arange(1, num_chunks + 1, dtype=jnp.int32) * chunk
    last_in = s_tile[jnp.minimum(bounds - 1, cap - 1)]
    next_in = s_tile[jnp.minimum(bounds, cap - 1)]
    cont = jnp.where(
        (bounds < cap) & (last_in == next_in) & (last_in < num_tiles), 1, 0
    )
    # -1 marks chunks with no real instances (their first tile is the
    # sentinel) so kernels can skip their block fetches entirely.
    first_in = s_tile[bounds - chunk]
    cont = jnp.where(first_in >= num_tiles, -1, cont)

    return SortedBinning(
        s_gid=s_gid,
        s_tile=s_tile,
        starts=starts,
        tile_counts=counts,
        cont=cont.astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=total > cap,
        s_emit=s_emit,
        emit_start=emit_start,
    )


def bin_gaussians(
    prep: Preprocessed,
    *,
    tiles_x: int,
    tiles_y: int,
    max_instances: int,
    chunk: int = 128,
    tile_px: int = C.DEFAULT_TILE,
) -> Binning:
    num_tiles = tiles_x * tiles_y
    cap = max_instances
    slot_cap = slot_capacity(cap, num_tiles, chunk)
    num_chunks = slot_cap // chunk

    s_tile, s_gid, _, starts, counts, total, _, _ = _sorted_core(
        prep, tiles_x, tiles_y, cap, tile_px
    )
    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_valid = inst < total
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    # Chunk-aligned slot layout: sorted instance i lands at slot
    # i + shift[tile(i)], where shift[t] = pstarts[t] - starts[t] is the
    # cumulative chunk padding of earlier tiles — nonnegative and
    # NONDECREASING in t, so its per-instance expansion is one tiny
    # scatter + cummax, and the slot array is built by ONE scatter.
    padded = ((counts + chunk - 1) // chunk) * chunk
    pcum = jnp.cumsum(padded)
    total_padded = pcum[-1]
    pstarts = (pcum - padded).astype(jnp.int32)

    shift_t = pstarts - starts
    shift_marks = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(counts > 0, starts, cap)
    ].max(shift_t, mode="drop")
    shift = jnp.maximum(jax.lax.cummax(shift_marks), 0)
    dst = jnp.where(inst_valid, inst + shift, slot_cap)
    point_list = jnp.full((slot_cap,), -1, jnp.int32).at[dst].set(
        s_gid, mode="drop"
    )

    # Per-chunk metadata, computed directly in chunk space (~free).
    chunk_idx = jnp.arange(num_chunks, dtype=jnp.int32)
    chunk_start_slot = chunk_idx * chunk
    first_chunk = pstarts // chunk
    ct_marks = jnp.full((num_chunks,), -1, jnp.int32).at[
        jnp.where(counts > 0, first_chunk, num_chunks)
    ].max(tile_ids, mode="drop")
    chunk_tile = jnp.maximum(jax.lax.cummax(ct_marks), 0)
    chunk_valid = chunk_start_slot < total_padded
    chunk_tile_c = jnp.minimum(chunk_tile, num_tiles - 1)
    chunk_first = (
        chunk_valid & (chunk_start_slot == pstarts[chunk_tile_c])
    ).astype(jnp.int32)
    chunk_last = (
        chunk_valid
        & (chunk_start_slot + chunk
           == pstarts[chunk_tile_c] + padded[chunk_tile_c])
    ).astype(jnp.int32)
    chunk_tile = jnp.where(chunk_valid, chunk_tile, num_tiles)

    # Broadcast, not jnp.repeat: repeat lowers to a slot-sized gather.
    slot_tile = jnp.broadcast_to(
        chunk_tile[:, None], (num_chunks, chunk)
    ).reshape(slot_cap)

    overflow = (total > cap) | (total_padded > slot_cap)
    return Binning(
        point_list=point_list,
        slot_tile=slot_tile,
        chunk_tile=chunk_tile.astype(jnp.int32),
        chunk_first=chunk_first,
        chunk_last=chunk_last,
        tile_counts=counts,
        num_instances=total.astype(jnp.int32),
        overflow=overflow,
    )
