"""Tile binning: Gaussian→tile instance duplication + depth ordering.

TPU-native replacement for the reference's cub pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:216-362: InclusiveSum → duplicateWithKeys →
DeviceRadixSort over [tileID|depth-bits] → identifyTileRanges). Instead of
dynamic allocations and 64-bit keys we use static capacities and a
*chunk-aligned* slot layout: every tile's instance run is padded to a
multiple of the blend kernel's chunk size so one grid step never straddles
two tiles. Empty capacity is marked with Gaussian id -1.

Sort strategy (the round-3 rewrite): instead of sorting S instances by the
(tile, depth) pair (S ≈ 5–8·P — the dominant cost at scale), the P
*Gaussians* are depth-sorted first and instances are emitted in that
order; the instance pass then only needs a sort by (tile, emission index),
which packs into ONE u32 key (tile in the high bits, instance index in the
low bits) whenever ceil(log2(num_tiles+1)) + ceil(log2(cap)) <= 32 — true
for every production configuration. Within a tile, emission order equals
(depth asc, Gaussian id asc), i.e. exactly the float-bit radix order of
the reference (positive depths) with its stable tie-break.

Everything here is shape-static and jit-compatible; `overflow` reports
when the capacity was exceeded (results are then truncated and the caller
should re-jit with a larger `max_instances`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed


class Binning(NamedTuple):
    point_list: jax.Array    # (S,) int32 Gaussian id per slot, -1 for padding
    slot_tile: jax.Array     # (S,) int32 tile of each slot (num_tiles for pad)
    chunk_tile: jax.Array    # (C,) int32 tile of each chunk (num_tiles sentinel)
    chunk_first: jax.Array   # (C,) int32 1 if first chunk of its tile
    chunk_last: jax.Array    # (C,) int32 1 if last chunk of its tile
    tile_counts: jax.Array   # (T,) int32 real instances per tile
    num_instances: jax.Array # () int32 total real instances
    overflow: jax.Array      # () bool


def bin_gaussians(
    prep: Preprocessed,
    *,
    tiles_x: int,
    tiles_y: int,
    max_instances: int,
    chunk: int = 128,
) -> Binning:
    num_tiles = tiles_x * tiles_y
    p = prep.depth.shape[0]
    cap = max_instances
    # Slot capacity covers worst-case per-tile round-up padding; rounded so
    # the chunk count is a multiple of 8 (blend kernel output blocking).
    slot_cap = cap + num_tiles * chunk
    slot_cap = ((slot_cap + 8 * chunk - 1) // (8 * chunk)) * (8 * chunk)
    num_chunks = slot_cap // chunk

    tiles_touched = prep.tiles_touched

    # ---- Depth pre-sort of the P Gaussians (P-sized — ~5-8x smaller than
    # the instance sort it lets us avoid). Stable sort on depth keeps the
    # reference tie-break (ascending Gaussian id).
    d_key = jnp.where(tiles_touched > 0, prep.depth, jnp.inf)
    _, perm = jax.lax.sort(
        (d_key, jnp.arange(p, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    tt_s = tiles_touched[perm]
    cum = jnp.cumsum(tt_s)
    total = cum[-1]
    offsets = (cum - tt_s).astype(jnp.int32)  # exclusive, sorted space

    # One wide-row gather of everything the expansion needs (separate
    # column gathers each pay full random-access cost). f32 holds these
    # ints exactly (all < 2^24).
    gtab = jnp.stack(
        [
            prep.rect_min[:, 0].astype(jnp.float32),
            prep.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1).astype(
                jnp.float32
            ),
            jnp.arange(p, dtype=jnp.float32),  # original Gaussian id
        ],
        axis=1,
    )
    gtab_s = jnp.concatenate(
        [offsets[:, None].astype(jnp.float32), gtab[perm]], axis=1
    )  # (P, 5): offset, rect_min_x, rect_min_y, rect_w, orig_id

    # Expand instances: instance i belongs to sorted-Gaussian g(i). A
    # searchsorted over millions of instances costs ~log(P) random gathers
    # each; instead scatter each Gaussian's position at its first instance
    # slot and take a running max — one scatter of P values + one
    # associative scan.
    inst = jnp.arange(cap, dtype=jnp.int32)
    start_marks = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(tt_s > 0, offsets, cap)
    ].max(jnp.arange(p, dtype=jnp.int32), mode="drop")
    gid_c = jnp.maximum(jax.lax.cummax(start_marks), 0)  # sorted positions
    rows = gtab_s[gid_c]
    local = inst - rows[:, 0].astype(jnp.int32)
    width = rows[:, 3].astype(jnp.int32)
    tx = rows[:, 1].astype(jnp.int32) + local % width
    ty = rows[:, 2].astype(jnp.int32) + local // width
    tile = ty * tiles_x + tx
    inst_valid = inst < total
    tile = jnp.where(inst_valid, tile, num_tiles)
    orig = rows[:, 4].astype(jnp.int32)  # original Gaussian id per instance

    # Sort instances by tile, stable in emission (= depth) order. When
    # tile and emission index pack into 32 bits this is ONE u32 key with
    # no payload — far cheaper than a multi-operand sort.
    inst_bits = max((cap - 1).bit_length(), 1)
    if num_tiles + 1 <= (1 << (32 - inst_bits)):
        key = (
            tile.astype(jnp.uint32) << inst_bits
        ) | inst.astype(jnp.uint32)
        (s_key,) = jax.lax.sort((key,), num_keys=1)
        s_tile = (s_key >> inst_bits).astype(jnp.int32)
        s_inst = (s_key & jnp.uint32((1 << inst_bits) - 1)).astype(jnp.int32)
    else:  # huge-capacity fallback: distinct (tile, inst) pairs — a 2-key
        # sort is a total order, identical result.
        s_tile, s_inst = jax.lax.sort((tile, inst), num_keys=2)
    s_gid = orig[s_inst]

    # Per-tile ranges in the sorted instance array.
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    # Chunk-aligned slot layout.
    padded = ((counts + chunk - 1) // chunk) * chunk
    pcum = jnp.cumsum(padded)
    total_padded = pcum[-1]
    pstarts = pcum - padded

    slot = jnp.arange(slot_cap, dtype=jnp.int32)
    # Expand per-tile quantities to slots with the same scatter+scan trick
    # as the gaussian-id expansion above. tile id, sorted-range start,
    # padded start, and data end are all nondecreasing along slots, so a
    # running max after scattering at each tile's first slot reconstructs
    # them without any large gathers.
    scatter_idx = jnp.where(padded > 0, pstarts, slot_cap)
    # All four expansions ride ONE scatter + ONE cummax over a (4, S) batch.
    vals = jnp.stack(
        [
            tile_ids, starts, pstarts.astype(jnp.int32),
            (pstarts + counts).astype(jnp.int32),
        ],
        axis=0,
    )
    marks = jnp.full((4, slot_cap), -1, jnp.int32).at[:, scatter_idx].max(
        vals, mode="drop"
    )
    expanded = jnp.maximum(jax.lax.cummax(marks, axis=1), 0)
    slot_tile, slot_start, slot_pstart, slot_data_end = expanded
    l = slot - slot_pstart
    slot_ok = (slot < total_padded) & (slot < slot_data_end)
    src = jnp.minimum(slot_start + l, cap - 1)
    point_list = jnp.where(slot_ok, s_gid[src], -1)
    slot_tile = jnp.where(slot < total_padded, slot_tile, num_tiles)

    chunk_start_slot = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    chunk_tile = slot_tile[chunk_start_slot]
    chunk_tile_c = jnp.minimum(chunk_tile, num_tiles - 1)
    chunk_valid = chunk_tile < num_tiles
    chunk_first = (
        chunk_valid & (chunk_start_slot == pstarts[chunk_tile_c])
    ).astype(jnp.int32)
    chunk_last = (
        chunk_valid
        & (chunk_start_slot + chunk == pstarts[chunk_tile_c] + padded[chunk_tile_c])
    ).astype(jnp.int32)

    overflow = (total > cap) | (total_padded > slot_cap)
    return Binning(
        point_list=point_list.astype(jnp.int32),
        slot_tile=slot_tile,
        chunk_tile=jnp.where(chunk_valid, chunk_tile, num_tiles).astype(jnp.int32),
        chunk_first=chunk_first,
        chunk_last=chunk_last,
        tile_counts=counts,
        num_instances=total.astype(jnp.int32),
        overflow=overflow,
    )
