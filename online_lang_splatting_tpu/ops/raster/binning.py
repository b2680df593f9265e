"""Tile binning: Gaussian→tile instance duplication + depth ordering.

TPU-native replacement for the reference's cub pipeline
(/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
rasterizer_impl.cu:216-362: InclusiveSum → duplicateWithKeys →
DeviceRadixSort over [tileID|depth-bits] → identifyTileRanges). Instead of
dynamic allocations and 64-bit keys we use static capacities, a stable
two-key `lax.sort` (tile major, depth minor — identical order to the
float-bit radix sort for positive depths, ties broken by Gaussian index
like the stable radix pass), and a *chunk-aligned* slot layout: every
tile's instance run is padded to a multiple of the blend kernel's chunk
size so one grid step never straddles two tiles. Empty capacity is marked
with Gaussian id -1.

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
    cum = jnp.cumsum(tiles_touched)
    total = cum[-1]
    offsets = cum - tiles_touched  # exclusive

    # Expand instances: instance i belongs to gaussian g(i). A searchsorted
    # over millions of instances costs ~log(P) random gathers each (the
    # dominant cost of the whole pipeline on TPU); instead scatter each
    # Gaussian's id at its first instance slot and take a running max —
    # one scatter of P values + one associative scan.
    inst = jnp.arange(cap, dtype=jnp.int32)
    start_marks = jnp.full((cap,), -1, jnp.int32).at[
        jnp.where(tiles_touched > 0, offsets, cap)
    ].max(jnp.arange(p, dtype=jnp.int32), mode="drop")
    gid_c = jnp.maximum(jax.lax.cummax(start_marks), 0)
    # One wide-row gather of everything the expansion needs (separate
    # column gathers each pay full random-access cost). f32 holds these
    # ints exactly (all < 2^24).
    gtable = jnp.stack(
        [
            offsets.astype(jnp.float32),
            prep.rect_min[:, 0].astype(jnp.float32),
            prep.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1).astype(
                jnp.float32
            ),
            prep.depth,
        ],
        axis=1,
    )
    rows = gtable[gid_c]
    local = inst - rows[:, 0].astype(jnp.int32)
    width = rows[:, 3].astype(jnp.int32)
    tx = rows[:, 1].astype(jnp.int32) + local % width
    ty = rows[:, 2].astype(jnp.int32) + local // width
    tile = ty * tiles_x + tx
    inst_valid = inst < total
    tile = jnp.where(inst_valid, tile, num_tiles)

    # Sort instances by (tile, depth), stable in gaussian order.
    depth = jnp.where(inst_valid, rows[:, 4], jnp.inf)
    s_tile, _, s_gid = jax.lax.sort(
        (tile, depth, gid_c), num_keys=2, is_stable=True
    )

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
