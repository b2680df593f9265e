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

    # Expand instances: instance i belongs to gaussian g(i) via searchsorted.
    inst = jnp.arange(cap, dtype=jnp.int32)
    gid = jnp.searchsorted(cum, inst, side="right").astype(jnp.int32)
    gid_c = jnp.minimum(gid, p - 1)
    local = inst - offsets[gid_c]
    rect_min = prep.rect_min[gid_c]
    width = jnp.maximum(prep.rect_max[gid_c, 0] - rect_min[:, 0], 1)
    tx = rect_min[:, 0] + local % width
    ty = rect_min[:, 1] + local // width
    tile = ty * tiles_x + tx
    inst_valid = inst < total
    tile = jnp.where(inst_valid, tile, num_tiles)

    # Sort instances by (tile, depth), stable in gaussian order.
    depth = jnp.where(inst_valid, prep.depth[gid_c], jnp.inf)
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
    slot_tile = jnp.searchsorted(pcum, slot, side="right").astype(jnp.int32)
    slot_tile_c = jnp.minimum(slot_tile, num_tiles - 1)
    l = slot - pstarts[slot_tile_c]
    slot_ok = (slot < total_padded) & (l < counts[slot_tile_c])
    src = jnp.minimum(starts[slot_tile_c] + l, cap - 1)
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
