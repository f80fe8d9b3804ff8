"""Tile binning: expand Gaussians into per-tile depth-sorted instances.

TPU-native replacement of the reference's CUB pipeline — InclusiveSum over
tiles_touched, duplicateWithKeys, 64-bit radix sort, identifyTileRanges
(reference: cuda_rasterizer/rasterizer_impl.cu:70-138, 276-308) — built from
XLA primitives with STATIC shapes and no searchsorted on hot paths
(XLA lowers searchsorted to serial gather loops; a scatter + cummax
"fill-forward" computes the same segment-ownership map in O(n) vector ops):

  * exclusive cumsum over tiles_touched,
  * segment ownership (instance slot -> source Gaussian) via scattering each
    Gaussian's index at its segment start and taking a cumulative max
    (the inverse of CUDA's per-Gaussian write loop),
  * one stable `lax.sort` keyed lexicographically on (tile, depth), which is
    order-equivalent to the reference's packed [tile|depth-bits] radix sort,
  * a scatter that re-lays the sorted instances into per-tile segments padded
    to the blend chunk size, so every chunk DMA in the Pallas kernel starts
    at a lane-aligned offset (TPU DMA slices along the minor dimension must
    be 128-aligned).

Overflow of the static instance capacity drops the instances of the largest
tile ids; the true total is returned so callers can monitor overflow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from segs_slam_tpu.ops.rasterizer.preprocess import GaussianProjection, RasterConfig


class TileBinning(NamedTuple):
    gauss_id: jnp.ndarray  # (cap_aligned,) int32 source gaussian per slot
    slot_valid: jnp.ndarray  # (cap_aligned,) bool — real instance vs padding
    slot_tile: jnp.ndarray  # (cap_aligned,) int32 tile of each slot
    seg_start: jnp.ndarray  # (num_tiles,) int32 aligned segment starts
    seg_count: jnp.ndarray  # (num_tiles,) int32 true instance counts
    num_instances: jnp.ndarray  # () int32 — true total (may exceed capacity)


def aligned_capacity(config: RasterConfig, width: int, height: int) -> int:
    tx, ty = config.grid(width, height)
    return config.max_instances + tx * ty * config.chunk


def _fill_forward_owner(starts: jnp.ndarray, size: int) -> jnp.ndarray:
    """owner[i] = largest k with starts[k] <= i (segments are [starts[k],
    starts[k+1])). Assumes starts is non-decreasing with starts[0] == 0."""
    n = starts.shape[0]
    mark = jnp.zeros(size, jnp.int32)
    mark = mark.at[starts].max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return lax.cummax(mark)


def bin_gaussians(
    proj: GaussianProjection,
    width: int,
    height: int,
    config: RasterConfig,
) -> TileBinning:
    tx, ty = config.grid(width, height)
    num_tiles = tx * ty
    cap = config.max_instances
    ch = config.chunk

    # Force materialization of the small per-gaussian tables. Without this
    # XLA fuses the entire preprocess chain INTO the 1M-index gathers below,
    # recomputing it per instance access (measured 39 ms vs 0.03 ms).
    proj = GaussianProjection(*jax.lax.optimization_barrier(tuple(proj)))

    touched = proj.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(touched)  # inclusive
    total = cum[-1]
    offsets = cum - touched  # exclusive

    inst = jnp.arange(cap, dtype=jnp.int32)
    # Instance i belongs to gaussian g with offsets[g] <= i < cum[g]. Among
    # gaussians sharing a segment start, all but the largest have empty
    # segments, so scatter-max + cummax picks the true owner.
    g = _fill_forward_owner(offsets, cap)
    in_range = inst < jnp.minimum(total, cap)

    k = inst - offsets[g]
    rect_min = proj.rect_min[g]  # (cap, 2) — gathers from small [N] tables
    rect_w = jnp.maximum(proj.rect_max[g, 0] - rect_min[:, 0], 1)
    dy = k // rect_w
    dx = k - dy * rect_w
    tile = (rect_min[:, 1] + dy) * tx + (rect_min[:, 0] + dx)
    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)

    depth = jnp.where(in_range, proj.depth[g], jnp.inf).astype(jnp.float32)

    tile_sorted, _depth_sorted, gauss_sorted = lax.sort(
        (tile, depth, g), num_keys=2, is_stable=True
    )

    # Per-tile instance counts without searchsorted: count instances per tile.
    counts = jnp.zeros(num_tiles + 1, jnp.int32).at[tile_sorted].add(1)[:-1]
    tile_stop = jnp.cumsum(counts)
    tile_start = tile_stop - counts

    # Chunk-aligned segment layout.
    padded = (counts + ch - 1) // ch * ch
    seg_cum = jnp.cumsum(padded)  # inclusive
    seg_start = seg_cum - padded

    cap_aligned = aligned_capacity(config, width, height)
    # Scatter sorted instances directly into their aligned slots.
    local = inst - tile_start[tile_sorted]  # rank within tile
    dest = jnp.where(
        tile_sorted < num_tiles, seg_start[tile_sorted] + local, cap_aligned
    )
    gauss_aligned = jnp.zeros(cap_aligned, jnp.int32).at[dest].set(
        gauss_sorted, mode="drop"
    )

    # Slot -> tile ownership over the aligned layout (same fill-forward trick;
    # empty tiles share starts with the next non-empty one, max wins).
    slot = jnp.arange(cap_aligned, dtype=jnp.int32)
    t_of = _fill_forward_owner(seg_start, cap_aligned)
    local_slot = slot - seg_start[t_of]
    slot_valid = (slot < seg_cum[-1]) & (local_slot < counts[t_of])

    return TileBinning(
        gauss_id=gauss_aligned,
        slot_valid=slot_valid,
        slot_tile=t_of,
        seg_start=seg_start,
        seg_count=counts,
        num_instances=total,
    )
