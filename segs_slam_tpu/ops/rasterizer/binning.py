"""Tile binning v3: compaction + K_MAX payload expansion — zero gathers.

TPU-native replacement of the reference's CUB binning pipeline
(reference: cuda_rasterizer/rasterizer_impl.cu:70-138, 276-308). Profiling on
v5e showed that ANY computed-index gather/scatter over the ~1M instance axis
lowers to a serial per-element loop (~8 ns/elem, ~8 ms per op), so this
design expresses the whole pipeline as sorts, scans and broadcasts only:

  1. COMPACT the (mostly padded/masked) gaussians: one stable sort by
     !valid carrying every per-gaussian field as a payload, then keep the
     leading `compact` slots (static capacity).
  2. EXPAND each compact gaussian to exactly kmax instance slots by pure
     broadcasting (invalid k's get the sentinel tile), computing each
     instance's tile arithmetically — the dynamic expansion of CUDA's
     duplicateWithKeys becomes a static [compact, kmax] grid (rects are
     pre-clamped to kmax cells in preprocess).
  3. ONE stable lexicographic sort on (tile, depth) whose payloads are the 9
     render features + the compact id; the sorted feature columns feed the
     Pallas blend directly (no post-sort feature gather).
  4. tile ranges via small-side searchsorted (1 query per tile).

Gradient flow happens in blend.py's custom VJP: per-instance gradients are
segment-summed by compact id and scattered back through the compaction
(both in the fast scatter class: sorted ids / unique indices).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from segs_slam_tpu.ops.rasterizer.preprocess import RasterConfig

NPAY = 9  # mean2d.x/y, conic a/b/c, opacity, r, g, b


class CompactGaussians(NamedTuple):
    feats: tuple  # NPAY arrays (compact,)
    rect_min_x: jnp.ndarray
    rect_min_y: jnp.ndarray
    rect_w: jnp.ndarray
    touched: jnp.ndarray
    depth: jnp.ndarray
    orig_id: jnp.ndarray  # (compact,) index into the original [N] arrays
    valid: jnp.ndarray  # (compact,) bool
    num_valid: jnp.ndarray  # () int32 — true count (may exceed capacity)


class BinnedInstances(NamedTuple):
    feats_sorted: tuple  # NPAY arrays (NK,) in (tile, depth) order
    gid_sorted: jnp.ndarray  # (NK,) compact ids
    tile_start: jnp.ndarray  # (num_tiles,)
    tile_stop: jnp.ndarray  # (num_tiles,)
    num_instances: jnp.ndarray  # () int32
    num_large: jnp.ndarray  # () int32 — gaussians with touched > ksmall


def compact_gaussians(
    feats: tuple,  # NPAY arrays (N,), differentiable payloads
    aux: dict,  # rect_min_x/y, rect_w, touched (int32), depth (f32), alive
    config: RasterConfig,
) -> CompactGaussians:
    alive = aux["alive"]
    n = alive.shape[0]
    nc = config.compact
    if n < nc:  # small scenes: pad up to the compaction capacity
        pad = nc - n
        feats = tuple(jnp.pad(f, (0, pad)) for f in feats)
        aux = {
            k: jnp.pad(v, (0, pad)) for k, v in aux.items()
        }
        alive = aux["alive"]
        n = nc
    # Priority compaction: under capacity pressure the sort drops the
    # FAINTEST gaussians instead of arbitrary (anchor-order) ones — overflow
    # becomes graceful degradation. Key layout: dead gaussians above every
    # alive one, alive ones ordered by descending opacity (16-bit quantized;
    # stable sort keeps original order within equal keys).
    opac = feats[5]
    opac_q = (65535.0 * (1.0 - jnp.clip(opac, 0.0, 1.0))).astype(jnp.int32)
    # non-finite opacity would quantize to an arbitrary (possibly negative)
    # int and win the priority sort — treat it as dead instead
    key = jnp.where(alive & jnp.isfinite(opac), opac_q, jnp.int32(1 << 24))
    idx = jnp.arange(n, dtype=jnp.int32)
    out = lax.sort(
        (key,)
        + tuple(feats)
        + (
            aux["rect_min_x"],
            aux["rect_min_y"],
            aux["rect_w"],
            aux["touched"],
            aux["depth"],
            idx,
        ),
        num_keys=1,
        is_stable=True,
    )
    key_s = out[0][:nc]
    feats_s = tuple(o[:nc] for o in out[1 : 1 + NPAY])
    rmx, rmy, rw, touched = (o[:nc] for o in out[1 + NPAY : 5 + NPAY])
    depth = out[5 + NPAY][:nc]
    orig = out[6 + NPAY][:nc]
    valid = key_s < (1 << 24)
    num_valid = jnp.sum(alive.astype(jnp.int32))
    return CompactGaussians(
        feats=feats_s,
        rect_min_x=rmx,
        rect_min_y=rmy,
        rect_w=rw,
        touched=jnp.where(valid, touched, 0),
        depth=depth,
        orig_id=orig,
        valid=valid,
        num_valid=num_valid,
    )


def _expand_grid(cg_fields, nc, k_lo, k_hi, tx, num_tiles):
    """Instance columns for slots k in [k_lo, k_hi) of nc gaussians.
    cg_fields = (feats tuple, rect_min_x, rect_min_y, rect_w, touched,
    depth, gid)."""
    feats, rmx, rmy, rw_, touched, depth_, gid_ = cg_fields
    kw = k_hi - k_lo
    k = lax.broadcasted_iota(jnp.int32, (nc, kw), 1) + k_lo
    ok = k < touched[:, None]
    rw = jnp.maximum(rw_, 1)[:, None]
    dy = k // rw
    dx = k - dy * rw
    tile = (rmy[:, None] + dy) * tx + (rmx[:, None] + dx)
    tile = jnp.where(ok, tile, num_tiles).reshape(-1).astype(jnp.int32)
    depth = jnp.broadcast_to(depth_[:, None], (nc, kw)).reshape(-1)
    gid = jnp.broadcast_to(gid_[:, None], (nc, kw)).reshape(-1)
    pays = tuple(
        jnp.broadcast_to(f[:, None], (nc, kw)).reshape(-1) for f in feats
    )
    return tile, depth, gid, pays


def expand_and_sort(
    cg: CompactGaussians,
    num_tiles_x: int,
    num_tiles_y: int,
    config: RasterConfig,
) -> BinnedInstances:
    nc, km = config.compact, config.kmax
    tx = num_tiles_x
    num_tiles = num_tiles_x * num_tiles_y

    gid0 = jnp.arange(nc, dtype=jnp.int32)
    touched = jnp.minimum(cg.touched, km)
    base_fields = (cg.feats, cg.rect_min_x, cg.rect_min_y, cg.rect_w,
                   touched, cg.depth, gid0)

    if config.ksmall:
        ks, nl = config.ksmall, config.nlarge
        # every gaussian gets its first ks slots
        tile_s, depth_s, gid_s, pays_s = _expand_grid(
            base_fields, nc, 0, ks, tx, num_tiles
        )
        # the nlarge largest-footprint gaussians get the remaining slots:
        # one cheap nc-row selection sort (largest touched first, stable)
        # carrying the fields needed for expansion + the ORIGINAL compact id
        # (gradients segment-sum by that id). Key: small gaussians sort above
        # km+1, large ones by km - touched so the biggest footprints win the
        # nlarge slots when truncation occurs (advisor r2).
        sel_key = jnp.where(touched <= ks, km + 1, km - touched)
        sel = lax.sort(
            (sel_key,)
            + tuple(cg.feats)
            + (cg.rect_min_x, cg.rect_min_y, cg.rect_w, touched, cg.depth,
               gid0),
            num_keys=1,
            is_stable=True,
        )
        feats_l = tuple(f[:nl] for f in sel[1 : 1 + NPAY])
        rmx_l, rmy_l, rw_l, touched_l, depth_l, gid_l = (
            x[:nl] for x in sel[1 + NPAY:]
        )
        large_fields = (feats_l, rmx_l, rmy_l, rw_l, touched_l, depth_l,
                        gid_l)
        tile_l, depth_lc, gid_lc, pays_l = _expand_grid(
            large_fields, nl, ks, km, tx, num_tiles
        )
        tile = jnp.concatenate([tile_s, tile_l])
        depth = jnp.concatenate([depth_s, depth_lc])
        gid = jnp.concatenate([gid_s, gid_lc])
        pays = tuple(
            jnp.concatenate([a, b]) for a, b in zip(pays_s, pays_l)
        )
    else:
        tile, depth, gid, pays = _expand_grid(
            base_fields, nc, 0, km, tx, num_tiles
        )

    out = lax.sort((tile, depth, gid) + pays, num_keys=2, is_stable=True)
    tile_sorted = out[0]
    depth_sorted = out[1]
    gid_sorted = out[2]
    # depth rides along as a 10th feature column (expected-depth rendering);
    # it gets no gradient (the sort key is stop-gradient upstream).
    feats_sorted = out[3:] + (depth_sorted,)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)

    if config.ksmall:
        # actual emitted instances: every gaussian gets min(touched, ksmall)
        # slots; only the nlarge selected large ones emit their slots beyond
        # ksmall (advisor r2: the old sum(min(touched, kmax)) overcounted
        # exactly when truncation occurred).
        ks = config.ksmall
        num_instances = jnp.sum(jnp.minimum(touched, ks)) + jnp.sum(
            jnp.maximum(touched_l - ks, 0)
        )
        num_large = jnp.sum((touched > ks).astype(jnp.int32))
    else:
        num_instances = jnp.sum(jnp.minimum(cg.touched, km))
        num_large = jnp.int32(0)
    return BinnedInstances(
        feats_sorted=feats_sorted,
        gid_sorted=gid_sorted,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_instances=num_instances,
        num_large=num_large,
    )
