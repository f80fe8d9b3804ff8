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
    assert not config.nmid, \
        "3-tier (nmid) is packed-eval only; training expansion is 2-tier"
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




# ---------------------------------------------------------------------------
# Packed (eval-only) binning: the two big payload sorts are HBM-bandwidth
# bound (real-map profile: 5.3 ms compact + 9.2 ms instance sort vs 2.5 ms
# for the Pallas blend itself at the 65k-anchor point), so the no-gradient
# eval path shrinks the sorted bytes by packing feature pairs into f16
# halves of one u32 column and fusing (tile, depth) into a single u32 sort
# key. Features are unpacked back to f32 [NFEAT, NK] AFTER the sort, so the
# blend kernel is shared with the training path bit-for-bit.
#
# Column layout (8 sort operands in the compaction vs 16 unpacked, 6 in the
# instance sort vs 12):
#   p_xy   = f16(x - rect_min_x*16) | f16(y - rect_min_y*16) << 16
#   p_cab  = f16(conic.a) | f16(conic.b) << 16
#   p_cco  = f16(conic.c) | f16(opacity) << 16
#   p_rg   = f16(r) | f16(g) << 16
#   p_b    = f16(b) | rect_min_x << 16 | rect_min_y << 24
#   dmeta  = depth_key(21 bits) | min(touched, kmax) << 21 | rect_w << 26
#            (rect_w needs 6 bits -> tile-grid width <= 63, i.e. images up
#            to 1008 px wide at 16 px tiles; kmax <= 31)
#
# Precision: mean2d is RECT-RELATIVE (f16 ulp <= 0.25 px within a
# kmax-clamped footprint; one more rounding when re-based to the instance
# tile bounds the total at 0.5 px for the farthest tile of the largest
# footprint); conic/opacity/rgb carry f16's ~0.05% relative error; the
# depth key keeps the top 21 bits of the f32 pattern (sign+exp+12 mantissa
# bits, monotonic for positive depths) — ordering flips only between
# gaussians within ~0.02% relative depth.
# ---------------------------------------------------------------------------

DEPTH_KEY_BITS = 21


def _pack2f16(a, b):
    """Two f32 arrays -> one u32 (f16 bit patterns; a in low, b in high)."""
    au = lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
    bu = lax.bitcast_convert_type(b.astype(jnp.float16), jnp.uint16)
    return au.astype(jnp.uint32) | (bu.astype(jnp.uint32) << 16)


def _unpack2f16(p):
    lo = lax.bitcast_convert_type((p & 0xFFFF).astype(jnp.uint16),
                                  jnp.float16)
    hi = lax.bitcast_convert_type((p >> 16).astype(jnp.uint16), jnp.float16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _depth_key(depth):
    """Monotonic 21-bit key for positive f32 depths."""
    bits = lax.bitcast_convert_type(depth, jnp.uint32)
    return bits >> (32 - DEPTH_KEY_BITS)


class PackedCompact(NamedTuple):
    p_xy: jnp.ndarray  # (compact,) u32 — rect-relative mean2d f16 pair
    p_cab: jnp.ndarray  # (compact,) u32
    p_cco: jnp.ndarray  # (compact,) u32
    p_rg: jnp.ndarray  # (compact,) u32
    p_b: jnp.ndarray  # (compact,) u32 — f16 b | rmx<<16 | rmy<<24
    dmeta: jnp.ndarray  # (compact,) u32 = dkey | touched<<21 | rw<<26
    valid: jnp.ndarray  # (compact,) bool
    num_valid: jnp.ndarray  # () int32
    orig_id: jnp.ndarray | None = None  # (compact,) i32 — training only


def _pack_eval_cols(feats, aux, config: RasterConfig):
    """Packed per-gaussian columns at the raw [N] rows. Returns
    (payload_cols, dmeta, alive_ok, opac_q, num_valid) — the shared
    front of both the opacity-priority compaction and the direct-selection
    path (dead rows carry dmeta with touched forced to 0 so they can never
    expand wherever they land).

    Default layout: 5 f16-pair payload columns (p_xy, p_cab, p_cco, p_rg,
    p_b|rmx|rmy). With config.pack8 (sel_direct eval only): 4 columns —
      c0 = xr f16 | yr f16       (rect-relative mean2d, as before)
      c1 = ca f16 | cb f16
      c2 = cc f16 | op11 << 16 | rmy5 << 27
      c3 = r8 | g8 << 8 | b8 << 16 | rmx6 << 24
    (dmeta unchanged: dkey21 | touched5 | rw6 — full depth-key precision.)
    """
    assert config.kmax <= 31, "touched packs into dmeta bits 21..25"
    alive = aux["alive"]
    x, y, ca, cb, cc, op, r, g, b = feats
    opac_q = (65535.0 * (1.0 - jnp.clip(op, 0.0, 1.0))).astype(jnp.uint32)
    alive_ok = alive & jnp.isfinite(op)
    rmx = jnp.clip(aux["rect_min_x"], 0, 255).astype(jnp.uint32)
    rmy = jnp.clip(aux["rect_min_y"], 0, 255).astype(jnp.uint32)
    rw = jnp.clip(aux["rect_w"], 0, 63).astype(jnp.uint32)
    touched = jnp.where(alive_ok,
                        jnp.clip(aux["touched"], 0, config.kmax),
                        0).astype(jnp.uint32)
    # depth of dead slots may be garbage/negative: force a positive value so
    # the 21-bit key stays monotonic-safe (dead slots never expand anyway)
    depth_safe = jnp.where(alive_ok, aux["depth"], 1.0)
    dmeta = (_depth_key(depth_safe) | (touched << DEPTH_KEY_BITS)
             | (rw << (DEPTH_KEY_BITS + 5)))
    ts = 16.0
    p_xy = _pack2f16(x - rmx.astype(jnp.float32) * ts,
                     y - rmy.astype(jnp.float32) * ts)
    if config.pack8:
        def q(v, levels):
            return jnp.clip(jnp.round(jnp.clip(v, 0.0, 1.0) * levels),
                            0, levels).astype(jnp.uint32)

        cco = lax.bitcast_convert_type(cc.astype(jnp.float16),
                                       jnp.uint16).astype(jnp.uint32)
        pays = (
            p_xy,
            _pack2f16(ca, cb),
            cco | (q(op, 2047) << 16) | (jnp.minimum(rmy, 31) << 27),
            q(r, 255) | (q(g, 255) << 8) | (q(b, 255) << 16) | (rmx << 24),
        )
    else:
        pays = (
            p_xy,
            _pack2f16(ca, cb),
            _pack2f16(cc, op),
            _pack2f16(r, g),
            _pack2f16(b, jnp.zeros_like(b)) | (rmx << 16) | (rmy << 24),
        )
    num_valid = jnp.sum(alive_ok.astype(jnp.int32))
    return pays, dmeta, alive_ok, opac_q, num_valid


def compact_gaussians_packed(feats, aux, config: RasterConfig,
                             with_orig: bool = False):
    """Opacity-priority compaction with packed payloads (7 sort operands vs
    16 in compact_gaussians). Same key semantics. with_orig adds the
    original-index column the training backward scatters through (8
    operands)."""
    alive = aux["alive"]
    n = alive.shape[0]
    nc = config.compact
    if n < nc:
        pad = nc - n
        feats = tuple(jnp.pad(f, (0, pad)) for f in feats)
        aux = {k: jnp.pad(v, (0, pad)) for k, v in aux.items()}
        alive = aux["alive"]
        n = nc
    pays, dmeta, alive_ok, opac_q, num_valid = _pack_eval_cols(
        feats, aux, config)
    key = jnp.where(alive_ok, opac_q, jnp.uint32(1 << 24))
    cols = (key,) + pays + (dmeta,)
    if config.kanchor and not with_orig and n % config.kgroup == 0:
        # per-anchor K-axis pre-compaction: priority-sort each anchor's
        # kgroup gaussians along the tiny lane axis (a vectorized sorting
        # network across all anchors at once) and keep the kanchor most
        # opaque — shrinking the global compaction sort's input rows by
        # kanchor/kgroup. The dropped overflow (anchors with > kanchor
        # alive offsets) coincides with what the global opacity-priority
        # compaction would drop under capacity pressure anyway.
        ka, kg = config.kanchor, config.kgroup
        grouped = [[c.reshape(-1, kg)[:, j] for c in cols]
                   for j in range(kg)]  # kg slots x ncol column vectors
        # Explicit compare-exchange network (Batcher-ish via insertion
        # bubbles, ~kg^2/2 CEs of pure elementwise select): lax.sort along
        # a tiny axis-1 lowers catastrophically on TPU (measured ~20 ms
        # fixed overhead for 2-D sorts), while kg^2/2 vectorized CEs over
        # [cap] lanes are essentially free.
        for pass_ in range(kg):
            lo = pass_ % 2
            for j in range(lo, kg - 1, 2):
                a, b = grouped[j], grouped[j + 1]
                swap = a[0] > b[0]  # key = operand 0 (priority)
                grouped[j] = [jnp.where(swap, y, x) for x, y in zip(a, b)]
                grouped[j + 1] = [jnp.where(swap, x, y)
                                  for x, y in zip(a, b)]
        cols = tuple(
            jnp.stack([grouped[j][ci] for j in range(ka)],
                      axis=1).reshape(-1)
            for ci in range(len(cols)))
        n = n // kg * ka
        if n < nc:
            cols = tuple(jnp.pad(c, (0, nc - n),
                                 constant_values=(1 << 24) if i == 0 else 0)
                         for i, c in enumerate(cols))
            n = nc
    if with_orig:
        cols = cols + (jnp.arange(n, dtype=jnp.int32),)
    out = lax.sort(cols, num_keys=1, is_stable=True)
    key_s = out[0][:nc]
    valid = key_s < (1 << 24)
    dmeta_s = jnp.where(valid, out[6][:nc], 0)  # touched=0 for dead slots
    return PackedCompact(
        p_xy=out[1][:nc],
        p_cab=out[2][:nc],
        p_cco=out[3][:nc],
        p_rg=out[4][:nc],
        p_b=out[5][:nc],
        dmeta=dmeta_s,
        valid=valid,
        num_valid=num_valid,
        orig_id=out[7][:nc] if with_orig else None,
    )


def _expand_grid_packed(cols, nc, k_lo, k_hi, tx, num_tiles,
                        pb_override=None):
    """Instance columns for slots [k_lo, k_hi): fused u32 (tile, depth) key
    + packed payloads, with mean2d re-based from rect-relative to
    TILE-relative per instance. cols = (p_xy, p_cab, p_cco, p_rg, p_b,
    dmeta). pb_override (training) replaces the broadcast p_b payload —
    rmx/rmy are still read from cols' p_b for tile arithmetic."""
    p_xy, p_cab, p_cco, p_rg, p_b, dmeta = cols
    rmx = ((p_b >> 16) & 0xFF).astype(jnp.int32)
    rmy = ((p_b >> 24) & 0xFF).astype(jnp.int32)
    rw_ = ((dmeta >> (DEPTH_KEY_BITS + 5)) & 0x3F).astype(jnp.int32)
    touched = ((dmeta >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)
    dkey = dmeta & ((1 << DEPTH_KEY_BITS) - 1)

    kw = k_hi - k_lo
    k = lax.broadcasted_iota(jnp.int32, (nc, kw), 1) + k_lo
    ok = k < touched[:, None]
    rw = jnp.maximum(rw_, 1)[:, None]
    dy = k // rw
    dx = k - dy * rw
    tile_x = rmx[:, None] + dx
    tile_y = rmy[:, None] + dy
    tile = jnp.where(ok, tile_y * tx + tile_x, num_tiles).astype(jnp.uint32)
    ukey = ((tile << DEPTH_KEY_BITS)
            | jnp.broadcast_to(dkey[:, None], (nc, kw))).reshape(-1)
    # re-base mean2d from rect-min-relative to instance-tile-relative: the
    # offset (dx, dy)*16 is exact in f16's range, so at most one extra
    # rounding of an already-f16 value
    ts = 16.0
    xr, yr = _unpack2f16(p_xy)
    xi = xr[:, None] - dx.astype(jnp.float32) * ts
    yi = yr[:, None] - dy.astype(jnp.float32) * ts
    p_xy_i = _pack2f16(xi.reshape(-1), yi.reshape(-1))

    def bcast(c):
        return jnp.broadcast_to(c[:, None], (nc, kw)).reshape(-1)

    pb = p_b if pb_override is None else pb_override
    return ukey, (p_xy_i, bcast(p_cab), bcast(p_cco), bcast(p_rg),
                  bcast(pb))


def _expand_grid_packed8(cols, nc, k_lo, k_hi, tx, num_tiles):
    """_expand_grid_packed for the pack8 4-column layout (see
    _pack_eval_cols): rmx lives in c3 bits 24..31, rmy in c2 bits 27..31.
    cols = (c_xy, c_cab, c_cco11rmy, c_rgbmx, dmeta)."""
    c_xy, c_cab, c_cco, c_rgb, dmeta = cols
    rmx = (c_rgb >> 24).astype(jnp.int32)
    rmy = ((c_cco >> 27) & 0x1F).astype(jnp.int32)
    rw_ = ((dmeta >> (DEPTH_KEY_BITS + 5)) & 0x3F).astype(jnp.int32)
    touched = ((dmeta >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)
    dkey = dmeta & ((1 << DEPTH_KEY_BITS) - 1)

    kw = k_hi - k_lo
    k = lax.broadcasted_iota(jnp.int32, (nc, kw), 1) + k_lo
    ok = k < touched[:, None]
    rw = jnp.maximum(rw_, 1)[:, None]
    dy = k // rw
    dx = k - dy * rw
    tile_x = rmx[:, None] + dx
    tile_y = rmy[:, None] + dy
    tile = jnp.where(ok, tile_y * tx + tile_x, num_tiles).astype(jnp.uint32)
    ukey = ((tile << DEPTH_KEY_BITS)
            | jnp.broadcast_to(dkey[:, None], (nc, kw))).reshape(-1)
    ts = 16.0
    xr, yr = _unpack2f16(c_xy)
    xi = xr[:, None] - dx.astype(jnp.float32) * ts
    yi = yr[:, None] - dy.astype(jnp.float32) * ts
    p_xy_i = _pack2f16(xi.reshape(-1), yi.reshape(-1))

    def bcast(c):
        return jnp.broadcast_to(c[:, None], (nc, kw)).reshape(-1)

    return ukey, (p_xy_i, bcast(c_cab), bcast(c_cco), bcast(c_rgb))


def expand_and_sort_packed(pc: PackedCompact, num_tiles_x: int,
                           num_tiles_y: int, config: RasterConfig,
                           return_packed: bool = False):
    """Packed-instance sort (6 operands vs 12): returns (feats_sorted
    [NPAY+1 f32 columns in the blend kernel's order], tile_start, tile_stop,
    num_instances, num_large). Eval only (no gid/orig_id for gradients).
    With return_packed the post-sort unpack is skipped entirely and the
    first element is the 5 sorted u32 payload columns (p_xy tile-local,
    p_cab, p_cco, p_rg, p_b) for the in-kernel-unpacking blend."""
    assert config.tile == 16, "packed expansion assumes 16px tiles"
    nc, km = config.compact, config.kmax
    tx = num_tiles_x
    num_tiles = num_tiles_x * num_tiles_y
    assert (num_tiles + 1) << DEPTH_KEY_BITS < (1 << 32), \
        "tile id must fit above the 21-bit depth key"
    assert tx <= 63, "rect_w packs into 6 dmeta bits (image width <= 1008)"

    cols = (pc.p_xy, pc.p_cab, pc.p_cco, pc.p_rg, pc.p_b, pc.dmeta)
    touched = ((pc.dmeta >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)

    if config.ksmall and config.nmid:
        # three-tier expansion: one footprint-selection sort serves both
        # upper tiers (sel is largest-touched-first, so sel[:nlarge] is a
        # prefix of sel[:nmid])
        ks, km_mid, nm, nl = (config.ksmall, config.kmid, config.nmid,
                              config.nlarge)
        assert nl <= nm and ks < km_mid < km
        ukey_s, pays_s = _expand_grid_packed(cols, nc, 0, ks, tx, num_tiles)
        sel_key = jnp.where(touched <= ks, km + 1, km - touched)
        sel = lax.sort((sel_key,) + cols, num_keys=1, is_stable=True)
        cols_m = tuple(f[:nm] for f in sel[1:])
        cols_l = tuple(f[:nl] for f in sel[1:])
        ukey_m, pays_m = _expand_grid_packed(cols_m, nm, ks, km_mid, tx,
                                             num_tiles)
        ukey_l, pays_l = _expand_grid_packed(cols_l, nl, km_mid, km, tx,
                                             num_tiles)
        ukey = jnp.concatenate([ukey_s, ukey_m, ukey_l])
        pays = tuple(jnp.concatenate([a, b, c])
                     for a, b, c in zip(pays_s, pays_m, pays_l))
        touched_m = ((cols_m[5] >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)
        touched_l = ((cols_l[5] >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)
        num_instances = (
            jnp.sum(jnp.minimum(touched, ks))
            + jnp.sum(jnp.clip(touched_m - ks, 0, km_mid - ks))
            + jnp.sum(jnp.maximum(touched_l - km_mid, 0)))
        num_large = jnp.sum((touched > ks).astype(jnp.int32))
    elif config.ksmall:
        ks, nl = config.ksmall, config.nlarge
        ukey_s, pays_s = _expand_grid_packed(cols, nc, 0, ks, tx, num_tiles)
        # selection: the nlarge largest footprints win the k >= ksmall slots
        sel_key = jnp.where(touched <= ks, km + 1, km - touched)
        sel = lax.sort((sel_key,) + cols, num_keys=1, is_stable=True)
        cols_l = tuple(f[:nl] for f in sel[1:])
        ukey_l, pays_l = _expand_grid_packed(cols_l, nl, ks, km, tx,
                                             num_tiles)
        ukey = jnp.concatenate([ukey_s, ukey_l])
        pays = tuple(jnp.concatenate([a, b])
                     for a, b in zip(pays_s, pays_l))
        touched_l = ((cols_l[5] >> DEPTH_KEY_BITS) & 0x1F).astype(
            jnp.int32)
        num_instances = jnp.sum(jnp.minimum(touched, ks)) + jnp.sum(
            jnp.maximum(touched_l - ks, 0))
        num_large = jnp.sum((touched > ks).astype(jnp.int32))
    else:
        ukey, pays = _expand_grid_packed(cols, nc, 0, km, tx, num_tiles)
        num_instances = jnp.sum(touched)
        num_large = jnp.int32(0)

    return _finalize_eval_instances(ukey, pays, num_tiles, tx,
                                    num_instances, num_large, return_packed)


def _finalize_eval_instances(ukey, pays, num_tiles, tx, num_instances,
                             num_large, return_packed):
    """Shared tail of the packed EVAL binning: the (tile, depth) instance
    sort + tile ranges, optionally unpacking back to f32 feature columns."""
    out = lax.sort((ukey,) + pays, num_keys=1, is_stable=True)
    ukey_sorted = out[0]
    tile_sorted = (ukey_sorted >> DEPTH_KEY_BITS).astype(jnp.int32)

    if return_packed:
        tiles = jnp.arange(num_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(tile_sorted, tiles,
                                      side="left").astype(jnp.int32)
        tile_stop = jnp.searchsorted(tile_sorted, tiles,
                                     side="right").astype(jnp.int32)
        return (out[1:], tile_start, tile_stop, num_instances, num_large)

    # unpack to the blend kernel's f32 feature columns; absolute mean2d is
    # reconstructed from the instance's tile id
    xr, yr = _unpack2f16(out[1])
    tile_clamped = jnp.minimum(tile_sorted, num_tiles - 1)
    ty_i = tile_clamped // tx
    tx_i = tile_clamped - ty_i * tx
    ts = 16.0
    x = xr + tx_i.astype(jnp.float32) * ts
    y = yr + ty_i.astype(jnp.float32) * ts
    ca, cb = _unpack2f16(out[2])
    cc, op = _unpack2f16(out[3])
    r, g = _unpack2f16(out[4])
    b, _ = _unpack2f16(out[5])
    # depth column: the blend's expected-depth output is discarded on the
    # eval path, so it is zero here rather than a 7th sorted column
    depth = jnp.zeros_like(x)
    feats_sorted = (x, y, ca, cb, cc, op, r, g, b, depth)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(
        jnp.int32)
    tile_stop = jnp.searchsorted(tile_sorted, tiles, side="right").astype(
        jnp.int32)
    return feats_sorted, tile_start, tile_stop, num_instances, num_large


def bin_eval_direct(feats, aux, num_tiles_x: int, num_tiles_y: int,
                    config: RasterConfig, return_packed: bool = False):
    """Direct-selection packed EVAL binning (RasterConfig.sel_direct): ONE
    footprint-priority selection sort over the RAW [N] rows replaces BOTH
    the global opacity-priority compaction sort (N x 7 operands) and the
    compact-level footprint-selection sort — the selection prefix IS the
    compaction. Tier-0 = the leading `compact` rows (every gaussian that
    wins a slot gets ksmall instance slots), tiers 1/2 = the nmid/nlarge
    prefixes of the SAME sort. Selection key: footprint desc, then opacity
    desc (dead rows last), so under capacity pressure the
    smallest-then-faintest drop first.

    Output-identical to compact + expand whenever the alive count fits the
    compaction capacity (parity: tests/test_packed_binning.py); returns
    (feats_or_cols, tile_start, tile_stop, num_instances, num_valid).
    """
    assert config.tile == 16, "packed expansion assumes 16px tiles"
    assert config.ksmall, "sel_direct requires tiered expansion"
    nc, km, ks = config.compact, config.kmax, config.ksmall
    tx = num_tiles_x
    num_tiles = num_tiles_x * num_tiles_y
    assert (num_tiles + 1) << DEPTH_KEY_BITS < (1 << 32), \
        "tile id must fit above the 21-bit depth key"
    assert tx <= 63, "rect_w packs into 6 dmeta bits (image width <= 1008)"
    if config.pack8:
        assert num_tiles_y <= 31, "pack8 rmy packs into 5 bits (height <= 496)"
        assert return_packed, "pack8 decodes in-kernel only"

    pays, dmeta, alive_ok, opac_q, num_valid = _pack_eval_cols(
        feats, aux, config)
    touched_raw = (dmeta >> DEPTH_KEY_BITS) & 0x1F
    # footprint-primary (km - touched, 5 bits), opacity-secondary (16 bits);
    # dead rows above everything
    sel_key = jnp.where(
        alive_ok,
        ((km - touched_raw).astype(jnp.uint32) << 16) | opac_q,
        jnp.uint32(0xFFFFFFFF))
    cols = (sel_key,) + pays + (dmeta,)
    n = sel_key.shape[0]
    if config.kanchor and n % config.kgroup == 0:
        ka, kg = config.kanchor, config.kgroup
        grouped = [[c.reshape(-1, kg)[:, j] for c in cols]
                   for j in range(kg)]
        for pass_ in range(kg):
            lo = pass_ % 2
            for j in range(lo, kg - 1, 2):
                a, b = grouped[j], grouped[j + 1]
                swap = a[0] > b[0]
                grouped[j] = [jnp.where(swap, y, x) for x, y in zip(a, b)]
                grouped[j + 1] = [jnp.where(swap, x, y)
                                  for x, y in zip(a, b)]
        cols = tuple(
            jnp.stack([grouped[j][ci] for j in range(ka)],
                      axis=1).reshape(-1)
            for ci in range(len(cols)))
        n = n // kg * ka
    if n < nc:
        cols = tuple(
            jnp.pad(c, (0, nc - n),
                    constant_values=0xFFFFFFFF if i == 0 else 0)
            for i, c in enumerate(cols))
        n = nc

    sel = lax.sort(cols, num_keys=1, is_stable=True)
    cols_sel = sel[1:]
    dm = len(cols_sel) - 1  # dmeta column index (4 payloads under pack8)
    expand = _expand_grid_packed8 if config.pack8 else _expand_grid_packed

    def _touched(cs):
        return ((cs[dm] >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)

    cols_0 = tuple(f[:nc] for f in cols_sel)
    touched_0 = _touched(cols_0)
    ukey_s, pays_s = expand(cols_0, nc, 0, ks, tx, num_tiles)
    if config.nmid:
        km_mid, nm, nl = config.kmid, config.nmid, config.nlarge
        cols_m = tuple(f[:nm] for f in cols_sel)
        cols_l = tuple(f[:nl] for f in cols_sel)
        ukey_m, pays_m = expand(cols_m, nm, ks, km_mid, tx, num_tiles)
        ukey_l, pays_l = expand(cols_l, nl, km_mid, km, tx, num_tiles)
        ukey = jnp.concatenate([ukey_s, ukey_m, ukey_l])
        pays_i = tuple(jnp.concatenate([a, b, c])
                       for a, b, c in zip(pays_s, pays_m, pays_l))
        touched_m = _touched(cols_m)
        touched_l = _touched(cols_l)
        num_instances = (
            jnp.sum(jnp.minimum(touched_0, ks))
            + jnp.sum(jnp.clip(touched_m - ks, 0, km_mid - ks))
            + jnp.sum(jnp.maximum(touched_l - km_mid, 0)))
    else:
        nl = config.nlarge
        cols_l = tuple(f[:nl] for f in cols_sel)
        ukey_l, pays_l = expand(cols_l, nl, ks, km, tx, num_tiles)
        ukey = jnp.concatenate([ukey_s, ukey_l])
        pays_i = tuple(jnp.concatenate([a, b])
                       for a, b in zip(pays_s, pays_l))
        touched_l = _touched(cols_l)
        num_instances = jnp.sum(jnp.minimum(touched_0, ks)) + jnp.sum(
            jnp.maximum(touched_l - ks, 0))

    res = _finalize_eval_instances(ukey, pays_i, num_tiles, tx,
                                   num_instances, num_valid, return_packed)
    return res


def expand_and_sort_packed_train(pc: PackedCompact, num_tiles_x: int,
                                 num_tiles_y: int,
                                 config: RasterConfig) -> BinnedInstances:
    """Packed instance sort for TRAINING (RasterConfig.packed_train): the
    eval packing plus the gradient routing the backward needs — the compact
    id rides in the upper 16 bits of the b-channel payload (so
    compact <= 2^16) and the per-instance depth column is reconstructed
    from the 21-bit depth key (the expected-depth output tolerates the
    ~0.02% relative truncation). Same 6 sort operands as the eval path."""
    assert not config.nmid, \
        "3-tier (nmid) is packed-eval only; training expansion is 2-tier"
    assert config.tile == 16, "packed expansion assumes 16px tiles"
    nc, km = config.compact, config.kmax
    assert nc <= (1 << 16), "packed_train gid packs into 16 payload bits"
    tx = num_tiles_x
    num_tiles = num_tiles_x * num_tiles_y
    assert (num_tiles + 1) << DEPTH_KEY_BITS < (1 << 32), \
        "tile id must fit above the 21-bit depth key"
    assert tx <= 63, "rect_w packs into 6 dmeta bits (image width <= 1008)"

    gid0 = jnp.arange(nc, dtype=jnp.uint32)
    p_bg = (pc.p_b & jnp.uint32(0xFFFF)) | (gid0 << 16)
    cols = (pc.p_xy, pc.p_cab, pc.p_cco, pc.p_rg, pc.p_b, pc.dmeta)
    touched = ((pc.dmeta >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)

    if config.ksmall:
        ks, nl = config.ksmall, config.nlarge
        ukey_s, pays_s = _expand_grid_packed(cols, nc, 0, ks, tx, num_tiles,
                                             pb_override=p_bg)
        sel_key = jnp.where(touched <= ks, km + 1, km - touched)
        sel = lax.sort((sel_key,) + cols + (p_bg,), num_keys=1,
                       is_stable=True)
        cols_l = tuple(f[:nl] for f in sel[1:7])
        pbg_l = sel[7][:nl]
        ukey_l, pays_l = _expand_grid_packed(cols_l, nl, ks, km, tx,
                                             num_tiles, pb_override=pbg_l)
        ukey = jnp.concatenate([ukey_s, ukey_l])
        pays = tuple(jnp.concatenate([a, b]) for a, b in zip(pays_s, pays_l))
        touched_l = ((cols_l[5] >> DEPTH_KEY_BITS) & 0x1F).astype(jnp.int32)
        num_instances = jnp.sum(jnp.minimum(touched, ks)) + jnp.sum(
            jnp.maximum(touched_l - ks, 0))
        num_large = jnp.sum((touched > ks).astype(jnp.int32))
    else:
        ukey, pays = _expand_grid_packed(cols, nc, 0, km, tx, num_tiles,
                                         pb_override=p_bg)
        num_instances = jnp.sum(touched)
        num_large = jnp.int32(0)

    out = lax.sort((ukey,) + pays, num_keys=1, is_stable=True)
    ukey_sorted = out[0]
    tile_sorted = (ukey_sorted >> DEPTH_KEY_BITS).astype(jnp.int32)

    xr, yr = _unpack2f16(out[1])
    tile_clamped = jnp.minimum(tile_sorted, num_tiles - 1)
    ty_i = tile_clamped // tx
    tx_i = tile_clamped - ty_i * tx
    ts = 16.0
    x = xr + tx_i.astype(jnp.float32) * ts
    y = yr + ty_i.astype(jnp.float32) * ts
    ca, cb = _unpack2f16(out[2])
    cc, op = _unpack2f16(out[3])
    b, _ = _unpack2f16(out[5] & jnp.uint32(0xFFFF))
    r, g = _unpack2f16(out[4])
    gid_sorted = (out[5] >> 16).astype(jnp.int32)
    # depth from the truncated key: top 21 bits of the f32 pattern
    depth = lax.bitcast_convert_type(
        (ukey_sorted & ((1 << DEPTH_KEY_BITS) - 1)) << (32 - DEPTH_KEY_BITS),
        jnp.float32)
    feats_sorted = (x, y, ca, cb, cc, op, r, g, b, depth)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(
        jnp.int32)
    tile_stop = jnp.searchsorted(tile_sorted, tiles, side="right").astype(
        jnp.int32)
    return BinnedInstances(
        feats_sorted=feats_sorted,
        gid_sorted=gid_sorted,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_instances=num_instances,
        num_large=num_large,
    )
