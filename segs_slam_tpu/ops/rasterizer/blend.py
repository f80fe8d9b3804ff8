"""Pallas TPU tile-blend kernel (forward + backward) with custom VJP — v3.

Replaces the reference's per-pixel CUDA blend loops
(cuda_rasterizer/forward.cu:339-452 renderCUDA, backward.cu:399-557
renderCUDA backward) with a TPU-native design:

  * one grid step per screen tile; INSTANCES live on the VPU lane axis,
    pixels on the sublane axis, so the alpha test over a chunk of instances
    is a single [PIXELS, CHUNK] vector op;
  * the inherently sequential front-to-back compositing becomes a cumulative
    product along the instance axis: with masked alphas the CUDA control flow
    (skip / early-`done`) is EXACTLY the closed form
        accept_i  = (T_in * prod_{j<=i}(1-a_j) >= T_MIN)
        color     = sum_i accept_i * a_i * T_before_i * c_i      (an MXU matmul)
        T_out     = min over accepted test_T (== masked product)
  * instance features arrive already sorted by (tile, depth) as sort payloads
    (binning.py); the kernel DMAs [16, CHUNK] slices whose lane offsets are
    chunk-aligned by construction: each tile's loop starts at
    floor(start/chunk)*chunk and masks the head/tail belonging to the
    neighboring tiles;
  * the backward pass re-traverses chunks back-to-front (like the CUDA
    backward) maintaining per-pixel suffix state, and ACCUMULATES
    per-instance gradients into an aliased zero-initialized buffer (boundary
    chunks are shared between adjacent tiles; the sequential tile grid makes
    read-add-write race-free); the per-gaussian reduction is one segment-sum
    outside the kernel — no atomics anywhere.

Feature packing (row index in the [16, NK] array):
  0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c
  5: opacity   6: r  7: g  8: b        9-15: padding
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segs_slam_tpu.ops.rasterizer.binning import (
    NPAY,
    compact_gaussians,
    compact_gaussians_packed,
    expand_and_sort,
    expand_and_sort_packed_train,
)

NFEAT = 16
F_X, F_Y, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_D = range(10)


def _pick_sup(tx):
    """Tiles per grid step: largest of 8/4/2 dividing the tile-grid width,
    so each step's subtiles stay horizontally adjacent within one tile row
    (contiguous instance ranges, shared oy)."""
    return next((s for s in (8, 4, 2) if tx % s == 0), 1)


def _tri_incl(c):
    """[C, C] lower-triangular-ones (k <= j): inclusive prefix along lanes
    when used as  out[p, j] = sum_k x[p, k] * tri[k, j]."""
    rows = lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cols = lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (rows <= cols).astype(jnp.float32)


def _tri_suffix(c):
    """[C, C] (k >= j): inclusive suffix along lanes."""
    rows = lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cols = lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (rows >= cols).astype(jnp.float32)


def _matmul_scan(x, tri):
    """Prefix/suffix SUM along axis 1 as one MXU matmul — cross-lane
    Hillis-Steele rolls are expensive on the VPU; a [P,C]x[C,C] triangular
    matmul is nearly free on the MXU."""
    return lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _prefix_prod_lane(x, tri_incl):
    """Inclusive prefix product along lanes via log-domain matmul scan.
    x must be in (0, 1] (it is: 1 - alpha with alpha <= 0.99)."""
    return jnp.exp(_matmul_scan(jnp.log(x), tri_incl))


def _suffix_prod_lane(x, tri_suf):
    return jnp.exp(_matmul_scan(jnp.log(x), tri_suf))


def _suffix_sum_lane(x, tri_suf):
    return _matmul_scan(x, tri_suf)


def _pixel_coords(t, tx, tile, npix):
    """Pixel centers of tile t as ([P, 1], [P, 1]) f32 (pixels on sublanes),
    plus the tile origin. The kernel works in TILE-LOCAL coordinates: the
    MXU quadratic-form expansion of the EWA exponent cancels catastrophically
    in f32 with absolute pixel monomials (x^2 ~ 4e5), but is well-conditioned
    with local ones (<= tile + radius)."""
    tile_y = t // tx
    tile_x = t - tile_y * tx
    ox = (tile_x * tile).astype(jnp.float32)
    oy = (tile_y * tile).astype(jnp.float32)
    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (p % tile).astype(jnp.float32)
    py = (p // tile).astype(jnp.float32)
    return px, py, ox, oy


def _pixel_basis(px, py):
    """Quadratic pixel-monomial basis [P, 6]: (1, x, y, x^2, xy, y^2).

    The EWA exponent is bilinear in pixel monomials and per-gaussian
    coefficients, so the whole [P, C] `power` computation becomes ONE MXU
    matmul instead of ~10 VPU passes."""
    ones = jnp.ones_like(px)
    return jnp.concatenate(
        [ones, px, py, px * px, px * py, py * py], axis=1
    )  # [P, 6]


def _f16_bits_to_f32(h):
    """Exact IEEE f16 -> f32 from a u32 vector holding the f16 bit pattern
    in its low 16 bits, as pure integer ops + one same-width bitcast (Mosaic
    lowers u32<->f32 bitcasts; u16<->f16 vector bitcasts are avoided).
    Handles signed normals and subnormals; inf/nan never occur (the packer
    quantized finite f32s)."""
    s = (h & 0x8000) << 16
    e = (h >> 10) & 0x1F
    m = h & 0x3FF
    normal_bits = (s | ((e + 112) << 23) | (m << 13)).astype(jnp.uint32)
    normal = lax.bitcast_convert_type(normal_bits, jnp.float32)
    sign = jnp.where(s > 0, -1.0, 1.0)
    # Mosaic has no u32->f32 cast; m <= 0x3FF so going through i32 is exact
    sub = m.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        5.9604645e-8) * sign
    return jnp.where(e > 0, normal, sub)


def _f16lo(u):
    return _f16_bits_to_f32(u & 0xFFFF)


def _f16hi(u):
    return _f16_bits_to_f32(u >> 16)


def _chunk_alpha_mxu(chunk, basis, ox, oy, lo, hi, base, cfg):
    """Alpha for a [P, C] block via the MXU quadratic form (forward path).

    power[p,i] = -0.5(a dx^2 + c dy^2) - b dx dy expanded in pixel monomials:
      const: -0.5(a x_i^2 + c y_i^2) - b x_i y_i
      px:     a x_i + b y_i          py:     c y_i + b x_i
      px^2:  -a/2    px py: -b       py^2:  -c/2
    """
    c = chunk.shape[1]
    x = chunk[F_X : F_X + 1, :] - ox  # tile-local mean coords
    y = chunk[F_Y : F_Y + 1, :] - oy
    ca = chunk[F_CA : F_CA + 1, :]
    cb = chunk[F_CB : F_CB + 1, :]
    cc = chunk[F_CC : F_CC + 1, :]
    op = chunk[F_OP : F_OP + 1, :]

    coef = jnp.concatenate(
        [
            -0.5 * (ca * x * x + cc * y * y) - cb * x * y,
            ca * x + cb * y,
            cc * y + cb * x,
            -0.5 * ca,
            -cb,
            -0.5 * cc,
        ],
        axis=0,
    )  # [6, C]
    power = lax.dot_general(
        basis, coef, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, C]
    opg = op * jnp.exp(power)  # unclamped op*G (the CUDA backward's basis)
    alpha = jnp.minimum(cfg.alpha_clamp, opg)

    idx = lax.broadcasted_iota(jnp.int32, (1, c), 1) + base
    inside = (idx >= lo) & (idx < hi)
    ok = inside & (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha = jnp.where(ok, alpha, 0.0)
    opg = jnp.where(ok, opg, 0.0)
    return alpha, opg


def _chunk_alpha_mxu_packed(chunk, basis, lo, hi, base, cfg):
    """_chunk_alpha_mxu for a PACKED [8, C] u32 chunk (binning.py packed
    column layout, rows: p_xy, p_cab, p_cco, p_rg, p_b, 3x pad — or, with
    cfg.pack8, rows: p_xy, p_cab, cc|op11|rmy, r8g8b8|rmx, 4x pad). mean2d
    is already instance-tile-local (expansion re-based it), so no ox/oy
    shift. Returns (alpha, colors [3, C])."""
    c = chunk.shape[1]
    x = _f16lo(chunk[0:1, :])
    y = _f16hi(chunk[0:1, :])
    ca = _f16lo(chunk[1:2, :])
    cb = _f16hi(chunk[1:2, :])
    cc = _f16lo(chunk[2:3, :])
    if cfg.pack8:
        # 11-bit fixed-point opacity + byte colors (values <= 2047/255, so
        # the i32 intermediate cast is exact — Mosaic has no u32->f32)
        op = ((chunk[2:3, :] >> 16) & 0x7FF).astype(jnp.int32).astype(
            jnp.float32) * jnp.float32(1.0 / 2047.0)
        inv255 = jnp.float32(1.0 / 255.0)
        r = (chunk[3:4, :] & 0xFF).astype(jnp.int32).astype(
            jnp.float32) * inv255
        g = ((chunk[3:4, :] >> 8) & 0xFF).astype(jnp.int32).astype(
            jnp.float32) * inv255
        b = ((chunk[3:4, :] >> 16) & 0xFF).astype(jnp.int32).astype(
            jnp.float32) * inv255
    else:
        op = _f16hi(chunk[2:3, :])
        r = _f16lo(chunk[3:4, :])
        g = _f16hi(chunk[3:4, :])
        b = _f16lo(chunk[4:5, :] & 0xFFFF)

    coef = jnp.concatenate(
        [
            -0.5 * (ca * x * x + cc * y * y) - cb * x * y,
            ca * x + cb * y,
            cc * y + cb * x,
            -0.5 * ca,
            -cb,
            -0.5 * cc,
        ],
        axis=0,
    )  # [6, C]
    power = lax.dot_general(
        basis, coef, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, C]
    alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(power))

    idx = lax.broadcasted_iota(jnp.int32, (1, c), 1) + base
    inside = (idx >= lo) & (idx < hi)
    ok = inside & (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha = jnp.where(ok, alpha, 0.0)
    colors = jnp.concatenate([r, g, b], axis=0)  # [3, C]
    return alpha, colors


def _fwd_kernel_eval_packed(
    # scalar prefetch
    start_ref,
    stop_ref,
    # inputs
    feats_hbm,  # [8, NK + chunk] u32 in HBM, (tile, depth)-sorted, packed
    bg_ref,  # [3, 1] VMEM
    # outputs
    color_ref,  # [SUP, 3, P]
    # scratch
    chunk_vmem,  # [2, 8, C] u32
    dma_sem,
    *,
    cfg,
    tx,
    npix,
    sup,
):
    """_fwd_kernel_eval over PACKED u32 feature columns: the sorted payloads
    are DMA'd as-is (8 u32 rows vs 16 f32 rows) and the f16 pairs are
    decoded on the VPU per chunk — eliminating the post-sort unpack +
    [NFEAT, NK] f32 materialization entirely (the eval path's third-largest
    cost after the two sorts)."""
    i = pl.program_id(0)
    t0 = i * sup
    ch = cfg.chunk
    tri_i = _tri_incl(ch)
    bg = bg_ref[:, :]  # [3, 1]

    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px0 = (p % cfg.tile).astype(jnp.float32)
    py = (p // cfg.tile).astype(jnp.float32)
    basis = _pixel_basis(px0, py)

    for s in range(sup):
        t = t0 + s
        start = start_ref[t]
        stop = stop_ref[t]
        astart = (start // ch) * ch
        lo = start - astart
        hi = stop - astart

        def dma(ci, astart=astart):
            off = pl.multiple_of(astart + ci * ch, ch)
            return pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(off, ch)], chunk_vmem.at[ci % 2],
                dma_sem.at[ci % 2]
            )

        @pl.when(hi > 0)
        def _():
            dma(0).start()

        def body(ci, carry, dma=dma, lo=lo, hi=hi):
            T, C, done = carry
            base = ci * ch

            @pl.when((ci + 1) * ch < hi)
            def _():
                dma(ci + 1).start()

            dma(ci).wait()
            chunk = chunk_vmem[ci % 2, :, :]

            alpha, colors = _chunk_alpha_mxu_packed(chunk, basis, lo, hi,
                                                    base, cfg)
            om = 1.0 - alpha
            cum = _prefix_prod_lane(om, tri_i)
            test_t = T * cum
            accept = (test_t >= cfg.transmittance_min) & (done < 0.5)
            t_before = T * cum / om
            w = jnp.where(accept, alpha * t_before, 0.0)

            C = C + lax.dot_general(
                colors, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            T = jnp.min(jnp.where(accept, test_t, T), axis=1, keepdims=True)
            done = jnp.maximum(
                done,
                jnp.max(
                    jnp.where((alpha > 0.0) & jnp.logical_not(accept), 1.0,
                              0.0),
                    axis=1,
                    keepdims=True,
                ),
            )
            return T, C, done

        def cond(state, hi=hi):
            ci, (_, _, done) = state
            return (ci * ch < hi) & (jnp.min(done) < 0.5)

        def step(state, body=body):
            ci, carry = state
            return ci + 1, body(ci, carry)

        T0 = jnp.ones((npix, 1), jnp.float32)
        C0 = jnp.zeros((3, npix), jnp.float32)
        done0 = jnp.zeros((npix, 1), jnp.float32)
        ci_end, (T, C, _) = lax.while_loop(cond, step, (0, (T0, C0, done0)))

        @pl.when(ci_end * ch < hi)
        def _():
            dma(ci_end).wait()

        color_ref[s, :, :] = C + bg * T.reshape(1, npix)


def _fwd_kernel(
    # scalar prefetch
    start_ref,
    stop_ref,
    # inputs
    feats_hbm,  # [NFEAT, NK + chunk] in HBM, (tile, depth)-sorted
    bg_ref,  # [3, 1] VMEM
    # outputs
    color_ref,  # [SUP, 3, P]
    final_t_ref,  # [SUP, 1, P]
    depth_ref,  # [SUP, 1, P] expected depth (sum w_i * depth_i)
    ncontrib_ref,  # [SUP, 1, P]
    # scratch
    chunk_vmem,  # [2, NFEAT, C]
    dma_sem,
    *,
    cfg,
    tx,
    npix,
    sup,
):
    """Training forward: SUP horizontally-adjacent tiles per grid step,
    processed sequentially (same rationale as _fwd_kernel_eval: the
    single-tile kernel is ~75% per-grid-step overhead; SUP tiles per step
    divide that floor by SUP while keeping the MXU prefix-product at
    [npix, C] per tile)."""
    i = pl.program_id(0)
    t0 = i * sup
    ch = cfg.chunk
    tri_i = _tri_incl(ch)
    bg = bg_ref[:, :]  # [3, 1]

    # sup divides tx, so all SUP subtiles share one tile row (same oy).
    tile_y = t0 // tx
    oy = (tile_y * cfg.tile).astype(jnp.float32)
    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px0 = (p % cfg.tile).astype(jnp.float32)
    py = (p // cfg.tile).astype(jnp.float32)
    basis = _pixel_basis(px0, py)  # tile-local; ox shifts move the origin

    for s in range(sup):
        t = t0 + s
        start = start_ref[t]
        stop = stop_ref[t]
        astart = (start // ch) * ch
        lo = start - astart
        hi = stop - astart
        ox = ((t - tile_y * tx) * cfg.tile).astype(jnp.float32)

        def dma(ci, astart=astart):
            off = pl.multiple_of(astart + ci * ch, ch)
            return pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(off, ch)], chunk_vmem.at[ci % 2],
                dma_sem.at[ci % 2]
            )

        # Double-buffered: chunk ci's DMA is started by the previous
        # iteration (or the warm-up); each iteration prefetches ci+1 before
        # computing ci.
        @pl.when(hi > 0)
        def _():
            dma(0).start()

        def body(ci, carry, dma=dma, lo=lo, hi=hi, ox=ox):
            T, C, D, nc, done = carry
            base = ci * ch

            @pl.when((ci + 1) * ch < hi)
            def _():
                dma(ci + 1).start()

            dma(ci).wait()
            chunk = chunk_vmem[ci % 2, :, :]

            alpha, _ = _chunk_alpha_mxu(chunk, basis, ox, oy, lo, hi, base,
                                        cfg)
            om = 1.0 - alpha
            cum = _prefix_prod_lane(om, tri_i)  # [P, C] inclusive
            test_t = T * cum
            # done rides the carry as f32 0/1 (Mosaic cannot yield i1
            # vectors from a while loop)
            accept = (test_t >= cfg.transmittance_min) & (done < 0.5)
            t_before = T * cum / om  # exclusive prefix (om >= 1 - clamp)
            w = jnp.where(accept, alpha * t_before, 0.0)  # [P, C]

            colors = chunk[F_R : F_B + 1, :]  # [3, C]
            contrib = lax.dot_general(
                colors, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [3, P]
            C = C + contrib
            D = D + jnp.sum(chunk[F_D : F_D + 1, :] * w, axis=1,
                            keepdims=True)

            # T_out = smallest accepted test_t (accept is a prefix/pixel).
            T = jnp.min(jnp.where(accept, test_t, T), axis=1, keepdims=True)

            # CUDA latches termination at the FIRST threshold crossing
            # (forward.cu:425-429: done = true, never resumes). Without the
            # latch, the rejected high-alpha instance's transmittance is
            # never folded into T, the next chunk's cum restarts at 1, and
            # acceptance resumes — producing (final_T, n_contrib) pairs
            # whose accepted-set suffix products underflow f32 in the
            # backward (t_before = T/sp blows up to inf). The latch restores
            # the reference's prefix semantics exactly.
            done = jnp.maximum(
                done,
                jnp.max(
                    jnp.where((alpha > 0.0) & jnp.logical_not(accept), 1.0,
                              0.0),
                    axis=1,
                    keepdims=True,
                ),
            )

            accepted = accept & (alpha > 0.0)
            # local contributor index within [start, stop)
            idx1 = (lax.broadcasted_iota(jnp.int32, accepted.shape, 1)
                    + base - lo + 1)
            nc = jnp.maximum(
                nc, jnp.max(jnp.where(accepted, idx1, 0), axis=1,
                            keepdims=True)
            )
            return T, C, D, nc, done

        def cond(state, hi=hi):
            ci, (_, _, _, _, done) = state
            return (ci * ch < hi) & (jnp.min(done) < 0.5)

        def step(state, body=body):
            ci, carry = state
            return ci + 1, body(ci, carry)

        T0 = jnp.ones((npix, 1), jnp.float32)
        C0 = jnp.zeros((3, npix), jnp.float32)
        D0 = jnp.zeros((npix, 1), jnp.float32)
        nc0 = jnp.zeros((npix, 1), jnp.int32)
        done0 = jnp.zeros((npix, 1), jnp.float32)
        ci_end, (T, C, D, nc, _) = lax.while_loop(
            cond, step, (0, (T0, C0, D0, nc0, done0))
        )

        # Early exit leaves the prefetched DMA for ci_end in flight; consume
        # it so the next subtile/grid step's semaphores start clean.
        @pl.when(ci_end * ch < hi)
        def _(dma=dma, ci_end=ci_end):
            dma(ci_end).wait()

        color_ref[s, :, :] = C + bg * T.reshape(1, npix)
        final_t_ref[s, 0, :] = T.reshape(npix)
        depth_ref[s, 0, :] = D.reshape(npix)
        ncontrib_ref[s, 0, :] = nc.reshape(npix)


def _bwd_kernel(
    # scalar prefetch
    start_ref,
    stop_ref,
    # inputs
    dzero_hbm,  # [NFEAT, NK + chunk] zeros, aliased to the output
    feats_hbm,
    bg_ref,
    dldc_ref,  # [1, 3, P]
    dldd_ref,  # [1, 1, P] cotangent of the expected-depth output
    dldt_ref,  # [1, 1, P] cotangent of the final-transmittance output
    final_t_ref,  # [1, 1, P]
    ncontrib_ref,  # [1, 1, P]
    # outputs
    dfeats_hbm,  # [NFEAT, NK + chunk] (accumulated across tiles)
    # scratch
    chunk_vmem,
    grad_vmem,
    in_sem,
    acc_sem,
    out_sem,
    *,
    cfg,
    tx,
    npix,
    sup,
):
    """Training backward: SUP subtiles per grid step (see _fwd_kernel).
    Boundary chunks shared between adjacent subtiles stay race-free: the
    per-chunk read-add-write below is fully serialized (acc.wait before the
    add, out.wait before the next chunk), and subtiles run sequentially."""
    i = pl.program_id(0)
    t0 = i * sup
    ch = cfg.chunk
    tri_s = _tri_suffix(ch)

    tile_y = t0 // tx
    oy = (tile_y * cfg.tile).astype(jnp.float32)
    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px0 = (p % cfg.tile).astype(jnp.float32)
    py = (p // cfg.tile).astype(jnp.float32)
    basis = _pixel_basis(px0, py)

    bg = bg_ref[:, :]  # [3, 1]

    for s in range(sup):
        t = t0 + s
        start = start_ref[t]
        stop = stop_ref[t]
        astart = (start // ch) * ch
        lo = start - astart
        hi = stop - astart
        ox = ((t - tile_y * tx) * cfg.tile).astype(jnp.float32)

        dldc = dldc_ref[s, :, :]  # [3, P]
        # the expected-depth output is a 4th "color" channel with zero
        # background: its cotangent joins the per-instance pull g and the
        # per-instance weight gradient rows below
        dld4 = jnp.concatenate([dldc, dldd_ref[s, :, :]], axis=0)  # [4, P]
        dldt = dldt_ref[s, 0, :].reshape(npix, 1)
        final_t = final_t_ref[s, 0, :].reshape(npix, 1)
        ncontrib = ncontrib_ref[s, 0, :].reshape(npix, 1)
        bg_dot = jnp.sum(bg * dldc, axis=0).reshape(npix, 1)  # [P, 1]

        # Chunks that ever contributed (skip the dead tail entirely).
        last = jnp.max(ncontrib)
        bound = jnp.minimum(lo + last, hi)
        nchunks = (bound + ch - 1) // ch

        def dma_in(ci, astart=astart):
            off = pl.multiple_of(astart + ci * ch, ch)
            return pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(off, ch)], chunk_vmem.at[ci % 2],
                in_sem.at[ci % 2],
            )

        @pl.when(nchunks > 0)
        def _():
            dma_in(nchunks - 1).start()

        def body(step_i, carry, dma_in=dma_in, nchunks=nchunks,
                 astart=astart, lo=lo, hi=hi, ox=ox, dldc=dldc,
                 dld4=dld4, ncontrib=ncontrib):
            T_end, S = carry  # both [P, 1]
            ci = nchunks - 1 - step_i
            base = ci * ch
            off = pl.multiple_of(astart + base, ch)

            @pl.when(ci > 0)
            def _():
                dma_in(ci - 1).start()

            dma_in(ci).wait()
            chunk = chunk_vmem[ci % 2, :, :]

            alpha, opg = _chunk_alpha_mxu(chunk, basis, ox, oy, lo, hi, base, cfg)
            idx = lax.broadcasted_iota(jnp.int32, alpha.shape, 1) + base - lo
            m = idx < ncontrib  # accepted in forward (alpha already 0 if !ok)
            alpha = jnp.where(m, alpha, 0.0)
            opg = jnp.where(m, opg, 0.0)
            om = 1.0 - alpha

            sp = _suffix_prod_lane(om, tri_s)  # prod_{k>=i}(1-a_k) [P, C]
            t_before = T_end / sp

            colors4 = chunk[F_R : F_D + 1, :]  # [4, C]: r, g, b, depth
            g = lax.dot_general(
                dld4, colors4, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P, C] = dL/dC . c_i + dL/dD . d_i
            w = alpha * t_before
            wg = w * g
            suf = _suffix_sum_lane(wg, tri_s)
            s_i = (suf - wg) + S  # sum_{k>i} w_k g_k  (+ later chunks + bg term)

            # alpha > 0 implies the full forward accept; dalpha is zero wherever
            # alpha was masked (G*dalpha and op*dalpha chain through zeros).
            dalpha = jnp.where(alpha > 0.0, t_before * g - s_i / om, 0.0)

            op = chunk[F_OP : F_OP + 1, :]
            ca = chunk[F_CA : F_CA + 1, :]
            cb = chunk[F_CB : F_CB + 1, :]
            cc = chunk[F_CC : F_CC + 1, :]
            x = chunk[F_X : F_X + 1, :] - ox
            y = chunk[F_Y : F_Y + 1, :] - oy
            # dpower = op * G * dalpha with the UNCLAMPED op*G (the CUDA backward
            # ignores the 0.99 clamp subgradient, backward.cu:399-557)
            dpower = opg * dalpha
            # One MXU matmul folds every per-instance pixel reduction:
            # dcoef[k, i] = sum_p basis[p, k] * dpower[p, i]
            dcoef = lax.dot_general(
                basis, dpower, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [6, C]
            d0 = dcoef[0:1, :]
            d1 = dcoef[1:2, :]
            d2 = dcoef[2:3, :]
            d3 = dcoef[3:4, :]
            d4 = dcoef[4:5, :]
            d5 = dcoef[5:6, :]
            # chain rule through the coef rows (see _chunk_alpha_mxu)
            da = -0.5 * x * x * d0 + x * d1 - 0.5 * d3
            db = -x * y * d0 + y * d1 + x * d2 - d4
            dc = -0.5 * y * y * d0 + y * d2 - 0.5 * d5
            dmx = (-ca * x - cb * y) * d0 + ca * d1 + cb * d2
            dmy = (-cc * y - cb * x) * d0 + cb * d1 + cc * d2
            # dop = sum_p G dalpha = (sum_p dpower) / op
            dop = jnp.where(jnp.abs(op) > 1e-20, d0 / op, 0.0)
            dcol4 = lax.dot_general(
                dld4, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [4, C]: dL/d(r,g,b) and dL/d(depth_i) = sum_p dD * w

            zeros = jnp.zeros((NFEAT - 10, alpha.shape[1]), jnp.float32)
            grad = jnp.concatenate(
                [dmx, dmy, da, db, dc, dop, dcol4, zeros], axis=0
            )  # [NFEAT, C]

            # Accumulate: boundary chunks are shared with neighboring tiles.
            acc = pltpu.make_async_copy(
                dfeats_hbm.at[:, pl.ds(off, ch)], grad_vmem, acc_sem
            )
            acc.start()
            acc.wait()
            grad_vmem[:, :] = grad_vmem[:, :] + grad
            out = pltpu.make_async_copy(
                grad_vmem, dfeats_hbm.at[:, pl.ds(off, ch)], out_sem
            )
            out.start()
            out.wait()

            T_end = jnp.minimum(T_end / sp[:, 0:1], 1.0)  # T at chunk start
            S = S + jnp.sum(wg, axis=1, keepdims=True)
            return T_end, S

        # Background's pull on earlier alphas, PLUS the final-transmittance
        # cotangent: d(T_final)/da_i = -T_final/(1-a_i) has exactly the same
        # shape as the bg term d(T_final*bg)/da_i, so dldt simply joins it.
        S0 = final_t * (bg_dot + dldt)
        lax.fori_loop(0, nchunks, body, (final_t, S0))


def _pallas_call(kernel, static, out_shapes, out_specs, in_specs, scratch,
                 io_aliases=None, grid=None):
    cfg, tx, ty, npix, interpret = static
    nt = tx * ty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,) if grid is None else grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kwargs = {}
    if io_aliases:
        kwargs["input_output_aliases"] = io_aliases
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )


def _fwd_kernel_eval(
    # scalar prefetch
    start_ref,
    stop_ref,
    # inputs
    feats_hbm,  # [NFEAT, NK + chunk] in HBM, (tile, depth)-sorted
    bg_ref,  # [3, 1] VMEM
    # outputs
    color_ref,  # [SUP, 3, P]
    # scratch
    chunk_vmem,  # [2, NFEAT, C]
    dma_sem,
    *,
    cfg,
    tx,
    npix,
    sup,
):
    """Multi-tile color-only forward: SUP horizontally-adjacent tiles per
    grid step, processed SEQUENTIALLY inside the step. The single-tile
    kernel's cost is ~75% per-grid-step overhead (~4.9 us/step floor
    measured with empty occupancy), so batching SUP tiles per step divides
    that floor by SUP. Processing them sequentially (not stacked on the
    sublane axis) keeps the MXU prefix-product at [npix, C] per tile — a
    sublane-stacked variant wastes (SUP-1)/SUP of the matmul on pixels the
    instance can never touch and measured no faster than single-tile.
    Eval-only: no depth/final_T/n_contrib outputs (fewer per-step
    write-backs); the training path keeps _fwd_kernel."""
    i = pl.program_id(0)
    t0 = i * sup
    ch = cfg.chunk
    tri_i = _tri_incl(ch)
    bg = bg_ref[:, :]  # [3, 1]

    tile_y = t0 // tx
    oy = (tile_y * cfg.tile).astype(jnp.float32)
    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px0 = (p % cfg.tile).astype(jnp.float32)
    py = (p // cfg.tile).astype(jnp.float32)
    basis = _pixel_basis(px0, py)  # tile-local; ox shifts move the origin

    for s in range(sup):
        t = t0 + s
        start = start_ref[t]
        stop = stop_ref[t]
        astart = (start // ch) * ch
        lo = start - astart
        hi = stop - astart
        ox = ((t - tile_y * tx) * cfg.tile).astype(jnp.float32)

        def dma(ci, astart=astart):
            off = pl.multiple_of(astart + ci * ch, ch)
            return pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(off, ch)], chunk_vmem.at[ci % 2],
                dma_sem.at[ci % 2]
            )

        @pl.when(hi > 0)
        def _():
            dma(0).start()

        def body(ci, carry, dma=dma, lo=lo, hi=hi, ox=ox):
            T, C, done = carry
            base = ci * ch

            @pl.when((ci + 1) * ch < hi)
            def _():
                dma(ci + 1).start()

            dma(ci).wait()
            chunk = chunk_vmem[ci % 2, :, :]

            alpha, _ = _chunk_alpha_mxu(chunk, basis, ox, oy, lo, hi, base,
                                        cfg)
            om = 1.0 - alpha
            cum = _prefix_prod_lane(om, tri_i)
            test_t = T * cum
            accept = (test_t >= cfg.transmittance_min) & (done < 0.5)
            t_before = T * cum / om
            w = jnp.where(accept, alpha * t_before, 0.0)

            colors = chunk[F_R : F_B + 1, :]
            C = C + lax.dot_general(
                colors, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            T = jnp.min(jnp.where(accept, test_t, T), axis=1, keepdims=True)
            done = jnp.maximum(
                done,
                jnp.max(
                    jnp.where((alpha > 0.0) & jnp.logical_not(accept), 1.0,
                              0.0),
                    axis=1,
                    keepdims=True,
                ),
            )
            return T, C, done

        def cond(state, hi=hi):
            ci, (_, _, done) = state
            return (ci * ch < hi) & (jnp.min(done) < 0.5)

        def step(state, body=body):
            ci, carry = state
            return ci + 1, body(ci, carry)

        T0 = jnp.ones((npix, 1), jnp.float32)
        C0 = jnp.zeros((3, npix), jnp.float32)
        done0 = jnp.zeros((npix, 1), jnp.float32)
        ci_end, (T, C, _) = lax.while_loop(cond, step, (0, (T0, C0, done0)))

        @pl.when(ci_end * ch < hi)
        def _():
            dma(ci_end).wait()

        color_ref[s, :, :] = C + bg * T.reshape(1, npix)


def binned_blend_eval(feats, aux, bg, static):
    """No-gradient blend with PACKED binning sorts (binning.py packed
    section): same Pallas kernel, ~2x less sort bandwidth — the dominant
    eval-path cost on real maps. Returns (color, final_T, depth[=0],
    n_contrib, num_instances, num_compact); the depth image is zero (the
    eval path discards it). f16 payload rounding bounds the color error
    (parity test: tests/test_packed_binning.py)."""
    from segs_slam_tpu.ops.rasterizer.binning import (
        bin_eval_direct,
        compact_gaussians_packed,
        expand_and_sort_packed,
    )

    cfg, tx, ty, npix, interpret = static
    nt = tx * ty

    if cfg.sel_direct:
        # one footprint-priority selection sort over the raw rows replaces
        # the compaction + selection pair (binning.bin_eval_direct)
        cols_sorted, tile_start, tile_stop, num_instances, num_valid = (
            bin_eval_direct(feats, aux, tx, ty, cfg, return_packed=True))
        nk = cfg.max_instances
        npad = 8 - len(cols_sorted)  # 3 (5 payload cols) or 4 (pack8)
        stacked = jnp.stack(
            list(cols_sorted) + [jnp.zeros((nk,), jnp.uint32)] * npad,
            axis=0)
        feats_hbm = jnp.concatenate(
            [stacked, jnp.zeros((8, cfg.chunk), jnp.uint32)], axis=1)
        kern_fn = _fwd_kernel_eval_packed
        chunk_scratch = pltpu.VMEM((2, 8, cfg.chunk), jnp.uint32)
        sup = _pick_sup(tx)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [chunk_scratch, pltpu.SemaphoreType.DMA((2,))]
        kern = functools.partial(kern_fn, cfg=cfg, tx=tx, npix=npix, sup=sup)
        out_shapes = (jax.ShapeDtypeStruct((nt, 3, npix), jnp.float32),)
        out_specs = (pl.BlockSpec((sup, 3, npix), lambda i, *_: (i, 0, 0)),)
        call = _pallas_call(kern, static, out_shapes, out_specs, in_specs,
                            scratch, grid=(nt // sup,))
        (color,) = call(tile_start, tile_stop, feats_hbm, bg.reshape(3, 1))
        zeros1 = jnp.zeros((nt, 1, npix), jnp.float32)
        return (color, zeros1, zeros1, zeros1.astype(jnp.int32),
                num_instances, num_valid)

    pc = compact_gaussians_packed(feats, aux, cfg)
    # in-kernel unpack everywhere (interpret mode included, so CPU tests
    # exercise the exact decode); the f32 branch is kept for A/B profiling
    packed_kernel = True
    if packed_kernel:
        cols_sorted, tile_start, tile_stop, num_instances, num_large = (
            expand_and_sort_packed(pc, tx, ty, cfg, return_packed=True)
        )
        nk = cfg.max_instances
        # [8, NK + chunk] u32: 5 payload rows + 3 pad rows (8-row VMEM tile)
        stacked = jnp.stack(
            list(cols_sorted) + [jnp.zeros((nk,), jnp.uint32)] * 3, axis=0)
        feats_hbm = jnp.concatenate(
            [stacked, jnp.zeros((8, cfg.chunk), jnp.uint32)], axis=1)
        kern_fn = _fwd_kernel_eval_packed
        chunk_scratch = pltpu.VMEM((2, 8, cfg.chunk), jnp.uint32)
    else:
        feats_sorted, tile_start, tile_stop, num_instances, num_large = (
            expand_and_sort_packed(pc, tx, ty, cfg)
        )
        nk = cfg.max_instances
        feats_hbm = _stack_feats(feats_sorted, nk, cfg.chunk)
        kern_fn = _fwd_kernel_eval
        chunk_scratch = pltpu.VMEM((2, NFEAT, cfg.chunk), jnp.float32)

    # tiles per grid step: largest of 8/4/2 dividing the tile-grid width
    # (grid rows stay aligned so each step's SUP tiles are horizontally
    # adjacent with contiguous instance ranges); VMEM stays flat in SUP
    # because subtiles run sequentially with [npix, chunk] state
    sup = _pick_sup(tx)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    scratch = [
        chunk_scratch,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    kern = functools.partial(kern_fn, cfg=cfg, tx=tx, npix=npix,
                             sup=sup)
    out_shapes = (jax.ShapeDtypeStruct((nt, 3, npix), jnp.float32),)
    out_specs = (pl.BlockSpec((sup, 3, npix), lambda i, *_: (i, 0, 0)),)
    call = _pallas_call(kern, static, out_shapes, out_specs, in_specs,
                        scratch, grid=(nt // sup,))
    (color,) = call(tile_start, tile_stop, feats_hbm, bg.reshape(3, 1))
    zeros1 = jnp.zeros((nt, 1, npix), jnp.float32)
    return (color, zeros1, zeros1, zeros1.astype(jnp.int32), num_instances,
            pc.num_valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def binned_blend(feats, aux, bg, static):
    """feats: tuple of NPAY differentiable per-gaussian [N] arrays
    (mean2d.x/y, conic a/b/c, opacity, r, g, b).
    aux: dict(rect_min_x, rect_min_y, rect_w, touched [int32 (N,)],
              depth [f32 (N,)], alive [bool (N,)]) — non-differentiable.
    bg: (3,) background color.
    Returns (color [nt,3,P], final_T [nt,1,P], depth [nt,1,P],
    n_contrib [nt,1,P], num_instances, num_compact)."""
    out, _ = _binned_blend_fwd(feats, aux, bg, static)
    return out


def _stack_feats(feats_sorted, nk, chunk):
    # feats_sorted = NPAY gradient-bearing columns + the depth column
    cols = list(feats_sorted) + [jnp.zeros((nk,), jnp.float32)] * (
        NFEAT - len(feats_sorted)
    )
    stacked = jnp.stack(cols, axis=0)  # [NFEAT, NK]
    return jnp.concatenate(
        [stacked, jnp.zeros((NFEAT, chunk), jnp.float32)], axis=1
    )


def _binned_blend_fwd(feats, aux, bg, static):
    cfg, tx, ty, npix, interpret = static
    nt = tx * ty

    use_packed = (getattr(cfg, "packed_train", False) and cfg.tile == 16
                  and tx <= 63 and cfg.kmax <= 31
                  and cfg.compact <= (1 << 16))
    if use_packed:
        # packed sorts (f16-pair payloads) with gradient routing — see
        # RasterConfig.packed_train for the precision budget
        pc = compact_gaussians_packed(feats, aux, cfg, with_orig=True)
        binned = expand_and_sort_packed_train(pc, tx, ty, cfg)
        cg_orig_id, cg_valid_arr = pc.orig_id, pc.valid
        num_valid = pc.num_valid
    else:
        cg = compact_gaussians(feats, aux, cfg)
        binned = expand_and_sort(cg, tx, ty, cfg)
        cg_orig_id, cg_valid_arr = cg.orig_id, cg.valid
        num_valid = cg.num_valid
    nk = cfg.max_instances
    feats_hbm = _stack_feats(binned.feats_sorted, nk, cfg.chunk)

    sup = _pick_sup(tx)
    kern = functools.partial(_fwd_kernel, cfg=cfg, tx=tx, npix=npix, sup=sup)
    out_shapes = (
        jax.ShapeDtypeStruct((nt, 3, npix), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, npix), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, npix), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, npix), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((sup, 3, npix), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # feats stay in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bg (3, 1)
    ]
    scratch = [
        pltpu.VMEM((2, NFEAT, cfg.chunk), jnp.float32),  # double buffer
        pltpu.SemaphoreType.DMA((2,)),
    ]
    call = _pallas_call(kern, static, out_shapes, out_specs, in_specs,
                        scratch, grid=(nt // sup,))
    bg_col = bg.reshape(3, 1)
    color, final_t, depth_img, ncontrib = call(
        binned.tile_start, binned.tile_stop, feats_hbm, bg_col
    )
    out = (color, final_t, depth_img, ncontrib, binned.num_instances,
           num_valid)
    aux_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), aux
    )
    residuals = (
        feats_hbm,
        binned.tile_start,
        binned.tile_stop,
        binned.gid_sorted,
        cg_orig_id,
        cg_valid_arr,
        bg_col,
        final_t,
        ncontrib,
        aux_struct,
    )
    return out, residuals


def _binned_blend_bwd(static, residuals, cotangents):
    cfg, tx, ty, npix, interpret = static
    (
        feats_hbm,
        tile_start,
        tile_stop,
        gid_sorted,
        orig_id,
        cg_valid,
        bg_col,
        final_t,
        ncontrib,
        aux_struct,
    ) = residuals
    dcolor = cotangents[0]
    # cotangents of the final-transmittance and expected-depth image outputs
    # (ncontrib and the int counters are non-differentiable)
    dfinal_t = cotangents[1]
    ddepth = cotangents[2]
    n_orig = aux_struct["alive"].shape[0]

    nt = tx * ty
    sup = _pick_sup(tx)
    kern = functools.partial(_bwd_kernel, cfg=cfg, tx=tx, npix=npix, sup=sup)
    out_shapes = jax.ShapeDtypeStruct(feats_hbm.shape, jnp.float32)
    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # dzero (aliased to output)
        pl.BlockSpec(memory_space=pltpu.HBM),  # feats
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        pl.BlockSpec((sup, 3, npix), lambda i, *_: (i, 0, 0)),  # dL/dcolor
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),  # dL/ddepth
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),  # dL/dfinal_T
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),  # final_T
        pl.BlockSpec((sup, 1, npix), lambda i, *_: (i, 0, 0)),  # n_contrib
    ]
    scratch = [
        pltpu.VMEM((2, NFEAT, cfg.chunk), jnp.float32),  # double buffer
        pltpu.VMEM((NFEAT, cfg.chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    # input index 2 = dzero among (start, stop, dzero, feats, ...)
    call = _pallas_call(
        kern, static, out_shapes, out_specs, in_specs, scratch,
        io_aliases={2: 0}, grid=(nt // sup,),
    )
    dzero = jnp.zeros(feats_hbm.shape, jnp.float32)
    dfeats = call(
        tile_start, tile_stop, dzero, feats_hbm, bg_col, dcolor, ddepth,
        dfinal_t, final_t, ncontrib,
    )

    nk = cfg.max_instances
    dcols = dfeats[: NPAY + 1, :nk].T  # [NK, NPAY+1] — 9 feats + depth
    dcompact = jax.ops.segment_sum(
        dcols, gid_sorted, num_segments=cfg.compact
    )  # [compact, NPAY+1]
    dcompact = jnp.where(cg_valid[:, None], dcompact, 0.0)
    # route back through the compaction (unique destinations)
    dorig = (
        jnp.zeros((n_orig, NPAY + 1), jnp.float32)
        .at[jnp.where(cg_valid, orig_id, n_orig)]
        .add(dcompact, mode="drop")
    )
    dfeats_tuple = tuple(dorig[:, i] for i in range(NPAY))

    dbg = jnp.sum(final_t * dcolor, axis=(0, 2))

    def zero_ct(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, s.dtype)
        return np.zeros(s.shape, jax.dtypes.float0)

    daux = jax.tree.map(zero_ct, aux_struct)
    # the per-gaussian depth gradient (expected-depth output chain) flows
    # back through aux["depth"] — rasterize passes depth differentiably
    daux["depth"] = dorig[:, NPAY]
    return dfeats_tuple, daux, dbg


binned_blend.defvjp(_binned_blend_fwd, _binned_blend_bwd)
