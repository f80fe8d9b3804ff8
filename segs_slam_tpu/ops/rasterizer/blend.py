"""Pallas TPU tile-blend kernel (forward + backward) with custom VJP.

This replaces the reference's per-pixel CUDA blend loops
(cuda_rasterizer/forward.cu:339-452 renderCUDA, backward.cu:399-557
renderCUDA backward) with a TPU-native design:

  * one grid step per screen tile; INSTANCES live on the VPU lane axis,
    pixels on the sublane axis, so the alpha test over a chunk of instances
    is a single [PIXELS, CHUNK] vector op;
  * instance features are packed [16, capacity] f32 (features on sublanes) so
    a chunk DMA is a [16, CHUNK] slice whose lane offset is chunk-aligned —
    the binning stage pads every tile's instance segment to a multiple of the
    chunk size to guarantee this (see binning.py);
  * the inherently sequential front-to-back compositing becomes a cumulative
    product along the instance axis: with masked alphas the CUDA control flow
    (skip / early-`done`) is EXACTLY the closed form
        accept_i  = (T_in * prod_{j<=i}(1-a_j) >= T_MIN)
        color     = sum_i accept_i * a_i * T_before_i * c_i      (an MXU matmul)
        T_out     = min over accepted test_T (== masked product)
  * the backward pass re-traverses chunks back-to-front (like the CUDA
    backward) maintaining per-pixel suffix state, and writes PER-INSTANCE
    gradients; the scatter-add the CUDA code does with atomics is instead the
    autodiff VJP of the instance gather (an XLA segment-sum) outside the
    kernel.

Feature packing (row index in the [16, cap] array):
  0: mean2d.x  1: mean2d.y  2: conic.a  3: conic.b  4: conic.c
  5: opacity   6: r  7: g  8: b        9-15: padding
Gradients come back in the same slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NFEAT = 16
F_X, F_Y, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B = range(9)


def _prefix_prod_lane(x):
    """Inclusive prefix product along axis 1 (lanes) via log-step rolls.

    Mosaic has no cumprod lowering; Hillis-Steele scan with static chunk
    sizes so the python loop fully unrolls.
    """
    n = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(idx >= shift, rolled, 1.0)
        shift *= 2
    return x


def _suffix_prod_lane(x):
    """sp_i = prod_{k>=i} x_k along axis 1."""
    n = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, n - shift, axis=1)  # roll by -shift
        x = x * jnp.where(idx < n - shift, rolled, 1.0)
        shift *= 2
    return x


def _suffix_sum_lane(x):
    """s_i = sum_{k>=i} x_k along axis 1."""
    n = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, n - shift, axis=1)  # roll by -shift
        x = x + jnp.where(idx < n - shift, rolled, 0.0)
        shift *= 2
    return x


def _pixel_coords(t, tx, tile, npix):
    """Pixel centers of tile t as ([P, 1], [P, 1]) f32 (pixels on sublanes)."""
    tile_y = t // tx
    tile_x = t - tile_y * tx
    p = lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    px = (tile_x * tile + p % tile).astype(jnp.float32)
    py = (tile_y * tile + p // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha(chunk, px, py, num_valid, base, cfg):
    """Alpha for a [P, C] block given chunk features [NFEAT, C].

    Returns (alpha, G, ok, dx, dy) all [P, C] (G/dx/dy needed by backward).
    Masked entries have alpha == 0.
    """
    c = chunk.shape[1]
    x = chunk[F_X : F_X + 1, :]  # [1, C]
    y = chunk[F_Y : F_Y + 1, :]
    ca = chunk[F_CA : F_CA + 1, :]
    cb = chunk[F_CB : F_CB + 1, :]
    cc = chunk[F_CC : F_CC + 1, :]
    op = chunk[F_OP : F_OP + 1, :]

    dx = x - px  # [P, C] broadcast (d = mean - pixel, forward.cu:411)
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_clamp, op * G)

    idx = lax.broadcasted_iota(jnp.int32, (1, c), 1) + base
    valid = idx < num_valid
    ok = valid & (power <= 0.0) & (alpha >= cfg.alpha_min)
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, G, ok, dx, dy


def _fwd_kernel(
    # scalar prefetch
    start_ref,  # aligned segment starts [nt]
    count_ref,  # true instance counts [nt]
    # inputs
    feats_hbm,  # [NFEAT, cap_aligned] in HBM
    bg_ref,  # [3, 1] VMEM
    # outputs
    color_ref,  # [1, 3, P]
    final_t_ref,  # [1, 1, P]
    ncontrib_ref,  # [1, 1, P]
    # scratch
    chunk_vmem,  # [NFEAT, C]
    dma_sem,
    *,
    cfg,
    tx,
    npix,
):
    t = pl.program_id(0)
    start = start_ref[t]
    num = count_ref[t]
    ch = cfg.chunk

    px, py = _pixel_coords(t, tx, cfg.tile, npix)

    def body(ci, carry):
        T, C, nc = carry
        base = ci * ch
        off = pl.multiple_of(start + base, ch)
        copy = pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, ch)],
            chunk_vmem,
            dma_sem,
        )
        copy.start()
        copy.wait()
        chunk = chunk_vmem[:, :]

        alpha, _G, _ok, _dx, _dy = _chunk_alpha(chunk, px, py, num, base, cfg)
        om = 1.0 - alpha
        cum = _prefix_prod_lane(om)  # [P, C] inclusive
        test_t = T * cum
        accept = test_t >= cfg.transmittance_min
        t_before = T * cum / om  # exclusive prefix (om >= 1 - alpha_clamp)
        w = jnp.where(accept, alpha * t_before, 0.0)  # [P, C]

        colors = chunk[F_R : F_B + 1, :]  # [3, C]
        contrib = lax.dot_general(
            colors,
            w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3, P]
        C = C + contrib

        # T_out = T_in * prod_{accepted} om. test_t is non-increasing and
        # accept is a prefix, so this is the smallest accepted test_t (or T_in
        # when nothing was accepted). Mosaic has no reduce_prod; min works.
        T = jnp.min(jnp.where(accept, test_t, T), axis=1, keepdims=True)

        accepted = accept & (alpha > 0.0)
        idx1 = lax.broadcasted_iota(jnp.int32, accepted.shape, 1) + base + 1
        nc = jnp.maximum(
            nc, jnp.max(jnp.where(accepted, idx1, 0), axis=1, keepdims=True)
        )
        return T, C, nc

    def cond(state):
        ci, (T, _, _) = state
        return (ci * ch < num) & (jnp.max(T) >= cfg.transmittance_min)

    def step(state):
        ci, carry = state
        return ci + 1, body(ci, carry)

    T0 = jnp.ones((npix, 1), jnp.float32)
    C0 = jnp.zeros((3, npix), jnp.float32)
    nc0 = jnp.zeros((npix, 1), jnp.int32)
    _, (T, C, nc) = lax.while_loop(cond, step, (0, (T0, C0, nc0)))

    bg = bg_ref[:, :]  # [3, 1]
    color_ref[0, :, :] = C + bg * T.reshape(1, npix)
    final_t_ref[0, 0, :] = T.reshape(npix)
    ncontrib_ref[0, 0, :] = nc.reshape(npix)


def _bwd_kernel(
    # scalar prefetch
    start_ref,
    count_ref,
    # inputs
    feats_hbm,
    bg_ref,
    dldc_ref,  # [1, 3, P]
    final_t_ref,  # [1, 1, P]
    ncontrib_ref,  # [1, 1, P]
    # outputs
    dfeats_hbm,  # [NFEAT, cap_aligned]
    # scratch
    chunk_vmem,
    grad_vmem,
    in_sem,
    out_sem,
    *,
    cfg,
    tx,
    npix,
):
    t = pl.program_id(0)
    start = start_ref[t]
    num = count_ref[t]
    ch = cfg.chunk

    px, py = _pixel_coords(t, tx, cfg.tile, npix)

    dldc = dldc_ref[0, :, :]  # [3, P]
    final_t = final_t_ref[0, 0, :].reshape(npix, 1)
    ncontrib = ncontrib_ref[0, 0, :].reshape(npix, 1)

    bg = bg_ref[:, :]  # [3, 1]
    bg_dot = jnp.sum(bg * dldc, axis=0).reshape(npix, 1)  # [P, 1]

    # Chunks that ever contributed (skip the dead tail entirely).
    last = jnp.max(ncontrib)
    nchunks = (last + ch - 1) // ch

    def body(step_i, carry):
        T_end, S = carry  # both [P, 1]
        ci = nchunks - 1 - step_i
        base = ci * ch
        off = pl.multiple_of(start + base, ch)
        copy = pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(off, ch)], chunk_vmem, in_sem
        )
        copy.start()
        copy.wait()
        chunk = chunk_vmem[:, :]

        alpha, G, ok, dx, dy = _chunk_alpha(chunk, px, py, num, base, cfg)
        idx = lax.broadcasted_iota(jnp.int32, alpha.shape, 1) + base
        m = ok & (idx < ncontrib)  # accepted in forward (see module docstring)
        alpha = jnp.where(m, alpha, 0.0)
        om = 1.0 - alpha

        sp = _suffix_prod_lane(om)  # prod_{k>=i}(1-a_k)   [P, C]
        t_before = T_end / sp

        colors = chunk[F_R : F_B + 1, :]  # [3, C]
        g = lax.dot_general(
            dldc, colors, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, C] = dL/dC . c_i
        w = alpha * t_before
        wg = w * g
        suf = _suffix_sum_lane(wg)
        s_i = (suf - wg) + S  # sum_{k>i} w_k g_k  (+ later chunks + bg term)

        dalpha = jnp.where(m, t_before * g - s_i / om, 0.0)

        op = chunk[F_OP : F_OP + 1, :]
        ca = chunk[F_CA : F_CA + 1, :]
        cb = chunk[F_CB : F_CB + 1, :]
        cc = chunk[F_CC : F_CC + 1, :]
        dG = op * dalpha
        dpower = dG * G
        # Per-instance reductions over pixels (axis 0 / sublanes) -> [1, C].
        dop = jnp.sum(jnp.where(m, G * dalpha, 0.0), axis=0, keepdims=True)
        da = jnp.sum(-0.5 * dx * dx * dpower, axis=0, keepdims=True)
        db = jnp.sum(-dx * dy * dpower, axis=0, keepdims=True)
        dc = jnp.sum(-0.5 * dy * dy * dpower, axis=0, keepdims=True)
        dmx = jnp.sum(-(ca * dx + cb * dy) * dpower, axis=0, keepdims=True)
        dmy = jnp.sum(-(cc * dy + cb * dx) * dpower, axis=0, keepdims=True)
        dcol = lax.dot_general(
            dldc, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3, C]

        zeros = jnp.zeros((NFEAT - 9, alpha.shape[1]), jnp.float32)
        grad = jnp.concatenate(
            [dmx, dmy, da, db, dc, dop, dcol, zeros], axis=0
        )  # [NFEAT, C]
        grad_vmem[:, :] = grad
        out_copy = pltpu.make_async_copy(
            grad_vmem, dfeats_hbm.at[:, pl.ds(off, ch)], out_sem
        )
        out_copy.start()
        out_copy.wait()

        T_end = jnp.minimum(T_end / sp[:, 0:1], 1.0)  # T at chunk start
        S = S + jnp.sum(wg, axis=1, keepdims=True)
        return T_end, S

    S0 = final_t * bg_dot  # background's pull on earlier alphas
    lax.fori_loop(0, nchunks, body, (final_t, S0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def tile_blend(feats, bg, seg_start, seg_count, slot_tile, static):
    out, _ = _tile_blend_fwd(feats, bg, seg_start, seg_count, slot_tile, static)
    return out


def _pallas_call(kernel, static, out_shapes, out_specs, in_specs, scratch):
    cfg, tx, ty, npix, interpret = static
    nt = tx * ty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )


def _tile_blend_fwd(feats, bg, seg_start, seg_count, slot_tile, static):
    cfg, tx, ty, npix, interpret = static
    nt = tx * ty
    kern = functools.partial(_fwd_kernel, cfg=cfg, tx=tx, npix=npix)
    out_shapes = (
        jax.ShapeDtypeStruct((nt, 3, npix), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, npix), jnp.float32),
        jax.ShapeDtypeStruct((nt, 1, npix), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((1, 3, npix), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, npix), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, npix), lambda i, *_: (i, 0, 0)),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # feats stay in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bg (3, 1)
    ]
    scratch = [
        pltpu.VMEM((NFEAT, cfg.chunk), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    call = _pallas_call(kern, static, out_shapes, out_specs, in_specs, scratch)
    color, final_t, ncontrib = call(seg_start, seg_count, feats, bg)
    return (color, final_t, ncontrib), (
        feats,
        bg,
        seg_start,
        seg_count,
        slot_tile,
        final_t,
        ncontrib,
    )


def _tile_blend_bwd(static, residuals, cotangents):
    cfg, tx, ty, npix, interpret = static
    nt = tx * ty
    feats, bg, seg_start, seg_count, slot_tile, final_t, ncontrib = residuals
    dcolor, _dfinal_t, _dncontrib = cotangents

    kern = functools.partial(_bwd_kernel, cfg=cfg, tx=tx, npix=npix)
    out_shapes = jax.ShapeDtypeStruct(feats.shape, jnp.float32)
    out_specs = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # feats stay in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bg (3, 1)
        pl.BlockSpec((1, 3, npix), lambda i, *_: (i, 0, 0)),  # dL/dcolor
        pl.BlockSpec((1, 1, npix), lambda i, *_: (i, 0, 0)),  # final_T
        pl.BlockSpec((1, 1, npix), lambda i, *_: (i, 0, 0)),  # n_contrib
    ]
    scratch = [
        pltpu.VMEM((NFEAT, cfg.chunk), jnp.float32),
        pltpu.VMEM((NFEAT, cfg.chunk), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    call = _pallas_call(kern, static, out_shapes, out_specs, in_specs, scratch)
    dfeats = call(seg_start, seg_count, feats, bg, dcolor, final_t, ncontrib)

    # Zero gradient slots the kernel never wrote: chunks beyond each tile's
    # contributing range, padding slots handled by the in-kernel mask.
    cap = feats.shape[1]
    inst = jnp.arange(cap, dtype=jnp.int32)
    max_nc = jnp.max(ncontrib, axis=(1, 2))  # [nt]
    bound = (max_nc + cfg.chunk - 1) // cfg.chunk * cfg.chunk
    local = inst - seg_start[slot_tile]
    covered = (local >= 0) & (local < bound[slot_tile])
    dfeats = jnp.where(covered[None, :], dfeats, 0.0)

    # d/d(bg): out = C + T_fin * bg  =>  dL/dbg[c] = sum_pix T_fin * dLdC.
    dbg = jnp.sum(final_t * dcolor, axis=(0, 2)).reshape(3, 1)

    zero_i32 = np.zeros(seg_start.shape, jax.dtypes.float0)
    zero_slot = np.zeros(slot_tile.shape, jax.dtypes.float0)
    return dfeats, dbg, zero_i32, zero_i32, zero_slot


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)
