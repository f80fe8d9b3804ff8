"""Per-Gaussian projection preprocess — the differentiable front half of the
tile rasterizer, as plain (vmappable, autodiff-able) JAX.

Re-derivation of the reference CUDA preprocess
(reference: cuda_rasterizer/forward.cu:74-256 computeCov2D/computeCov3D/
preprocessCUDA, cuda_rasterizer/auxiliary.h:41-57,140-166
ndc2Pix/getRect/in_frustum) in batched matrix form: everything is one fused
set of elementwise ops + tiny matmuls over the [N] Gaussian axis, which XLA
maps onto the VPU directly. The non-differentiable integer outputs (radii,
tile rects) are stop-gradient'ed; gradients flow through mean2d / conic /
depth exactly where the CUDA backward (backward.cu:144-396) provides them.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (shapes must be static under jit).

    tile = the screen-space tile edge in pixels. The reference hardcodes 16
    (cuda_rasterizer/config.h BLOCK_X/BLOCK_Y); here it is a free performance
    parameter because binning is recomputed per tile size. max_instances is
    the static capacity of the duplicated (gaussian, tile) instance list that
    replaces the reference's dynamically-sized binning buffers
    (rasterizer_impl.cu:280-308).
    """

    tile: int = 16
    compact: int = 2**17  # capacity of the visible-gaussian compaction
    kmax: int = 16  # max tiles per gaussian (rect clamped around center)
    chunk: int = 256  # instances processed per Pallas blend step
    near: float = 0.2  # near-cull plane (auxiliary.h:156)
    alpha_min: float = 1.0 / 255.0  # forward.cu:422
    alpha_clamp: float = 0.99  # forward.cu:421
    transmittance_min: float = 1.0e-4  # forward.cu:425
    # Dual-rate expansion (0 = off): most gaussians touch <= ksmall tiles,
    # so the static [compact, kmax] instance grid wastes ~3x sort rows on
    # sentinel slots. With ksmall > 0, every gaussian gets ksmall slots and
    # only the nlarge largest-footprint gaussians get the remaining
    # kmax - ksmall slots — shrinking the dominant (tile, depth) payload
    # sort by ~compact*kmax / (compact*ksmall + nlarge*(kmax-ksmall)).
    ksmall: int = 0
    nlarge: int = 0
    # Optional THIRD tier (packed eval path only; 0 = off): with kmid/nmid
    # set, every gaussian gets ksmall slots, the nmid largest footprints get
    # slots up to kmid, and the nlarge largest get the rest up to kmax
    # (nlarge <= nmid; one shared footprint-selection sort serves both
    # tiers). Matches the single-rate output exactly whenever nmid covers
    # all footprints > ksmall and nlarge covers all > kmid.
    kmid: int = 0
    nmid: int = 0
    # Per-anchor K-axis pre-compaction (eval path only; 0 = off): with
    # kgroup = the model's n_offsets and kanchor < kgroup, each anchor's
    # kgroup gaussians are priority-sorted along the (tiny) K axis — a
    # vectorized sorting network over [cap, K] — and only the kanchor
    # most-opaque survive into the global compaction sort, shrinking the
    # dominant sort's input rows by kanchor/kgroup. Lossless whenever no
    # anchor has more than kanchor alive (opacity > 0) offsets; the r4
    # 65k-map histogram measured 18 of 45k visible anchors above 6 of 10.
    kanchor: int = 0
    kgroup: int = 0
    # Direct-selection eval binning (packed eval path only): SKIP the global
    # opacity-priority compaction sort entirely; ONE footprint-priority
    # selection sort over the RAW cap*K rows serves as both the compaction
    # and the tier selection (tier-0 = the leading `compact` rows of the
    # selection, tiers 1/2 = its nmid/nlarge prefixes). Saves the whole
    # compact-sort pass; under capacity pressure it drops the
    # smallest-footprint-then-faintest gaussians instead of the faintest.
    sel_direct: bool = False
    # Byte-packed color payload (eval + sel_direct only): r/g/b as 8-bit,
    # opacity as 11-bit fixed point — squeezing the 5 packed payload columns
    # into 4, i.e. the instance sort to 5 operands and the selection sort to
    # 6, while KEEPING the full 21-bit depth key (no ordering regression).
    # Color quantization adds <= 1/510 per contribution (the render is saved
    # as 8-bit PNG anyway); opacity 11-bit steps are ~0.0005. Requires
    # sel_direct and a tile grid <= 63x31 (rmx/rmy bit budgets).
    pack8: bool = False
    # Use the packed (f16-pair payload) binning sorts on the TRAINING path
    # too (binning.py packed section): ~2x less sorted bandwidth on the two
    # dominant sorts in exchange for f16 rounding of the blend features
    # (<=0.25 px mean2d, ~0.05% conic/opacity/rgb — far below SGD noise; the
    # custom VJP differentiates the exact forward it ran, so gradients stay
    # consistent). Requires tile=16, grid width <= 63 tiles, kmax <= 31 and
    # compact <= 2^16 (gid packs into 16 payload bits).
    packed_train: bool = False

    def __post_init__(self):
        # 3-tier sizing (max_instances) is only implemented by the packed
        # EVAL expansion (binning.expand_and_sort_packed); the training
        # expansions are 2-tier. Reject inconsistent tier configs up front
        # instead of producing a confusing trace-time shape error (ADVICE r3).
        if self.nmid:
            if not self.ksmall:
                raise ValueError("nmid > 0 requires ksmall > 0")
            if not (self.ksmall < self.kmid < self.kmax):
                raise ValueError(
                    f"need ksmall < kmid < kmax, got {self.ksmall}/"
                    f"{self.kmid}/{self.kmax}")
            if self.nlarge > self.nmid:
                raise ValueError("nlarge must be <= nmid (tier prefix)")
        elif self.kmid:
            raise ValueError("kmid > 0 requires nmid > 0")
        if self.ksmall and not self.nlarge:
            raise ValueError("ksmall > 0 requires nlarge > 0")
        if self.kanchor and (not self.kgroup or self.kanchor >= self.kgroup):
            raise ValueError("kanchor requires 0 < kanchor < kgroup")
        if self.sel_direct and not self.ksmall:
            raise ValueError("sel_direct requires the tiered expansion "
                             "(ksmall > 0)")
        if self.pack8 and not self.sel_direct:
            raise ValueError("pack8 is implemented on the sel_direct eval "
                             "path only")

    def grid(self, width: int, height: int) -> tuple[int, int]:
        tx = (width + self.tile - 1) // self.tile
        ty = (height + self.tile - 1) // self.tile
        return tx, ty

    def eval_variant(self, width: int, height: int) -> "RasterConfig":
        """The production EVAL-path upgrade of this (training) config: the
        round-5 65k sweep winner — 3-tier expansion + direct-selection
        binning + byte-packed color payloads (sel_direct + pack8), which
        replaces compact+select+instance sorts (~9 ms at the 65k full-map
        point) with selection+instance (~5.7 ms; scripts/sweep_eval65k.py,
        PERF_NOTES.md). Returns self unchanged when the packed-path
        constraints don't hold (16px tiles, grid <= 63x31, kmax <= 31) —
        the fallback stays the exact training-path binning."""
        import dataclasses

        tx, ty = self.grid(width, height)
        if (self.tile != 16 or tx > 63 or ty > 31 or self.kmax > 31
                or self.kmax < 6):
            return self
        nmid = max(self.nmid, self.compact // 8)
        nlarge = min(nmid, max(self.nlarge if self.ksmall else 0,
                               self.compact // 32))
        return dataclasses.replace(
            self, sel_direct=True, pack8=True, packed_train=False,
            ksmall=2, kmid=self.kmax // 2, nmid=nmid, nlarge=nlarge)

    @property
    def max_instances(self) -> int:
        if self.ksmall and self.nmid:
            return (self.compact * self.ksmall
                    + self.nmid * (self.kmid - self.ksmall)
                    + self.nlarge * (self.kmax - self.kmid))
        if self.ksmall:
            return self.compact * self.ksmall + self.nlarge * (
                self.kmax - self.ksmall
            )
        return self.compact * self.kmax


class GaussianProjection(NamedTuple):
    """Per-Gaussian screen-space quantities ([N] leading axis)."""

    mean2d: jnp.ndarray  # (N, 2) pixel coords
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    depth: jnp.ndarray  # (N,) view-space z
    radius: jnp.ndarray  # (N,) int32 pixel radius, 0 = culled
    rect_min: jnp.ndarray  # (N, 2) int32 tile coords (x, y)
    rect_max: jnp.ndarray  # (N, 2) int32 tile coords, exclusive
    tiles_touched: jnp.ndarray  # (N,) int32
    kmax_truncated: jnp.ndarray  # () int32 — valid gaussians whose footprint
    #   exceeded kmax tiles and was shrunk (silent-quality guard)


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance from (linear) scales and quaternions.

    Sigma = R diag(s^2) R^T returned as the symmetric-packed
    (xx, xy, xz, yy, yz, zz). Quaternions are used as-is (the reference's
    computeCov3D does not re-normalize; callers normalize beforehand —
    forward.cu:118-152).
    """
    s = scales * scale_modifier
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    # Rows of R (standard (w,x,y,z) rotation matrix) as [N] vectors —
    # fully elementwise: per-gaussian 3x3 matmuls lower terribly on TPU
    # (measured ~3 ms/100k for the batched form vs ~0.1 ms elementwise).
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    # Sigma = R diag(s^2) R^T, symmetric packed
    c_xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c_xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c_xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c_yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c_yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c_zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def _ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """reference: auxiliary.h:41-45"""
    return ((v + 1.0) * size - 1.0) * 0.5


def _transform_rows(x, y, z, M):
    """(x, y, z, 1) @ M for [N]-vector coords and a 4x4 (traced-scalar)
    matrix, fully elementwise — XLA on TPU lowers tiny [N,4]x[4,4] matmuls
    terribly (measured ~1 ms per 100k points), while 16 scalar-coefficient
    vector FMAs are essentially free."""
    out = []
    for j in range(4):
        out.append(x * M[0, j] + y * M[1, j] + z * M[2, j] + M[3, j])
    return out


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    world_view_transform: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA splatting 2D covariance (a, b, c) with the +0.3 low-pass filter.

    cov2D = J W Sigma W^T J^T with the view-direction clamp of the reference
    (forward.cu:74-113). world_view_transform is W2C^T (row-vector form).
    Expanded to scalar-coefficient elementwise form (no per-gaussian 3x3
    matmuls — see _transform_rows note).
    """
    x, y, z = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    wvt = world_view_transform
    tx0, ty0, tz, _ = _transform_rows(x, y, z, wvt)

    # Degenerate (culled) gaussians can sit exactly on the camera plane
    # (tz == 0); they are masked out of the forward, but an inf here would
    # still poison gradients via 0 * inf = nan. Sign-preserving clamp.
    tz = jnp.where(jnp.abs(tz) < 1e-6, jnp.where(tz < 0, -1e-6, 1e-6), tz)

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = tx0 / tz
    tytz = ty0 / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (2x3 Jacobian): j00, 0, j02 / 0, j11, j12  — [N] vectors.
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # W2C rotation entries (scalars). wvt = W2C^T so W2C[i][j] = wvt[j][i].
    w = [[wvt[j, i] for j in range(3)] for i in range(3)]  # w[i][j] = W2C[i,j]

    # M = J @ W2C3: M0j = j00*w[0][j] + j02*w[2][j]; M1j = j11*w[1][j] + j12*w[2][j]
    m00 = j00 * w[0][0] + j02 * w[2][0]
    m01 = j00 * w[0][1] + j02 * w[2][1]
    m02 = j00 * w[0][2] + j02 * w[2][2]
    m10 = j11 * w[1][0] + j12 * w[2][0]
    m11 = j11 * w[1][1] + j12 * w[2][1]
    m12 = j11 * w[1][2] + j12 * w[2][2]

    c0, c1, c2 = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    c3, c4, c5 = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    # V @ M^T rows for M row 0 and row 1 (V symmetric).
    v0m0 = c0 * m00 + c1 * m01 + c2 * m02
    v1m0 = c1 * m00 + c3 * m01 + c4 * m02
    v2m0 = c2 * m00 + c4 * m01 + c5 * m02
    v0m1 = c0 * m10 + c1 * m11 + c2 * m12
    v1m1 = c1 * m10 + c3 * m11 + c4 * m12
    v2m1 = c2 * m10 + c4 * m11 + c5 * m12

    a = m00 * v0m0 + m01 * v1m0 + m02 * v2m0 + 0.3
    b = m00 * v0m1 + m01 * v1m1 + m02 * v2m1
    cc = m10 * v0m1 + m11 * v1m1 + m12 * v2m1 + 0.3
    return jnp.stack([a, b, cc], axis=-1)


def preprocess_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    world_view_transform: jnp.ndarray,
    full_proj_transform: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    config: RasterConfig,
    valid_in: jnp.ndarray | None = None,
) -> GaussianProjection:
    """Project Gaussians to screen space and compute tile footprints.

    Equivalent of preprocessCUDA (forward.cu:154-256) minus color (colors are
    always precomputed in this framework, matching the reference's live path
    src/gaussian_renderer.cpp:96-99). `valid_in` masks padded / inactive
    entries of fixed-capacity buffers.
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    mx, my, mz = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    _, _, depth, _ = _transform_rows(mx, my, mz, world_view_transform)

    hx, hy, hz, hw = _transform_rows(mx, my, mz, full_proj_transform)
    denom = hw + 1.0e-7
    # guard the w-divide for degenerate (masked) gaussians — see tz note
    denom = jnp.where(
        jnp.abs(denom) < 1e-6, jnp.where(denom < 0, -1e-6, 1e-6), denom
    )
    p_w = 1.0 / denom

    mean2d = jnp.stack(
        [_ndc2pix(hx * p_w, width), _ndc2pix(hy * p_w, height)], axis=-1
    )

    cov = compute_cov2d(
        means3d, cov3d, world_view_transform, focal_x, focal_y, tan_fovx, tan_fovy
    )
    det = cov[..., 0] * cov[..., 2] - cov[..., 1] * cov[..., 1]
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack(
        [cov[..., 2] * inv_det, -cov[..., 1] * inv_det, cov[..., 0] * inv_det], axis=-1
    )

    mid = 0.5 * (cov[..., 0] + cov[..., 2])
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    valid = depth > config.near
    valid &= det != 0.0
    if valid_in is not None:
        valid &= valid_in

    # Tile footprint (auxiliary.h:47-57 getRect), ints are non-differentiable.
    tx, ty = config.grid(width, height)
    px = jax.lax.stop_gradient(mean2d[..., 0])
    py = jax.lax.stop_gradient(mean2d[..., 1])
    r = jax.lax.stop_gradient(radius_f)
    tile = float(config.tile)
    rect_min_x = jnp.clip(jnp.floor((px - r) / tile), 0, tx).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((py - r) / tile), 0, ty).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor((px + r + tile - 1) / tile), 0, tx).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor((py + r + tile - 1) / tile), 0, ty).astype(jnp.int32)

    # Static-shape divergence from the reference: each gaussian's rect is
    # clamped to at most `kmax` tiles, shrunk around the projected center
    # (the reference's binning buffers are dynamically sized,
    # rasterizer_impl.cu:280-285). Exact whenever w*h <= kmax.
    w = rect_max_x - rect_min_x
    h = rect_max_y - rect_min_y
    over = (w * h) > config.kmax
    ratio = jnp.sqrt(config.kmax / jnp.maximum((w * h).astype(jnp.float32), 1.0))
    w2 = jnp.maximum((w.astype(jnp.float32) * ratio).astype(jnp.int32), 1)
    w2 = jnp.minimum(w2, config.kmax)
    h2 = jnp.minimum(jnp.maximum(config.kmax // jnp.maximum(w2, 1), 1), h)
    w2 = jnp.where(over, w2, w)
    h2 = jnp.where(over, h2, h)
    # center tile of the projected mean, clamped inside the original rect
    cx_t = jnp.clip((px / tile).astype(jnp.int32), rect_min_x, rect_max_x - 1)
    cy_t = jnp.clip((py / tile).astype(jnp.int32), rect_min_y, rect_max_y - 1)
    nmin_x = jnp.clip(cx_t - w2 // 2, rect_min_x, rect_max_x - w2)
    nmin_y = jnp.clip(cy_t - h2 // 2, rect_min_y, rect_max_y - h2)
    rect_min_x = jnp.where(over, nmin_x, rect_min_x)
    rect_min_y = jnp.where(over, nmin_y, rect_min_y)
    rect_max_x = jnp.where(over, nmin_x + w2, rect_max_x)
    rect_max_y = jnp.where(over, nmin_y + h2, rect_max_y)

    tiles_touched = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    valid &= tiles_touched > 0

    radius = jnp.where(valid, r, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles_touched, 0)
    kmax_truncated = jnp.sum((over & valid).astype(jnp.int32))

    return GaussianProjection(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles_touched,
        kmax_truncated=kmax_truncated,
    )
