"""Top-level differentiable tile rasterizer.

Pipeline (replacing CudaRasterizer::Rasterizer::forward/backward,
reference: cuda_rasterizer/rasterizer_impl.cu:198-416):

    preprocess (JAX, autodiff)                       forward.cu:154-256
      -> compaction + kmax expansion + payload sort  rasterizer_impl.cu:276-308
      -> Pallas tile blend (custom VJP over the
         whole binned pipeline; gradients return
         via segment-sum + compaction scatter)       backward.cu atomics

Everything upstream of binned_blend is ordinary JAX, so gradients to
means3d/scales/rotations/opacities/colors flow through JAX autodiff and the
one custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from segs_slam_tpu.ops.rasterizer.blend import binned_blend
from segs_slam_tpu.ops.rasterizer.preprocess import (
    RasterConfig,
    compute_cov3d,
    preprocess_gaussians,
)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def rasterize(
    means3d: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N, 3) linear (already exp'd)
    rotations: jnp.ndarray,  # (N, 4) normalized quats (w,x,y,z)
    opacities: jnp.ndarray,  # (N,) or (N, 1)
    colors: jnp.ndarray,  # (N, 3) precomputed colors
    world_view_transform: jnp.ndarray,  # (4, 4) W2C^T
    full_proj_transform: jnp.ndarray,  # (4, 4)
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    bg: jnp.ndarray,  # (3,)
    config: RasterConfig = RasterConfig(),
    valid: jnp.ndarray | None = None,  # (N,) bool mask for padded buffers
    mean2d_offset: jnp.ndarray | None = None,  # (N, 2) zeros; grad = stats hook
    scale_modifier: float = 1.0,
    interpret: bool | None = None,
    shs: jnp.ndarray | None = None,  # (N, K, 3) SH coeffs; overrides colors
    sh_degree: int = 3,
    campos: jnp.ndarray | None = None,  # (3,) needed with shs; else derived
):
    """Returns dict with image (3, H, W), radii (N,), final_T, n_contrib,
    num_instances, num_compact."""
    if interpret is None:
        interpret = _auto_interpret()
    if not interpret and config.chunk % 128 != 0:
        raise ValueError(
            "compiled TPU blend requires chunk % 128 == 0 (DMA slices along "
            f"the lane dimension must be 128-aligned); got {config.chunk}"
        )
    opacities = opacities.reshape(-1)

    if shs is not None:
        # SH color mode (reference: computeColorFromSH, forward.cu:20-71 —
        # unused by the reference's live renderer but part of the kernel
        # surface). Vectorized XLA; fuses into the preprocess.
        from segs_slam_tpu.ops.sh import sh_to_color

        if campos is None:
            # camera center = last row of inv(W2C^T) = (-R^T t, 1)
            inv = jnp.linalg.inv(world_view_transform)
            campos = inv[3, :3]
        colors = sh_to_color(sh_degree, shs, means3d, campos)

    cov3d = compute_cov3d(scales, rotations, scale_modifier)
    proj = preprocess_gaussians(
        means3d,
        cov3d,
        world_view_transform,
        full_proj_transform,
        width,
        height,
        tan_fovx,
        tan_fovy,
        config,
        valid_in=valid,
    )

    mean2d = proj.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    feats = (
        mean2d[:, 0],
        mean2d[:, 1],
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        opacities,
        colors[:, 0],
        colors[:, 1],
        colors[:, 2],
    )
    aux = {
        "rect_min_x": proj.rect_min[:, 0],
        "rect_min_y": proj.rect_min[:, 1],
        "rect_w": proj.rect_max[:, 0] - proj.rect_min[:, 0],
        "touched": proj.tiles_touched.astype(jnp.int32),
        # depth is differentiable: the expected-depth output's VJP returns a
        # per-gaussian depth gradient through aux["depth"] (blend.py), which
        # chains to means3d (and the camera pose) via the projection
        "depth": proj.depth,
        "alive": proj.radius > 0,
    }

    tx, ty = config.grid(width, height)
    npix = config.tile * config.tile
    static = (config, tx, ty, npix, interpret)
    color, final_t, depth_img, ncontrib, num_instances, num_compact = (
        binned_blend(feats, aux, bg.astype(jnp.float32), static)
    )

    # (nt, 3, P) -> (3, H, W)
    b = config.tile
    image = (
        color.reshape(ty, tx, 3, b, b)
        .transpose(2, 0, 3, 1, 4)
        .reshape(3, ty * b, tx * b)[:, :height, :width]
    )
    final_t_img = (
        final_t.reshape(ty, tx, b, b)
        .transpose(0, 2, 1, 3)
        .reshape(ty * b, tx * b)[:height, :width]
    )
    ncontrib_img = (
        ncontrib.reshape(ty, tx, b, b)
        .transpose(0, 2, 1, 3)
        .reshape(ty * b, tx * b)[:height, :width]
    )
    depth_map = (
        depth_img.reshape(ty, tx, b, b)
        .transpose(0, 2, 1, 3)
        .reshape(ty * b, tx * b)[:height, :width]
    )

    return {
        "image": image,
        "radii": proj.radius,
        "final_T": final_t_img,
        "n_contrib": ncontrib_img,
        "depth_map": depth_map,
        "num_instances": num_instances,
        "num_compact": num_compact,
        "num_kmax_truncated": proj.kmax_truncated,
        # dual-rate footprint pressure: gaussians needing more than ksmall
        # tiles (only the nlarge largest get them; compare against
        # config.nlarge to detect truncation)
        "num_large": (
            jnp.sum(
                (
                    jnp.minimum(proj.tiles_touched, config.kmax)
                    > config.ksmall
                ).astype(jnp.int32)
                * (proj.radius > 0).astype(jnp.int32)
            )
            if config.ksmall
            else jnp.int32(0)
        ),
        "depth": proj.depth,
    }


def visible_filter(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,  # (N, 3) linear
    rotations: jnp.ndarray,  # (N, 4) normalized
    world_view_transform: jnp.ndarray,
    full_proj_transform: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    config: RasterConfig = RasterConfig(),
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Anchor visibility prefilter: radii > 0, no blending.

    reference: GaussianRenderer::prefilter_voxel + visible_filter
    (src/gaussian_renderer.cpp:131-199, forward.cu:258-334).
    """
    cov3d = compute_cov3d(scales, rotations, 1.0)
    proj = preprocess_gaussians(
        jax.lax.stop_gradient(means3d),
        jax.lax.stop_gradient(cov3d),
        world_view_transform,
        full_proj_transform,
        width,
        height,
        tan_fovx,
        tan_fovy,
        config,
        valid_in=valid,
    )
    return proj.radius > 0
