"""Top-level differentiable tile rasterizer.

Pipeline (replacing CudaRasterizer::Rasterizer::forward/backward,
reference: cuda_rasterizer/rasterizer_impl.cu:198-416):

    preprocess (JAX, autodiff)                       forward.cu:154-256
      -> binning (XLA sort/searchsorted, no grad)    rasterizer_impl.cu:276-308
      -> per-instance feature gather (JAX; its VJP
         IS the atomic-free gradient scatter)        backward.cu atomics
      -> Pallas tile blend (custom VJP)              forward.cu:339-452

Everything except the blend kernel is ordinary JAX, so gradients to
means3d/scales/rotations/opacities/colors flow through JAX autodiff and the
one custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from segs_slam_tpu.ops.rasterizer import blend as blend_mod
from segs_slam_tpu.ops.rasterizer.binning import bin_gaussians
from segs_slam_tpu.ops.rasterizer.blend import NFEAT, tile_blend
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
):
    """Returns dict with image (3, H, W), radii (N,), final_T, n_contrib,
    num_instances."""
    if interpret is None:
        interpret = _auto_interpret()
    if not interpret and config.chunk % 128 != 0:
        raise ValueError(
            "compiled TPU blend requires chunk % 128 == 0 (DMA slices along "
            f"the lane dimension must be 128-aligned); got {config.chunk}"
        )
    opacities = opacities.reshape(-1)

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

    binning = bin_gaussians(proj, width, height, config)

    n = means3d.shape[0]
    pad_cols = NFEAT - 9
    feats = jnp.concatenate(
        [
            mean2d,
            proj.conic,
            opacities[:, None],
            colors,
            jnp.zeros((n, pad_cols), jnp.float32),
        ],
        axis=-1,
    ).T  # (16, N): features on sublanes, gaussians on lanes

    # (16, cap_aligned); the VJP of this gather is the per-gaussian
    # gradient segment-sum (replaces the CUDA backward's atomics).
    inst_feats = feats[:, binning.gauss_id]

    tx, ty = config.grid(width, height)
    npix = config.tile * config.tile
    static = (config, tx, ty, npix, interpret)
    bg_col = bg.reshape(3, 1).astype(jnp.float32)
    color, final_t, ncontrib = tile_blend(
        inst_feats, bg_col, binning.seg_start, binning.seg_count,
        binning.slot_tile, static
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

    return {
        "image": image,
        "radii": proj.radius,
        "final_T": final_t_img,
        "n_contrib": ncontrib_img,
        "num_instances": binning.num_instances,
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
