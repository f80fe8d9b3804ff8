"""Dense differentiable blend — O(pixels x gaussians) pure JAX.

Identical compositing semantics to the Pallas tile kernel (same accept
mask/cumprod closed form, same tile-membership binning), written as one dense
[Npix, N] computation so JAX autodiff provides exact reference gradients for
testing the custom VJP. Only usable on tiny scenes.
"""

from __future__ import annotations

import jax.numpy as jnp

from segs_slam_tpu.ops.rasterizer.preprocess import (
    RasterConfig,
    compute_cov3d,
    preprocess_gaussians,
)


def rasterize_dense(
    means3d,
    scales,
    rotations,
    opacities,
    colors,
    world_view_transform,
    full_proj_transform,
    width,
    height,
    tan_fovx,
    tan_fovy,
    bg,
    config: RasterConfig = RasterConfig(),
    valid=None,
    mean2d_offset=None,
):
    opacities = opacities.reshape(-1)
    cov3d = compute_cov3d(scales, rotations, 1.0)
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

    n = means3d.shape[0]
    # Stable global depth order; restricted per tile it equals the
    # (tile, depth) instance sort order of the production binning.
    order = jnp.argsort(proj.depth, stable=True)
    mean2d_s = mean2d[order]
    conic_s = proj.conic[order]
    op_s = opacities[order]
    col_s = colors[order]
    rect_min_s = proj.rect_min[order]
    rect_max_s = proj.rect_max[order]
    alive_s = proj.radius[order] > 0

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    px = xs.reshape(-1, 1)  # [P, 1]
    py = ys.reshape(-1, 1)
    tile_x = (px // config.tile).astype(jnp.int32)
    tile_y = (py // config.tile).astype(jnp.int32)

    member = (
        alive_s[None, :]
        & (tile_x >= rect_min_s[None, :, 0])
        & (tile_x < rect_max_s[None, :, 0])
        & (tile_y >= rect_min_s[None, :, 1])
        & (tile_y < rect_max_s[None, :, 1])
    )  # [P, N]

    dx = mean2d_s[None, :, 0] - px
    dy = mean2d_s[None, :, 1] - py
    a, b, c = conic_s[:, 0], conic_s[:, 1], conic_s[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(config.alpha_clamp, op_s[None] * G)
    ok = member & (power <= 0.0) & (alpha >= config.alpha_min)
    alpha = jnp.where(ok, alpha, 0.0)

    om = 1.0 - alpha
    cum = jnp.cumprod(om, axis=1)
    accept = cum >= config.transmittance_min  # T_in = 1
    t_before = cum / om
    w = jnp.where(accept, alpha * t_before, 0.0)  # [P, N]
    color = w @ col_s  # [P, 3]
    depth_map = w @ proj.depth[order]  # expected depth sum_i w_i d_i
    final_t = jnp.prod(jnp.where(accept, om, 1.0), axis=1)
    color = color + final_t[:, None] * bg[None, :]

    image = color.T.reshape(3, height, width)
    return {
        "image": image,
        "final_T": final_t.reshape(height, width),
        "depth_map": depth_map.reshape(height, width),
        "radii": proj.radius,
    }
