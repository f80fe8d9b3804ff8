"""Full-model render: prefilter -> neural-gaussian decode -> rasterize.

Equivalent of GaussianRenderer::render + prefilter_voxel
(reference: src/gaussian_renderer.cpp:19-199) as one jittable function over
the fixed-capacity state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from segs_slam_tpu.models.anchors import AnchorState
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.neural_gaussians import NeuralGaussians, generate_neural_gaussians
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize, visible_filter


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # (3, H, W)
    radii: jnp.ndarray  # (cap*K,)
    visibility_filter: jnp.ndarray  # (cap*K,) bool — radii > 0
    neural: NeuralGaussians
    visible_anchor_mask: jnp.ndarray  # (cap,)
    num_instances: jnp.ndarray
    num_compact: jnp.ndarray  # () int32 — visible gaussians before the
    #   static `compact` cap (overflow drops gaussians + their grads)
    num_kmax_truncated: jnp.ndarray  # () int32 — footprints shrunk to kmax


def render(
    state: AnchorState,
    decoder_params: dict,
    cam: dict,  # keyframe render_inputs(): transforms + pose7 + tan_fov
    width: int,
    height: int,
    bg: jnp.ndarray,
    model_config: ModelConfig,
    raster_config: RasterConfig,
    mean2d_offset: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> RenderOutput:
    # Anchor visibility prefilter (reference: prefilter_voxel uses the
    # anchors with scaling[:, :3] and normalized rotations).
    grid_scale3 = jnp.exp(state.scaling[:, :3])
    rotation = state.rotation / jnp.maximum(
        jnp.linalg.norm(state.rotation, axis=-1, keepdims=True), 1e-12
    )
    visible = visible_filter(
        state.anchor,
        grid_scale3,
        rotation,
        cam["world_view_transform"],
        cam["full_proj_transform"],
        width,
        height,
        cam["tan_fovx"],
        cam["tan_fovy"],
        config=raster_config,
        valid=state.active,
    )

    neural = generate_neural_gaussians(
        state,
        decoder_params,
        cam["camera_center"],
        cam["pose7"],
        visible,
        model_config,
    )

    out = rasterize(
        neural.xyz,
        neural.scaling,
        neural.rotation,
        neural.opacity,
        neural.color,
        cam["world_view_transform"],
        cam["full_proj_transform"],
        width,
        height,
        cam["tan_fovx"],
        cam["tan_fovy"],
        bg,
        config=raster_config,
        valid=neural.valid,
        mean2d_offset=mean2d_offset,
        interpret=interpret,
    )

    return RenderOutput(
        image=out["image"],
        radii=out["radii"],
        visibility_filter=out["radii"] > 0,
        neural=neural,
        visible_anchor_mask=visible,
        num_instances=out["num_instances"],
        num_compact=out["num_compact"],
        num_kmax_truncated=out["num_kmax_truncated"],
    )


def project_to_image(
    state: AnchorState,
    decoder_params: dict,
    cam: dict,
    width: int,
    height: int,
    model_config: ModelConfig,
    raster_config: RasterConfig,
):
    """Debug 2D projection: per neural gaussian (mean2d, radius, color).

    Equivalent of GaussianRenderer::gaussians_project2_image /
    RasterizeGaussiansprojectCUDA (reference: src/gaussian_renderer.cpp:
    336-423, rasterizer_impl.cu:571-585) used for the mapper's debug ellipse
    overlays; here it is just the preprocess outputs, no device-to-host
    copies needed until the caller asks.
    """
    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    grid_scale3 = jnp.exp(state.scaling[:, :3])
    rotation = state.rotation / jnp.maximum(
        jnp.linalg.norm(state.rotation, axis=-1, keepdims=True), 1e-12
    )
    visible = visible_filter(
        state.anchor, grid_scale3, rotation,
        cam["world_view_transform"], cam["full_proj_transform"],
        width, height, cam["tan_fovx"], cam["tan_fovy"],
        config=raster_config, valid=state.active,
    )
    neural = generate_neural_gaussians(
        state, decoder_params, cam["camera_center"], cam["pose7"], visible,
        model_config,
    )
    cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
    proj = preprocess_gaussians(
        neural.xyz, cov3d, cam["world_view_transform"],
        cam["full_proj_transform"], width, height,
        cam["tan_fovx"], cam["tan_fovy"], raster_config,
        valid_in=neural.valid,
    )
    return {
        "points2d": proj.mean2d,
        "radii": proj.radius,
        "color": neural.color,
        "valid": neural.valid & (proj.radius > 0),
    }
