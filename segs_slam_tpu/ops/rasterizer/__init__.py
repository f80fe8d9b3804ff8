from segs_slam_tpu.ops.rasterizer.preprocess import (
    RasterConfig,
    compute_cov3d,
    preprocess_gaussians,
)
from segs_slam_tpu.ops.rasterizer.rasterize import rasterize, visible_filter

__all__ = [
    "RasterConfig",
    "compute_cov3d",
    "preprocess_gaussians",
    "rasterize",
    "visible_filter",
]
