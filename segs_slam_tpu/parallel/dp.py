"""Multi-chip data parallelism over keyframes (SPMD via shard_map + psum).

The reference is strictly single-GPU (SURVEY §2.4); this is the TPU-native
scale-out: each chip renders ONE keyframe of a batch against replicated map
state, gradients are pmean'd and densification statistics psum'd over the ICI
mesh, and the replicated Adam update is computed identically everywhere.

The per-chip body IS the single-chip step (train/step.py make_train_step with
axis_name="dp") — same losses, same gradient sanitization, same metrics — so
the two paths cannot drift.

Batch axis layout:
  cam fields: (B, ...) sharded on 'dp'   gt images: (B, 3, H, W) on 'dp'
  state: replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.step import make_train_step

CAM_SPEC = {
    "world_view_transform": P("dp"),
    "full_proj_transform": P("dp"),
    "camera_center": P("dp"),
    "pose7": P("dp"),
    "tan_fovx": P("dp"),
    "tan_fovy": P("dp"),
    "projection_matrix": P("dp"),
}


def make_dp_train_step(
    mesh: Mesh,
    model_config: ModelConfig,
    opt_config: OptimizationConfig,
    raster_config: RasterConfig,
    width: int,
    height: int,
    interpret: bool | None = None,
):
    """Returns step(ts, cam_batch, gt_batch, bg) -> (ts, metrics), jitted
    over `mesh` with the batch sharded on the 'dp' axis."""
    body = make_train_step(
        model_config, opt_config, raster_config, width, height,
        interpret=interpret, axis_name="dp",
    )

    def per_chip(ts, cam, gt, bg):
        # cam/gt arrive with a leading local-batch dim of 1
        cam = jax.tree.map(lambda x: x[0], cam)
        return body(ts, cam, gt[0], bg)

    shard_step = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), CAM_SPEC, P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_step)
