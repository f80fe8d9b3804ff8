"""Multi-chip data parallelism over keyframes (SPMD via shard_map + psum).

The reference is strictly single-GPU (SURVEY §2.4); this is the TPU-native
scale-out: each chip renders ONE keyframe of a batch against replicated map
state, gradients/statistics are psum'd over the ICI mesh, and the replicated
Adam update is computed identically everywhere. shard_map keeps the per-chip
body literally the single-chip step body (no vmap over the Pallas kernel).

Batch axis layout:
  cam fields: (B, ...) sharded on 'dp'   gt images: (B, 3, H, W) on 'dp'
  state: replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train import optimizer
from segs_slam_tpu.train.step import DensifyStats, TrainState, _lr_tree


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
    from segs_slam_tpu.models.renderer import render
    from segs_slam_tpu.train import losses

    cap, k = model_config.capacity, model_config.n_offsets
    schedules = opt_config.lr_schedules()

    def per_chip(ts: TrainState, cam: dict, gt: jnp.ndarray, bg: jnp.ndarray):
        # cam/gt arrive with a leading local-batch dim of 1
        cam = jax.tree.map(lambda x: x[0], cam)
        gt = gt[0]
        it = ts.step + 1
        params = {"anchors": ts.anchors.params(), "decoders": ts.decoders}
        mean2d_zero = jnp.zeros((cap * k, 2), jnp.float32)

        def loss_fn(params, mean2d_offset):
            anchors = ts.anchors.replace_params(params["anchors"])
            out = render(
                anchors, params["decoders"], cam, width, height, bg,
                model_config, raster_config, mean2d_offset=mean2d_offset,
                interpret=interpret,
            )
            mask = jnp.any(gt != 0.0, axis=0, keepdims=True).astype(jnp.float32)
            img_m, gt_m = out.image * mask, gt * mask
            l1 = losses.l1_loss(img_m, gt_m)
            ssim_v = losses.ssim(img_m, gt_m)
            valid_f = out.neural.valid.astype(jnp.float32)
            reg = jnp.sum(jnp.prod(out.neural.scaling, -1) * valid_f) / jnp.maximum(
                jnp.sum(valid_f), 1.0
            )
            lam = opt_config.lambda_dssim
            loss = (1 - lam) * l1 + lam * (1 - ssim_v) + 0.01 * reg
            return loss, (l1, out)

        (loss, (l1, out)), (grads, m2g) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, mean2d_zero)

        # all-reduce over the data-parallel mesh axis (ICI collectives)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        l1 = jax.lax.pmean(l1, "dp")

        # densification stats: sum contributions across chips
        visible = out.visible_anchor_mask
        neural_op = out.neural.neural_opacity.reshape(cap, k)
        vis_f = visible.astype(jnp.float32)
        d_opacity = jax.lax.psum(vis_f * jnp.sum(jnp.maximum(neural_op, 0), 1), "dp")
        d_demon = jax.lax.psum(vis_f, "dp")
        combined = (
            jnp.repeat(visible, k) & out.neural.offset_mask & out.visibility_filter
        ).reshape(cap, k).astype(jnp.float32)
        gscale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
        gnorm = jnp.linalg.norm(m2g * gscale[None, :], axis=-1).reshape(cap, k)
        d_grad = jax.lax.psum(combined * gnorm, "dp")
        d_denom = jax.lax.psum(combined, "dp")

        in_window = (it > opt_config.start_stat) & (it < opt_config.update_until)
        gate = in_window.astype(jnp.float32)
        stats = DensifyStats(
            opacity_accum=ts.stats.opacity_accum + gate * d_opacity,
            anchor_demon=ts.stats.anchor_demon + gate * d_demon,
            offset_grad_accum=ts.stats.offset_grad_accum + gate * d_grad,
            offset_denom=ts.stats.offset_denom + gate * d_denom,
        )

        lr_tree = _lr_tree(params, schedules, it)
        active = ts.anchors.active

        def row_mask(path):
            return active if path[0].key == "anchors" else None

        new_params, new_adam = optimizer.update(
            params, grads, ts.adam, lr_tree, row_mask_fn=row_mask
        )
        new_ts = TrainState(
            anchors=ts.anchors.replace_params(new_params["anchors"]),
            decoders=new_params["decoders"],
            adam=new_adam,
            stats=stats,
            step=it,
        )
        metrics = {"loss": loss, "l1": l1}
        return new_ts, metrics

    cam_spec = {
        "world_view_transform": P("dp"),
        "full_proj_transform": P("dp"),
        "camera_center": P("dp"),
        "pose7": P("dp"),
        "tan_fovx": P("dp"),
        "tan_fovy": P("dp"),
    }
    shard_step = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), cam_spec, P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_step)
