"""The jitted training step: render -> loss -> backward -> stats -> Adam.

One fused function of fixed shapes = the whole of
GaussianMapper::trainForOneIteration's device work (reference:
src/gaussian_mapper.cpp:823-1031) minus the densify trigger (see densify.py,
invoked by the host loop every update_interval iterations). Where the
reference synchronizes the device every iteration
(src/gaussian_mapper.cpp:953), this step is one async dispatch; the host only
syncs at queue/metric boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from segs_slam_tpu.models.anchors import AnchorState
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train import losses, optimizer
from segs_slam_tpu.train.config import OptimizationConfig


class DensifyStats(NamedTuple):
    """Densification statistics (reference: include/gaussian_model.h
    opacity_accum / anchor_demon / offset_gradient_accum / offset_denom,
    updated by training_statis, src/gaussian_model.cpp:1459-1503)."""

    opacity_accum: jnp.ndarray  # (cap,)
    anchor_demon: jnp.ndarray  # (cap,)
    offset_grad_accum: jnp.ndarray  # (cap, K)
    offset_denom: jnp.ndarray  # (cap, K)

    @staticmethod
    def zeros(cap: int, k: int) -> "DensifyStats":
        return DensifyStats(
            opacity_accum=jnp.zeros((cap,), jnp.float32),
            anchor_demon=jnp.zeros((cap,), jnp.float32),
            offset_grad_accum=jnp.zeros((cap, k), jnp.float32),
            offset_denom=jnp.zeros((cap, k), jnp.float32),
        )


class TrainState(NamedTuple):
    anchors: AnchorState
    decoders: dict
    adam: optimizer.AdamState
    stats: DensifyStats
    step: jnp.ndarray  # () int32
    # per-keyframe SE3 tangent deltas (omega, upsilon), row-assigned by the
    # trainer: in-step photometric pose optimization (beyond reference — the
    # reference takes SLAM poses as given; a differentiable renderer makes
    # them free parameters). Zero rows = identity. Shape (max_kfs, 6);
    # (0, 6) when pose optimization is off.
    pose: jnp.ndarray
    # stop-gradient EMA of each pose row (pose_prior_mode="ema"): the prior
    # anchor that damps Adam's noise-driven random walk without biasing the
    # photometric equilibrium toward the SLAM base pose. Same shape as pose.
    pose_ema: jnp.ndarray

    @property
    def pose_rows(self) -> int:
        return self.pose.shape[0]


def init_train_state(anchors: AnchorState, decoders: dict,
                     config: ModelConfig, max_pose_kfs: int = 0) -> TrainState:
    pose = jnp.zeros((max_pose_kfs, 6), jnp.float32)
    params = {"anchors": anchors.params(), "decoders": decoders, "pose": pose}
    return TrainState(
        anchors=anchors,
        decoders=decoders,
        adam=optimizer.init(params),
        stats=DensifyStats.zeros(config.capacity, config.n_offsets),
        step=jnp.zeros((), jnp.int32),
        pose=pose,
        pose_ema=pose,
    )


_DECODER_GROUP = {
    "opacity": "mlp_opacity",
    "cov": "mlp_cov",
    "color": "mlp_color",
    "appearance": "appearance",
    "embedding": "appearance",
    "feat_bank": "mlp_featurebank",
}


def _lr_tree(params: dict, schedules: dict, step) -> dict:
    """Build a pytree of scalar LRs matching `params` from path->schedule."""

    def assign(path, _leaf):
        top = path[0].key
        if top == "anchors":
            return schedules[path[1].key](step)
        if top == "pose":
            return schedules["pose"](step)
        return schedules[_DECODER_GROUP[path[1].key]](step)

    return jax.tree_util.tree_map_with_path(assign, params)


def apply_pose_delta(cam: dict, delta: jnp.ndarray) -> dict:
    """Left-multiply exp(delta) onto the camera's world-to-view transform.

    delta = (omega[3], upsilon[3]) in the SE3 tangent at the current pose.
    The appearance input `pose7` is intentionally held at the base pose so
    pose gradients flow through geometry, not through the appearance MLP's
    color modulation (same reasoning as Trainer.refine_keyframe_pose).
    """
    w, v = delta[:3], delta[3:]
    # smooth at w=0: plain norm has a NaN gradient there
    th = jnp.sqrt(jnp.sum(w * w) + 1e-16)
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    R = (jnp.eye(3) + jnp.sin(th) / th * K
         + (1 - jnp.cos(th)) / th**2 * (K @ K))
    W2C0 = cam["world_view_transform"].T
    Rn = R @ W2C0[:3, :3]
    tn = R @ W2C0[:3, 3] + v
    W2C = jnp.eye(4).at[:3, :3].set(Rn).at[:3, 3].set(tn)
    wvt = W2C.T
    out = dict(cam)
    out["world_view_transform"] = wvt
    out["full_proj_transform"] = wvt @ cam["projection_matrix"]
    out["camera_center"] = -Rn.T @ tn
    return out


def make_train_step(
    model_config: ModelConfig,
    opt_config: OptimizationConfig,
    raster_config: RasterConfig,
    width: int,
    height: int,
    interpret: bool | None = None,
    axis_name: str | None = None,
):
    """Build the fused train step.

    With ``axis_name`` set, the returned function is the per-chip SPMD body
    for a data-parallel mesh (see parallel/dp.py): losses/gradients are
    pmean'd and densification-statistic contributions psum'd over that axis
    before the (replicated) Adam update — each chip renders its own keyframe
    against replicated map state, so one dp step over B chips accumulates
    stats like B sequential single-chip iterations.
    """
    cap, k = model_config.capacity, model_config.n_offsets
    schedules = opt_config.lr_schedules()
    freq_scales = tuple(1.0 / 2**i for i in range(opt_config.scale_num))

    def step_fn(ts: TrainState, cam: dict, gt_image: jnp.ndarray,
                bg: jnp.ndarray, kf_row=None, gt_depth=None):
        it = ts.step + 1

        params = {"anchors": ts.anchors.params(), "decoders": ts.decoders,
                  "pose": ts.pose}
        mean2d_zero = jnp.zeros((cap * k, 2), jnp.float32)
        # in-step pose optimization engages when the state carries pose rows
        # AND the caller identifies the keyframe's row
        opt_pose = ts.pose.shape[0] > 0 and kf_row is not None

        def loss_fn(params, mean2d_offset):
            anchors = ts.anchors.replace_params(params["anchors"])
            cam_used = (
                apply_pose_delta(cam, params["pose"][kf_row])
                if opt_pose else cam
            )
            out = render(
                anchors,
                params["decoders"],
                cam_used,
                width,
                height,
                bg,
                model_config,
                raster_config,
                mean2d_offset=mean2d_offset,
                interpret=interpret,
            )
            img = out.image

            # mask of non-black gt pixels (reference:
            # src/gaussian_mapper.cpp:917-922)
            mask_rgb = jnp.any(gt_image != 0.0, axis=0, keepdims=True).astype(
                jnp.float32
            )
            img_m = img * mask_rgb
            gt_m = gt_image * mask_rgb

            l1 = losses.l1_loss(img_m, gt_m)
            ssim_v = losses.ssim(img_m, gt_m)
            # scaling regularizer over the rendered gaussians
            valid_f = out.neural.valid.astype(jnp.float32)
            prod = jnp.prod(out.neural.scaling, axis=-1)
            scaling_reg = jnp.sum(prod * valid_f) / jnp.maximum(
                jnp.sum(valid_f), 1.0
            )

            lam = opt_config.lambda_dssim
            loss = (1.0 - lam) * l1 + lam * (1.0 - ssim_v) + 0.01 * scaling_reg
            if opt_config.lambda_depth > 0.0 and gt_depth is not None:
                # sensor-depth supervision (OptimizationConfig.lambda_depth):
                # alpha-normalized expected depth vs sensor depth over
                # confident, valid pixels, in relative-depth units
                opac_img = 1.0 - out.final_T
                dr = out.depth_map / jnp.maximum(opac_img, 1e-6)
                dm = ((gt_depth > 0.0) & (opac_img > 0.5)).astype(jnp.float32)
                dl1 = jnp.sum(
                    jnp.abs(dr - gt_depth) / jnp.maximum(gt_depth, 0.1) * dm
                ) / jnp.maximum(jnp.sum(dm), 1.0)
                loss = loss + opt_config.lambda_depth * dl1
            if opt_pose:
                # L2 prior damping the delta's random walk (see
                # OptimizationConfig.pose_prior / pose_prior_mode)
                anchor_pt = (
                    jax.lax.stop_gradient(ts.pose_ema[kf_row])
                    if opt_config.pose_prior_mode == "ema"
                    else 0.0
                )
                loss = loss + opt_config.pose_prior * jnp.sum(
                    (params["pose"][kf_row] - anchor_pt) ** 2)

            if opt_config.use_frequency_regularization:
                # lax.cond so the FFTs (and their grads) only run inside the
                # schedule window — both faster and safe: an always-computed
                # branch at zero weight still back-propagates its NaNs.
                in_low = it < opt_config.frequency_regulization_until
                in_high = in_low & (
                    it > opt_config.high_frequency_regularization_start
                )
                if opt_config.lambda_frequency_low != 0.0:
                    loss = loss + opt_config.lambda_frequency_low * jax.lax.cond(
                        in_low,
                        lambda: losses.low_freq_loss(img_m, gt_m),
                        lambda: jnp.zeros(()),
                    )
                if opt_config.use_multi_resolution:
                    fl_fn = lambda: losses.multi_scale_loss(img_m, gt_m, freq_scales)
                else:
                    fl_fn = lambda: losses.high_frequency_loss(img_m, gt_m)
                loss = loss + opt_config.lambda_frequency_high * jax.lax.cond(
                    in_high, fl_fn, lambda: jnp.zeros(())
                )

            aux = {
                "l1": l1,
                "ssim": ssim_v,
                "psnr": losses.psnr(img_m, gt_m),
                "out": out,
            }
            return loss, aux

        (loss, aux), (grads, mean2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, mean2d_zero)
        out = aux["out"]

        # Gradient sanitization (failure hardening, SURVEY §5.3): a single
        # non-finite gradient would poison the Adam second moments forever
        # (inf nu silently freezes the row; nan kills it). Zero them and
        # surface the count so regressions are visible in metrics.
        def _clean(g):
            return jnp.where(jnp.isfinite(g), g, 0.0)

        nonfinite = sum(
            jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        ) + jnp.sum(~jnp.isfinite(mean2d_grad))
        grads = jax.tree.map(_clean, grads)
        mean2d_grad = _clean(mean2d_grad)

        if axis_name is not None:
            # Sanitize per-chip FIRST (above), so one chip's NaN cannot
            # poison the cross-chip reduction; then average the model grads
            # for the replicated Adam update. mean2d_grad stays per-chip:
            # densify statistics below are per-keyframe contributions that
            # get psum'd, matching B sequential reference iterations
            # (training_statis, src/gaussian_model.cpp:1459-1503).
            grads = jax.lax.pmean(grads, axis_name)
            nonfinite = jax.lax.psum(nonfinite, axis_name)

        # --- densification statistics (training_statis,
        # src/gaussian_model.cpp:1459-1503), gated on the stats window ---
        in_window = (it > opt_config.start_stat) & (it < opt_config.update_until)
        gate = in_window.astype(jnp.float32)

        visible = out.visible_anchor_mask  # (cap,)
        neural_op = out.neural.neural_opacity.reshape(cap, k)
        temp_op = jnp.maximum(neural_op, 0.0)
        vis_f = visible.astype(jnp.float32)
        d_opacity = gate * vis_f * jnp.sum(temp_op, axis=1)
        d_demon = gate * vis_f

        # combined mask: anchor visible & neural opacity > 0 & rendered
        combined = (
            jnp.repeat(visible, k)
            & out.neural.offset_mask
            & out.visibility_filter
        ).reshape(cap, k)
        # viewspace grad in the reference's NDC-ish units: dL/dpix * (W/2, H/2)
        # (backward.cu ddelx_dx = 0.5*W, ddely_dy = 0.5*H)
        gscale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
        gnorm = jnp.linalg.norm(mean2d_grad * gscale[None, :], axis=-1).reshape(cap, k)
        cf = combined.astype(jnp.float32) * gate
        d_grad = cf * gnorm
        d_denom = cf

        if axis_name is not None:
            d_opacity, d_demon, d_grad, d_denom = jax.lax.psum(
                (d_opacity, d_demon, d_grad, d_denom), axis_name
            )

        stats = ts.stats
        new_stats = DensifyStats(
            opacity_accum=stats.opacity_accum + d_opacity,
            anchor_demon=stats.anchor_demon + d_demon,
            offset_grad_accum=stats.offset_grad_accum + d_grad,
            offset_denom=stats.offset_denom + d_denom,
        )

        # --- Adam ---
        lr_tree = _lr_tree(params, schedules, it)
        active = ts.anchors.active

        # pose rows: only the rendered keyframe's row may move (zero grads
        # elsewhere would still decay that row's Adam moments into drift).
        # Under dp the per-chip masks differ, so OR them across the axis:
        # grads were pmean'd, so every chip applies the identical update.
        if opt_pose:
            pose_mask = jnp.arange(ts.pose.shape[0]) == kf_row
            # late-start gate: freeze the deltas until the map has converged
            # (the ablation matrix showed the damage is the EARLY transient —
            # big map-error gradients drag the deltas before the map can
            # disambiguate pose error from its own error; the stationary
            # phase is harmless under amsmax). 0 = from the start.
            if opt_config.pose_opt_start > 0:
                pose_mask = pose_mask & (it >= opt_config.pose_opt_start)
            if axis_name is not None:
                pose_mask = jax.lax.psum(
                    pose_mask.astype(jnp.float32), axis_name) > 0
        else:
            pose_mask = jnp.zeros((ts.pose.shape[0],), bool)

        def row_mask(path):
            if path[0].key == "anchors":
                return active
            if path[0].key == "pose":
                return pose_mask
            return None

        def opt_mode(path):
            # pose group may use a non-Adam family: Adam's scale-free steps
            # random-walk the deltas ~lr/visit at the photometric optimum
            # (the measured 2.7 dB map blur, RESULTS.md ablation matrix)
            if path[0].key == "pose":
                return opt_config.pose_opt_mode
            return "adam"

        new_params, new_adam = optimizer.update(
            params, grads, ts.adam, lr_tree, row_mask_fn=row_mask,
            mode_fn=opt_mode,
        )

        new_anchors = ts.anchors.replace_params(new_params["anchors"])
        if opt_pose and opt_config.pose_prior_mode == "ema":
            dec = opt_config.pose_ema_decay
            new_ema = jnp.where(
                pose_mask[:, None],
                dec * ts.pose_ema + (1.0 - dec) * new_params["pose"],
                ts.pose_ema,
            )
        else:
            new_ema = ts.pose_ema
        new_ts = TrainState(
            anchors=new_anchors,
            decoders=new_params["decoders"],
            adam=new_adam,
            stats=new_stats,
            step=it,
            pose=new_params["pose"],
            pose_ema=new_ema,
        )
        metrics = {
            "loss": loss,
            "l1": aux["l1"],
            "psnr": aux["psnr"],
            "ssim": aux["ssim"],
            "num_instances": out.num_instances,
            "n_active": ts.anchors.num_active(),
            "nonfinite_grads": nonfinite,
            # capacity-pressure counters: visible gaussians beyond the static
            # `compact` cap are silently dropped (with their gradients), and
            # oversized footprints are shrunk to kmax tiles — both must be
            # observable (advisor finding r1; binning.py:59-108,
            # preprocess.py:251-272)
            "num_compact": out.num_compact,
            "num_kmax_truncated": out.num_kmax_truncated,
        }
        if axis_name is not None:
            for key in ("loss", "l1", "psnr", "ssim"):
                metrics[key] = jax.lax.pmean(metrics[key], axis_name)
            for key in ("num_instances", "num_compact", "num_kmax_truncated"):
                metrics[key] = jax.lax.pmax(metrics[key], axis_name)
        return new_ts, metrics

    return step_fn
