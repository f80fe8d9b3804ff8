"""Anchor -> neural Gaussian decoding (masked, fixed-capacity, all-MXU).

Re-design of GaussianRenderer::generate_neural_gaussians
(reference: src/gaussian_renderer.cpp:214-334). The reference gathers the
visible-anchor subset with masked_select/index ops and reshapes with
cat/repeat per iteration; on TPU we decode ALL capacity slots with static
shapes — the MLPs are batched matmuls over [cap, .] so the MXU eats the
padding — and carry masks instead of gathers:

  * visibility prefilter mask (anchor radii > 0) gates densification stats
    and, multiplied into validity, skips invisible anchors' gaussians;
  * the neural-opacity > 0 mask (the reference's `mask`) combines with the
    anchor active mask into the per-gaussian `valid` fed to the rasterizer.

Outputs are FLAT [cap*K] neural-gaussian arrays in (anchor-major, offset)
order, identical to the reference's reshape({-1, ...}) layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from segs_slam_tpu.models.anchors import AnchorState
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import DecoderApply


class NeuralGaussians(NamedTuple):
    xyz: jnp.ndarray  # (cap*K, 3)
    color: jnp.ndarray  # (cap*K, 3)
    opacity: jnp.ndarray  # (cap*K,)
    scaling: jnp.ndarray  # (cap*K, 3) linear
    rotation: jnp.ndarray  # (cap*K, 4) normalized
    valid: jnp.ndarray  # (cap*K,) bool — active & visible & opacity>0
    neural_opacity: jnp.ndarray  # (cap*K,) raw tanh output (for stats)
    offset_mask: jnp.ndarray  # (cap*K,) bool — the reference's `mask`


def generate_neural_gaussians(
    state: AnchorState,
    decoder_params: dict,
    camera_center: jnp.ndarray,  # (3,)
    pose7: jnp.ndarray,  # (7,) tx,ty,tz,qw,qx,qy,qz
    visible_mask: jnp.ndarray,  # (cap,) bool from the voxel prefilter
    config: ModelConfig,
) -> NeuralGaussians:
    cap, k = state.capacity, config.n_offsets

    feat = state.feat  # (cap, F)
    anchor = state.anchor
    grid_scaling = jnp.exp(state.scaling)  # (cap, 6)

    ob_view = anchor - camera_center[None, :]
    # safe norm: plain norm has a nan gradient at exactly 0, which inactive
    # (zero-padded) anchor slots can hit when the camera is at the origin
    ob_dist = jnp.sqrt(jnp.sum(ob_view * ob_view, axis=-1, keepdims=True) + 1e-12)
    ob_view = ob_view / ob_dist

    if config.use_feat_bank:
        # reference: src/gaussian_renderer.cpp:236-249 — blend the feature
        # at 3 decimations (::4, ::2, ::1) with softmax weights.
        cat_view = jnp.concatenate([ob_view, ob_dist], axis=-1)
        bank = DecoderApply.feat_bank(decoder_params, cat_view)  # (cap, 3)
        f4 = jnp.repeat(feat[:, ::4], 4, axis=1)[:, : feat.shape[1]]
        f2 = jnp.repeat(feat[:, ::2], 2, axis=1)[:, : feat.shape[1]]
        feat = (
            f4 * bank[:, 0:1] + f2 * bank[:, 1:2] + feat * bank[:, 2:3]
        )

    cat_local = jnp.concatenate([feat, ob_view], axis=-1)
    cat_local_dist = jnp.concatenate([feat, ob_view, ob_dist], axis=-1)

    op_in = cat_local_dist if config.add_opacity_dist else cat_local
    neural_opacity = DecoderApply.opacity(decoder_params, op_in)  # (cap, K)
    offset_mask = neural_opacity > 0.0

    color_in = cat_local_dist if config.add_color_dist else cat_local
    if config.appearance_dim > 0:
        app = DecoderApply.appearance(decoder_params, pose7[None, :])  # (1, A)
        app = jnp.broadcast_to(app, (cap, app.shape[-1]))
        color_in = jnp.concatenate([color_in, app], axis=-1)
    color = DecoderApply.color(decoder_params, color_in)  # (cap, 3K)
    color = color.reshape(cap * k, 3)

    cov_in = cat_local_dist if config.add_cov_dist else cat_local
    scale_rot = DecoderApply.cov(decoder_params, cov_in).reshape(cap * k, 7)

    # xyz = anchor + offset * scaling[:3]; scaling = scaling[3:] * sigmoid(sr)
    # (reference: src/gaussian_renderer.cpp:301-333)
    scaling = jnp.repeat(grid_scaling[:, 3:6], k, axis=0) * jax.nn.sigmoid(
        scale_rot[:, :3]
    )
    rot_raw = scale_rot[:, 3:7]
    rot = rot_raw / jnp.sqrt(
        jnp.sum(rot_raw * rot_raw, axis=-1, keepdims=True) + 1e-24
    )

    offsets = state.offset.reshape(cap * k, 3)
    xyz = jnp.repeat(anchor, k, axis=0) + offsets * jnp.repeat(
        grid_scaling[:, 0:3], k, axis=0
    )

    active_k = jnp.repeat(state.active & visible_mask, k, axis=0)
    valid = active_k & offset_mask.reshape(-1)

    return NeuralGaussians(
        xyz=xyz,
        color=color,
        opacity=neural_opacity.reshape(-1),
        scaling=scaling,
        rotation=rot,
        valid=valid,
        neural_opacity=neural_opacity.reshape(-1),
        offset_mask=offset_mask.reshape(-1),
    )
