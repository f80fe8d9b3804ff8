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
    depth_map: jnp.ndarray  # (H, W) expected depth sum_i w_i d_i (NOT
    #   alpha-normalized; divide by opacity = 1 - final_T to compare with
    #   sensor depth)
    final_T: jnp.ndarray  # (H, W) remaining transmittance


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
        depth_map=out["depth_map"],
        final_T=out["final_T"],
    )


class EvalRenderer:
    """Eval-only render: ONE fused jit (decode + project + packed blend).

    Round-3 true-sync measurements (PERF_NOTES.md) overturned the round-2
    chained-stage design: with genuine completion timing the fused single
    dispatch is the fastest eval path (16.1 ms vs 18.4 ms chained at the
    full 65k-anchor point) — fusing decode+project into the blend jit lets
    XLA eliminate the [cap*K, 3/4] stage-boundary materializations
    (~6.5 ms) and saves two tunnel dispatch overheads (~1.5 ms).

    Uses the packed binning sorts (binning.py packed section) — eval only,
    not differentiable; the training path keeps the fused render() with
    full-f32 sorts.
    """

    def __init__(self, model_config: ModelConfig, raster_config: RasterConfig,
                 width: int, height: int, bg: jnp.ndarray,
                 interpret: bool | None = None, packed: bool = True):
        import jax

        from segs_slam_tpu.ops.rasterizer.blend import (
            binned_blend,
            binned_blend_eval,
        )
        from segs_slam_tpu.ops.rasterizer.preprocess import (
            compute_cov3d,
            preprocess_gaussians,
        )

        mc, rc = model_config, raster_config
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        tx, ty = rc.grid(width, height)
        npix = rc.tile * rc.tile
        static = (rc, tx, ty, npix, interpret)
        bg = jnp.asarray(bg, jnp.float32)
        # packed needs 16px tiles, <=63 tile columns (rect_w packs into 6
        # bits) and kmax <= 31 (touched packs into 5 bits)
        blend_fn = (binned_blend_eval
                    if packed and rc.tile == 16 and tx <= 63
                    and rc.kmax <= 31 else binned_blend)

        def _render_body(anchors, decoders, cam):
            grid_scale3 = jnp.exp(anchors.scaling[:, :3])
            rotation = anchors.rotation / jnp.maximum(
                jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True),
                1e-12)
            visible = visible_filter(
                anchors.anchor, grid_scale3, rotation,
                cam["world_view_transform"], cam["full_proj_transform"],
                width, height, cam["tan_fovx"], cam["tan_fovy"],
                config=rc, valid=anchors.active)
            neural = generate_neural_gaussians(
                anchors, decoders, cam["camera_center"], cam["pose7"],
                visible, mc)
            cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
            pr = preprocess_gaussians(
                neural.xyz, cov3d, cam["world_view_transform"],
                cam["full_proj_transform"], width, height,
                cam["tan_fovx"], cam["tan_fovy"], rc,
                valid_in=neural.valid)
            feats = (pr.mean2d[:, 0], pr.mean2d[:, 1], pr.conic[:, 0],
                     pr.conic[:, 1], pr.conic[:, 2],
                     neural.opacity.reshape(-1), neural.color[:, 0],
                     neural.color[:, 1], neural.color[:, 2])
            aux = {
                "rect_min_x": pr.rect_min[:, 0],
                "rect_min_y": pr.rect_min[:, 1],
                "rect_w": pr.rect_max[:, 0] - pr.rect_min[:, 0],
                "touched": pr.tiles_touched.astype(jnp.int32),
                "depth": pr.depth,
                "alive": pr.radius > 0,
            }
            color, *_ = blend_fn(feats, aux, bg, static)
            b = rc.tile
            return (color.reshape(ty, tx, 3, b, b)
                    .transpose(2, 0, 3, 1, 4)
                    .reshape(3, ty * b, tx * b)[:, :height, :width])

        import jax as _jax
        from jax import lax as _lax

        self._render = _jax.jit(_render_body)

        # Batched form: render a STACK of cameras (every leaf of `cams` has
        # a leading batch axis) in ONE jit dispatch. lax.map compiles the
        # body once and runs it B times on-device, so the ~1-2.5 ms tunnel
        # dispatch overhead (PERF_NOTES.md) is paid once per batch instead
        # of once per frame.
        @_jax.jit
        def _render_batch(anchors, decoders, cams):
            return _lax.map(lambda c: _render_body(anchors, decoders, c),
                            cams)

        self._render_batch = _render_batch

    def __call__(self, anchors, decoders, cam):
        return self._render(anchors, decoders, cam)

    def render_batch(self, anchors, decoders, cams_stacked):
        """One dispatch over a stacked cam pytree -> (B, 3, H, W)."""
        return self._render_batch(anchors, decoders, cams_stacked)

    def jits(self):
        return (self._render,)


def calibrate_eval_config(raster_config: RasterConfig,
                          model_config: ModelConfig,
                          anchors: AnchorState,
                          decoders: dict,
                          cams: list[dict],
                          width: int, height: int,
                          headroom: float = 2.0) -> RasterConfig:
    """Size the packed-eval tier prefixes (nmid/nlarge) from the MAP'S OWN
    footprint distribution instead of fixed compact fractions.

    The tiered expansion drops tile coverage for any gaussian whose
    footprint exceeds its tier's budget — harmless when the nmid/nlarge
    prefixes cover every gaussian with touched > ksmall/kmid, and a
    uniform dimming haze when they don't (measured: the compact//8 static
    formula cost 12 dB on a REAL trained 8k-iteration map whose footprint
    distribution is far heavier than the random synthetic maps the sweep
    validated on). A one-off host pre-pass renders nothing: it runs the
    decode+preprocess jit on a few representative cameras, counts
    footprints above each tier threshold, and bakes 2x-headroom
    power-of-two prefix sizes into the returned static config — shapes
    stay static per compile, sizes fit the actual map (XLA-idiomatic
    host-side shape selection). Falls back to eval_variant's formula
    sizes as a floor.
    """
    import math

    import jax

    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    rc = raster_config.eval_variant(width, height)
    if not rc.sel_direct:
        return rc  # packed path not applicable; nothing to calibrate

    @jax.jit
    def _counts(anchors, decoders, cam):
        grid_scale3 = jnp.exp(anchors.scaling[:, :3])
        rotation = anchors.rotation / jnp.maximum(
            jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True),
            1e-12)
        visible = visible_filter(
            anchors.anchor, grid_scale3, rotation,
            cam["world_view_transform"], cam["full_proj_transform"],
            width, height, cam["tan_fovx"], cam["tan_fovy"],
            config=rc, valid=anchors.active)
        neural = generate_neural_gaussians(
            anchors, decoders, cam["camera_center"], cam["pose7"],
            visible, model_config)
        cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
        pr = preprocess_gaussians(
            neural.xyz, cov3d, cam["world_view_transform"],
            cam["full_proj_transform"], width, height,
            cam["tan_fovx"], cam["tan_fovy"], rc, valid_in=neural.valid)
        t = jnp.where((pr.radius > 0) & neural.valid,
                      jnp.minimum(pr.tiles_touched, rc.kmax), 0)
        return (jnp.sum(t > rc.ksmall), jnp.sum(t > rc.kmid))

    n_mid = n_large = 0
    for cam in cams:
        a, b = _counts(anchors, decoders, cam)
        n_mid = max(n_mid, int(a))
        n_large = max(n_large, int(b))

    def pow2(n):
        return 1 << max(0, math.ceil(math.log2(max(n, 1))))

    import dataclasses

    nmid = min(rc.compact, max(rc.nmid, pow2(int(n_mid * headroom))))
    nlarge = min(nmid, max(rc.nlarge, pow2(int(n_large * headroom))))
    return dataclasses.replace(rc, nmid=nmid, nlarge=nlarge)


class ChainedEvalRenderer:
    """Eval-only render as a chain of three jit dispatches.

    SUPERSEDED by EvalRenderer for production eval: the round-2 finding
    that motivated the split ("fused 22.6 ms vs chained 2.4 ms") was an
    async-ack measurement artifact (PERF_NOTES.md) — with true synchronous
    timing the fused single jit wins. The chained form is kept because its
    separable stages are the test/profiling surface (per-stage parity
    oracles, real-map stage attribution).

    Stages: decode (prefilter + neural-gaussian MLPs) -> project
    (cov3d + preprocess + feature/aux assembly) -> blend (compaction +
    instance sort + Pallas tile blend + image assembly).

    Not differentiable; the training path keeps the fused render().
    """

    def __init__(self, model_config: ModelConfig, raster_config: RasterConfig,
                 width: int, height: int, bg: jnp.ndarray,
                 interpret: bool | None = None, packed: bool = True):
        import jax

        from segs_slam_tpu.ops.rasterizer.blend import (
            binned_blend,
            binned_blend_eval,
        )
        from segs_slam_tpu.ops.rasterizer.preprocess import (
            compute_cov3d,
            preprocess_gaussians,
        )

        # packed=True halves the binning-sort bandwidth (the dominant
        # eval-path cost on real maps) via f16-pair payload packing; see
        # binning.py packed section for the precision analysis and its
        # tile/kmax/width limits. The training path always keeps full-f32
        # sorts.
        _tx = raster_config.grid(width, height)[0]
        blend_fn = (binned_blend_eval
                    if packed and raster_config.tile == 16 and _tx <= 63
                    and raster_config.kmax <= 31 else binned_blend)

        mc, rc = model_config, raster_config
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        tx, ty = rc.grid(width, height)
        npix = rc.tile * rc.tile
        static = (rc, tx, ty, npix, interpret)
        bg = jnp.asarray(bg, jnp.float32)

        @jax.jit
        def _decode(anchors, decoders, cam):
            grid_scale3 = jnp.exp(anchors.scaling[:, :3])
            rotation = anchors.rotation / jnp.maximum(
                jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True),
                1e-12)
            visible = visible_filter(
                anchors.anchor, grid_scale3, rotation,
                cam["world_view_transform"], cam["full_proj_transform"],
                width, height, cam["tan_fovx"], cam["tan_fovy"],
                config=rc, valid=anchors.active)
            return generate_neural_gaussians(
                anchors, decoders, cam["camera_center"], cam["pose7"],
                visible, mc)

        @jax.jit
        def _project(neural, cam):
            cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
            proj = preprocess_gaussians(
                neural.xyz, cov3d, cam["world_view_transform"],
                cam["full_proj_transform"], width, height,
                cam["tan_fovx"], cam["tan_fovy"], rc, valid_in=neural.valid)
            opac = neural.opacity.reshape(-1)
            feats = (proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
                     proj.conic[:, 1], proj.conic[:, 2], opac,
                     neural.color[:, 0], neural.color[:, 1],
                     neural.color[:, 2])
            aux = {
                "rect_min_x": proj.rect_min[:, 0],
                "rect_min_y": proj.rect_min[:, 1],
                "rect_w": proj.rect_max[:, 0] - proj.rect_min[:, 0],
                "touched": proj.tiles_touched.astype(jnp.int32),
                "depth": proj.depth,
                "alive": proj.radius > 0,
            }
            return feats, aux

        @jax.jit
        def _blend(feats, aux):
            color, *_ = blend_fn(feats, aux, bg, static)
            b = rc.tile
            return (color.reshape(ty, tx, 3, b, b)
                    .transpose(2, 0, 3, 1, 4)
                    .reshape(3, ty * b, tx * b)[:, :height, :width])

        self._decode, self._project, self._blend = _decode, _project, _blend

    def __call__(self, anchors, decoders, cam):
        neural = self._decode(anchors, decoders, cam)
        feats, aux = self._project(neural, cam)
        return self._blend(feats, aux)

    def jits(self):
        """The three stage jits (decode, project, blend) — for cache-size
        introspection in tests: a retrace of any stage on TPU means a
        minutes-long recompile of the instance sort, so consumers must keep
        input signatures canonical."""
        return (self._decode, self._project, self._blend)


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
