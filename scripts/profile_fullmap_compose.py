"""Compose the cached stage jits in Python vs the single fused render jit.

If the chained version is much faster per frame (queued), the fused graph
has a scheduling pathology and the eval path should be split."""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig, visible_filter
from segs_slam_tpu.ops.rasterizer.binning import (
    compact_gaussians,
    expand_and_sort,
)
from segs_slam_tpu.ops.rasterizer.blend import binned_blend
from segs_slam_tpu.ops.rasterizer.preprocess import (
    compute_cov3d,
    preprocess_gaussians,
)


def main():
    width, height = 640, 480
    cap = 2**16
    mc = ModelConfig(capacity=cap)
    rng = np.random.default_rng(0)
    st = empty_state(mc)
    anchors = st._replace(
        anchor=jnp.asarray(
            rng.uniform([-4, -3, 0.5], [4, 3, 12], size=(cap, 3)),
            jnp.float32),
        offset=jnp.asarray(rng.normal(0, 0.3, (cap, mc.n_offsets, 3)),
                           jnp.float32),
        feat=jnp.asarray(rng.normal(0, 0.1, (cap, mc.feat_dim)), jnp.float32),
        scaling=jnp.full_like(st.scaling, np.log(0.05)),
        active=jnp.ones(cap, bool),
    )
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    cam = Camera(camera_id=0, width=width, height=height, fx=500.0, fy=500.0,
                 cx=width / 2, cy=height / 2)
    cams = []
    for i in range(4):
        kf = Keyframe(kf_id=i, camera=cam, quat=[1, 0, 0, 0],
                      trans=[0.01 * i, 0, 0])
        cams.append({k: jnp.asarray(v) for k, v in kf.render_inputs().items()})
    bg = jnp.zeros(3)
    rc = RasterConfig(tile=16, compact=2**17, kmax=16, chunk=256,
                      ksmall=4, nlarge=2**13)
    tx, ty = rc.grid(width, height)
    npix = rc.tile * rc.tile
    static = (rc, tx, ty, npix, False)

    @jax.jit
    def stage_decode(a, d, c):
        grid_scale3 = jnp.exp(a.scaling[:, :3])
        rotation = a.rotation / jnp.maximum(
            jnp.linalg.norm(a.rotation, axis=-1, keepdims=True), 1e-12)
        visible = visible_filter(
            a.anchor, grid_scale3, rotation, c["world_view_transform"],
            c["full_proj_transform"], width, height, c["tan_fovx"],
            c["tan_fovy"], config=rc, valid=a.active)
        return generate_neural_gaussians(
            a, d, c["camera_center"], c["pose7"], visible, mc)

    @jax.jit
    def stage_preprocess(n, c):
        cov3d = compute_cov3d(n.scaling, n.rotation, 1.0)
        return preprocess_gaussians(
            n.xyz, cov3d, c["world_view_transform"],
            c["full_proj_transform"], width, height, c["tan_fovx"],
            c["tan_fovy"], rc, valid_in=n.valid)

    @jax.jit
    def stage_blend(f, a, b):
        return binned_blend(f, a, b, static)

    bgf = bg.astype(jnp.float32)

    def chained(a, d, c):
        n = stage_decode(a, d, c)
        p = stage_preprocess(n, c)
        opacities = n.opacity.reshape(-1)
        feats = (p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0],
                 p.conic[:, 1], p.conic[:, 2], opacities,
                 n.color[:, 0], n.color[:, 1], n.color[:, 2])
        aux = {
            "rect_min_x": p.rect_min[:, 0],
            "rect_min_y": p.rect_min[:, 1],
            "rect_w": p.rect_max[:, 0] - p.rect_min[:, 0],
            "touched": p.tiles_touched.astype(jnp.int32),
            "depth": jax.lax.stop_gradient(p.depth),
            "alive": p.radius > 0,
        }
        return stage_blend(feats, aux, bgf)

    # warm
    out = chained(anchors, decoders, cams[0])
    jax.block_until_ready(out)
    for n_it in (20, 100):
        t0 = time.perf_counter()
        for i in range(n_it):
            out = chained(anchors, decoders, cams[i % 4])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_it * 1000
        print(f"chained x{n_it:4d}: {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)",
              flush=True)
    print("color sum", float(jnp.sum(out[0])), flush=True)

    @jax.jit
    def whole(a, d, c):
        o = render(a, d, c, width, height, bg, mc, rc, interpret=False)
        return o.image

    img = whole(anchors, decoders, cams[0])
    jax.block_until_ready(img)
    for n_it in (20, 100):
        t0 = time.perf_counter()
        for i in range(n_it):
            img = whole(anchors, decoders, cams[i % 4])
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / n_it * 1000
        print(f"whole   x{n_it:4d}: {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)",
              flush=True)
    print("img mean", float(jnp.mean(img)), flush=True)


if __name__ == "__main__":
    main()
