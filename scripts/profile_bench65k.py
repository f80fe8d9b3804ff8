"""Stage-level timing of the fullmap-65k eval point (bench.py _eval_fps
config): decode / project / compact-sort / instance-sort / Pallas blend,
each as its own jit over a 10-frame lax.map batch (dispatch overhead
amortized like the recorder path). Drives the round-4 FPS attack.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_sync():
    np.asarray(jnp.zeros(8) + 1.0)


def main():
    from segs_slam_tpu.core import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.models.anchors import empty_state
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.models.decoders import init_decoders
    from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians
    from segs_slam_tpu.models.renderer import EvalRenderer
    from segs_slam_tpu.ops.rasterizer import RasterConfig, visible_filter
    from segs_slam_tpu.ops.rasterizer.binning import (
        compact_gaussians_packed,
        expand_and_sort_packed,
    )
    from segs_slam_tpu.ops.rasterizer.blend import binned_blend_eval
    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    force_sync()
    cap, compact, nlarge = 2**16, 2**17, 2**13
    width, height = 640, 480
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
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    rc = RasterConfig(tile=16, compact=compact, kmax=16, chunk=256,
                      ksmall=4, nlarge=nlarge)
    tx, ty = rc.grid(width, height)
    npix = rc.tile * rc.tile
    static = (rc, tx, ty, npix, False)
    bg = jnp.zeros(3)
    B = 10

    def bmap(f):
        """jit(lax.map(f)) over a B-stacked leading axis of every arg."""
        return jax.jit(lambda *xs: lax.map(lambda t: f(*t), xs))

    def tile10(x):
        return jax.tree.map(lambda a: jnp.stack([a] * B), x)

    # ---- stage fns ----
    def decode(cam):
        grid_scale3 = jnp.exp(anchors.scaling[:, :3])
        rotation = anchors.rotation / jnp.maximum(
            jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True), 1e-12)
        visible = visible_filter(
            anchors.anchor, grid_scale3, rotation,
            cam["world_view_transform"], cam["full_proj_transform"],
            width, height, cam["tan_fovx"], cam["tan_fovy"],
            config=rc, valid=anchors.active)
        return generate_neural_gaussians(
            anchors, decoders, cam["camera_center"], cam["pose7"],
            visible, mc)

    def project(neural, cam):
        cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
        pr = preprocess_gaussians(
            neural.xyz, cov3d, cam["world_view_transform"],
            cam["full_proj_transform"], width, height,
            cam["tan_fovx"], cam["tan_fovy"], rc, valid_in=neural.valid)
        feats = (pr.mean2d[:, 0], pr.mean2d[:, 1], pr.conic[:, 0],
                 pr.conic[:, 1], pr.conic[:, 2], neural.opacity.reshape(-1),
                 neural.color[:, 0], neural.color[:, 1], neural.color[:, 2])
        aux = {
            "rect_min_x": pr.rect_min[:, 0],
            "rect_min_y": pr.rect_min[:, 1],
            "rect_w": pr.rect_max[:, 0] - pr.rect_min[:, 0],
            "touched": pr.tiles_touched.astype(jnp.int32),
            "depth": pr.depth,
            "alive": pr.radius > 0,
        }
        return feats, aux

    def compact(feats, aux):
        return compact_gaussians_packed(feats, aux, rc)

    def expand(pc):
        fs, t0, t1, ni, nl = expand_and_sort_packed(pc, tx, ty, rc)
        return fs, t0, t1

    def blend_full(feats, aux):
        color, *_ = binned_blend_eval(feats, aux, bg, static)
        return color

    # materialize stage inputs
    neural1 = jax.jit(decode)(cam_in)
    feats1, aux1 = jax.jit(project)(neural1, cam_in)
    pc1 = jax.jit(compact)(feats1, aux1)
    jax.block_until_ready((neural1, feats1, pc1))
    print("num_valid (visible gaussians):", int(pc1.num_valid), flush=True)

    cams10 = tile10(cam_in)
    neural10 = tile10(neural1)
    feats10, aux10 = tile10(feats1), tile10(aux1)
    pc10 = tile10(pc1)

    jits = {
        "decode": (bmap(decode), (cams10,)),
        "project": (bmap(project), (neural10, cams10)),
        "compact": (bmap(compact), (feats10, aux10)),
        "expand+isort": (bmap(expand), (pc10,)),
        "blend_all": (bmap(blend_full), (feats10, aux10)),
    }
    for name, (f, args) in jits.items():
        out = f(*args)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * B) * 1000
        print(f"{name:13s}: {dt:7.2f} ms/frame", flush=True)

    # full fused production path
    er = EvalRenderer(mc, rc, width, height, bg)
    stack = cams10
    out = er.render_batch(anchors, decoders, stack)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = er.render_batch(anchors, decoders, stack)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * B) * 1000
    print(f"fused (prod) : {dt:7.2f} ms/frame ({1000/dt:6.1f} FPS)",
          flush=True)


if __name__ == "__main__":
    main()
