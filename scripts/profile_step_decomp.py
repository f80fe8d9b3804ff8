"""Fine-grained attribution of the 65-70 ms online train step (bench.py
operating point: 2^16 anchors x K=10, 40k active, 640x480).

Times each pipeline segment in isolation (jitted, steady-state, sync mode):
  decode fwd / fwd+bwd        visible_filter + generate_neural_gaussians
  preprocess fwd / fwd+bwd    cov3d + projection + rect/touched
  blend fwd / fwd+bwd         binned_blend custom VJP (compaction sort +
                              instance sort + Pallas kernels + segment_sum
                              + scatter)
  compact sort                compaction alone
  expand+sort                 instance expansion + (tile,depth) sort alone
  loss fwd+bwd                L1 + SSIM on (3,480,640)

Sub-stage times do not sum exactly to the fused step (XLA fuses across
boundaries; stage boundaries materialize [cap*K] arrays) but attribute the
dominant costs.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "scripts")
from bench_lib import force_sync_mode

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians
from segs_slam_tpu.models.renderer import visible_filter
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.binning import compact_gaussians, expand_and_sort
from segs_slam_tpu.ops.rasterizer.blend import binned_blend
from segs_slam_tpu.ops.rasterizer.preprocess import compute_cov3d, preprocess_gaussians
from segs_slam_tpu.train import losses

force_sync_mode()

W, H = 640, 480
mc = ModelConfig(capacity=2**16)
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0,
             cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
rng = np.random.default_rng(0)
pts = rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(40_000, 3))
anchors, _ = insert_points(empty_state(mc), pts, mc)
decoders = init_decoders(jax.random.PRNGKey(0), mc)
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
bg = jnp.zeros(3)
REPS = 20


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return out


def main(rc):
    print(f"=== compact=2^{int(np.log2(rc.compact))} kmax={rc.kmax} "
          f"ksmall={rc.ksmall} nlarge={rc.nlarge}", flush=True)
    tx, ty = rc.grid(W, H)
    npix = rc.tile * rc.tile
    static = (rc, tx, ty, npix, False)

    # ---- decode ----
    @jax.jit
    def decode_fwd(anchors, decoders, cam):
        grid_scale3 = jnp.exp(anchors.scaling[:, :3])
        rot = anchors.rotation / jnp.maximum(
            jnp.linalg.norm(anchors.rotation, axis=-1, keepdims=True), 1e-12)
        vis = visible_filter(anchors.anchor, grid_scale3, rot,
                             cam["world_view_transform"],
                             cam["full_proj_transform"], W, H,
                             cam["tan_fovx"], cam["tan_fovy"], config=rc,
                             valid=anchors.active)
        return generate_neural_gaussians(anchors, decoders,
                                         cam["camera_center"], cam["pose7"],
                                         vis, mc)

    neural = bench("decode fwd", decode_fwd, anchors, decoders, cam_in)

    @jax.jit
    def decode_fwdbwd(aparams, decoders, cam):
        def f(aparams, decoders):
            a = anchors.replace_params(aparams)
            n = decode_fwd(a, decoders, cam)
            return (jnp.sum(n.xyz) + jnp.sum(n.scaling) + jnp.sum(n.color)
                    + jnp.sum(n.opacity) + jnp.sum(n.rotation))
        return jax.grad(f, argnums=(0, 1))(aparams, decoders)

    bench("decode fwd+bwd", decode_fwdbwd, anchors.params(), decoders, cam_in)

    # ---- preprocess ----
    @jax.jit
    def prep_fwd(neural, cam):
        cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
        return preprocess_gaussians(neural.xyz, cov3d,
                                    cam["world_view_transform"],
                                    cam["full_proj_transform"], W, H,
                                    cam["tan_fovx"], cam["tan_fovy"], rc,
                                    valid_in=neural.valid)

    proj = bench("preprocess fwd", prep_fwd, neural, cam_in)

    # ---- blend: build feats/aux once ----
    @jax.jit
    def mk_feats(neural, proj):
        opac = neural.opacity.reshape(-1)
        feats = (proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0],
                 proj.conic[:, 1], proj.conic[:, 2], opac,
                 neural.color[:, 0], neural.color[:, 1], neural.color[:, 2])
        aux = {
            "rect_min_x": proj.rect_min[:, 0],
            "rect_min_y": proj.rect_min[:, 1],
            "rect_w": proj.rect_max[:, 0] - proj.rect_min[:, 0],
            "touched": proj.tiles_touched.astype(jnp.int32),
            "depth": jax.lax.stop_gradient(proj.depth),
            "alive": proj.radius > 0,
        }
        return feats, aux

    feats, aux = jax.block_until_ready(mk_feats(neural, cam_in and proj))

    compact_j = jax.jit(functools.partial(compact_gaussians, config=rc))
    cg = bench("compact sort", compact_j, feats, aux)
    exp_j = jax.jit(functools.partial(expand_and_sort, num_tiles_x=tx,
                                      num_tiles_y=ty, config=rc))
    bench("expand+instance sort", exp_j, cg)

    @jax.jit
    def blend_fwd(feats, aux):
        return binned_blend(feats, aux, bg, static)[0]

    bench("blend fwd (sorts+kernel)", blend_fwd, feats, aux)

    @jax.jit
    def blend_fwdbwd(feats, aux):
        def f(feats):
            return jnp.sum(binned_blend(feats, aux, bg, static)[0])
        return jax.grad(f)(feats)

    bench("blend fwd+bwd", blend_fwdbwd, feats, aux)

    # ---- loss ----
    @jax.jit
    def loss_fwdbwd(img, gt):
        def f(img):
            mask = jnp.any(gt != 0.0, axis=0, keepdims=True).astype(jnp.float32)
            im, g = img * mask, gt * mask
            return 0.8 * losses.l1_loss(im, g) + 0.2 * (1 - losses.ssim(im, g))
        return jax.grad(f)(img)

    img = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    bench("loss fwd+bwd (L1+SSIM)", loss_fwdbwd, img, gt)


if __name__ == "__main__":
    main(RasterConfig(tile=16, compact=2**16, kmax=8, chunk=256,
                      ksmall=4, nlarge=2**13))
    if "--flat" in sys.argv:
        main(RasterConfig(tile=16, compact=2**16, kmax=8, chunk=256))
