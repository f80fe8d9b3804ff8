"""Decompose the online train step's 69 ms/iter (bench.py operating point:
2^16 anchors x K=10, 640x480, compact 2^16, kmax 8).

Segments timed (steady-state, 30 reps, block_until_ready at the end):
  step_fused       full train step (render+loss+bwd+stats+Adam), one jit
  step_dualrate    same with dual-rate expansion (ksmall=4, nlarge=2^13)
  grads_only       value_and_grad of the loss (no stats, no Adam)
  fwd_only         forward render+loss only
  render_fused     eval render, one fused jit
  render_chained   eval render, ChainedEvalRenderer (3 jits)

If step_fused >> grads_only + (stats/adam residue), the fused graph has the
same XLA:TPU scheduling pathology the eval path had (see
profile_fullmap_compose.py) and chaining the step is worth engineering.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import ChainedEvalRenderer, render
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.step import init_train_state, make_train_step

W, H = 640, 480
mc = ModelConfig(capacity=2**16)
oc = OptimizationConfig()
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0,
             cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
rng = np.random.default_rng(0)
pts = rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(40_000, 3))
anchors, _ = insert_points(empty_state(mc), pts, mc)
decoders = init_decoders(jax.random.PRNGKey(0), mc)
ts0 = init_train_state(anchors, decoders, mc)
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
bg = jnp.zeros(3)

import sys
sys.path.insert(0, 'scripts')
from bench_lib import force_sync_mode
force_sync_mode()

REPS = 30


def bench(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / REPS * 1000
    print(f"{label:16s} {ms:8.2f} ms/iter   ({1000/ms:6.1f} /s)")
    return ms


def run_config(tag, rc):
    print(f"--- {tag}: compact=2^{int(np.log2(rc.compact))} kmax={rc.kmax} "
          f"ksmall={rc.ksmall} nlarge={rc.nlarge}")
    step = jax.jit(make_train_step(mc, oc, rc, W, H), donate_argnums=0)
    ts = ts0

    def one(ts):
        new_ts, m = step(ts, cam_in, gt, bg)
        return new_ts, m

    # steady state
    ts, m = one(ts)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for _ in range(REPS):
        ts, m = one(ts)
    jax.block_until_ready(m["loss"])
    ms = (time.time() - t0) / REPS * 1000
    print(f"{'step_fused':16s} {ms:8.2f} ms/iter   ({1000/ms:6.1f} /s)")

    # grads only
    import segs_slam_tpu.train.step as stepmod

    def loss_fn(params, mean2d_offset, ts, cam, gt_image):
        a = ts.anchors.replace_params(params["anchors"])
        out = render(a, params["decoders"], cam, W, H, bg, mc, rc,
                     mean2d_offset=mean2d_offset)
        mask = jnp.any(gt_image != 0.0, axis=0, keepdims=True).astype(
            jnp.float32)
        img_m = out.image * mask
        gt_m = gt_image * mask
        from segs_slam_tpu.train import losses
        l1 = losses.l1_loss(img_m, gt_m)
        s = losses.ssim(img_m, gt_m)
        return 0.8 * l1 + 0.2 * (1 - s)

    cap, k = mc.capacity, mc.n_offsets
    m2z = jnp.zeros((cap * k, 2), jnp.float32)

    @jax.jit
    def grads_only(ts, cam, gt_image):
        params = {"anchors": ts.anchors.params(), "decoders": ts.decoders}
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, m2z, ts, cam, gt_image)

    bench("grads_only", grads_only, ts, cam_in, gt)

    @jax.jit
    def fwd_only(ts, cam, gt_image):
        params = {"anchors": ts.anchors.params(), "decoders": ts.decoders}
        return loss_fn(params, m2z, ts, cam, gt_image)

    bench("fwd_only", fwd_only, ts, cam_in, gt)

    @jax.jit
    def render_fused(ts, cam):
        return render(ts.anchors, ts.decoders, cam, W, H, bg, mc, rc).image

    bench("render_fused", render_fused, ts, cam_in)

    chain = ChainedEvalRenderer(mc, rc, W, H, bg)
    bench("render_chained", lambda ts, cam: chain(ts.anchors, ts.decoders,
                                                  cam), ts, cam_in)


run_config("train operating point", RasterConfig(tile=16, compact=2**16,
                                                 kmax=8, chunk=256))
run_config("dual-rate", RasterConfig(tile=16, compact=2**16, kmax=8,
                                     chunk=256, ksmall=4, nlarge=2**13))
