"""Drive: tiny online training through the public API on real TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.densify import make_adjust_anchor
from segs_slam_tpu.train.step import init_train_state, make_train_step

W = H = 128
mc = ModelConfig(feat_dim=16, n_offsets=5, appearance_dim=8, embedding_dim=4,
                 capacity=4096, voxel_size=0.02)
oc = OptimizationConfig(start_stat=10, update_from=50, update_interval=50,
                        update_until=1000, use_frequency_regularization=True)
rc = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=256)
cam = Camera(camera_id=0, width=W, height=H, fx=110.0, fy=110.0, cx=64, cy=64)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
rng = np.random.default_rng(0)
pts = rng.uniform([-0.8, -0.6, 1.2], [0.8, 0.6, 4.0], size=(2000, 3))
anchors, n = insert_points(empty_state(mc), pts, mc)
print("anchors inserted:", n, flush=True)
decoders = init_decoders(jax.random.PRNGKey(0), mc)
ts = init_train_state(anchors, decoders, mc)
yy, xx = np.mgrid[0:H, 0:W]
gt = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 9)], 0).astype(np.float32)
gt = jnp.asarray(gt)
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
bg = jnp.zeros(3)
step = jax.jit(make_train_step(mc, oc, rc, W, H, interpret=False))
adjust = jax.jit(make_adjust_anchor(mc, oc))
t0 = time.time()
ts, m = step(ts, cam_in, gt, bg)
jax.block_until_ready(m)
print(f"step compile: {time.time()-t0:.0f}s  loss0={float(m['loss']):.4f} "
      f"psnr0={float(m['psnr']):.2f}", flush=True)
key = jax.random.PRNGKey(0)
t0 = time.time()
for i in range(2, 301):
    ts, m = step(ts, cam_in, gt, bg)
    if i % 50 == 0 and i > oc.update_from:
        key, sub = jax.random.split(key)
        ts = adjust(ts, sub)
    if i % 100 == 0:
        print(f"iter {i}: loss={float(m['loss']):.4f} psnr={float(m['psnr']):.2f} "
              f"active={int(m['n_active'])} inst={int(m['num_instances'])}",
              flush=True)
jax.block_until_ready(m)
dt = time.time() - t0
print(f"299 iters in {dt:.1f}s -> {dt/299*1000:.1f} ms/iter", flush=True)
