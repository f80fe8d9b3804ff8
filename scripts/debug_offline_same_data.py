"""Offline trainer on the same on-disk keyframes as the online debug."""

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.io import datasets
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.slam import frontends
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer

W = H = 320
cam = Camera(camera_id=0, width=W, height=H, fx=288.0, fy=288.0, cx=160, cy=160)
frames = datasets.load_replica("/root/data/synth_room")

mc = ModelConfig(capacity=16384)
oc = OptimizationConfig(iterations=3000)
rc = RasterConfig(tile=16, compact=16384, kmax=32, chunk=256)
trainer = Trainer(mc, oc, rc, width=W, height=H)
trainer.scene.add_camera(cam)

rng = np.random.default_rng(0)
all_pts = []
for i in range(0, 150, 8):
    fr = frames[i]
    rgb = fr.load_rgb()
    depth = fr.load_depth(6553.5)
    kf = Keyframe(kf_id=i, camera=cam, quat=fr.quat, trans=fr.trans, image=rgb)
    trainer.add_keyframe(kf)
    pts = frontends.backproject_depth(depth, cam, fr.quat, fr.trans, 0.05,
                                      20.0, stride=8)
    all_pts.append(pts[rng.choice(len(pts), 300, replace=False)])

n = trainer.initialize_map(np.concatenate(all_pts))
print("anchors:", n, flush=True)
for k in range(24):
    m = trainer.train(25)
    print(f"iter {trainer.iteration}: loss={float(m['loss']):.4f} "
          f"psnr={float(m['psnr']):.2f}", flush=True)
