"""Measure healthy densify-stat distributions for threshold calibration."""

import numpy as np
import jax
import jax.numpy as jnp

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
oc = OptimizationConfig(iterations=3000, update_from=10**9)  # never adjust
rc = RasterConfig(tile=16, compact=32768, kmax=16, chunk=256)
trainer = Trainer(mc, oc, rc, width=W, height=H)
trainer.scene.add_camera(cam)
rng = np.random.default_rng(0)
all_pts = []
for i in range(0, 150, 8):
    fr = frames[i]
    trainer.add_keyframe(Keyframe(kf_id=i, camera=cam, quat=fr.quat,
                                  trans=fr.trans, image=fr.load_rgb()))
    pts = frontends.backproject_depth(fr.load_depth(6553.5), cam, fr.quat,
                                      fr.trans, 0.05, 20.0, stride=8)
    all_pts.append(pts[rng.choice(len(pts), 300, replace=False)])
trainer.initialize_map(np.concatenate(all_pts))
m = trainer.train(700)
print("final loss/psnr:", float(m["loss"]), float(m["psnr"]),
      "nonfinite:", int(m["nonfinite_grads"]), flush=True)

st = trainer.state.stats
acc = np.asarray(st.offset_grad_accum)
den = np.asarray(st.offset_denom)
g = np.where(den > 0, acc / np.maximum(den, 1), 0.0)
gpos = g[g > 0]
print("stat count:", gpos.size)
for q in [25, 50, 75, 90, 95, 99]:
    print(f"p{q}: {np.percentile(gpos, q):.6g}")
print("frac above 0.0002:", (gpos > 0.0002).mean())
print("denom>40 frac:", (den > 40).mean())
print("opacity_accum/demon stats:",
      float(np.median(np.asarray(st.opacity_accum)[np.asarray(st.anchor_demon) > 0]
                      / np.asarray(st.anchor_demon)[np.asarray(st.anchor_demon) > 0])))
