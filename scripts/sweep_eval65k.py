"""Sweep packed-eval RasterConfig tiers at the 65k full-map point.

VERDICT r3 #1: render_fps_eval_fullmap_65k must reach >= 100 (13.6 -> <=10
ms/frame). The instance sort is ~5.7 ms and the compact sort 3.2 ms; the
3-tier expansion (binning.expand_and_sort_packed, eval only) was built in
round 3 but never enabled on the eval chain. Measure the candidates on the
real chip with the recorder's batched methodology.
"""

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
from segs_slam_tpu.models.renderer import EvalRenderer
from segs_slam_tpu.ops.rasterizer import RasterConfig

force_sync_mode()

W, H = 640, 480
CAP = 2**16
B = 10
mc = ModelConfig(capacity=CAP)
B_OFFSETS = mc.n_offsets
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0,
             cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
rng = np.random.default_rng(0)
pts = rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(CAP, 3))
anchors, _ = insert_points(empty_state(mc), pts, mc)
decoders = init_decoders(jax.random.PRNGKey(0), mc)
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
stack = {k: jnp.stack([cam_in[k]] * B) for k in cam_in}
bg = jnp.zeros(3)

CFGS = {
    "2tier ks4 nl8k (current)": dict(ksmall=4, nlarge=2**13),
    "3tier ks2 km8 nm16k nl4k": dict(ksmall=2, kmid=8, nmid=2**14,
                                     nlarge=2**12),
    "3tier + seldirect": dict(ksmall=2, kmid=8, nmid=2**14, nlarge=2**12,
                              sel_direct=True),
    "3tier + seldirect + kanchor6": dict(ksmall=2, kmid=8, nmid=2**14,
                                         nlarge=2**12, sel_direct=True,
                                         kanchor=6, kgroup=B_OFFSETS),
    "3tier + seldirect + kanchor4": dict(ksmall=2, kmid=8, nmid=2**14,
                                         nlarge=2**12, sel_direct=True,
                                         kanchor=4, kgroup=B_OFFSETS),
    "2tier + seldirect": dict(ksmall=4, nlarge=2**13, sel_direct=True),
    "3tier + seldirect + pack8": dict(ksmall=2, kmid=8, nmid=2**14,
                                      nlarge=2**12, sel_direct=True,
                                      pack8=True),
    "3tier + sd + pack8 + kanchor6": dict(ksmall=2, kmid=8, nmid=2**14,
                                          nlarge=2**12, sel_direct=True,
                                          pack8=True, kanchor=6,
                                          kgroup=B_OFFSETS),
    "2tier + seldirect + pack8": dict(ksmall=4, nlarge=2**13,
                                      sel_direct=True, pack8=True),
}

ref_img = None
for name, kw in CFGS.items():
    rc = RasterConfig(tile=16, compact=2**17, kmax=16, chunk=256, **kw)
    chain = EvalRenderer(mc, rc, W, H, bg)
    imgs = chain.render_batch(anchors, decoders, stack)
    jax.block_until_ready(imgs)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        imgs = chain.render_batch(anchors, decoders, stack)
    jax.block_until_ready(imgs)
    ms = (time.perf_counter() - t0) * 1000 / (n * B)
    img0 = np.asarray(imgs[0] if isinstance(imgs, (list, tuple)) else
                      imgs)[..., :H, :W]
    if ref_img is None:
        ref_img = img0
        err = 0.0
    else:
        err = float(np.abs(img0 - ref_img).max())
    print(f"{name:32s} {ms:6.2f} ms/frame  {1000/ms:6.1f} FPS  "
          f"maxerr {err:.4f}")
