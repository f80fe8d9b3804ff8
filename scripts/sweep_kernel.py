"""Sweep blend-kernel tile/chunk configs (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize

W, H, N = 640, 480, 100_000
rng = np.random.default_rng(0)
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0, cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
means = jnp.asarray(rng.uniform([-3, -2, 1.5], [3, 2, 10], (N, 3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (N, 3))), jnp.float32)
quats = rng.normal(size=(N, 4))
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
opac = jnp.asarray(rng.uniform(0.1, 0.9, N), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

ref_img = None
for tile, chunk, kmax in [(16, 256, 8), (16, 512, 8), (32, 128, 4),
                          (32, 256, 4), (8, 256, 16)]:
    cfg = RasterConfig(tile=tile, compact=2**16, kmax=kmax, chunk=chunk)
    args = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=W, height=H, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        bg=jnp.zeros(3), config=cfg, interpret=False,
    )
    f = jax.jit(lambda *a: rasterize(*a, **args)["image"])
    try:
        t0 = time.time()
        r = f(means, scales, quats, opac, colors)
        r.block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(20):
            r = f(means, scales, quats, opac, colors)
        r.block_until_ready()
        dt = (time.time() - t0) / 20 * 1000
        if ref_img is None:
            ref_img = np.asarray(r)
            diff = 0.0
        else:
            diff = float(np.abs(np.asarray(r) - ref_img).max())
        print(f"tile={tile} chunk={chunk} kmax={kmax}: {dt:.2f} ms "
              f"(compile {compile_s:.0f}s, maxdiff {diff:.2e})", flush=True)
    except Exception as e:
        print(f"tile={tile} chunk={chunk} kmax={kmax}: FAILED {str(e)[:150]}",
              flush=True)
