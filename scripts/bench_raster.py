"""Microbenchmark: compiled rasterizer forward / forward+backward on TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize


def main(width=640, height=480, n=100_000, tile=16, chunk=256, compact=2**17, kmax=16):
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    cam = Camera(camera_id=0, width=width, height=height, fx=500.0, fy=500.0,
                 cx=width / 2, cy=height / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    means = rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -3.0, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.1, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = RasterConfig(tile=tile, compact=compact, kmax=kmax, chunk=chunk)

    args = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=width, height=height, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        bg=jnp.zeros(3), config=cfg, interpret=False,
    )

    @jax.jit
    def fwd(m, s, q, o, c):
        return rasterize(m, s, q, o, c, **args)["image"]

    @jax.jit
    def loss_grad(m, s, q, o, c):
        def f(m, s, q, o, c):
            return jnp.sum(rasterize(m, s, q, o, c, **args)["image"] ** 2)
        return jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(m, s, q, o, c)

    m, s, q, o, c = map(jnp.asarray, (means, scales, quats, opac, colors))
    t0 = time.time()
    img = fwd(m, s, q, o, c)
    img.block_until_ready()
    print(f"fwd compile+run: {time.time()-t0:.1f} s")
    t0 = time.time()
    for _ in range(20):
        img = fwd(m, s, q, o, c)
    img.block_until_ready()
    dt = (time.time() - t0) / 20
    print(f"fwd: {dt*1000:.2f} ms  -> FPS: {1/dt:.1f}")
    print("img stats:", float(img.min()), float(img.max()), float(img.mean()))

    t0 = time.time()
    out = loss_grad(m, s, q, o, c)
    jax.block_until_ready(out)
    print(f"bwd compile+run: {time.time()-t0:.1f} s")
    t0 = time.time()
    for _ in range(10):
        out = loss_grad(m, s, q, o, c)
    jax.block_until_ready(out)
    print(f"fwd+bwd: {(time.time()-t0)/10*1000:.2f} ms")
    v, g = out
    print("loss:", float(v), "grad finite:",
          all(bool(jnp.isfinite(x).all()) for x in g))


if __name__ == "__main__":
    main()
