"""Profile the eval-path render at the full-map operating point.

VERDICT r2 missing #1: the 30k-run eval config (65k anchors x 10 offsets,
compact 2^17, kmax 16) reads 42.6 ms/frame (23.5 FPS) while the kernel bench
hits ~108 FPS at a lighter config. This script times the REAL eval path
(prefilter -> decode -> rasterize, trainer._eval_render_metrics equivalent)
across RasterConfig variants to find the winning operating point.
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
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig


def main():
    width, height = 640, 480
    cap = 2**16
    mc = ModelConfig(capacity=cap)
    rng = np.random.default_rng(0)
    # build a capacity-saturated state directly (insert_points' chunked KNN
    # is built for incremental ~3k batches, not a 90k bulk load)
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
    print(f"anchors active: {cap}/{cap}", flush=True)
    decoders = init_decoders(jax.random.PRNGKey(0), mc)
    cam = Camera(camera_id=0, width=width, height=height, fx=500.0, fy=500.0,
                 cx=width / 2, cy=height / 2)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    bg = jnp.zeros(3)

    configs = [
        ("r2 eval (2^17/16)", RasterConfig(tile=16, compact=2**17, kmax=16, chunk=256)),
        ("dual 2^17/16 ks4 nl8k", RasterConfig(tile=16, compact=2**17, kmax=16,
                                               chunk=256, ksmall=4, nlarge=2**13)),
        ("dual 2^17/16 ks2 nl8k", RasterConfig(tile=16, compact=2**17, kmax=16,
                                               chunk=256, ksmall=2, nlarge=2**13)),
        ("dual 2^16/16 ks4 nl8k", RasterConfig(tile=16, compact=2**16, kmax=16,
                                               chunk=256, ksmall=4, nlarge=2**13)),
        ("dual 2^16/8 ks4 nl8k", RasterConfig(tile=16, compact=2**16, kmax=8,
                                              chunk=256, ksmall=4, nlarge=2**13)),
        ("2^16/8 (bench cfg)", RasterConfig(tile=16, compact=2**16, kmax=8, chunk=256)),
    ]

    for name, rc in configs:
        @jax.jit
        def f(a, d, c):
            out = render(a, d, c, width, height, bg, mc, rc, interpret=False)
            return out.image, out.num_compact, out.num_instances

        img, ncomp, ninst = f(anchors, decoders, cam_in)
        jax.block_until_ready(img)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            img, ncomp, ninst = f(anchors, decoders, cam_in)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:28s}: {dt:7.2f} ms/frame  ({1000/dt:6.1f} FPS)  "
              f"num_compact={int(ncomp)} num_instances={int(ninst)}",
              flush=True)


if __name__ == "__main__":
    main()
