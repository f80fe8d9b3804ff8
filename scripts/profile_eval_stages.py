"""Eval-path stage attribution at the FULL-MAP operating point (65k anchors
x K=10, compact 2^17, kmax 16, dual-rate, packed): where do the 13.4 ms go?

Times the fused EvalRenderer, the packed ChainedEvalRenderer stages
(decode / project / blend), and blend sub-pieces (packed compaction,
packed expand+sort, eval kernel) on synthetic anchors with realistic
occupancy.
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
from segs_slam_tpu.models.renderer import ChainedEvalRenderer, EvalRenderer
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.binning import (
    compact_gaussians_packed,
    expand_and_sort_packed,
)

force_sync_mode()

W, H = 640, 480
CAP = 2**16
mc = ModelConfig(capacity=CAP)
rc = RasterConfig(tile=16, compact=2**17, kmax=16, chunk=256, ksmall=4,
                  nlarge=2**13)
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0,
             cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
rng = np.random.default_rng(0)
pts = rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(CAP, 3))
anchors, _ = insert_points(empty_state(mc), pts, mc)
decoders = init_decoders(jax.random.PRNGKey(0), mc)
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
bg = jnp.zeros(3)
REPS = 30


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


fused = EvalRenderer(mc, rc, W, H, bg)
bench("EvalRenderer (fused)", fused, anchors, decoders, cam_in)

chain = ChainedEvalRenderer(mc, rc, W, H, bg)
neural = bench("  decode", chain._decode, anchors, decoders, cam_in)
feats_aux = bench("  project", chain._project, neural, cam_in)
bench("  blend (packed)", chain._blend, *feats_aux)

feats, aux = feats_aux
compact_j = jax.jit(functools.partial(compact_gaussians_packed, config=rc))
pc = bench("    packed compact sort", compact_j, feats, aux)
tx, ty = rc.grid(W, H)
exp_j = jax.jit(functools.partial(expand_and_sort_packed, num_tiles_x=tx,
                                  num_tiles_y=ty, config=rc))
bench("    packed expand+sort", exp_j, pc)
print(f"num alive: {int(jnp.sum(aux['alive']))}", flush=True)
