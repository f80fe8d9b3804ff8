"""Single-step NaN hunt from a saved mapper checkpoint (dev tool)."""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.io import datasets
from segs_slam_tpu.io.checkpoint import load_train_state
from segs_slam_tpu.models.anchors import empty_state
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.densify import make_adjust_anchor
from segs_slam_tpu.train.step import init_train_state, make_train_step

W = H = 320
cam = Camera(camera_id=0, width=W, height=H, fx=288.0, fy=288.0, cx=160, cy=160)
frames = datasets.load_replica("/root/data/synth_room")

mc = ModelConfig(capacity=16384)
oc = OptimizationConfig(iterations=3000)
rc = RasterConfig(tile=16, compact=16384, kmax=32, chunk=256)

template = init_train_state(
    empty_state(mc), init_decoders(jax.random.PRNGKey(0), mc), mc
)
ts = load_train_state("/tmp/mapper_debug_ckpt", template)
print("loaded; step =", int(ts.step), flush=True)


def badleaves(x):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(x)[0]:
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            out.append((jax.tree_util.keystr(path), int((~np.isfinite(a)).sum())))
    return out


print("initial bad leaves:", badleaves(ts), flush=True)

# same spatial_lr_scale the app computed (radius over first 5 kfs)
kf_ids = list(range(0, 150, 8))


def c2w_center(q, t):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return -R.T @ t


centers = np.array([c2w_center(frames[i].quat, frames[i].trans) for i in kf_ids[:5]])
radius = float(np.linalg.norm(centers - centers.mean(0), axis=1).max() * 1.1)
import dataclasses

oc = dataclasses.replace(oc, spatial_lr_scale=radius)
print("spatial_lr_scale:", radius, flush=True)

step = jax.jit(make_train_step(mc, oc, rc, W, H))
adjust = jax.jit(make_adjust_anchor(mc, oc))
bg = jnp.zeros(3)

kfs = []
for i in kf_ids:
    fr = frames[i]
    kf = Keyframe(kf_id=i, camera=cam, quat=fr.quat, trans=fr.trans,
                  image=np.transpose(fr.load_rgb(), (2, 0, 1)))
    kfs.append(kf)
cams = [
    ({k: jnp.asarray(v) for k, v in kf.render_inputs().items()},
     jnp.asarray(kf.image, jnp.float32))
    for kf in kfs
]

rng = np.random.default_rng(3)
key = jax.random.PRNGKey(42)
it = int(ts.step)
for n in range(300):
    cam_in, gt = cams[rng.integers(len(cams))]
    ts, m = step(ts, cam_in, gt, bg)
    it += 1
    bad = badleaves(ts)
    if bad:
        print(f"NAN AFTER STEP at iter {it}: {bad[:6]}", flush=True)
        break
    if it % 100 == 0:
        key, sub = jax.random.split(key)
        ts_new = adjust(ts, sub)
        bad = badleaves(ts_new)
        if bad:
            print(f"NAN AFTER ADJUST at iter {it}: {bad[:6]}", flush=True)
            # dump pre-adjust diagnostics
            a = ts.anchors
            print("pre-adjust scaling range:",
                  float(a.scaling.min()), float(a.scaling.max()), flush=True)
            print("pre-adjust offset absmax:", float(jnp.abs(a.offset).max()),
                  flush=True)
            print("pre-adjust anchor absmax:", float(jnp.abs(a.anchor).max()),
                  flush=True)
            sc = np.asarray(a.scaling[:, :3])
            print("scaling[:, :3] > 80:", int((sc > 80).sum()), flush=True)
            break
        ts = ts_new
        print(f"iter {it}: adjust ok, active={int(ts.anchors.num_active())}",
              flush=True)
else:
    print("no nan in 300 iters", flush=True)
