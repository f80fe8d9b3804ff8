"""Localize nonfinite gradients from the 640x480/65536 debug checkpoint.

Loads /tmp/mapper_debug_ckpt (written by slam_rgbd --debug-ckpt-at), runs
one loss+grad evaluation, and reports which parameter leaves carry
nonfinite gradients plus decode-output statistics (opacity/scale/conic
ranges) to identify the pathological gaussians.
"""

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.io import datasets
from segs_slam_tpu.io.checkpoint import load_train_state
from segs_slam_tpu.models.anchors import empty_state
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.losses import l1_loss, ssim
from segs_slam_tpu.train.step import init_train_state

W, H = 640, 480
cam = Camera(camera_id=0, width=W, height=H, fx=576.0, fy=576.0, cx=320,
             cy=240)
frames = datasets.load_replica("/root/data/synth_room")

mc = ModelConfig(capacity=65536)
oc = OptimizationConfig(iterations=30000)
rc = RasterConfig(tile=16, compact=131072, kmax=16, chunk=256)

template = init_train_state(
    empty_state(mc), init_decoders(jax.random.PRNGKey(0), mc), mc
)
ts = load_train_state("/tmp/mapper_debug_ckpt", template)
print("loaded; step =", int(ts.step), "active =",
      int(ts.anchors.num_active()), flush=True)

a = ts.anchors
act = np.asarray(a.active)
for name, arr in [("anchor", a.anchor), ("feat", a.feat),
                  ("offset", a.offset), ("scaling", a.scaling),
                  ("opacity", a.opacity), ("rotation", a.rotation)]:
    v = np.asarray(arr)[act]
    print(f"  state {name}: finite={np.isfinite(v).all()} "
          f"min={v.min():.3g} max={v.max():.3g}", flush=True)

kf_i = 80
fr = frames[kf_i]
kf = Keyframe(kf_id=kf_i, camera=cam, quat=fr.quat, trans=fr.trans,
              image=np.transpose(fr.load_rgb(), (2, 0, 1)))
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
gt = jnp.asarray(kf.image, jnp.float32)
bg = jnp.zeros(3)

params = {"anchors": ts.anchors.params(), "decoders": ts.decoders}


def loss_fn(params):
    anchors = ts.anchors.replace_params(params["anchors"])
    out = render(anchors, params["decoders"], cam_in, W, H, bg, mc, rc)
    img = out.image
    l1 = l1_loss(img, gt)
    s = ssim(img, gt)
    return 0.8 * l1 + 0.2 * (1.0 - s), out.num_compact


grads, num_compact = jax.jit(jax.grad(loss_fn, has_aux=True))(params)
print("num_compact:", int(num_compact), "vs cap", rc.compact, flush=True)

flat = jax.tree_util.tree_flatten_with_path(grads)[0]
total_bad = 0
for path, leaf in flat:
    g = np.asarray(leaf)
    if g.dtype.kind != "f":
        continue
    bad = ~np.isfinite(g)
    if bad.any():
        total_bad += int(bad.sum())
        name = jax.tree_util.keystr(path)
        print(f"  GRAD {name}: {int(bad.sum())} nonfinite "
              f"/ {g.size}", flush=True)
        if g.ndim >= 2 and g.shape[0] == mc.capacity:
            rows = np.unique(np.argwhere(bad)[:, 0])
            print(f"    rows: {len(rows)} anchors, e.g. {rows[:10]}",
                  flush=True)
            # inspect those anchors' state
            sc = np.asarray(a.scaling)[rows[:10]]
            op = np.asarray(a.opacity)[rows[:10], 0]
            print(f"    their scaling rows: {sc[:3]}")
            print(f"    their opacity: {op}")
print("total nonfinite grad elements:", total_bad, flush=True)

# ---- drill into forward intermediates for the bad anchors ----
from segs_slam_tpu.models.renderer import visible_filter  # noqa: E402
from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians  # noqa: E402
from segs_slam_tpu.ops.rasterizer.preprocess import (  # noqa: E402
    compute_cov3d,
    preprocess_gaussians,
)

bad_rows = np.array([743, 815, 819, 840, 841, 976, 1547, 1633, 1658, 1728])

state = ts.anchors
grid_scale3 = jnp.exp(state.scaling[:, :3])
rotation = state.rotation / jnp.maximum(
    jnp.linalg.norm(state.rotation, axis=-1, keepdims=True), 1e-12
)
visible = visible_filter(
    state.anchor, grid_scale3, rotation, cam_in["world_view_transform"],
    cam_in["full_proj_transform"], W, H, cam_in["tan_fovx"],
    cam_in["tan_fovy"], config=rc, valid=state.active,
)
neural = generate_neural_gaussians(
    state, ts.decoders, cam_in["camera_center"], cam_in["pose7"], visible,
    mc,
)
k = mc.n_offsets
print("visible[bad]:", np.asarray(visible)[bad_rows], flush=True)
for name in ("xyz", "scaling", "rotation", "opacity", "color"):
    v = np.asarray(getattr(neural, name))
    vb = v.reshape(mc.capacity, k, -1)[bad_rows]
    fin = np.isfinite(vb).all()
    print(f"  neural.{name}: bad-anchor finite={fin} "
          f"absmax={np.abs(vb[np.isfinite(vb)]).max():.4g} "
          f"min={vb[np.isfinite(vb)].min():.4g}", flush=True)
valid = np.asarray(getattr(neural, "valid", np.ones(1)))
if valid.size > 1:
    print("  neural.valid[bad]:", valid.reshape(mc.capacity, k)[bad_rows][:3],
          flush=True)

cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
proj = preprocess_gaussians(
    neural.xyz, cov3d, cam_in["world_view_transform"],
    cam_in["full_proj_transform"], W, H, float(cam_in["tan_fovx"]),
    float(cam_in["tan_fovy"]), rc,
    valid_in=getattr(neural, "valid", None),
)
for name in ("mean2d", "conic", "depth", "radius"):
    v = np.asarray(getattr(proj, name))
    vb = v.reshape(mc.capacity, k, -1)[bad_rows] if v.ndim > 1 else \
        v.reshape(mc.capacity, k)[bad_rows]
    finmask = np.isfinite(vb)
    print(f"  proj.{name}: bad-anchor finite={finmask.all()} "
          f"absmax={np.abs(vb[finmask]).max():.4g}", flush=True)

# ---- isolate: grads of rasterize() wrt the decoded gaussians ----
from segs_slam_tpu.ops.rasterizer import rasterize  # noqa: E402

neural_in = dict(
    xyz=neural.xyz, scaling=neural.scaling, rotation=neural.rotation,
    opacity=neural.opacity, color=neural.color,
)
nvalid = getattr(neural, "valid", None)


def rast_loss(ni):
    out = rasterize(
        ni["xyz"], ni["scaling"], ni["rotation"], ni["opacity"], ni["color"],
        cam_in["world_view_transform"], cam_in["full_proj_transform"], W, H,
        float(cam_in["tan_fovx"]), float(cam_in["tan_fovy"]), bg, config=rc,
        valid=nvalid,
    )
    return jnp.abs(out["image"] - gt).mean()


dn = jax.jit(jax.grad(rast_loss))(neural_in)
for name, g in dn.items():
    g = np.asarray(g)
    bad = ~np.isfinite(g)
    print(f"  dneural.{name}: nonfinite={int(bad.sum())} / {g.size}",
          flush=True)
    if bad.any():
        rows = np.unique(np.argwhere(bad)[:, 0] // mc.n_offsets)
        print(f"    bad anchors: {len(rows)} e.g. {rows[:10]}", flush=True)
