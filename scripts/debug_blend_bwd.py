"""Instance-level localization of nonfinite gradients in the blend VJP."""

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
from segs_slam_tpu.models.renderer import visible_filter
from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.blend import binned_blend
from segs_slam_tpu.ops.rasterizer.preprocess import (
    compute_cov3d,
    preprocess_gaussians,
)
from segs_slam_tpu.train.step import init_train_state

W, H = 640, 480
cam = Camera(camera_id=0, width=W, height=H, fx=576.0, fy=576.0, cx=320,
             cy=240)
frames = datasets.load_replica("/root/data/synth_room")
mc = ModelConfig(capacity=65536)
rc = RasterConfig(tile=16, compact=131072, kmax=16, chunk=256)
template = init_train_state(
    empty_state(mc), init_decoders(jax.random.PRNGKey(0), mc), mc
)
ts = load_train_state("/tmp/mapper_debug_ckpt", template)

kf_i = 80
fr = frames[kf_i]
kf = Keyframe(kf_id=kf_i, camera=cam, quat=fr.quat, trans=fr.trans,
              image=np.transpose(fr.load_rgb(), (2, 0, 1)))
cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
gt = jnp.asarray(kf.image, jnp.float32)
bg = jnp.zeros(3)

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
    state, ts.decoders, cam_in["camera_center"], cam_in["pose7"], visible, mc
)
cov3d = compute_cov3d(neural.scaling, neural.rotation, 1.0)
proj = preprocess_gaussians(
    neural.xyz, cov3d, cam_in["world_view_transform"],
    cam_in["full_proj_transform"], W, H, float(cam_in["tan_fovx"]),
    float(cam_in["tan_fovy"]), rc, valid_in=neural.valid,
)
opac = neural.opacity.reshape(-1)
colors = neural.color

feats = (
    proj.mean2d[:, 0], proj.mean2d[:, 1],
    proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
    opac, colors[:, 0], colors[:, 1], colors[:, 2],
)
aux = {
    "rect_min_x": proj.rect_min[:, 0],
    "rect_min_y": proj.rect_min[:, 1],
    "rect_w": proj.rect_max[:, 0] - proj.rect_min[:, 0],
    "touched": proj.tiles_touched.astype(jnp.int32),
    "depth": jax.lax.stop_gradient(proj.depth),
    "alive": proj.radius > 0,
}
tx, ty = rc.grid(W, H)
static = (rc, tx, ty, rc.tile * rc.tile, False)


def blend_loss(feats):
    color, final_t, depth_img, ncontrib, n_inst, n_comp = binned_blend(
        feats, aux, bg.astype(jnp.float32), static
    )
    b = rc.tile
    img = (
        color.reshape(ty, tx, 3, b, b).transpose(2, 0, 3, 1, 4)
        .reshape(3, ty * b, tx * b)[:, :H, :W]
    )
    return jnp.abs(img - gt).mean()


dfeats = jax.jit(jax.grad(blend_loss))(feats)
names = ["mx", "my", "ca", "cb", "cc", "op", "r", "g", "b"]
badrows = set()
for name, g in zip(names, dfeats):
    g = np.asarray(g)
    bad = ~np.isfinite(g)
    print(f"dfeat {name}: nonfinite {int(bad.sum())}/{g.size}", flush=True)
    badrows |= set(np.argwhere(bad)[:, 0].tolist())
badrows = np.array(sorted(badrows))
print("bad gaussian rows:", len(badrows), badrows[:20], flush=True)
if len(badrows):
    r = badrows[0]
    print("example row", r, flush=True)
    for name, f in zip(names, feats):
        print(f"  {name} = {float(np.asarray(f)[r]):.6g}")
    print("  rect_min:", int(np.asarray(aux['rect_min_x'])[r]),
          int(np.asarray(aux['rect_min_y'])[r]),
          "w:", int(np.asarray(aux['rect_w'])[r]),
          "touched:", int(np.asarray(aux['touched'])[r]),
          "depth:", float(np.asarray(aux['depth'])[r]))
    np.save("/tmp/bad_rows.npy", badrows)
    np.savez("/tmp/blend_inputs.npz",
             **{n: np.asarray(f) for n, f in zip(names, feats)},
             **{k: np.asarray(v) for k, v in aux.items()})
