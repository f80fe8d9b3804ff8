"""Dump HLO + per-fusion profile for composed binning (dev tool)."""

import collections
import glob
import gzip
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.preprocess import compute_cov3d, preprocess_gaussians
from segs_slam_tpu.ops.rasterizer import binning as B

W, H, N = 640, 480, 100_000
CAP = 2**20
rng = np.random.default_rng(0)
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0, cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
means = jnp.asarray(rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(N, 3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (N, 3))), jnp.float32)
quats = rng.normal(size=(N, 4))
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
cfg = RasterConfig(tile=16, max_instances=CAP, chunk=256)
wvt = jnp.asarray(kf.world_view_transform)
fpt = jnp.asarray(kf.full_proj_transform)
tx, ty = cfg.grid(W, H)
NT = tx * ty


def composed_1d(m, s, q):
    proj = preprocess_gaussians(m, compute_cov3d(s, q, 1.0), wvt, fpt, W, H,
                                cam.tan_fovx, cam.tan_fovy, cfg)
    touched = proj.tiles_touched.astype(jnp.int32)
    rminx = proj.rect_min[:, 0]
    rminy = proj.rect_min[:, 1]
    rw = jnp.maximum(proj.rect_max[:, 0] - rminx, 1)
    dep = proj.depth
    cum = jnp.cumsum(touched)
    total = cum[-1]
    off = cum - touched
    inst = jnp.arange(CAP, dtype=jnp.int32)
    g = B._fill_forward_owner(off, CAP)
    in_range = inst < jnp.minimum(total, CAP)
    k = inst - off[g]
    rwg = rw[g]
    dy = k // rwg
    dx = k - dy * rwg
    tile = (rminy[g] + dy) * tx + (rminx[g] + dx)
    tile = jnp.where(in_range, tile, NT).astype(jnp.int32)
    depv = jnp.where(in_range, dep[g], jnp.inf).astype(jnp.float32)
    ts, ds, gs = lax.sort((tile, depv, g), num_keys=2, is_stable=True)
    counts = jnp.zeros(NT + 1, jnp.int32).at[ts].add(1)[:-1]
    return ts, gs, counts


f = jax.jit(composed_1d)
r = f(means, scales, quats)
jax.block_until_ready(r)
os.system("rm -rf /tmp/tr2")
with jax.profiler.trace("/tmp/tr2"):
    for _ in range(3):
        r = f(means, scales, quats)
    jax.block_until_ready(r)
files = glob.glob("/tmp/tr2/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0]) as fh:
    tr = json.load(fh)
pids = {
    e["pid"]: e["args"].get("name", "")
    for e in tr["traceEvents"]
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
dur = collections.Counter()
args_by_name = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "") and not e["name"].startswith("jit_"):
        dur[e["name"]] += e.get("dur", 0)
        if e.get("args"):
            args_by_name[e["name"]] = e["args"]
for name, d in dur.most_common(10):
    print(f"{d/3000:.2f} ms/iter  {name}", flush=True)
    a = args_by_name.get(name, {})
    for kk in ("long_name", "hlo_op", "source_info", "tf_op"):
        if kk in a:
            print(f"    {kk}: {str(a[kk])[:300]}", flush=True)

hlo = f.lower(means, scales, quats).compile().as_text()
open("/tmp/binning_hlo.txt", "w").write(hlo)
print("hlo written, bytes:", len(hlo))
