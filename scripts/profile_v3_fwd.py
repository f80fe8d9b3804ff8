"""Per-fusion device profile of the v3 forward path (dev tool)."""

import collections
import glob
import gzip
import json
import os

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
cfg = RasterConfig(tile=16, compact=2**16, kmax=8, chunk=256)

args = dict(
    world_view_transform=jnp.asarray(kf.world_view_transform),
    full_proj_transform=jnp.asarray(kf.full_proj_transform),
    width=W, height=H, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    bg=jnp.zeros(3), config=cfg, interpret=False,
)

f = jax.jit(lambda *a: rasterize(*a, **args)["image"])
r = f(means, scales, quats, opac, colors)
r.block_until_ready()
os.system("rm -rf /tmp/trf")
with jax.profiler.trace("/tmp/trf"):
    for _ in range(5):
        r = f(means, scales, quats, opac, colors)
    r.block_until_ready()
files = glob.glob("/tmp/trf/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0]) as fh:
    tr = json.load(fh)
pids = {
    e["pid"]: e["args"].get("name", "")
    for e in tr["traceEvents"]
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
dur = collections.Counter()
info = {}
for e in tr["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], "") and not e["name"].startswith("jit"):
        dur[e["name"]] += e.get("dur", 0)
        if e.get("args"):
            info[e["name"]] = e["args"].get("long_name", "")[:160]
total = sum(dur.values())
print(f"total {total/5/1000:.2f} ms/iter")
for name, d in dur.most_common(14):
    print(f"{d/5000:7.2f} ms  {name}  | {info.get(name,'')[:120]}")
