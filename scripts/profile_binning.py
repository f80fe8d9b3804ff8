"""Bisect binning pipeline cost on TPU (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from segs_slam_tpu.core import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.preprocess import compute_cov3d, preprocess_gaussians
from segs_slam_tpu.ops.rasterizer.binning import _fill_forward_owner, aligned_capacity

W, H, N = 640, 480, 100_000
rng = np.random.default_rng(0)
cam = Camera(camera_id=0, width=W, height=H, fx=500.0, fy=500.0, cx=W / 2, cy=H / 2)
kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
means = jnp.asarray(rng.uniform([-3, -2, 1.5], [3, 2, 10], size=(N, 3)), jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (N, 3))), jnp.float32)
quats = rng.normal(size=(N, 4))
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
quats = jnp.asarray(quats, jnp.float32)
cfg = RasterConfig(tile=16, max_instances=2**20, chunk=256)
wvt = jnp.asarray(kf.world_view_transform)
fpt = jnp.asarray(kf.full_proj_transform)
tx, ty = cfg.grid(W, H)
num_tiles = tx * ty
cap = cfg.max_instances
ch = cfg.chunk


def stage(upto):
    def f(m, s, q):
        cov = compute_cov3d(s, q, 1.0)
        proj = preprocess_gaussians(m, cov, wvt, fpt, W, H, cam.tan_fovx, cam.tan_fovy, cfg)
        touched = proj.tiles_touched.astype(jnp.int32)
        cum = jnp.cumsum(touched)
        total = cum[-1]
        offsets = cum - touched
        inst = jnp.arange(cap, dtype=jnp.int32)
        g = _fill_forward_owner(offsets, cap)
        in_range = inst < jnp.minimum(total, cap)
        k = inst - offsets[g]
        rect_min = proj.rect_min[g]
        rect_w = jnp.maximum(proj.rect_max[g, 0] - rect_min[:, 0], 1)
        dy = k // rect_w
        dx = k - dy * rect_w
        tile = (rect_min[:, 1] + dy) * tx + (rect_min[:, 0] + dx)
        tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
        depth = jnp.where(in_range, proj.depth[g], jnp.inf).astype(jnp.float32)
        if upto == "keys":
            return tile, depth
        ts, ds, gs = lax.sort((tile, depth, g), num_keys=2, is_stable=True)
        if upto == "sorted":
            return ts, gs
        counts = jnp.zeros(num_tiles + 1, jnp.int32).at[ts].add(1)[:-1]
        tile_stop = jnp.cumsum(counts)
        tile_start = tile_stop - counts
        padded = (counts + ch - 1) // ch * ch
        seg_cum = jnp.cumsum(padded)
        seg_start = seg_cum - padded
        cap_a = aligned_capacity(cfg, W, H)
        local = inst - tile_start[ts]
        dest = jnp.where(ts < num_tiles, seg_start[ts] + local, cap_a)
        ga = jnp.zeros(cap_a, jnp.int32).at[dest].set(gs, mode="drop")
        if upto == "scatter":
            return ga
        slot = jnp.arange(cap_a, dtype=jnp.int32)
        t_of = _fill_forward_owner(seg_start, cap_a)
        local_slot = slot - seg_start[t_of]
        slot_valid = (slot < seg_cum[-1]) & (local_slot < counts[t_of])
        return ga, slot_valid, t_of

    return jax.jit(f)


for name in ["keys", "sorted", "scatter", "all"]:
    f = stage(name)
    t0 = time.time()
    r = f(means, scales, quats)
    jax.block_until_ready(r)
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(20):
        r = f(means, scales, quats)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/20*1000:.2f} ms", flush=True)
