"""Bisect bin_gaussians with real proj inputs (dev tool)."""

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

cov = compute_cov3d(scales, quats, 1.0)
proj = preprocess_gaussians(means, cov, wvt, fpt, W, H, cam.tan_fovx, cam.tan_fovy, cfg)
proj = jax.tree.map(jnp.asarray, proj)
jax.block_until_ready(proj)

touched_in = proj.tiles_touched.astype(jnp.int32)
rect_min_in = proj.rect_min
rect_max_in = proj.rect_max
depth_in = proj.depth


def run(upto):
    def f(touched, rect_min_a, rect_max_a, depth_a):
        cum = jnp.cumsum(touched)
        total = cum[-1]
        offsets = cum - touched
        inst = jnp.arange(cap, dtype=jnp.int32)
        g = _fill_forward_owner(offsets, cap)
        in_range = inst < jnp.minimum(total, cap)
        k = inst - offsets[g]
        rm = rect_min_a[g]
        rw = jnp.maximum(rect_max_a[g, 0] - rm[:, 0], 1)
        dy = k // rw
        dx = k - dy * rw
        tile = (rm[:, 1] + dy) * tx + (rm[:, 0] + dx)
        tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
        depth = jnp.where(in_range, depth_a[g], jnp.inf).astype(jnp.float32)
        if upto == "keys":
            return tile, depth
        ts, ds, gs = lax.sort((tile, depth, g), num_keys=2, is_stable=True)
        if upto == "sorted":
            return ts, gs
        counts = jnp.zeros(num_tiles + 1, jnp.int32).at[ts].add(1)[:-1]
        if upto == "counts":
            return counts
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

    g = jax.jit(f)
    r = g(touched_in, rect_min_in, rect_max_in, depth_in)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(20):
        r = g(touched_in, rect_min_in, rect_max_in, depth_in)
    jax.block_until_ready(r)
    print(f"{upto}: {(time.time()-t0)/20*1000:.2f} ms", flush=True)


for name in ["keys", "sorted", "counts", "scatter", "all"]:
    run(name)
