"""Isolate binning expansion cost variants (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 100_000
CAP = 2**20
NT = 1200
rng = np.random.default_rng(0)
touched = rng.integers(0, 8, N).astype(np.int32)
touched_j = jnp.asarray(touched)
rect_min = jnp.asarray(rng.integers(0, 70, (N, 2)), jnp.int32)
rect_max = rect_min + jnp.asarray(rng.integers(1, 4, (N, 2)), jnp.int32)
depth_g = jnp.asarray(rng.uniform(1, 10, N), jnp.float32)


def timeit(f, *a, name=""):
    t0 = time.time()
    r = jax.jit(f)(*a)
    jax.block_until_ready(r)
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(20):
        r = jax.jit(f)(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/20*1000:.2f} ms", flush=True)


def fill(off):
    mark = jnp.zeros(CAP, jnp.int32)
    mark = mark.at[off].max(jnp.arange(N, dtype=jnp.int32), mode="drop")
    return lax.cummax(mark)


def v_fill(t):
    cum = jnp.cumsum(t)
    return fill(cum - t)


def v_karith(t):
    cum = jnp.cumsum(t)
    off = cum - t
    g = fill(off)
    k = jnp.arange(CAP, dtype=jnp.int32) - off[g]
    return g, k


def v_full(t, rmn, rmx, d):
    cum = jnp.cumsum(t)
    off = cum - t
    total = cum[-1]
    g = fill(off)
    inst = jnp.arange(CAP, dtype=jnp.int32)
    in_range = inst < jnp.minimum(total, CAP)
    k = inst - off[g]
    rm = rmn[g]
    rw = jnp.maximum(rmx[g, 0] - rm[:, 0], 1)
    dy = k // rw
    dx = k - dy * rw
    tile = (rm[:, 1] + dy) * 75 + (rm[:, 0] + dx)
    tile = jnp.where(in_range, tile, NT).astype(jnp.int32)
    dep = jnp.where(in_range, d[g], jnp.inf).astype(jnp.float32)
    return tile, dep


def v_nodiv(t, rmn, rmx, d):
    # same but replace // with an alternative? keep for comparison of div cost
    cum = jnp.cumsum(t)
    off = cum - t
    g = fill(off)
    inst = jnp.arange(CAP, dtype=jnp.int32)
    k = inst - off[g]
    rm = rmn[g]
    rw = jnp.maximum(rmx[g, 0] - rm[:, 0], 1)
    dy = (k.astype(jnp.float32) * (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
    dx = k - dy * rw
    tile = (rm[:, 1] + dy) * 75 + (rm[:, 0] + dx)
    return tile


timeit(v_fill, touched_j, name="fill-forward only")
timeit(v_karith, touched_j, name="fill + k arith")
timeit(v_full, touched_j, rect_min, rect_max, depth_g, name="full expansion")
timeit(v_nodiv, touched_j, rect_min, rect_max, depth_g, name="expansion float-div")
