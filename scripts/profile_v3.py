"""Measure binning-v3 candidate costs in-program (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 100_000
KMAX = 16
NK = N * KMAX
NT = 1200
rng = np.random.default_rng(0)

touched = jnp.asarray(rng.integers(0, 8, N), jnp.int32)
depth_g = jnp.asarray(rng.uniform(1, 10, N), jnp.float32)
rminx = jnp.asarray(rng.integers(0, 37, N), jnp.int32)
rminy = jnp.asarray(rng.integers(0, 27, N), jnp.int32)
rw = jnp.asarray(rng.integers(1, 4, N), jnp.int32)
feats = jnp.asarray(rng.normal(size=(N, 9)), jnp.float32)


def timefn(f, *a, name="", n=20):
    g = jax.jit(f)
    r = g(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return r


def expand_sort(t, d, rx, ry, rwv, f):
    k = lax.broadcasted_iota(jnp.int32, (N, KMAX), 1)
    valid = k < t[:, None]
    dy = k // rwv[:, None]
    dx = k - dy * rwv[:, None]
    tile = (ry[:, None] + dy) * 40 + (rx[:, None] + dx)
    tile = jnp.where(valid, tile, NT).reshape(-1)
    dep = jnp.broadcast_to(d[:, None], (N, KMAX)).reshape(-1)
    gid = lax.broadcasted_iota(jnp.int32, (N, KMAX), 0).reshape(-1)
    pay = [jnp.broadcast_to(f[:, i : i + 1], (N, KMAX)).reshape(-1) for i in range(9)]
    out = lax.sort((tile, dep, gid, *pay), num_keys=2, is_stable=True)
    return out


r = timefn(expand_sort, touched, depth_g, rminx, rminy, rw, feats,
           name="expand+sort 1.6M x 12 operands")

ts_sorted = r[0]


def ranges(ts):
    tiles = jnp.arange(NT, dtype=jnp.int32)
    return (
        jnp.searchsorted(ts, tiles, side="left"),
        jnp.searchsorted(ts, tiles, side="right"),
    )


timefn(ranges, ts_sorted, name="searchsorted small-side (1200 queries)")

gid_sorted = r[2]
dvals = jnp.asarray(rng.normal(size=(NK, 16)), jnp.float32)


def segsum(ids, v):
    return jax.ops.segment_sum(v, ids, num_segments=N)


timefn(segsum, gid_sorted, dvals, name="segment_sum [1.6M,16] -> [100k,16]")


def stack16(p):
    z = jnp.zeros((NK,), jnp.float32)
    return jnp.stack(list(p) + [z] * 4, axis=0)


timefn(stack16, r[3:] + (r[1], ts_sorted.astype(jnp.float32), gid_sorted.astype(jnp.float32)), name="stack 12 x 1.6M -> [16, NK]")
