"""V3 binning building blocks at real model scale (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

NG = 600_000  # padded neural gaussians (60k anchors x 10 offsets)
NC = 2**17  # compact capacity
KMAX = 16
NK = NC * KMAX  # ~2M instances
NT = 1200
rng = np.random.default_rng(0)

valid = jnp.asarray(rng.uniform(size=NG) < 0.18)  # ~110k valid
fields = jnp.asarray(rng.normal(size=(NG, 16)), jnp.float32)
touched_c = jnp.asarray(rng.integers(0, 6, NC), jnp.int32)
feats_c = jnp.asarray(rng.normal(size=(NC, 9)), jnp.float32)
rminx = jnp.asarray(rng.integers(0, 37, NC), jnp.int32)
rminy = jnp.asarray(rng.integers(0, 27, NC), jnp.int32)
rw = jnp.asarray(rng.integers(1, 4, NC), jnp.int32)
depth_c = jnp.asarray(rng.uniform(1, 10, NC), jnp.float32)


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


def compact_sort(v, f):
    key = (~v).astype(jnp.int32)
    ops = (key,) + tuple(f[:, i] for i in range(16))
    out = lax.sort(ops, num_keys=1, is_stable=True)
    return tuple(o[:NC] for o in out[1:])


timefn(compact_sort, valid, fields, name=f"compaction sort {NG} x 17 ops")


def compact_scatter(v, f):
    rank = jnp.cumsum(v.astype(jnp.int32)) - 1
    dest = jnp.where(v, rank, NC)
    out = jnp.zeros((NC, 16), jnp.float32).at[dest].set(f, mode="drop")
    return out


timefn(compact_scatter, valid, fields, name=f"compaction scatter {NG}x16 rows")


def expand_sort(t, d, rx, ry, rwv, f):
    k = lax.broadcasted_iota(jnp.int32, (NC, KMAX), 1)
    ok = k < t[:, None]
    dy = k // rwv[:, None]
    dx = k - dy * rwv[:, None]
    tile = (ry[:, None] + dy) * 40 + (rx[:, None] + dx)
    tile = jnp.where(ok, tile, NT).reshape(-1)
    dep = jnp.broadcast_to(d[:, None], (NC, KMAX)).reshape(-1)
    gid = lax.broadcasted_iota(jnp.int32, (NC, KMAX), 0).reshape(-1)
    pay = [jnp.broadcast_to(f[:, i : i + 1], (NC, KMAX)).reshape(-1) for i in range(9)]
    return lax.sort((tile, dep, gid, *pay), num_keys=2, is_stable=True)


r = timefn(expand_sort, touched_c, depth_c, rminx, rminy, rw, feats_c,
           name=f"expand+sort {NK} x 12 ops")

gid_sorted = r[2]
dvals = jnp.asarray(rng.normal(size=(NK, 16)), jnp.float32)
timefn(lambda i, v: jax.ops.segment_sum(v, i, num_segments=NC), gid_sorted, dvals,
       name=f"segment_sum [{NK},16] -> [{NC},16]")
timefn(lambda ts: (jnp.searchsorted(ts, jnp.arange(NT, dtype=jnp.int32), side="left"),
                   jnp.searchsorted(ts, jnp.arange(NT, dtype=jnp.int32), side="right")),
       r[0], name="tile ranges searchsorted")
