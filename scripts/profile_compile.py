"""Bisect v3 compile times (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

NC = 2**17
for KM in (16,):
    NK = NC * KM
    rng = np.random.default_rng(0)
    touched = jnp.asarray(rng.integers(0, 6, NC), jnp.int32)
    depth = jnp.asarray(rng.uniform(1, 10, NC), jnp.float32)
    rminx = jnp.asarray(rng.integers(0, 37, NC), jnp.int32)
    rminy = jnp.asarray(rng.integers(0, 27, NC), jnp.int32)
    rw = jnp.asarray(rng.integers(1, 4, NC), jnp.int32)
    feats = tuple(jnp.asarray(rng.normal(size=NC), jnp.float32) for _ in range(9))

    def expand_sort(t, d, rx, ry, rwv, *f):
        k = lax.broadcasted_iota(jnp.int32, (NC, KM), 1)
        ok = k < jnp.minimum(t, KM)[:, None]
        rr = jnp.maximum(rwv, 1)[:, None]
        dy = k // rr
        dx = k - dy * rr
        tile = (ry[:, None] + dy) * 40 + (rx[:, None] + dx)
        tile = jnp.where(ok, tile, 1200).reshape(-1)
        dep = jnp.broadcast_to(d[:, None], (NC, KM)).reshape(-1)
        gid = lax.broadcasted_iota(jnp.int32, (NC, KM), 0).reshape(-1)
        pays = tuple(jnp.broadcast_to(x[:, None], (NC, KM)).reshape(-1) for x in f)
        return lax.sort((tile, dep, gid) + pays, num_keys=2, is_stable=True)

    def sort3(t, d, rx, ry, rwv, *f):
        k = lax.broadcasted_iota(jnp.int32, (NC, KM), 1)
        ok = k < jnp.minimum(t, KM)[:, None]
        rr = jnp.maximum(rwv, 1)[:, None]
        dy = k // rr
        dx = k - dy * rr
        tile = (ry[:, None] + dy) * 40 + (rx[:, None] + dx)
        tile = jnp.where(ok, tile, 1200).reshape(-1)
        dep = jnp.broadcast_to(d[:, None], (NC, KM)).reshape(-1)
        gid = lax.broadcasted_iota(jnp.int32, (NC, KM), 0).reshape(-1)
        return lax.sort((tile, dep, gid), num_keys=2, is_stable=True)

    for name, fn in [("sort3ops", sort3), ("sort12ops", expand_sort)]:
        t0 = time.time()
        g = jax.jit(fn)
        r = g(touched, depth, rminx, rminy, rw, *feats)
        jax.block_until_ready(r)
        print(f"KM={KM} {name}: compile+run {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for _ in range(10):
            r = g(touched, depth, rminx, rminy, rw, *feats)
        jax.block_until_ready(r)
        print(f"KM={KM} {name}: {(time.time()-t0)/10*1000:.2f} ms", flush=True)
