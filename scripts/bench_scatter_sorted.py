"""Sorted/monotone-index scatter+gather costs at 655k rows — can they
replace the compaction sort?"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def t_chain(f, x0, reps=10):
    x = f(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps * 1000

np.asarray(jnp.zeros(8) + 1.0)
n = 655_360
nc = 131_072
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
alive = jnp.asarray(rng.uniform(0, 1, n) < 0.34)

def compact_scatter(x):
    a = alive & (x > -1)  # depend on x
    dest = jnp.cumsum(a.astype(jnp.int32)) - 1
    dest = jnp.where(a, dest, nc)  # clamp dead to sink
    out = jnp.zeros(nc, x.dtype).at[dest].set(x, mode="drop")
    return jnp.pad(out + 1, (0, n - nc))

print(f"cumsum+scatter compact 1 col : {t_chain(jax.jit(compact_scatter), x0):6.2f} ms", flush=True)

def compact_scatter8(x):
    a = alive & (x > -1)
    dest = jnp.cumsum(a.astype(jnp.int32)) - 1
    dest = jnp.where(a, dest, nc)
    cols = jnp.stack([x + i for i in range(8)], axis=1)  # [n, 8]
    out = jnp.zeros((nc, 8), x.dtype).at[dest].set(cols, mode="drop")
    s = out.sum(axis=1)
    return jnp.pad(s, (0, n - nc))

print(f"cumsum+scatter compact 8 col : {t_chain(jax.jit(compact_scatter8), x0):6.2f} ms", flush=True)

def compact_scatter8sep(x):
    a = alive & (x > -1)
    dest = jnp.cumsum(a.astype(jnp.int32)) - 1
    dest = jnp.where(a, dest, nc)
    outs = [jnp.zeros(nc, x.dtype).at[dest].set(x + i, mode="drop")
            for i in range(8)]
    s = outs[0]
    for o in outs[1:]:
        s = s + o
    return jnp.pad(s, (0, n - nc))

print(f"cumsum+scatter compact 8 sep : {t_chain(jax.jit(compact_scatter8sep), x0):6.2f} ms", flush=True)

idx_sorted = jnp.asarray(np.sort(rng.choice(n, nc, replace=False)).astype(np.int32))
def gather_sorted(x):
    return jnp.pad(x[idx_sorted] + 1, (0, n - nc))
print(f"gather 131k sorted idx       : {t_chain(jax.jit(gather_sorted), x0):6.2f} ms", flush=True)

def cumsum_only(x):
    return jnp.cumsum(x)
print(f"cumsum 655k                  : {t_chain(jax.jit(cumsum_only), x0):6.2f} ms", flush=True)
