"""Primitive cost envelope for the binning redesign: lax.sort payload
scaling vs permutation scatters/gathers at the 65k-point row counts.
Informs whether sort-carried payloads should become post-sort permutation
scatters (fast only if unique-index scatter is bandwidth-bound on TPU).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    np.asarray(jnp.zeros(8) + 1.0)  # force sync mode
    n = 655_360
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    cols = [jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
            for _ in range(8)]
    fcols = [jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
             for _ in range(8)]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    for k in (0, 1, 2, 4, 6):
        f = jax.jit(lambda key, *cs: lax.sort((key,) + cs, num_keys=1,
                                              is_stable=True))
        dt = t(f, key, *cols[:k])
        print(f"sort 655k, {k} payload cols: {dt:6.2f} ms", flush=True)

    scat = jax.jit(lambda p, x: jnp.zeros(n, x.dtype).at[p].set(x))
    print(f"scatter-set unique random perm: {t(scat, perm, fcols[0]):6.2f} ms",
          flush=True)
    scad = jax.jit(lambda p, x: jnp.zeros(n, x.dtype).at[p].add(x))
    print(f"scatter-add unique random perm: {t(scad, perm, fcols[0]):6.2f} ms",
          flush=True)
    gath = jax.jit(lambda p, x: x[p])
    print(f"gather random perm:             {t(gath, perm, fcols[0]):6.2f} ms",
          flush=True)

    # multi-column scatter through one shared permutation
    scat5 = jax.jit(lambda p, *xs: tuple(
        jnp.zeros(n, x.dtype).at[p].set(x) for x in xs))
    print(f"5x scatter-set same perm:       {t(scat5, perm, *fcols[:5]):6.2f} ms",
          flush=True)
    # stacked variant: one [n,5] scatter
    stk = jnp.stack(fcols[:5], axis=1)
    scatm = jax.jit(lambda p, x: jnp.zeros((n, 5), x.dtype).at[p].set(x))
    print(f"[n,5] row scatter same perm:    {t(scatm, perm, stk):6.2f} ms",
          flush=True)
    gathm = jax.jit(lambda p, x: x[p])
    print(f"[n,5] row gather:               {t(gathm, perm, stk):6.2f} ms",
          flush=True)

    # segment_sum by sorted ids (the backward's fast path, for reference)
    ids = jnp.sort(jnp.asarray(rng.integers(0, 131072, n, dtype=np.int32)))
    seg = jax.jit(lambda i, x: jax.ops.segment_sum(x, i,
                                                   num_segments=131072))
    print(f"segment_sum 655k->131k sorted:  {t(seg, ids, fcols[0]):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
