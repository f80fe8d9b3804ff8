"""Raw primitive costs at the eval-path shapes (informs the round-5 FPS
attack): lax.sort at the pipeline's row/column counts, computed-index
gathers (sorted vs random indices), and top-k — the data that decides
whether compaction/selection should stay full-payload sorts or become
key+index sorts followed by payload gathers.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_sync():
    np.asarray(jnp.zeros(8) + 1.0)


def bench(f, args, reps=20, label=""):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1000 / reps
    print(f"{label}: {ms:6.2f} ms", flush=True)
    return ms


def t_sort(rows, ncols, dtype=jnp.uint32, reps=20, nkeys=1):
    rng = np.random.default_rng(0)
    if dtype == jnp.uint32:
        cols = [jnp.asarray(rng.integers(0, 2**31, rows, dtype=np.uint32))
                for _ in range(ncols)]
    else:
        cols = [jnp.asarray(rng.normal(size=rows).astype(np.float32))
                for _ in range(ncols)]
    f = jax.jit(lambda *cs: lax.sort(cs, num_keys=nkeys, is_stable=True))
    return bench(f, cols, reps,
                 f"sort {rows:>7d} rows x {ncols:2d} "
                 f"{np.dtype(dtype.dtype).name} cols")


def t_gather(n_src, n_idx, ncols, sorted_idx, reps=20):
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.integers(0, 2**31, n_src, dtype=np.uint32))
            for _ in range(ncols)]
    idx = rng.integers(0, n_src, n_idx).astype(np.int32)
    if sorted_idx:
        idx = np.sort(idx)
    idx = jnp.asarray(idx)

    def f(idx, *cs):
        return tuple(jnp.take(c, idx, indices_are_sorted=sorted_idx) for c in cs)

    return bench(jax.jit(f), (idx,) + tuple(cols), reps,
                 f"gather {n_idx:>7d} of {n_src} x {ncols} u32 "
                 f"({'sorted' if sorted_idx else 'random'} idx)")


def t_topk(n, k, reps=20):
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=n).astype(np.float32))
    f = jax.jit(lambda x: lax.top_k(x, k))
    return bench(f, (v,), reps, f"top_k {k} of {n}")


def t_argsort2(rows, reps=20):
    """key + iota sort (the permutation-only alternative)."""
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31, rows, dtype=np.uint32))
    iota = jnp.arange(rows, dtype=jnp.int32)
    f = jax.jit(lambda k, i: lax.sort((k, i), num_keys=1, is_stable=True))
    return bench(f, (key, iota), reps, f"sort {rows:>7d} rows x  2 (key+idx)")


def main():
    force_sync()
    print("== sorts ==")
    t_sort(2**16 * 10, 7)     # packed compaction sort (cap*K inputs)
    t_sort(2**16 * 10, 6)     # narrowed compaction (rgb8 packing)
    t_argsort2(2**16 * 10)    # key + idx only
    t_sort(393216, 6)         # 3-tier packed instance sort
    t_sort(393216, 5)         # narrowed instance sort
    t_sort(2**17, 7)          # footprint selection sort
    t_sort(2**16 * 4, 6)      # CE-compacted truncation alternative
    print("== gathers ==")
    t_gather(2**16 * 10, 2**17, 6, sorted_idx=True)
    t_gather(2**16 * 10, 2**17, 6, sorted_idx=False)
    t_gather(2**16 * 10, 2**14, 6, sorted_idx=True)
    print("== top_k ==")
    t_topk(2**16 * 10, 2**17)


if __name__ == "__main__":
    main()
