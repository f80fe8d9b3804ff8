"""Microbenchmark: stream compaction via monotonic scatter vs full sort.

Hypothesis: compaction doesn't need a full payload sort — find the capacity
threshold with a KEY-ONLY sort, then scatter the selected rows to
cumsum-derived (strictly increasing, unique) destinations, which is the
fast scatter class on TPU. If the scatter is fast, the eval compact sort
(3.6 ms packed) drops to ~key-sort + scatter.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 655360
NC = 131072
NCOLS = 8


def bench(fn, args, n=50, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s}: {dt:7.3f} ms", flush=True)
    return out


def bench_varied(fn, args_list, name=""):
    """Feed a DIFFERENT pre-staged input each iteration, pipelined (no
    per-iter host sync — the axon tunnel round-trip poisons synced loops),
    one block at the end. Matches the recorder's timing methodology."""
    outs = [fn(*args_list[0]), fn(*args_list[1])]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list) * 1000
    print(f"{name:34s}: {dt:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64),
                      jnp.uint32)
    cols = tuple(jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64),
                             jnp.uint32) for _ in range(NCOLS))

    @jax.jit
    def full_sort(key, cols):
        return jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)

    bench(full_sort, (key, cols), name=f"full sort {NCOLS} payload cols")

    keys_v = [jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64),
                          jnp.uint32) for _ in range(60)]
    jax.block_until_ready(keys_v)
    bench_varied(full_sort, [(k, cols) for k in keys_v],
                 name="full sort (varied keys)")

    @jax.jit
    def key_only_sort(key):
        return jax.lax.sort((key,), num_keys=1)[0]

    bench(key_only_sort, (key,), name="key-only sort")
    bench_varied(key_only_sort, [(k,) for k in keys_v],
                 name="key-only sort (varied)")

    @jax.jit
    def partition_v(key, cols):
        ks = jax.lax.sort((key,), num_keys=1)[0]
        tau = ks[NC - 1]
        pred = key <= tau
        dst = jnp.cumsum(pred.astype(jnp.int32)) - 1
        dst = jnp.where(pred, dst, NC)
        return tuple(
            jnp.zeros(NC, c.dtype).at[dst].set(c, mode="drop",
                                               unique_indices=True)
            for c in cols
        )

    bench_varied(partition_v, [(k, cols) for k in keys_v],
                 name="partition (varied keys)")

    @jax.jit
    def partition(key, cols):
        ks = jax.lax.sort((key,), num_keys=1)[0]
        tau = ks[NC - 1]
        pred = key <= tau  # (ties may overflow; refined below)
        # tie refinement: keep only the first (NC - count(key < tau)) ties
        lt = key < tau
        n_lt = jnp.sum(lt.astype(jnp.int32))
        is_tie = key == tau
        tie_rank = jnp.cumsum(is_tie.astype(jnp.int32)) - 1
        pred = lt | (is_tie & (tie_rank < NC - n_lt))
        dst = jnp.cumsum(pred.astype(jnp.int32)) - 1
        dst = jnp.where(pred, dst, NC)  # dropped rows land out of range
        outs = tuple(
            jnp.zeros(NC, c.dtype).at[dst].set(c, mode="drop",
                                               unique_indices=True)
            for c in cols
        )
        return outs

    bench(partition, (key, cols), name="key sort + monotonic scatter x8")

    # sanity: partition keeps exactly the NC smallest keys' rows
    outs = partition(key, cols)
    ks = np.sort(np.asarray(key))
    tau = ks[NC - 1]
    sel = np.asarray(key) <= tau
    print("selected", int(np.asarray(outs[0] != 0).sum()), "rows; tau ok:",
          sel.sum() >= NC, flush=True)

    # variant: single scatter of a packed [N, NCOLS] matrix (row gather)
    mat = jnp.stack(cols, axis=1)

    @jax.jit
    def partition_rows(key, mat):
        ks = jax.lax.sort((key,), num_keys=1)[0]
        tau = ks[NC - 1]
        pred = key <= tau
        dst = jnp.cumsum(pred.astype(jnp.int32)) - 1
        dst = jnp.where(pred, dst, NC)
        return jnp.zeros((NC, NCOLS), mat.dtype).at[dst].set(
            mat, mode="drop", unique_indices=True)

    bench(partition_rows, (key, mat), name="key sort + row scatter [N,8]")


if __name__ == "__main__":
    main()
