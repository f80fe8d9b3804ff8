"""Layout microbenchmark: is [N, 3] (narrow minor dim -> 128-lane padding)
the decode/project bandwidth killer vs [3, N] / flat SoA columns?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 655360


def bench_varied(fn, args_list, name=""):
    outs = [fn(*args_list[0]), fn(*args_list[1])]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list) * 1000
    print(f"{name:34s}: {dt:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    xs_n3 = [jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
             for _ in range(30)]
    xs_3n = [jnp.asarray(np.asarray(x).T.copy()) for x in xs_n3]
    xs_flat = [tuple(jnp.asarray(np.asarray(x)[:, i].copy())
                     for i in range(3)) for x in xs_n3]
    jax.block_until_ready((xs_n3, xs_3n, xs_flat))

    @jax.jit
    def f_n3(x):
        return x * 2.0 + 1.0

    @jax.jit
    def f_3n(x):
        return x * 2.0 + 1.0

    @jax.jit
    def f_flat(cols):
        return tuple(c * 2.0 + 1.0 for c in cols)

    bench_varied(f_n3, [(x,) for x in xs_n3], name=f"[{N},3] elementwise")
    bench_varied(f_3n, [(x,) for x in xs_3n], name=f"[3,{N}] elementwise")
    bench_varied(f_flat, [(x,) for x in xs_flat], name="3x flat [N] columns")

    # repeat k=10 (the decode assembly pattern)
    small = [jnp.asarray(rng.normal(size=(N // 10, 3)), jnp.float32)
             for _ in range(30)]
    jax.block_until_ready(small)

    @jax.jit
    def rep_n3(s):
        return jnp.repeat(s, 10, axis=0) * 2.0

    bench_varied(rep_n3, [(s,) for s in small],
                 name="repeat k=10 -> [N,3]")

    small_t = [jnp.asarray(np.asarray(s).T.copy()) for s in small]
    jax.block_until_ready(small_t)

    @jax.jit
    def rep_3n(s):
        return jnp.repeat(s, 10, axis=1) * 2.0

    bench_varied(rep_3n, [(s,) for s in small_t],
                 name="repeat k=10 -> [3,N]")


if __name__ == "__main__":
    main()
