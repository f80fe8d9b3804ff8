"""Sort/scatter primitive timing, hardened against dispatch-ack artifacts:
each jit returns a scalar checksum and reps are CHAINED (output feeds the
next call's input) so no dispatch can be elided or overlapped away.
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


def t_chain(f, x0, reps=10):
    x = f(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    np.asarray(jnp.zeros(8) + 1.0)
    n = 655_360
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))

    for k in (0, 1, 2, 4, 6):
        def f(key, k=k):
            cols = tuple(key + i for i in range(1, k + 1))
            out = lax.sort((key,) + cols, num_keys=1, is_stable=True)
            # feed the sorted key back, perturbed so the next sort differs
            s = out[0]
            for c in out[1:]:
                s = s ^ c
            return jnp.roll(s, 1) ^ (s >> 1)
        dt = t_chain(jax.jit(f), key0)
        print(f"chained sort 655k, {k} cols: {dt:6.2f} ms", flush=True)

    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def scat(x):
        y = jnp.zeros(n, x.dtype).at[perm].set(x)
        return y + 1
    print(f"chained scatter-set perm:  "
          f"{t_chain(jax.jit(scat), key0):6.2f} ms", flush=True)

    def gath(x):
        return x[perm] + 1
    print(f"chained gather perm:       "
          f"{t_chain(jax.jit(gath), key0):6.2f} ms", flush=True)

    def scat4(x):
        ys = [jnp.zeros(n, x.dtype).at[perm].set(x + i) for i in range(4)]
        s = ys[0]
        for y in ys[1:]:
            s = s ^ y
        return s
    print(f"chained 4x scatter perm:   "
          f"{t_chain(jax.jit(scat4), key0):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def batched():
    np.asarray(jnp.zeros(8) + 1.0)
    n = 655_360
    rng = np.random.default_rng(0)
    for b in (1, 2, 5, 10):
        key0 = jnp.asarray(
            rng.integers(0, 1 << 30, (b, n), dtype=np.int32))

        def f(key, b=b):
            cols = tuple(key + i for i in range(1, 6))
            out = lax.sort((key,) + cols, num_keys=1, is_stable=True,
                           dimension=1)
            s = out[0]
            for c in out[1:]:
                s = s ^ c
            return jnp.roll(s, 1, axis=1) ^ (s >> 1)

        dt = t_chain(jax.jit(f), key0)
        print(f"batched sort [{b},655k] x6cols: {dt:7.2f} ms total, "
              f"{dt/b:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--batched" in _s.argv:
        batched()
