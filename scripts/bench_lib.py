"""Trustworthy TPU timing under the axon tunnel.

Findings (round 3, scripts/prof_trigger* experiments):
  * In a fresh process, `jax.block_until_ready` returns on dispatch ACK, not
    completion — a 1.6 TFLOP matmul chain "finishes" in 0.05 ms. Every
    timing taken in that state is fiction.
  * After the process performs ONE device->host transfer (np.asarray of any
    device array), the runtime switches to genuinely synchronous completion
    tracking for the rest of the process. Timings taken in this state match
    wall-clock app artifacts (render_time.txt).
  * In sync mode each dispatch carries a fixed overhead (tunnel round trip,
    ~0.5-1 ms) — measure it with a trivial jit and subtract when
    attributing device work.

Usage: call force_sync_mode() once at start; use pipe() for per-call wall
time and dispatch_overhead() to calibrate.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def force_sync_mode():
    """One tiny D2H flips the axon runtime to synchronous completion."""
    _ = np.asarray(jnp.zeros(4) + 1.0)


def pipe(fn, args_list, name="", reps=1):
    """Pipelined loop over distinct inputs, one sync at the end; returns
    ms/call."""
    outs = [fn(*args_list[0]), fn(*args_list[-1])]
    jax.block_until_ready(outs)
    n = 0
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [fn(*a) for a in args_list]
        n += len(args_list)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n * 1000
    if name:
        print(f"{name:44s}: {dt:7.3f} ms", flush=True)
    return dt


def dispatch_overhead(n=40):
    """Per-dispatch overhead of a trivial jit in the current mode."""
    xs = [jnp.asarray(np.full(8, i, np.float32)) for i in range(n)]
    jax.block_until_ready(xs)

    @jax.jit
    def triv(x):
        return x + 1.0

    return pipe(triv, [(x,) for x in xs])
