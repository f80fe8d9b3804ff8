"""Ground-truth device-time for binning primitive candidates (dev tool)."""

import collections
import glob
import gzip
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 100_000
CAP = 2**20
CAPA = CAP + 1200 * 256
NT = 1200
rng = np.random.default_rng(0)

table_f = jnp.asarray(rng.normal(size=N), jnp.float32)
table_small = jnp.asarray(rng.normal(size=NT), jnp.float32)
idx_g = jnp.asarray(np.sort(rng.integers(0, N, CAP)), jnp.int32)
idx_t = jnp.asarray(rng.integers(0, NT, CAP), jnp.int32)
dest = jnp.asarray(rng.permutation(CAPA)[:CAP], jnp.int32)
vals = jnp.asarray(rng.normal(size=CAP), jnp.float32)
vals9 = jnp.asarray(rng.normal(size=(CAP, 9)), jnp.float32)
sortkey = jnp.asarray(rng.integers(0, NT, CAP), jnp.int32)
starts = jnp.asarray(np.sort(rng.integers(0, CAP, N)), jnp.int32)
seg_ids = idx_g

CASES = {
    "gather_1M_from_100k": (lambda: table_f[idx_g],),
    "gather_1M_from_1200": (lambda: table_small[idx_t],),
    "scatter_set_1M_to_1.3M": (
        lambda: jnp.zeros(CAPA, jnp.float32).at[dest].set(vals, mode="drop"),
    ),
    "scatter_add_1M_to_100k": (
        lambda: jnp.zeros(N, jnp.float32).at[seg_ids].add(vals),
    ),
    "segsum9_1M_to_100k": (
        lambda: jax.ops.segment_sum(vals9, seg_ids, num_segments=N),
    ),
    "sort_1key_2pay": (
        lambda: lax.sort((sortkey, vals, idx_g), num_keys=1, is_stable=True),
    ),
    "sort_1key_10pay": (
        lambda: lax.sort(
            (sortkey, vals, idx_g) + tuple(vals9[:, i] for i in range(8)),
            num_keys=1,
            is_stable=True,
        ),
    ),
    "fill_forward_cummax": (
        lambda: lax.cummax(
            jnp.zeros(CAP, jnp.int32).at[starts].max(
                jnp.arange(N, dtype=jnp.int32), mode="drop"
            )
        ),
    ),
    "cumsum_1M": (lambda: jnp.cumsum(vals),),
}


def profile(name, fn):
    f = jax.jit(fn)
    r = f()
    jax.block_until_ready(r)
    trace_dir = f"/tmp/prim_trace/{name}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            r = f()
        jax.block_until_ready(r)
    # parse device total
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    total = 0.0
    with gzip.open(files[0]) as fh:
        tr = json.load(fh)
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in tr.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            if not e["name"].startswith("jit_"):  # skip the enclosing span
                total += e.get("dur", 0)
    print(f"{name}: {total/10/1000:.3f} ms/iter (device)", flush=True)


for name, (fn,) in CASES.items():
    profile(name, fn)
