"""Blend-stage sub-profile on the REAL saved map: compaction sort vs
selection sort vs instance sort vs Pallas kernel.

Usage: python scripts/profile_blend_stages.py /root/results/room_oracle_8k_full
"""

import argparse
import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.renderer import ChainedEvalRenderer
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.binning import (
    compact_gaussians,
    expand_and_sort,
)
from segs_slam_tpu.ops.rasterizer.blend import binned_blend

from profile_realmap import load_cams, load_map


def bench(fn, args, n=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:24s}: {dt:7.2f} ms", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--capacity", type=int, default=65536)
    p.add_argument("--compact", type=int, default=131072)
    p.add_argument("--kmax", type=int, default=16)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=8192)
    args = p.parse_args()

    run_dir = Path(args.run_dir)
    mc = ModelConfig(capacity=args.capacity)
    st, decoders, n = load_map(run_dir, mc)
    cams, width, height = load_cams(run_dir)
    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax,
                      chunk=256, ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0)
    chain = ChainedEvalRenderer(mc, rc, width, height, jnp.zeros(3))
    dec, proj, blend = chain.jits()
    neural = dec(st, decoders, cams[0])
    feats, aux = proj(neural, cams[0])
    jax.block_until_ready((feats, aux))
    tx, ty = rc.grid(width, height)
    npix = rc.tile * rc.tile
    static = (rc, tx, ty, npix, False)

    print(f"N={feats[0].shape[0]} compact={rc.compact} kmax={rc.kmax} "
          f"ksmall={rc.ksmall} nlarge={rc.nlarge} "
          f"max_instances={rc.max_instances} tiles={tx}x{ty}", flush=True)

    cjit = jax.jit(functools.partial(compact_gaussians, config=rc))
    cg = bench(cjit, (feats, aux), name="compact sort")

    ejit = jax.jit(functools.partial(expand_and_sort, num_tiles_x=tx,
                                     num_tiles_y=ty, config=rc))
    binned = bench(ejit, (cg,), name="expand+instance sort")

    bjit = jax.jit(functools.partial(binned_blend, static=static))
    bench(bjit, (feats, aux, jnp.zeros(3)), name="full binned_blend")

    from segs_slam_tpu.ops.rasterizer.binning import (
        compact_gaussians_packed,
        expand_and_sort_packed,
    )
    from segs_slam_tpu.ops.rasterizer.blend import binned_blend_eval

    pjit = jax.jit(functools.partial(compact_gaussians_packed, config=rc))
    pc = bench(pjit, (feats, aux), name="packed compact sort")
    pejit = jax.jit(functools.partial(expand_and_sort_packed, num_tiles_x=tx,
                                      num_tiles_y=ty, config=rc))
    bench(pejit, (pc,), name="packed expand+sort")
    pbjit = jax.jit(functools.partial(binned_blend_eval, static=static))
    bench(pbjit, (feats, aux, jnp.zeros(3)), name="packed binned_blend")

    bench(blend, (feats, aux), name="blend stage (jit)")

    # occupancy
    import numpy as np
    ts = np.asarray(binned.tile_start)
    te = np.asarray(binned.tile_stop)
    per_tile = te - ts
    print(f"instances/tile: mean {per_tile.mean():.0f} p50 "
          f"{np.percentile(per_tile, 50):.0f} p95 "
          f"{np.percentile(per_tile, 95):.0f} max {per_tile.max()}",
          flush=True)
    print("num_instances", int(binned.num_instances),
          "num_large", int(binned.num_large), flush=True)


if __name__ == "__main__":
    main()
