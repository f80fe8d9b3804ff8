"""Bisect the real packed blend jit ON REAL DATA with distinct pipelined
inputs: time prefixes of the pipeline (compact -> expand -> sort -> unpack
-> pallas) to attribute device time under real fusion conditions.

Usage: python scripts/profile_blend_bisect.py /root/results/room_oracle_8k_full
"""

import argparse
import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.renderer import ChainedEvalRenderer
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.ops.rasterizer.binning import (
    DEPTH_KEY_BITS,
    _unpack2f16,
    compact_gaussians_packed,
    expand_and_sort_packed,
)
from segs_slam_tpu.ops.rasterizer import binning as B
from segs_slam_tpu.ops.rasterizer.blend import binned_blend_eval, _stack_feats

from bench_lib import dispatch_overhead, force_sync_mode
from profile_realmap import load_cams, load_map


def bench_varied(fn, args_list, name=""):
    outs = [fn(*args_list[0]), fn(*args_list[1])]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list) * 1000
    print(f"{name:40s}: {dt:7.3f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--capacity", type=int, default=65536)
    p.add_argument("--compact", type=int, default=131072)
    p.add_argument("--kmax", type=int, default=16)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=8192)
    args = p.parse_args()

    force_sync_mode()  # async-ack mode fakes every timing (bench_lib)
    print(f"dispatch overhead: {dispatch_overhead():.3f} ms", flush=True)
    run_dir = Path(args.run_dir)
    mc = ModelConfig(capacity=args.capacity)
    st, decoders, n = load_map(run_dir, mc)
    cams, width, height = load_cams(run_dir)
    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax,
                      chunk=256, ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0)
    chain = ChainedEvalRenderer(mc, rc, width, height, jnp.zeros(3))
    dec, proj, _ = chain.jits()

    # distinct real inputs: project stage output for each camera
    inputs = []
    for c in cams[:24]:
        neural = dec(st, decoders, c)
        feats, aux = proj(neural, c)
        inputs.append((feats, aux))
    jax.block_until_ready(inputs)
    print(f"{len(inputs)} real input sets staged", flush=True)

    tx, ty = rc.grid(width, height)
    npix = rc.tile * rc.tile
    static = (rc, tx, ty, npix, False)
    bg = jnp.zeros(3)

    @jax.jit
    def v1_compact(feats, aux):
        return compact_gaussians_packed(feats, aux, rc)

    bench_varied(v1_compact, inputs, name="v1 compact only")

    @jax.jit
    def v3_sorted(feats, aux):
        pc = compact_gaussians_packed(feats, aux, rc)
        return expand_and_sort_packed(pc, tx, ty, rc)

    bench_varied(v3_sorted, inputs, name="v3 compact+expand+sort+unpack")

    @jax.jit
    def v4_stacked(feats, aux):
        pc = compact_gaussians_packed(feats, aux, rc)
        fs, st_, sp, ni, nl = expand_and_sort_packed(pc, tx, ty, rc)
        return _stack_feats(fs, rc.max_instances, rc.chunk), st_, sp

    bench_varied(v4_stacked, inputs, name="v4 + stack [16,NK]")

    @jax.jit
    def v5_full(feats, aux):
        return binned_blend_eval(feats, aux, bg, static)[0]

    bench_varied(v5_full, inputs, name="v5 full packed blend (pallas)")

    # fully fused: decode + project + packed blend in ONE jit — no [N, c]
    # narrow-minor arrays materialize at jit boundaries
    from segs_slam_tpu.models.neural_gaussians import (
        generate_neural_gaussians,
    )
    from segs_slam_tpu.ops.rasterizer import visible_filter
    from segs_slam_tpu.ops.rasterizer.preprocess import (
        compute_cov3d,
        preprocess_gaussians,
    )

    @jax.jit
    def fused_eval(a, d, c):
        grid_scale3 = jnp.exp(a.scaling[:, :3])
        rotation = a.rotation / jnp.maximum(
            jnp.linalg.norm(a.rotation, axis=-1, keepdims=True), 1e-12)
        visible = visible_filter(
            a.anchor, grid_scale3, rotation, c["world_view_transform"],
            c["full_proj_transform"], width, height, c["tan_fovx"],
            c["tan_fovy"], config=rc, valid=a.active)
        n_ = generate_neural_gaussians(a, d, c["camera_center"], c["pose7"],
                                       visible, mc)
        cov3d = compute_cov3d(n_.scaling, n_.rotation, 1.0)
        pr = preprocess_gaussians(
            n_.xyz, cov3d, c["world_view_transform"],
            c["full_proj_transform"], width, height, c["tan_fovx"],
            c["tan_fovy"], rc, valid_in=n_.valid)
        feats = (pr.mean2d[:, 0], pr.mean2d[:, 1], pr.conic[:, 0],
                 pr.conic[:, 1], pr.conic[:, 2], n_.opacity.reshape(-1),
                 n_.color[:, 0], n_.color[:, 1], n_.color[:, 2])
        aux = {
            "rect_min_x": pr.rect_min[:, 0],
            "rect_min_y": pr.rect_min[:, 1],
            "rect_w": pr.rect_max[:, 0] - pr.rect_min[:, 0],
            "touched": pr.tiles_touched.astype(jnp.int32),
            "depth": pr.depth,
            "alive": pr.radius > 0,
        }
        color, *_ = binned_blend_eval(feats, aux, bg, static)
        b = rc.tile
        return (color.reshape(ty, tx, 3, b, b)
                .transpose(2, 0, 3, 1, 4)
                .reshape(3, ty * b, tx * b)[:, :height, :width])

    bench_varied(fused_eval, [(st, decoders, c) for c in cams[:24]],
                 name="FUSED eval render (1 jit)")


if __name__ == "__main__":
    main()
