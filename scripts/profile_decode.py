"""Decode-stage sub-profile on the real saved map: visible_filter vs MLP
heads vs the full generate_neural_gaussians assembly.

Usage: python scripts/profile_decode.py /root/results/room_oracle_8k_full
"""

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import DecoderApply
from segs_slam_tpu.models.neural_gaussians import generate_neural_gaussians
from segs_slam_tpu.ops.rasterizer import RasterConfig, visible_filter

from profile_realmap import load_cams, load_map


def bench(fn, args, n=50, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s}: {dt:7.3f} ms", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--capacity", type=int, default=65536)
    args = p.parse_args()

    mc = ModelConfig(capacity=args.capacity)
    st, decoders, n = load_map(Path(args.run_dir), mc)
    cams, width, height = load_cams(Path(args.run_dir))
    cam = cams[0]
    rc = RasterConfig(tile=16, compact=131072, kmax=16, chunk=256,
                      ksmall=4, nlarge=8192)

    @jax.jit
    def vf(a, c):
        grid_scale3 = jnp.exp(a.scaling[:, :3])
        rotation = a.rotation / jnp.maximum(
            jnp.linalg.norm(a.rotation, axis=-1, keepdims=True), 1e-12)
        return visible_filter(
            a.anchor, grid_scale3, rotation, c["world_view_transform"],
            c["full_proj_transform"], width, height, c["tan_fovx"],
            c["tan_fovy"], config=rc, valid=a.active)

    visible = bench(vf, (st, cam), name="visible_filter")

    @jax.jit
    def heads_only(a, d, c):
        feat = a.feat
        ob_view = a.anchor - c["camera_center"][None, :]
        ob_dist = jnp.sqrt(
            jnp.sum(ob_view * ob_view, axis=-1, keepdims=True) + 1e-12)
        ob_view = ob_view / ob_dist
        cat = jnp.concatenate([feat, ob_view], axis=-1)
        color_in = cat
        if mc.appearance_dim:
            app = DecoderApply.appearance(d, c["pose7"][None, :])
            color_in = jnp.concatenate(
                [cat, jnp.broadcast_to(app, (a.anchor.shape[0],
                                             mc.appearance_dim))], axis=-1)
        return (DecoderApply.opacity(d, cat), DecoderApply.cov(d, cat),
                DecoderApply.color(d, color_in))

    bench(heads_only, (st, decoders, cam), name="MLP heads only")

    @jax.jit
    def gen(a, d, c, vis):
        return generate_neural_gaussians(a, d, c["camera_center"],
                                         c["pose7"], vis, mc)

    bench(gen, (st, decoders, cam, visible), name="generate_neural_gaussians")

    @jax.jit
    def full(a, d, c):
        return generate_neural_gaussians(a, d, c["camera_center"],
                                         c["pose7"], vf(a, c), mc)

    bench(full, (st, decoders, cam), name="decode total (vf+gen)")


if __name__ == "__main__":
    main()
