"""Generate a synthetic COLMAP scene ON DISK (binary sparse model + images).

Renders the synthetic gaussian room along a trajectory and writes the exact
layout examples/train_colmap.cpp consumes (reference:
examples/train_colmap.cpp:35-240 readColmapScene; binary formats per
third_party/colmap/utils/endian.h):

  <out>/sparse/0/cameras.bin     (one PINHOLE camera)
  <out>/sparse/0/images.bin      (world-to-camera quat+trans per view)
  <out>/sparse/0/points3D.bin    (subsampled surface points as the sparse
                                  SfM cloud, with per-point color)
  <out>/images/<name>.png

so apps/train_colmap.py runs the offline 30k-iteration golden gate
(PSNR_GS 31.22 / SSIM 0.9434, examples/train_colmap.cpp:305) with zero
external data.
"""

from __future__ import annotations

import argparse
import struct
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize
from segs_slam_tpu.utils.synthetic import make_room_scene, make_trajectory


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--views", type=int, default=48)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--gaussians", type=int, default=8000)
    p.add_argument("--sparse-points", type=int, default=12000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from PIL import Image

    out = Path(args.out)
    sparse = out / "sparse" / "0"
    imgdir = out / "images"
    sparse.mkdir(parents=True, exist_ok=True)
    imgdir.mkdir(parents=True, exist_ok=True)

    w, h = args.width, args.height
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    means, scales, quats, opac, colors = make_room_scene(
        args.gaussians, seed=args.seed)
    opac = np.full_like(opac, 0.995)  # opaque surfaces (see make_rgbd_dataset)
    poses = make_trajectory(args.views, seed=args.seed)
    cfg = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=128)
    arrs = [jnp.asarray(x) for x in (means, scales, quats, opac, colors)]

    @jax.jit
    def _render(wvt, fpt):
        o = rasterize(
            *arrs, wvt, fpt, w, h, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            config=cfg,
        )
        return o["image"]

    # cameras.bin: one PINHOLE camera (model id 1: fx fy cx cy)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))
        f.write(struct.pack("<dddd", cam.fx, cam.fy, cam.cx, cam.cy))

    # images.bin: quat (w x y z) + trans, world-to-camera, zero 2D features
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(poses)))
        for i, (q, t) in enumerate(poses):
            name = f"view{i:04d}.png"
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *[float(v) for v in q]))
            f.write(struct.pack("<ddd", *[float(v) for v in t]))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

            kf = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
            img = _render(jnp.asarray(kf.world_view_transform),
                          jnp.asarray(kf.full_proj_transform))
            rgb = np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
            Image.fromarray((rgb * 255).astype(np.uint8)).save(imgdir / name)

    # points3D.bin: subsample of the true surface (the SfM sparse cloud)
    rng = np.random.default_rng(args.seed)
    sel = rng.choice(len(means), min(args.sparse_points, len(means)),
                     replace=False)
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(sel)))
        for pid, si in enumerate(sel):
            xyz = means[si] + rng.normal(scale=0.005, size=3)  # SfM noise
            rgb = (np.clip(colors[si], 0, 1) * 255).astype(np.uint8)
            f.write(struct.pack("<Q", pid + 1))
            f.write(struct.pack("<ddd", *[float(v) for v in xyz]))
            f.write(struct.pack("<BBB", *[int(v) for v in rgb]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    print(f"wrote COLMAP scene: {len(poses)} views, {len(sel)} points -> {out}")


if __name__ == "__main__":
    main()
