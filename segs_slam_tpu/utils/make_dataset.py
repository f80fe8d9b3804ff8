"""Generate a synthetic RGB-D dataset ON DISK in Replica (NICE-SLAM) layout.

Renders the synthetic gaussian room (color + expected-depth) along a
trajectory and writes results/frameXXXXXX.jpg, results/depthXXXXXX.png and
traj.txt — so the full online SLAM app (native decode -> native tracking ->
mapping) can run end-to-end with zero external data.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize
from segs_slam_tpu.utils.synthetic import make_room_scene, make_trajectory

DEPTH_SCALE = 6553.5


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--gaussians", type=int, default=6000)
    args = p.parse_args(argv)

    from PIL import Image

    out = Path(args.out)
    (out / "results").mkdir(parents=True, exist_ok=True)
    w = h = args.size
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    means, scales, quats, opac, colors = make_room_scene(args.gaussians)
    # near-opaque gaussians give clean depth for the tracker
    opac = np.clip(opac + 0.25, 0, 0.98)
    poses = make_trajectory(args.frames)
    cfg = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=128)
    arrs = [jnp.asarray(x) for x in (means, scales, quats, opac, colors)]

    @jax.jit
    def _render(wvt, fpt):
        out_d = rasterize(
            *arrs, wvt, fpt, w, h, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            config=cfg,
        )
        return out_d["image"], out_d["depth_map"], out_d["final_T"]

    traj_rows = []
    for i, (q, t) in enumerate(poses):
        kf = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
        img, depth, final_t = _render(
            jnp.asarray(kf.world_view_transform),
            jnp.asarray(kf.full_proj_transform),
        )
        img = np.asarray(img)
        # expected depth normalized by opacity mass; empty pixels -> 0
        alpha_mass = 1.0 - np.asarray(final_t)
        d = np.where(alpha_mass > 0.5, np.asarray(depth) / np.maximum(alpha_mass, 1e-6), 0.0)
        rgb8 = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(out / "results" / f"frame{i:06d}.jpg",
                                   quality=95)
        d16 = np.clip(d * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(out / "results" / f"depth{i:06d}.png")

        # traj.txt rows are camera-to-world 4x4
        W2C = np.eye(4)
        W2C[:3, :3] = kf.rotation_matrix()
        W2C[:3, 3] = kf.trans
        C2W = np.linalg.inv(W2C)
        traj_rows.append(C2W.reshape(-1))
    np.savetxt(out / "traj.txt", np.array(traj_rows))
    print(f"wrote {args.frames} frames to {out}")


if __name__ == "__main__":
    main()
