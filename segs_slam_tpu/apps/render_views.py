"""Offscreen novel-view renderer — the viewer's renderFromPose equivalent.

The reference viewer (GLFW/ImGui, flagged "under development" and disabled in
the shipped examples) renders free views via GaussianMapper::renderFromPose
(reference: src/gaussian_mapper.cpp:2484-2538, viewer/imgui_viewer.cpp).
Headless TPU hosts have no GL stack, so the equivalent here renders novel
view sequences (orbit or interpolated trajectory) to image files / an MP4-
ready frame directory from a saved checkpoint.

Usage:
  python -m segs_slam_tpu.apps.render_views --ckpt <orbax dir> --out frames/ \
      [--orbit-frames 60] [--size 480]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe


def orbit_poses(center, radius, height, n, look_at):
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        cam_pos = center + np.array(
            [radius * np.cos(ang), height, radius * np.sin(ang)]
        )
        look = look_at - cam_pos
        look = look / np.linalg.norm(look)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, look)
        right /= np.linalg.norm(right)
        up2 = np.cross(look, right)
        R = np.stack([right, up2, look], axis=0)
        t = -R @ cam_pos
        from segs_slam_tpu.core import se3

        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
        poses.append((q, t))
    return poses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=480)
    p.add_argument("--orbit-frames", type=int, default=60)
    p.add_argument("--orbit-radius", type=float, default=1.5)
    p.add_argument("--capacity", type=int, default=2**14)
    p.add_argument("--compact", type=int, default=2**15)
    p.add_argument("--kmax", type=int, default=8)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=2**13)
    args = p.parse_args(argv)

    from PIL import Image

    from segs_slam_tpu.io.checkpoint import load_train_state
    from segs_slam_tpu.models.anchors import empty_state
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.models.decoders import init_decoders
    from segs_slam_tpu.models.renderer import EvalRenderer
    from segs_slam_tpu.ops.rasterizer import RasterConfig
    from segs_slam_tpu.train.step import init_train_state

    mc = ModelConfig(capacity=args.capacity)
    template = init_train_state(
        empty_state(mc), init_decoders(jax.random.PRNGKey(0), mc), mc
    )
    ts = load_train_state(args.ckpt, template)

    w = h = args.size
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax, chunk=256,
                      ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0)

    anchors_np = np.asarray(ts.anchors.anchor)
    active = np.asarray(ts.anchors.active)
    center = anchors_np[active].mean(axis=0)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    poses = orbit_poses(center, args.orbit_radius, -0.3, args.orbit_frames,
                        center + np.array([0, 0, 0.5]))

    from segs_slam_tpu.models.renderer import calibrate_eval_config

    def _cam_in(i, q, t):
        kf = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
        return {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}

    cal_cams = [_cam_in(i, q, t)
                for i, (q, t) in enumerate(poses[:: max(1, len(poses) // 4)])]
    rc = calibrate_eval_config(rc, mc, ts.anchors, ts.decoders, cal_cams[:4],
                               w, h)
    chain = EvalRenderer(mc, rc, w, h, jnp.zeros(3))

    def _render(cam_in):
        return chain(ts.anchors, ts.decoders, cam_in)

    for i, (q, t) in enumerate(poses):
        kf = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
        cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
        img = np.asarray(_render(cam_in))
        rgb8 = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(
            np.uint8
        )
        Image.fromarray(rgb8).save(out / f"view{i:04d}.png")
    print(f"wrote {len(poses)} views to {out}")


if __name__ == "__main__":
    main()
