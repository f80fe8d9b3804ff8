"""Offline training on a synthetic multi-view room — the `train_colmap`
equivalent end-to-end slice, self-contained (no datasets needed).

Mirrors the shape of examples/train_colmap.cpp: build a scene, seed anchors
from a sparse point cloud, run the full optimization with densification, and
report PSNR/SSIM over the training views (the reference's inline golden
numbers at examples/train_colmap.cpp:305 play this role for COLMAP scenes).
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer
from segs_slam_tpu.utils.synthetic import (
    make_room_scene,
    make_trajectory,
    render_gt_views,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--gaussians", type=int, default=4000)
    p.add_argument("--capacity", type=int, default=2**14)
    p.add_argument("--compact", type=int, default=2**15)
    p.add_argument("--kmax", type=int, default=8)
    p.add_argument("--ksmall", type=int, default=4)
    p.add_argument("--nlarge", type=int, default=2**13)
    p.add_argument("--n-offsets", type=int, default=10)
    p.add_argument("--seed-points", type=int, default=1500)
    p.add_argument("--voxel-size", type=float, default=0.02)
    p.add_argument("--log-every", type=int, default=250)
    p.add_argument("--save-ply", type=str, default="")
    p.add_argument("--freq-reg", action="store_true")
    args = p.parse_args(argv)

    w = h = args.size
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)

    print("rendering ground-truth views...", flush=True)
    means, scales, quats, opac, colors = make_room_scene(args.gaussians)
    poses = make_trajectory(args.views)
    kfs, _ = render_gt_views(means, scales, quats, opac, colors, poses, cam)

    mc = ModelConfig(
        capacity=args.capacity,
        n_offsets=args.n_offsets,
        voxel_size=args.voxel_size,
    )
    oc = OptimizationConfig(
        iterations=args.iters,
        update_until=min(25_500, int(args.iters * 0.85)),
        frequency_regulization_until=min(25_500, int(args.iters * 0.85)),
        high_frequency_regularization_start=min(5_000, args.iters // 6),
        use_frequency_regularization=args.freq_reg,
    )
    rc = RasterConfig(tile=16, compact=args.compact, kmax=args.kmax, chunk=256,
                      ksmall=args.ksmall,
                      nlarge=args.nlarge if args.ksmall else 0)

    trainer = Trainer(mc, oc, rc, width=w, height=h)
    trainer.scene.add_camera(cam)
    for kf in kfs:
        trainer.add_keyframe(kf)

    # Seed the map from a noisy subsample of the true geometry (the role the
    # SLAM/COLMAP sparse points play).
    rng = np.random.default_rng(1)
    sel = rng.choice(len(means), size=min(args.seed_points, len(means)), replace=False)
    seed_pts = means[sel] + rng.normal(0, 0.01, (len(sel), 3))
    n = trainer.initialize_map(seed_pts)
    print(f"initialized {n} anchors; training {args.iters} iters "
          f"on {len(kfs)} views at {w}x{h}", flush=True)

    t0 = time.time()
    trainer.train(args.iters, log_every=args.log_every)
    dt = time.time() - t0
    print(f"trained in {dt:.0f}s ({dt/max(trainer.iteration,1)*1000:.1f} ms/iter)")

    metrics = trainer.evaluate()
    print("eval:", {k: round(v, 3) for k, v in metrics.items()})
    if args.save_ply:
        trainer.save_ply(args.save_ply)
        print("saved", args.save_ply)
    return metrics


if __name__ == "__main__":
    main()
