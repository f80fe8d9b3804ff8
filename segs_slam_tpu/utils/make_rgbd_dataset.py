"""Generate a synthetic RGB-D dataset ON DISK in Replica NICE-SLAM layout.

Renders the synthetic gaussian room along a trajectory and writes

  <out>/results/frame%06d.jpg          (RGB)
  <out>/results/depth%06d.png          (uint16, depth * depth_scale)
  <out>/traj.txt                       (4x4 camera-to-world per line, row-major)

so apps/slam_rgbd.py --dataset replica runs end-to-end with zero external
data (reference driver: examples/replica_rgbd.cpp, NICE-SLAM dataset layout).

With --loop the trajectory is a closed orbit that revisits its starting pose
at the end — a ground-truth loop-closure scenario for exercising the
LOOP_CLOSING_BA producer path (reference: ORB-SLAM3/src/LoopClosing.cc:1201).
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

DEPTH_SCALE = 6553.5  # Replica convention: uint16 = meters * 6553.5


def make_loop_trajectory(n_views: int, seed: int = 0):
    """Closed orbit: yaw sweeps a full 2*pi so the final views re-observe the
    first views' scene content (loop-closure ground truth)."""
    from segs_slam_tpu.core import se3

    rng = np.random.default_rng(seed)
    room_center = np.array([0.0, 0.0, 3.0])  # interior of make_room_scene box
    poses = []
    for i in range(n_views):
        ang = 2.0 * np.pi * i / n_views
        radius = 0.9 + 0.05 * np.sin(3 * ang)
        center = room_center + np.array(
            [radius * np.sin(ang), 0.15 * np.sin(2 * ang), radius * np.cos(ang)]
        )
        center += rng.normal(scale=0.01, size=3)
        # look outward from the room center, tangentially biased
        fwd = np.array([np.sin(ang + 0.35), -0.08, np.cos(ang + 0.35)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=0)  # world-to-camera
        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
        t = -R @ center
        poses.append((q, t))
    return poses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--gaussians", type=int, default=8000)
    p.add_argument("--loop", action="store_true",
                   help="closed-orbit trajectory for loop-closure testing")
    p.add_argument("--imu", action="store_true",
                   help="derive a 200 Hz IMU stream (imu.txt) from the "
                        "trajectory (reference analogue: the inertial entry "
                        "points; see utils/make_imu.py)")
    p.add_argument("--imu-rate", type=float, default=200.0)
    p.add_argument("--imu-gyro-bias", type=float, nargs=3, default=[0, 0, 0],
                   help="constant gyro bias [rad/s] baked into the stream "
                        "(exercises the tracker's online bias estimator)")
    p.add_argument("--imu-gravity", type=float, nargs=3,
                   default=[0.0, 9.81, 0.0],
                   help="world gravity vector the accelerometer measures "
                        "against (non-default exercises the tracker's "
                        "online gravity initializer)")
    p.add_argument("--photometric", action="store_true",
                   help="per-frame exposure / white-balance variation "
                        "(smooth along the trajectory, so the reference's "
                        "pose->appearance MLP can model it; reference: "
                        "src/gaussian_renderer.cpp:256-270) — makes the "
                        "appearance-embedding ablation measurable")
    p.add_argument("--cam-fps", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from PIL import Image

    out = Path(args.out)
    res = out / "results"
    res.mkdir(parents=True, exist_ok=True)

    w, h = args.width, args.height
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    means, scales, quats, opac, colors = make_room_scene(
        args.gaussians, seed=args.seed)
    if args.loop:
        # close the box: make_room_scene leaves the z=0 face open (the room
        # "entrance"); an inward-looking orbit sweeps past it and tracking
        # starves there. Add a front wall so every orbit segment sees
        # structure.
        rng = np.random.default_rng(args.seed + 1)
        n_front = args.gaussians // 5
        u = rng.uniform(0, 1, n_front)
        v = rng.uniform(0, 1, n_front)
        front = np.stack(
            [-2 + 4 * u, -1.5 + 3 * v, np.zeros(n_front)], axis=1
        ).astype(np.float32)
        fcol = np.stack([0.3 + 0.6 * u, 0.2 + 0.3 * v, 0.7 - 0.5 * u],
                        axis=1).astype(np.float32)
        fscale = np.exp(rng.uniform(-4.3, -3.0, (n_front, 3))).astype(
            np.float32)
        fquat = rng.normal(size=(n_front, 4)).astype(np.float32)
        fquat /= np.linalg.norm(fquat, axis=1, keepdims=True)
        means = np.concatenate([means, front])
        colors = np.concatenate([colors, fcol])
        scales = np.concatenate([scales, fscale])
        quats = np.concatenate([quats, fquat])
        opac = np.concatenate([opac, np.full(n_front, 0.995, np.float32)])
    # near-opaque surfaces: with semi-transparent gaussians the alpha-blended
    # depth mixes fore/background view-DEPENDENTLY (measured ~11% cross-view
    # inconsistency), which poisons RGB-D tracking and densification; with
    # alpha ~1 the first hit dominates and depth is a consistent surface.
    opac = np.full_like(opac, 0.995)
    if args.loop:
        poses = make_loop_trajectory(args.frames, seed=args.seed)
    else:
        poses = make_trajectory(args.frames, seed=args.seed)
    cfg = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=128)
    arrs = [jnp.asarray(x) for x in (means, scales, quats, opac, colors)]

    @jax.jit
    def _render(wvt, fpt):
        o = rasterize(
            *arrs, wvt, fpt, w, h, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            config=cfg,
        )
        return o["image"], o["depth_map"], o["final_T"]

    traj_rows = []
    for i, (q, t) in enumerate(poses):
        kf = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
        img, depth, final_t = _render(
            jnp.asarray(kf.world_view_transform),
            jnp.asarray(kf.full_proj_transform),
        )
        rgb = np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
        if args.photometric:
            # smooth exposure + white-balance drive along the trajectory
            # (auto-exposure/AWB analogue; learnable from pose7)
            exposure = 1.0 + 0.18 * np.sin(2 * np.pi * i / 70.0)
            wb = np.array([
                1.0 + 0.06 * np.sin(2 * np.pi * i / 45.0 + 0.7),
                1.0,
                1.0 - 0.06 * np.sin(2 * np.pi * i / 45.0 + 0.2),
            ])
            rgb = np.clip(rgb * exposure * wb[None, None, :], 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            res / f"frame{i:06d}.jpg", quality=95
        )
        alpha = 1.0 - np.asarray(final_t)
        d = np.where(alpha > 0.5,
                     np.asarray(depth) / np.maximum(alpha, 1e-6), 0.0)
        d16 = np.clip(d * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(res / f"depth{i:06d}.png")

        # traj.txt rows are camera-to-world 4x4, row-major flattened
        W2C = np.eye(4)
        W2C[:3, :3] = kf.rotation_matrix()
        W2C[:3, 3] = kf.trans
        C2W = np.linalg.inv(W2C)
        traj_rows.append(" ".join(f"{v:.9f}" for v in C2W.reshape(-1)))

    (out / "traj.txt").write_text("\n".join(traj_rows) + "\n")
    print(f"wrote {args.frames} RGB-D frames to {out}")

    if args.imu:
        from segs_slam_tpu.utils.make_imu import derive_imu, write_imu_txt

        times, gyro, accel = derive_imu(
            poses, cam_fps=args.cam_fps, imu_rate=args.imu_rate,
            gyro_noise=2e-4, accel_noise=2e-3, seed=args.seed,
            gyro_bias=tuple(args.imu_gyro_bias),
            gravity_w=np.asarray(args.imu_gravity, float))
        write_imu_txt(out / "imu.txt", times, gyro, accel)
        print(f"wrote {len(times)} IMU samples to {out / 'imu.txt'}")


if __name__ == "__main__":
    main()
