"""Generate a synthetic STEREO dataset ON DISK in EuRoC MAV layout.

Renders the synthetic gaussian room from a rectified stereo pair (left
camera on the trajectory, right camera offset by `baseline` along the
camera +x axis) and writes

  <out>/mav0/cam0/data/<ts>.png + data.csv     (left, grayscale)
  <out>/mav0/cam1/data/<ts>.png + data.csv     (right)
  <out>/mav0/state_groundtruth_estimate0/data.csv
  <out>/mav0/depth0/<ts>.npy                   (left GT depth, diagnostics)
  <out>/calib.json                             (pinhole intrinsics+baseline)

so apps/slam_stereo.py --pre-rectified runs end-to-end with zero external
data (reference driver: examples/euroc_stereo.cpp). Poses written to the GT
csv are pre-multiplied by inv(T_BS) of the standard EuRoC cam0 extrinsics so
io/datasets.load_euroc_stereo (which applies T_BS) recovers the true
camera-to-world transforms.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize
from segs_slam_tpu.utils.synthetic import make_room_scene, make_trajectory

# must match io/datasets.load_euroc_stereo's hardcoded cam0 T_BS
EUROC_T_BS = np.array([
    [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
    [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
    [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
    [0.0, 0.0, 0.0, 1.0],
])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--baseline", type=float, default=0.11)
    p.add_argument("--gaussians", type=int, default=8000)
    args = p.parse_args(argv)

    from PIL import Image

    out = Path(args.out)
    cam0 = out / "mav0" / "cam0" / "data"
    cam1 = out / "mav0" / "cam1" / "data"
    gt_dir = out / "mav0" / "state_groundtruth_estimate0"
    depth_dir = out / "mav0" / "depth0"
    for d in (cam0, cam1, gt_dir, depth_dir):
        d.mkdir(parents=True, exist_ok=True)

    w, h, b = args.width, args.height, args.baseline
    cam = Camera(camera_id=0, width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2, cy=h / 2)
    means, scales, quats, opac, colors = make_room_scene(args.gaussians)
    # near-opaque surfaces, matching make_rgbd_dataset: semi-transparent
    # gaussians make the photometry view-dependent (splat parallax) and the
    # blended depth a non-surface — measured on the round-4 dataset as a
    # ~13-grey-level L->R warp floor at the CORRECT depth, which capped
    # native stereo tracking at ~0.22 m ATE regardless of depth quality.
    opac = np.full_like(opac, 0.995)
    poses = make_trajectory(args.frames)
    cfg = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=128)
    arrs = [jnp.asarray(x) for x in (means, scales, quats, opac, colors)]

    @jax.jit
    def _render(wvt, fpt):
        o = rasterize(
            *arrs, wvt, fpt, w, h, cam.tan_fovx, cam.tan_fovy, jnp.zeros(3),
            config=cfg,
        )
        return o["image"], o["depth_map"], o["final_T"]

    inv_tbs = np.linalg.inv(EUROC_T_BS)
    rows_cam, rows_gt = [], []
    for i, (q, t) in enumerate(poses):
        ts_ns = int((i / 20.0) * 1e9)  # 20 Hz
        kf_l = Keyframe(kf_id=i, camera=cam, quat=q, trans=t)
        # right eye: x_r = x_l - (b, 0, 0) in rectified camera coords
        t_r = np.asarray(t, np.float64) + np.array([-b, 0.0, 0.0])
        kf_r = Keyframe(kf_id=i, camera=cam, quat=q, trans=t_r)

        for kf, ddir in ((kf_l, cam0), (kf_r, cam1)):
            img, depth, final_t = _render(
                jnp.asarray(kf.world_view_transform),
                jnp.asarray(kf.full_proj_transform),
            )
            gray = np.clip(np.asarray(img).mean(axis=0), 0, 1)
            Image.fromarray((gray * 255).astype(np.uint8)).save(
                ddir / f"{ts_ns}.png"
            )
            if ddir is cam0:
                alpha = 1.0 - np.asarray(final_t)
                d = np.where(alpha > 0.5,
                             np.asarray(depth) / np.maximum(alpha, 1e-6), 0.0)
                np.save(depth_dir / f"{ts_ns}.npy", d.astype(np.float32))

        rows_cam.append(f"{ts_ns},{ts_ns}.png")
        # GT row: T_WB such that loader's T_WB @ T_BS == true C2W of cam0
        W2C = np.eye(4)
        W2C[:3, :3] = kf_l.rotation_matrix()
        W2C[:3, 3] = kf_l.trans
        T_WB = np.linalg.inv(W2C) @ inv_tbs
        from segs_slam_tpu.core import se3

        qb = np.asarray(se3.rotmat_to_quat(jnp.asarray(T_WB[:3, :3],
                                                       jnp.float32)))
        pb = T_WB[:3, 3]
        rows_gt.append(
            f"{ts_ns},{pb[0]},{pb[1]},{pb[2]},{qb[0]},{qb[1]},{qb[2]},{qb[3]}"
        )

    hdr = "#timestamp [ns],filename\n"
    (out / "mav0" / "cam0" / "data.csv").write_text(hdr + "\n".join(rows_cam))
    (out / "mav0" / "cam1" / "data.csv").write_text(hdr + "\n".join(rows_cam))
    (gt_dir / "data.csv").write_text(
        "#timestamp,px,py,pz,qw,qx,qy,qz\n" + "\n".join(rows_gt)
    )
    (out / "calib.json").write_text(json.dumps({
        "width": w, "height": h, "fx": cam.fx, "fy": cam.fy,
        "cx": cam.cx, "cy": cam.cy, "baseline": b,
    }))
    print(f"wrote {args.frames} stereo pairs to {out}")


if __name__ == "__main__":
    main()
