"""Relative-pose-error diagnostic for the native tracker.

Separates per-frame noise from systematic drift: compares estimated vs
ground-truth RELATIVE motion over 1-frame and 10-frame spans, split into
translation and rotation, plus the bias of the per-frame motion error
(a nonzero mean = systematic drift source; zero mean + large std = noise).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

if not jax._src.xla_bridge.backends_are_initialized():
    jax.config.update("jax_platforms", "cpu")

from segs_slam_tpu.io import datasets
from segs_slam_tpu.native import NativeTracker


def quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True)
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args()

    frames = datasets.load_replica(args.path)
    if args.max_frames:
        frames = frames[: args.max_frames]
    tracker = NativeTracker(576.0, 576.0, 320.0, 240.0)

    est_T, gt_T = [], []
    for fr in frames:
        rgb = fr.load_rgb()
        gray = (rgb.mean(axis=2) * 255).astype(np.uint8)
        depth = fr.load_depth(6553.5)
        status, pose7, n_inl = tracker.track(gray, depth)
        T = np.eye(4)
        T[:3, :3] = quat_to_R(pose7[3:7])
        T[:3, 3] = pose7[0:3]
        est_T.append(T)
        G = np.eye(4)
        G[:3, :3] = quat_to_R(fr.quat)
        G[:3, 3] = np.asarray(fr.trans)
        gt_T.append(G)

    for span in (1, 10):
        terrs, rerrs, tvec_errs = [], [], []
        for i in range(len(frames) - span):
            dE = est_T[i + span] @ np.linalg.inv(est_T[i])
            dG = gt_T[i + span] @ np.linalg.inv(gt_T[i])
            dd = np.linalg.inv(dG) @ dE
            terrs.append(np.linalg.norm(dd[:3, 3]))
            tvec_errs.append(dd[:3, 3])
            ang = np.degrees(
                np.arccos(np.clip((np.trace(dd[:3, :3]) - 1) / 2, -1, 1)))
            rerrs.append(ang)
        terrs = np.array(terrs)
        rerrs = np.array(rerrs)
        bias = np.mean(np.stack(tvec_errs), axis=0)
        print(f"span {span:2d}: trans RPE mean {terrs.mean()*1000:.2f} mm "
              f"(p95 {np.percentile(terrs,95)*1000:.2f}) | rot RPE mean "
              f"{rerrs.mean():.4f} deg (p95 {np.percentile(rerrs,95):.4f})")
        print(f"         trans bias vector: "
              f"[{bias[0]*1000:.3f}, {bias[1]*1000:.3f}, {bias[2]*1000:.3f}] mm"
              f"  |bias| {np.linalg.norm(bias)*1000:.3f} mm")


if __name__ == "__main__":
    main()
