"""Sensor frontends: sparse->dense geometry harvesting per sensor type.

TPU/numpy re-designs of the reference's per-sensor densification kernels
(reference: src/stereo_vision.cu / GaussianMapper::increasePcdByKeyframe-
InactiveGeoDensify, src/gaussian_mapper.cpp:1544-1731):

  * RGB-D: pinhole depth back-projection (reproject_depths_pinhole,
    src/stereo_vision.cu:39-61) — a couple of vectorized numpy ops.
  * Monocular: keypoint-neighborhood depth guessing (the O(N^2)
    neighbor-search kernel, src/stereo_vision.cu:63-133) — vectorized
    pairwise distances.
  * Stereo: block-matching disparity (stands in for the reference's
    cv::cuda::StereoSGM, src/gaussian_mapper.cpp:93-95, 1591-1650).

These run on the host mapper thread (they feed the anchor-insert path, which
is host-side anyway); numpy is plenty at keyframe rate.
"""

from __future__ import annotations

import numpy as np

from segs_slam_tpu.core.camera import Camera


def _c2w(quat: np.ndarray, trans: np.ndarray) -> np.ndarray:
    w, x, y, z = quat
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    Rt = np.eye(4)
    Rt[:3, :3] = R
    Rt[:3, 3] = trans
    return np.linalg.inv(Rt)


def backproject_depth(
    depth: np.ndarray,
    camera: Camera,
    quat: np.ndarray,
    trans: np.ndarray,
    min_depth: float = 1e-10,
    max_depth: float = 40.0,
    stride: int = 4,
) -> np.ndarray:
    """Depth map -> world points (reference: reproject_depths_pinhole).

    `stride` subsamples the depth image (the voxel filter in increasePcd
    collapses dense duplicates anyway; reference feeds every pixel)."""
    h, w = depth.shape
    d = depth[::stride, ::stride]
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    valid = (d > min_depth) & (d < max_depth) & np.isfinite(d)
    z = d[valid]
    u = xs[valid]
    v = ys[valid]
    x = (u - camera.cx) / camera.fx * z
    y = (v - camera.cy) / camera.fy * z
    cam_pts = np.stack([x, y, z], axis=1)
    C2W = _c2w(np.asarray(quat, float), np.asarray(trans, float))
    return (cam_pts @ C2W[:3, :3].T + C2W[:3, 3]).astype(np.float32)


def mono_neighborhood_densify(
    keypoint_pixels: np.ndarray,  # (n, 2) undistorted pixels
    keypoint_points: np.ndarray | None,  # (n, 3) camera-local 3D or nan rows
    camera: Camera,
    quat: np.ndarray,
    trans: np.ndarray,
    max_pixel_dist: float = 15.0,
) -> np.ndarray:
    """Monocular inactive-geometry densification: keypoints without depth
    borrow the depth of their nearest pixel-space neighbor that has one
    (reference: monocularPinholeInactiveGeoDensifyBySearchingNeighborhood-
    Keypoints, src/stereo_vision.cu:63-133)."""
    if keypoint_points is None or len(keypoint_pixels) == 0:
        return np.zeros((0, 3), np.float32)
    pts = np.asarray(keypoint_points, float)
    px = np.asarray(keypoint_pixels, float)
    has_depth = np.isfinite(pts[:, 2]) & (pts[:, 2] > 0)
    if not has_depth.any() or has_depth.all():
        known = pts[has_depth]
    else:
        unknown_px = px[~has_depth]
        known_px = px[has_depth]
        known_z = pts[has_depth][:, 2]
        # pairwise pixel distances (n_unknown x n_known)
        d2 = ((unknown_px[:, None, :] - known_px[None, :, :]) ** 2).sum(-1)
        nn = np.argmin(d2, axis=1)
        ok = d2[np.arange(len(nn)), nn] <= max_pixel_dist**2
        z = known_z[nn[ok]]
        u, v = unknown_px[ok, 0], unknown_px[ok, 1]
        guessed = np.stack(
            [(u - camera.cx) / camera.fx * z, (v - camera.cy) / camera.fy * z, z],
            axis=1,
        )
        known = np.concatenate([pts[has_depth], guessed], axis=0)
    C2W = _c2w(np.asarray(quat, float), np.asarray(trans, float))
    return (known @ C2W[:3, :3].T + C2W[:3, 3]).astype(np.float32)


def stereo_block_matching(
    left: np.ndarray,  # (h, w) grayscale [0, 1]
    right: np.ndarray,
    min_disparity: int = 8,
    num_disparities: int = 128,
    block: int = 7,
    stride: int = 4,
) -> np.ndarray:
    """Coarse block-matching disparity (SAD over a window), the stand-in for
    the reference's semi-global matcher. Returns disparity (h//stride,
    w//stride) with 0 = invalid. Host numpy; keyframe-rate only."""
    h, w = left.shape
    hb = block // 2
    ys = np.arange(hb, h - hb, stride)
    xs = np.arange(hb + min_disparity + num_disparities, w - hb, stride)
    disp = np.zeros((len(ys), len(xs)), np.float32)
    # integral-image SAD per disparity
    best = np.full((len(ys), len(xs)), np.inf, np.float32)
    for d in range(min_disparity, min_disparity + num_disparities, 2):
        diff = np.abs(left[:, d:] - right[:, :-d])
        ii = diff.cumsum(0).cumsum(1)

        def box(y0, y1, x0, x1):
            return ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]

        yy = ys[:, None]
        xx = xs[None, :] - d
        sad = box(yy - hb, yy + hb, xx - hb, xx + hb)
        better = sad < best
        best = np.where(better, sad, best)
        disp = np.where(better, float(d), disp)
    return disp, ys, xs


def stereo_densify(
    left: np.ndarray,
    right: np.ndarray,
    camera: Camera,
    baseline: float,
    quat: np.ndarray,
    trans: np.ndarray,
    min_disparity: int = 8,
    num_disparities: int = 128,
    max_depth: float = 40.0,
) -> np.ndarray:
    """Stereo inactive-geo densify: disparity -> depth -> world points
    (reference: src/gaussian_mapper.cpp:1591-1650 via reprojectImageTo3D)."""
    disp, ys, xs = stereo_block_matching(
        left, right, min_disparity, num_disparities
    )
    valid = disp > 0
    z = camera.fx * baseline / np.maximum(disp[valid], 1e-6)
    ok = (z > 0) & (z < max_depth)
    u = np.broadcast_to(xs[None, :], disp.shape)[valid][ok].astype(float)
    v = np.broadcast_to(ys[:, None], disp.shape)[valid][ok].astype(float)
    z = z[ok]
    cam_pts = np.stack(
        [(u - camera.cx) / camera.fx * z, (v - camera.cy) / camera.fy * z, z],
        axis=1,
    )
    C2W = _c2w(np.asarray(quat, float), np.asarray(trans, float))
    return (cam_pts @ C2W[:3, :3].T + C2W[:3, 3]).astype(np.float32)
