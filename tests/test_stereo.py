"""Stereo rectification + stereo frontend + stereo producer tests."""

import numpy as np
import pytest

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.undistort import StereoRectifyMap
from segs_slam_tpu.slam import frontends


def _euroc_cams():
    camL = Camera(camera_id=0, width=752, height=480, fx=458.654, fy=457.296,
                  cx=367.215, cy=248.375,
                  dist_coeffs=(-0.28340811, 0.07395907, 0.00019359,
                               1.76187114e-05, 0.0))
    camR = Camera(camera_id=1, width=752, height=480, fx=457.587, fy=456.134,
                  cx=379.999, cy=255.238,
                  dist_coeffs=(-0.28368365, 0.07451284, -0.00010473,
                               -3.555907e-05, 0.0))
    T_BS0 = np.array([
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0, 0, 0, 1.0],
    ])
    T_BS1 = np.array([
        [0.0125552670891, -0.999755099723, 0.0182237714554, -0.0198435579556],
        [0.999598781151, 0.0130119051815, 0.0251588363115, 0.0453689425024],
        [-0.0253898008918, 0.0179005838253, 0.999517347078, 0.00786212447038],
        [0, 0, 0, 1.0],
    ])
    T_10 = np.linalg.inv(T_BS1) @ T_BS0
    return camL, camR, T_10[:3, :3], T_10[:3, 3]


def test_stereo_rectify_epipolar_alignment():
    camL, camR, R, t = _euroc_cams()
    sr = StereoRectifyMap(camL, camR, R, t)
    assert abs(sr.baseline - 0.1101) < 5e-4  # EuRoC stereo baseline

    rng = np.random.default_rng(0)
    P0 = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-0.6, 0.6, 50),
                   rng.uniform(2, 8, 50)], 1)
    Pr1 = P0 @ sr.R1.T
    Pr2 = (P0 @ R.T + t) @ sr.R2.T
    K = sr.camera
    v1 = K.fy * Pr1[:, 1] / Pr1[:, 2] + K.cy
    v2 = K.fy * Pr2[:, 1] / Pr2[:, 2] + K.cy
    u1 = K.fx * Pr1[:, 0] / Pr1[:, 2] + K.cx
    u2 = K.fx * Pr2[:, 0] / Pr2[:, 2] + K.cx
    # rectified: rows align, disparity = fx * b / z
    np.testing.assert_allclose(v1, v2, atol=1e-8)
    np.testing.assert_allclose(u1 - u2, K.fx * sr.baseline / Pr1[:, 2],
                               atol=1e-8)
    # rotations orthonormal
    np.testing.assert_allclose(sr.R1 @ sr.R1.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(sr.R2 @ sr.R2.T, np.eye(3), atol=1e-12)


def test_stereo_rectify_pose_roundtrip():
    camL, camR, R, t = _euroc_cams()
    sr = StereoRectifyMap(camL, camR, R, t, scale=2)
    assert sr.camera.width == 376 and sr.camera.height == 240
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0], np.float32)  # 45 deg y
    tr = np.array([0.3, -0.2, 1.0], np.float32)
    q2, t2 = sr.rectify_pose(q, tr)
    # rectified pose must keep the camera center fixed in world space
    from segs_slam_tpu.core import se3
    import jax.numpy as jnp

    R0 = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    R2_ = np.asarray(se3.quat_to_rotmat(jnp.asarray(q2)))
    c0 = -R0.T @ tr
    c2 = -R2_.T @ t2
    np.testing.assert_allclose(c0, c2, atol=1e-5)


def _smooth_noise(rng, h, w):
    img = rng.uniform(size=(h, w)).astype(np.float32)
    k = np.ones(5) / 5
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    return np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, img)


def test_stereo_densify_recovers_plane_depth():
    # distortion-free, pre-rectified pair: right = left shifted by d pixels
    h, w, d = 64, 288, 16.0
    cam = Camera(camera_id=0, width=w, height=h, fx=200.0, fy=200.0,
                 cx=(w - 1) / 2, cy=(h - 1) / 2)
    baseline = 0.11
    z_true = cam.fx * baseline / d
    rng = np.random.default_rng(1)
    left = _smooth_noise(rng, h, w)
    right = np.roll(left, -int(d), axis=1)
    pts = frontends.stereo_densify(
        left, right, cam, baseline,
        np.array([1.0, 0, 0, 0]), np.zeros(3), max_depth=10.0,
    )
    assert len(pts) > 50
    # identity pose: world z == camera depth
    med = np.median(pts[:, 2])
    assert abs(med - z_true) / z_true < 0.08


def test_stereo_producer_smoke(tmp_path):
    from PIL import Image

    from segs_slam_tpu.apps.slam_stereo import run_stereo_producer
    from segs_slam_tpu.io.datasets import Frame
    from segs_slam_tpu.slam.protocol import MappingQueue
    import threading

    h, w, d = 64, 288, 16.0
    cam = Camera(camera_id=0, width=w, height=h, fx=200.0, fy=200.0,
                 cx=(w - 1) / 2, cy=(h - 1) / 2)
    rng = np.random.default_rng(2)

    class IdentityRect:
        """Pre-rectified stand-in (distortion-free centered cams)."""
        camera = cam
        baseline = 0.11

        def remap_left(self, img):
            return img

        def remap_right(self, img):
            return img

        def rectify_pose(self, q, t):
            return np.asarray(q, np.float32), np.asarray(t, np.float32)

    pairs = []
    for i in range(3):
        left = _smooth_noise(rng, h, w)
        right = np.roll(left, -int(d), axis=1)
        lp, rp = tmp_path / f"l{i}.png", tmp_path / f"r{i}.png"
        Image.fromarray((left * 255).astype(np.uint8)).save(lp)
        Image.fromarray((right * 255).astype(np.uint8)).save(rp)
        pairs.append((
            Frame(timestamp=float(i), quat=np.array([1.0, 0, 0, 0]),
                  trans=np.array([0.0, 0, float(i) * 0.01]),
                  rgb_path=str(lp)),
            str(rp),
        ))

    queue = MappingQueue()
    rows = run_stereo_producer(pairs, IdentityRect(), queue, "oracle",
                               keyframe_every=1, points_per_kf=200,
                               tracking_times=[], stop_event=threading.Event())
    assert len(rows) == 3
    ops = []
    while True:
        op = queue.pop(timeout=0.01)
        if op is None:
            break
        ops.append(op)
    assert len(ops) == 3
    for op in ops:
        kf = op.keyframes[0]
        assert kf.image.shape == (h, w, 3)
        assert op.points_xyz is not None and len(op.points_xyz) > 50
        z_true = cam.fx * 0.11 / d
        med = np.median(op.points_xyz[:, 2])
        assert abs(med - z_true) / z_true < 0.15
