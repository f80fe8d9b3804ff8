"""IMU: synthetic derivation round-trip + native preintegration parity.

The contract: strapdown-integrating the derived samples (gravity added
back, right-multiplicative rotation update) reproduces the ground-truth
camera trajectory to integration error — first in NumPy (validates the
generator), then through the native tracker's preintegration C API
(validates the consumer against the same convention).

Reference analogue: ORB-SLAM3/src/ImuTypes.cc IntegrateNewMeasurement +
Tracking.cc PredictStateIMU.
"""

import numpy as np
import pytest

from segs_slam_tpu.utils.make_imu import (
    GRAVITY_W, derive_imu, exp_so3, load_imu_txt, quat_to_R, write_imu_txt)
from segs_slam_tpu.utils.synthetic import make_trajectory


def _strapdown(poses, times, gyro, accel, cam_fps, imu_rate):
    """Integrate IMU from the first pose; return positions at frame times."""
    R0 = quat_to_R(np.asarray(poses[0][0], float))
    R_wb = R0.T
    p = -R0.T @ np.asarray(poses[0][1], float)
    dt_f = 1.0 / cam_fps
    # initial velocity from the Hermite tangent used by the generator
    c0 = p
    R1 = quat_to_R(np.asarray(poses[1][0], float))
    c1 = -R1.T @ np.asarray(poses[1][1], float)
    v = (c1 - c0) / dt_f
    dt = 1.0 / imu_rate
    out = [p.copy()]
    next_frame = dt_f
    for t, w, a in zip(times, gyro, accel):
        a_w = R_wb @ a + GRAVITY_W
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R_wb = R_wb @ exp_so3(w * dt)
        if t + dt >= next_frame - 1e-9:
            out.append(p.copy())
            next_frame += dt_f
    return np.stack(out[: len(poses)]), R_wb


def test_strapdown_reproduces_trajectory():
    poses = make_trajectory(30)
    times, gyro, accel = derive_imu(poses, cam_fps=30.0, imu_rate=600.0)
    est, R_wb_end = _strapdown(poses, times, gyro, accel, 30.0, 600.0)
    gt = np.stack([
        -quat_to_R(np.asarray(q, float)).T @ np.asarray(t, float)
        for q, t in poses
    ])
    err = np.linalg.norm(est - gt, axis=1)
    # 1 second of strapdown at 600 Hz on a smooth path: mm-level
    assert err.max() < 5e-3, err.max()
    # terminal rotation matches the last frame
    R_end = quat_to_R(np.asarray(poses[-1][0], float))
    dR = R_wb_end.T @ R_end.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR @ np.eye(3)) - 1) / 2,
                                       -1, 1)))
    assert ang < 0.2, ang


def test_imu_txt_roundtrip(tmp_path):
    poses = make_trajectory(5)
    times, gyro, accel = derive_imu(poses, imu_rate=100.0, gyro_noise=0.001,
                                    accel_noise=0.01, seed=3)
    path = tmp_path / "imu.txt"
    write_imu_txt(path, times, gyro, accel)
    t2, g2, a2 = load_imu_txt(path)
    np.testing.assert_allclose(t2, times, atol=1e-8)
    np.testing.assert_allclose(g2, gyro, atol=1e-8)
    np.testing.assert_allclose(a2, accel, atol=1e-8)


def test_native_preintegration_matches_numpy():
    from segs_slam_tpu.native import native_available
    if not native_available():
        pytest.skip("native library not built")
    from segs_slam_tpu.native import NativeTracker

    poses = make_trajectory(30)
    times, gyro, accel = derive_imu(poses, cam_fps=30.0, imu_rate=600.0)
    tr = NativeTracker(576.0, 576.0, 320.0, 240.0)
    if not hasattr(tr, "feed_imu"):
        pytest.skip("tracker built without IMU API")
    # feed the full stream; the preintegrated delta over [0, T] must match
    # the strapdown terminal state
    dt = 1.0 / 600.0
    for w, a in zip(gyro, accel):
        tr.feed_imu(dt, w, a)
    dR, dv, dp = tr.imu_delta()
    est, _ = _strapdown(poses, times, gyro, accel, 30.0, 600.0)

    # numpy preintegration in the FIRST body frame (gravity-free):
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    for w, a in zip(gyro, accel):
        p = p + v * dt + 0.5 * (R @ a) * dt * dt
        v = v + (R @ a) * dt
        R = R @ exp_so3(w * dt)
    np.testing.assert_allclose(dR, R, atol=1e-6)
    np.testing.assert_allclose(dv, v, atol=1e-6)
    np.testing.assert_allclose(dp, p, atol=1e-6)
