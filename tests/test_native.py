"""Native runtime tests (dataloader + tracker) — skipped when no toolchain."""

import numpy as np
import pytest

from segs_slam_tpu.native import NativeLoader, NativeTracker, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


def test_native_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    imgs = []
    for i in range(5):
        img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.png"
        _write_png(p, img)
        paths.append(p)
        imgs.append(img)
    depth_paths = []
    for i in range(5):
        d = (rng.uniform(0.5, 3.0, (24, 32)) * 5000).astype(np.uint16)
        p = tmp_path / f"d{i}.png"
        _write_png(p, d)
        depth_paths.append(p)

    loader = NativeLoader(paths, depth_paths, depth_scale=5000.0, n_threads=2)
    assert (loader.width, loader.height) == (32, 24)
    got = list(loader)
    assert [i for i, _, _ in got] == list(range(5))
    for i, rgb, depth in got:
        np.testing.assert_allclose(rgb * 255, imgs[i], atol=1.0)
        assert depth is not None
        assert 0.4 < depth.mean() < 3.1
    loader.close()


def _render_dots(w, h, pts2d, size=3):
    img = np.full((h, w), 30, np.uint8)
    rng = np.random.default_rng(0)
    img = img + rng.integers(0, 20, (h, w)).astype(np.uint8)
    for (u, v), val in zip(pts2d, range(80, 255, 1)):
        ui, vi = int(u), int(v)
        if 1 <= ui < w - 1 and 1 <= vi < h - 1:
            img[vi - size : vi + size, ui - size : ui + size] = val % 255
    return img


def test_native_tracker_recovers_translation():
    """Synthetic RGB-D sequence: textured plane, camera translating in x."""
    w, h = 320, 240
    fx = fy = 200.0
    cx, cy = w / 2, h / 2
    rng = np.random.default_rng(1)
    # random 3D points on a z=2 plane
    pts = rng.uniform([-1.5, -1.0, 1.8], [1.5, 1.0, 2.4], (400, 3))

    def view(dx):
        # camera at (dx, 0, 0) looking down +z: p_cam = p - center
        p = pts - np.array([dx, 0, 0])
        u = p[:, 0] / p[:, 2] * fx + cx
        v = p[:, 1] / p[:, 2] * fy + cy
        img = _render_dots(w, h, np.stack([u, v], 1))
        depth = np.zeros((h, w), np.float32)
        for (uu, vv), z in zip(np.stack([u, v], 1), p[:, 2]):
            ui, vi = int(uu), int(vv)
            if 0 <= ui < w and 0 <= vi < h:
                depth[max(0, vi - 3) : vi + 3, max(0, ui - 3) : ui + 3] = z
        depth[depth == 0] = 2.1  # plane fill
        return img, depth

    tracker = NativeTracker(fx, fy, cx, cy, n_features=800)
    img0, d0 = view(0.0)
    status, pose, n = tracker.track(img0, d0)
    assert status == NativeTracker.NEW_KEYFRAME

    img1, d1 = view(0.05)
    status, pose, n = tracker.track(img1, d1)
    assert status in (NativeTracker.TRACKED, NativeTracker.NEW_KEYFRAME)
    assert n > 20
    # camera moved +x by 0.05 -> world-to-camera translation ~ (-0.05, 0, 0)
    assert abs(pose[0] - (-0.05)) < 0.03, pose
    assert abs(pose[1]) < 0.03 and abs(pose[2]) < 0.05

    kp = tracker.keyframe_points()
    assert len(kp) > 50
    assert (kp[:, 4] > 0).all()


def test_tracker_pose_export_apis():
    """window_poses / trajectory / poll_loop contracts on a short synthetic
    RGB-D sequence (pose refreshes feed LOCAL_MAPPING_BA; reference:
    LocalMapping.cc:149-160)."""
    w, h = 320, 240
    fx = fy = 200.0
    cx, cy = w / 2, h / 2
    rng = np.random.default_rng(3)
    pts = rng.uniform([-1.5, -1.0, 1.8], [1.5, 1.0, 2.6], (500, 3))

    def view(dx):
        p = pts - np.array([dx, 0, 0])
        u = p[:, 0] / p[:, 2] * fx + cx
        v = p[:, 1] / p[:, 2] * fy + cy
        img = _render_dots(w, h, np.stack([u, v], 1))
        depth = np.full((h, w), 2.2, np.float32)
        for (uu, vv), z in zip(np.stack([u, v], 1), p[:, 2]):
            ui, vi = int(uu), int(vv)
            if 0 <= ui < w and 0 <= vi < h:
                depth[max(0, vi - 3) : vi + 3, max(0, ui - 3) : ui + 3] = z
        return img, depth

    tracker = NativeTracker(fx, fy, cx, cy, n_features=800)
    n_kf = 0
    for i, dx in enumerate(np.linspace(0, 0.5, 12)):
        img, d = view(float(dx))
        status, pose, n = tracker.track(img, d)
        if status == 1:
            n_kf += 1
    assert n_kf >= 2

    ids, fnos, poses = tracker.window_poses()
    assert len(ids) == min(n_kf, 10)  # tracker BA window is 10 keyframes
    assert poses.shape == (len(ids), 7)
    # quaternions are normalized
    np.testing.assert_allclose(np.linalg.norm(poses[:, 3:7], axis=1), 1.0,
                               atol=1e-6)

    tids, tfnos, tposes = tracker.trajectory()
    assert len(tids) == n_kf
    assert list(tids) == sorted(tids)
    # frame ordinals are within the fed range and increasing
    assert all(0 <= f < 12 for f in tfnos)
    assert list(tfnos) == sorted(tfnos)
    # window poses are the tail of the trajectory (same ids)
    assert list(ids) == list(tids[-len(ids):])

    assert tracker.poll_loop() == -1  # no revisit in a linear sweep


def test_pr_index_and_imu_init_apis():
    """Inverted-index place recognition stats + IMU-init introspection.

    The PR contract (tracker.cpp LshIndex, the DBoW2 slot — reference:
    ORB-SLAM3/Thirdparty/DBoW2 + KeyFrameDatabase): every loop/reloc query
    runs at most loop_max_candidates descriptor-bag verifications however
    large the registry is — the retrieval itself is bucket probes, not a
    registry scan. The IMU contract: gyro bias starts at zero, gravity
    starts at the default until estimated (state 0) or set (state 2).
    """
    w, h = 320, 240
    fx = fy = 200.0
    rng = np.random.default_rng(5)
    pts = rng.uniform([-1.5, -1.0, 1.8], [1.5, 1.0, 2.6], (500, 3))

    def view(dx):
        p = pts - np.array([dx, 0, 0])
        u = p[:, 0] / p[:, 2] * fx + w / 2
        v = p[:, 1] / p[:, 2] * fy + h / 2
        img = _render_dots(w, h, np.stack([u, v], 1))
        depth = np.full((h, w), 2.2, np.float32)
        for (uu, vv), z in zip(np.stack([u, v], 1), p[:, 2]):
            ui, vi = int(uu), int(vv)
            if 0 <= ui < w and 0 <= vi < h:
                depth[max(0, vi - 3): vi + 3, max(0, ui - 3): ui + 3] = z
        return img, depth

    tracker = NativeTracker(fx, fy, w / 2, h / 2, n_features=800)
    bias, grav, state = tracker.imu_init_state()
    assert state == 0 and bias == [0.0, 0.0, 0.0]
    np.testing.assert_allclose(grav, [0.0, 9.81, 0.0])
    tracker.set_gravity([0.0, 0.0, 9.81])
    _, grav2, state2 = tracker.imu_init_state()
    assert state2 == 2 and grav2[2] == 9.81

    n_kf = 0
    for dx in np.linspace(0, 0.6, 14):
        img, d = view(float(dx))
        status, pose, n = tracker.track(img, d)
        n_kf += status == 1
    assert n_kf >= 2

    queries, bags, descs = tracker.pr_stats()
    assert descs > 100  # every registry keyframe was indexed
    # every query verifies at most loop_max_candidates (12) bags — the
    # sub-linear retrieval contract (no full-registry scans)
    assert bags <= queries * 12

    # round-5 inertial surfaces: accel bias starts at zero (no joint
    # [gravity; accel-bias] commit yet) and the mono-inertial scale poll is
    # poll-once with 0.0 = none pending (reference analogue: ORB-SLAM3
    # LocalMapping.cc:1296-1305 ScaleRefinement ops)
    assert tracker.imu_accel_bias() == [0.0, 0.0, 0.0]
    assert tracker.poll_scale() == 0.0
    assert tracker.poll_scale() == 0.0


def test_accel_bias_recovery_known_gravity():
    """Inject a large accel bias into a synthetic RGB-D + IMU sequence with
    KNOWN gravity (set_gravity): the staged bias-only solve
    (tracker.cpp ba_N, gravity_fixed branch) must recover it. The bias is
    deliberately large (0.6 m/s^2-scale) because frame-rate velocity
    differencing has a ~0.3 m/s^2 noise floor from PnP jitter — the
    estimator's job is rejecting gross bias, mirroring ORB-SLAM3's
    InertialOptimization accel-bias states (LocalMapping.cc InitializeIMU)."""
    from segs_slam_tpu.utils.make_imu import derive_imu
    from segs_slam_tpu.core.se3 import rotmat_to_quat
    import jax.numpy as jnp

    w, h = 320, 240
    fx = fy = 200.0
    rng = np.random.default_rng(11)
    pts = rng.uniform([-2.0, -1.4, 1.6], [2.0, 1.4, 3.2], (700, 3))
    n_frames, fps = 140, 30.0

    def pose(i):
        t = i / fps
        yaw = 0.12 * np.sin(2 * np.pi * t / 2.1)
        pitch = 0.08 * np.sin(2 * np.pi * t / 1.4 + 1.0)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        R = (Rx @ Ry).T  # world-to-camera
        c = np.array([0.25 * np.sin(2 * np.pi * t / 1.7),
                      0.15 * np.sin(2 * np.pi * t / 1.1 + 0.5),
                      0.10 * np.sin(2 * np.pi * t / 2.3)])
        return R, -R @ c

    def render(R, t):
        p = (R @ pts.T).T + t
        uv = np.stack([p[:, 0] / p[:, 2] * fx + w / 2,
                       p[:, 1] / p[:, 2] * fy + h / 2], 1)
        img = _render_dots(w, h, uv)
        depth = np.full((h, w), 2.4, np.float32)
        for (uu, vv), z in zip(uv, p[:, 2]):
            ui, vi = int(uu), int(vv)
            if 0 <= ui < w and 0 <= vi < h:
                depth[max(0, vi - 3): vi + 3, max(0, ui - 3): ui + 3] = z
        return img, depth

    poses = []
    for i in range(n_frames):
        R, t = pose(i)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)), float)
        poses.append((q, t))
    bias_true = np.array([0.6, -0.8, 0.4])
    times, gyro, accel = derive_imu(poses, cam_fps=fps, imu_rate=200.0,
                                    accel_bias=tuple(bias_true))

    tracker = NativeTracker(fx, fy, w / 2, h / 2, n_features=900)
    tracker.set_gravity([0.0, 9.81, 0.0])
    dt_s = times[1] - times[0]
    cur = 0
    tracked = 0
    for i in range(n_frames):
        t_frame = i / fps
        while cur < len(times) and times[cur] < t_frame - 1e-9:
            tracker.feed_imu(dt_s, gyro[cur], accel[cur])
            cur += 1
        R, t = pose(i)
        img, depth = render(R, t)
        status, pose7, n_inl = tracker.track(img, depth)
        tracked += status >= 0
    assert tracked > 100  # the sequence must actually track

    ab = np.asarray(tracker.imu_accel_bias())
    assert np.any(ab != 0.0), "bias solve never committed"
    err = np.linalg.norm(ab - bias_true)
    assert err < 0.35, (ab, bias_true, err)


def test_mono_inertial_scale_recovery():
    """Mono + IMU on a synthetic dot scene: the horizon-based [s; g; v0]
    estimator (tracker.cpp mono-inertial initialization) must commit a
    metric rescale — poll_scale surfaces a factor, gravity lands near
    truth, and the FINAL keyframe trajectory is metric without post-hoc
    scale correction (reference contract: ORB-SLAM3 ScaleRefinement ops,
    LocalMapping.cc:1296-1305)."""
    from segs_slam_tpu.utils.make_imu import derive_imu
    from segs_slam_tpu.core.se3 import rotmat_to_quat
    import jax.numpy as jnp

    w, h = 320, 240
    fx = fy = 200.0
    rng = np.random.default_rng(5)
    pts = rng.uniform([-2.2, -1.5, 1.4], [2.2, 1.5, 3.4], (800, 3))
    n_frames, fps = 240, 30.0

    def pose(i):
        t = i / fps
        yaw = 0.10 * np.sin(2 * np.pi * t / 2.7)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        R = Ry.T
        c = np.array([
            0.45 * np.sin(2 * np.pi * t / 2.3),
            0.20 * np.sin(2 * np.pi * t / 1.3 + 0.4),
            0.15 * np.sin(2 * np.pi * t / 1.9 + 1.1),
        ])
        return R, -R @ c

    poses = []
    for i in range(n_frames):
        R, t = pose(i)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)), float)
        poses.append((q, t))
    times, gyro, accel = derive_imu(poses, cam_fps=fps, imu_rate=200.0)

    tracker = NativeTracker(fx, fy, w / 2, h / 2, n_features=900)
    dt_s = times[1] - times[0]
    cur = 0
    est, gt = [], []
    scale_polled = 1.0
    for i in range(n_frames):
        t_frame = i / fps
        while cur < len(times) and times[cur] < t_frame - 1e-9:
            tracker.feed_imu(dt_s, gyro[cur], accel[cur])
            cur += 1
        R, t = pose(i)
        p = (R @ pts.T).T + t
        uv = np.stack([p[:, 0] / p[:, 2] * fx + w / 2,
                       p[:, 1] / p[:, 2] * fy + h / 2], 1)
        img = _render_dots(w, h, uv)
        status, pose7, n_inl = tracker.track_mono(img)
        s = tracker.poll_scale()
        if s > 0.0:
            scale_polled *= s
        if status >= 0:
            w_, x_, y_, z_ = pose7[3:7]
            Re = np.array([
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_),
                 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_),
                 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_),
                 1 - 2 * (x_ * x_ + y_ * y_)],
            ])
            est.append(-Re.T @ np.asarray(pose7[0:3]))
            gt.append(-R.T @ t)

    assert scale_polled != 1.0, "no scale refinement ever committed"
    _, grav, state = tracker.imu_init_state()
    assert state >= 1
    g = np.asarray(grav)
    # derive_imu's default gravity is (0, 9.81, 0) in world
    cosang = g[1] / (np.linalg.norm(g) + 1e-12)
    assert cosang > 0.95, grav

    from segs_slam_tpu.eval.metrics import ate_rmse
    r = ate_rmse(np.stack(est[-120:]), np.stack(gt[-120:]),
                 correct_scale=True)
    assert 0.7 < r["scale"] < 1.4, r["scale"]
