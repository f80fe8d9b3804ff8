"""Live mono SCALE_REFINEMENT emission (VERDICT r2 weak #7): the
ScaleDriftMonitor must fire on a coherent similarity rescale of already-sent
keyframe poses, stay silent on noise-level drift, and reject an incoherent
trajectory change (tracking reset) that no similarity explains."""

import numpy as np

from segs_slam_tpu.slam.producers import ScaleDriftMonitor, fit_similarity


def _pose_for_center(c, rng):
    """Random world-to-camera (quat wxyz, trans) whose camera center is c."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return q, -R @ np.asarray(c, np.float64)


def _record_trajectory(mon, centers, rng):
    poses = {}
    for i, c in enumerate(centers):
        q, t = _pose_for_center(c, rng)
        mon.record(i, q, t)
        poses[i] = (q, t)
    return poses


def test_fit_similarity_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(10, 3))
    s_true = 1.7
    th = 0.3
    R = np.array([
        [np.cos(th), -np.sin(th), 0.0],
        [np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ])
    t = np.array([0.5, -1.0, 2.0])
    dst = (s_true * R @ src.T).T + t
    s, T = fit_similarity(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-9)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-9)


def test_fires_on_coherent_rescale():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-2, 2, size=(8, 3))
    mon = ScaleDriftMonitor(tol_log_scale=0.02, min_kfs=6)
    _record_trajectory(mon, centers, rng)
    # BA rescales history by 1.25 around the origin
    updates = {}
    for i, c in enumerate(centers):
        updates[i] = _pose_for_center(1.25 * c, rng)
    hit = mon.check(updates)
    assert hit is not None
    s, T = hit
    assert abs(s - 1.25) < 1e-6
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_silent_below_tolerance():
    rng = np.random.default_rng(2)
    centers = rng.uniform(-2, 2, size=(8, 3))
    mon = ScaleDriftMonitor(tol_log_scale=0.02, min_kfs=6)
    _record_trajectory(mon, centers, rng)
    updates = {i: _pose_for_center(1.005 * c, rng)
               for i, c in enumerate(centers)}
    assert mon.check(updates) is None


def test_rejects_incoherent_reset():
    """A tracking reset re-estimates history incoherently: no similarity
    maps old centers to new ones, so the fit residual is large and the
    monitor must not emit (emitting would corrupt the map — a real mono
    re-bootstrap produced s=34 before this gate)."""
    rng = np.random.default_rng(3)
    centers = rng.uniform(-2, 2, size=(10, 3))
    mon = ScaleDriftMonitor(tol_log_scale=0.02, min_kfs=6)
    _record_trajectory(mon, centers, rng)
    # unrelated random centers at a wildly different scale
    updates = {i: _pose_for_center(c, rng)
               for i, c in enumerate(rng.uniform(-60, 60, size=(10, 3)))}
    assert mon.check(updates) is None


def test_requires_min_keyframes():
    rng = np.random.default_rng(4)
    centers = rng.uniform(-2, 2, size=(3, 3))
    mon = ScaleDriftMonitor(min_kfs=6)
    _record_trajectory(mon, centers, rng)
    updates = {i: _pose_for_center(2.0 * c, rng)
               for i, c in enumerate(centers)}
    assert mon.check(updates) is None
