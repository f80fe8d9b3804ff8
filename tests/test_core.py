import numpy as np

from segs_slam_tpu.core import Camera, se3
from segs_slam_tpu.core.keyframe import Keyframe


def _camera():
    return Camera(camera_id=0, width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def test_projection_matrix_matches_reference_form():
    cam = _camera()
    P = cam.projection()
    # reference: src/gaussian_keyframe.cpp:252-279
    import math

    tan_x = math.tan(cam.fovx / 2)
    tan_y = math.tan(cam.fovy / 2)
    assert np.isclose(P[0, 0], 1.0 / tan_x, rtol=1e-6)
    assert np.isclose(P[1, 1], 1.0 / tan_y, rtol=1e-6)
    assert np.isclose(P[3, 2], 1.0)
    zf, zn = cam.zfar, cam.znear
    assert np.isclose(P[2, 2], zf / (zf - zn))
    assert np.isclose(P[2, 3], -(zf * zn) / (zf - zn))


def test_keyframe_transform_tensors_identity_pose():
    cam = _camera()
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    np.testing.assert_allclose(kf.world_view_transform, np.eye(4), atol=1e-6)
    np.testing.assert_allclose(kf.camera_center, np.zeros(3), atol=1e-6)
    np.testing.assert_allclose(
        kf.full_proj_transform, kf.projection, atol=1e-6
    )


def test_keyframe_camera_center_is_inverse_translation():
    cam = _camera()
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    kf = Keyframe(kf_id=1, camera=cam, quat=q, trans=t)
    # camera center = -R^T t (world position of the camera)
    R = kf.rotation_matrix()
    np.testing.assert_allclose(kf.camera_center, -R.T @ t, rtol=1e-4, atol=1e-5)
    # world_view_transform is W2C^T: transforming the camera center by W2C
    # must land at the origin.
    hom = np.append(kf.camera_center, 1.0)
    view = hom @ kf.world_view_transform
    np.testing.assert_allclose(view[:3], np.zeros(3), atol=1e-4)


def test_quat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = np.asarray(se3.quat_to_rotmat(q))
        q2 = np.asarray(se3.rotmat_to_quat(R))
        np.testing.assert_allclose(q, q2, atol=1e-5)


def test_se3_inverse():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    T = np.asarray(se3.se3_matrix(q, t))
    Tinv = np.asarray(se3.se3_inverse(T))
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-5)


def test_transform_points():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    T = np.asarray(se3.se3_matrix(q, t))
    pts = rng.normal(size=(10, 3))
    out = np.asarray(se3.transform_points(T, pts))
    expected = (T[:3, :3] @ pts.T).T + T[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_undistort_identity_and_mask():
    import numpy as np
    from segs_slam_tpu.core.undistort import UndistortMap

    cam = _camera()
    m = UndistortMap(cam)
    assert m.is_identity
    img = np.random.default_rng(0).uniform(size=(48, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(m.remap(img), img)

    cam2 = Camera(camera_id=1, width=64, height=48, fx=60.0, fy=60.0,
                  cx=32.0, cy=24.0, dist_coeffs=(-0.3, 0.1, 0.0, 0.0, 0.0))
    m2 = UndistortMap(cam2)
    assert not m2.is_identity
    out = m2.remap(img)
    assert out.shape == img.shape
    # the center is nearly unwarped; corners may be masked out
    np.testing.assert_allclose(out[22:26, 30:34], img[22:26, 30:34], atol=0.15)
    assert 0.3 < m2.mask.mean() <= 1.0
