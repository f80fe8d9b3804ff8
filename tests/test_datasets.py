"""On-disk dataset generators round-trip through their loaders."""

import numpy as np

from segs_slam_tpu.io import datasets
from segs_slam_tpu.io.colmap import read_scene


def test_colmap_generator_roundtrip(tmp_path):
    """make_colmap_dataset writes a binary sparse model that io.colmap reads
    back with consistent poses/points (reference consumer:
    examples/train_colmap.cpp:35-240)."""
    from segs_slam_tpu.utils.make_colmap_dataset import main

    out = tmp_path / "scene"
    main([
        "--out", str(out), "--views", "3", "--width", "64", "--height", "48",
        "--gaussians", "300", "--sparse-points", "120",
    ])
    scene = read_scene(out / "sparse" / "0")
    assert len(scene.images) == 3
    cam = scene.cameras[1]
    fx, fy, cx, cy = cam.focal_and_center()
    assert (fx, fy) == (0.9 * 64, 0.9 * 64)
    assert scene.points_xyz.shape == (120, 3)
    assert np.isfinite(scene.points_xyz).all()
    for img in scene.images.values():
        assert (out / "images" / img.name).exists()
        q = np.asarray(img.qvec)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)


def test_rgbd_generator_roundtrip(tmp_path):
    """make_rgbd_dataset writes a Replica-layout sequence that load_replica
    reads back: RGB + uint16 depth + invertible traj.txt poses."""
    from segs_slam_tpu.utils.make_rgbd_dataset import main

    out = tmp_path / "seq"
    main([
        "--out", str(out), "--frames", "3", "--width", "64", "--height", "48",
        "--gaussians", "300",
    ])
    frames = datasets.load_replica(out)
    assert len(frames) == 3
    rgb = frames[0].load_rgb()
    assert rgb.shape == (48, 64, 3) and 0 <= rgb.min() <= rgb.max() <= 1
    d = frames[0].load_depth(6553.5)
    assert d.shape == (48, 64)
    assert (d[d > 0] < 10.0).all()  # room-scale depths
    q = np.asarray(frames[0].quat)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
