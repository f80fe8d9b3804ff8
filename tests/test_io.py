import struct

import numpy as np

from segs_slam_tpu.io.colmap import (
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)
from segs_slam_tpu.io.ply import load_anchor_ply, save_anchor_ply


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, f, k = 17, 8, 5
    data = {
        "anchor": rng.normal(size=(n, 3)).astype(np.float32),
        "feat": rng.normal(size=(n, f)).astype(np.float32),
        "offset": rng.normal(size=(n, k, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 6)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    path = tmp_path / "anchors.ply"
    save_anchor_ply(path, **data)
    loaded = load_anchor_ply(path)
    for key in data:
        np.testing.assert_allclose(loaded[key], data[key], rtol=1e-6,
                                   err_msg=key)


def _write_colmap_fixture(d):
    # cameras.bin: one PINHOLE camera
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 60.0, 61.0, 32.0, 24.0))
    # images.bin: one image with 2 features
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<ddd", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"img0.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 1.0, 2.0, 11))
        f.write(struct.pack("<ddq", 3.0, 4.0, -1))
    # points3D.bin: two points
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid, xyz, rgb in [(11, (1, 2, 3), (255, 0, 10)),
                              (12, (-1, 0, 5), (9, 8, 7))]:
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", *xyz))
            f.write(struct.pack("<BBB", *rgb))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 7, 0))


def test_colmap_binary_readers(tmp_path):
    _write_colmap_fixture(tmp_path)
    cams = read_cameras_binary(tmp_path / "cameras.bin")
    assert cams[1].model == "PINHOLE"
    fx, fy, cx, cy = cams[1].focal_and_center()
    assert (fx, fy, cx, cy) == (60.0, 61.0, 32.0, 24.0)

    imgs = read_images_binary(tmp_path / "images.bin")
    img = imgs[7]
    assert img.name == "img0.png"
    np.testing.assert_allclose(img.qvec, [1, 0, 0, 0])
    np.testing.assert_allclose(img.xys, [[1, 2], [3, 4]])
    assert list(img.point3d_ids) == [11, -1]

    xyz, rgb = read_points3d_binary(tmp_path / "points3D.bin")
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0, 5]])
    assert rgb[0, 0] == 255


def test_load_scannet(tmp_path):
    from PIL import Image

    from segs_slam_tpu.io import datasets

    (tmp_path / "color").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "pose").mkdir()
    (tmp_path / "intrinsic").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            (rng.uniform(size=(8, 12, 3)) * 255).astype(np.uint8)
        ).save(tmp_path / "color" / f"{i}.jpg")
        Image.fromarray(
            (rng.uniform(0, 4000, size=(8, 12))).astype(np.uint16)
        ).save(tmp_path / "depth" / f"{i}.png")
        T = np.eye(4)
        T[:3, 3] = [i * 0.1, 0, 0]
        if i == 1:  # invalid exported pose must be skipped
            T[0, 0] = np.inf
        np.savetxt(tmp_path / "pose" / f"{i}.txt", T)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 100.0, 101.0, 6.0, 4.0
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", K)

    frames = datasets.load_scannet(tmp_path)
    assert [f.timestamp for f in frames] == [0.0, 2.0]
    # identity c2w -> identity w2c
    np.testing.assert_allclose(frames[0].quat, [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(frames[1].trans, [-0.2, 0, 0], atol=1e-6)
    assert frames[0].load_rgb().shape == (8, 12, 3)
    d = frames[0].load_depth(1000.0)
    assert d.shape == (8, 12) and d.max() <= 4.0

    intr = datasets.load_scannet_intrinsics(tmp_path)
    assert intr == dict(fx=100.0, fy=101.0, cx=6.0, cy=4.0)
