"""Multi-map Atlas: new-map spawn on unrecoverable loss + cross-map merge.

Reference architecture: ORB-SLAM3 Atlas (include/Atlas.h) — Tracking spawns
a fresh map after persistent loss (Tracking.cc CreateMapInAtlas) and
LoopClosing merges the active map onto an old one when place recognition
finds a cross-map keyframe (LoopClosing::MergeLocal). This exercises the
compact equivalent: lost-streak spawn, cross-map place recognition with
ratio-test tentatives + coarse PnP + guided expansion + strict PnP, full-SE3
map alignment, and registry relabeling.
"""

import numpy as np
import pytest

from segs_slam_tpu.native import native_available

if not native_available():
    pytest.skip("native library not built", allow_module_level=True)

from segs_slam_tpu.native import NativeTracker

W, H = 424, 320
FX = FY = 260.0
CX, CY = W / 2, H / 2


def _render_dots(pts_w, dx):
    """Textured dots at projected positions for a camera at (dx, 0, 0)."""
    img = np.full((H, W), 30, np.uint8)
    depth = np.zeros((H, W), np.float32)
    p = pts_w - np.array([dx, 0.0, 0.0])
    u = p[:, 0] / p[:, 2] * FX + CX
    v = p[:, 1] / p[:, 2] * FY + CY
    rng = np.random.default_rng(7)
    pat = rng.integers(60, 255, len(pts_w))
    for k, (uu, vv, z) in enumerate(zip(u, v, p[:, 2])):
        ui, vi = int(uu), int(vv)
        if 2 <= ui < W - 2 and 2 <= vi < H - 2:
            img[vi - 2 : vi + 3, ui - 2 : ui + 3] = 30
            img[vi - 1 : vi + 2, ui - 1 : ui + 2] = pat[k]
            img[vi, ui] = min(255, pat[k] + 40)
            depth[vi - 2 : vi + 3, ui - 2 : ui + 3] = z
    return img, depth


def test_atlas_spawn_and_merge():
    rng = np.random.default_rng(11)
    pts = rng.uniform([-2.5, -1.5, 2.0], [3.5, 1.5, 4.0], (450, 3))

    tracker = NativeTracker(FX, FY, CX, CY, n_features=900)
    noise_rng = np.random.default_rng(0)

    # phase 1: track along x
    xs1 = np.linspace(0.0, 0.6, 14)
    for dx in xs1:
        img, d = _render_dots(pts, float(dx))
        tracker.track(img, d)
    a0, c0, _ = tracker.map_info()
    assert c0 == 1

    # phase 2: 35 garbage frames -> persistent loss -> new map spawned
    for _ in range(35):
        g = noise_rng.integers(0, 255, (H, W)).astype(np.uint8)
        tracker.track(g, np.zeros((H, W), np.float32))
    a1, c1, _ = tracker.map_info()
    assert c1 >= 2, "no new map spawned after persistent loss"

    # phase 3: resume INSIDE previously-seen territory (re-walking the
    # original path); keep moving so keyframes accumulate until cross-map
    # place recognition fires
    merged = False
    last_pose = None
    for dx in np.linspace(0.0, 1.0, 40):
        img, d = _render_dots(pts, float(dx))
        status, pose7, _ = tracker.track(img, d)
        _, _, m = tracker.map_info()
        if m >= 0:
            merged = True
        if merged and status >= 0:
            last_pose = (float(dx), pose7.copy())
    assert merged, "active map never merged into the original map"
    a2, c2, _ = tracker.map_info()
    assert a2 == 0, "after the merge the active map should be the original"

    # post-merge poses live in the ORIGINAL map frame: camera center must
    # match the ground-truth (dx, 0, 0) of the original trajectory
    assert last_pose is not None
    dx, p7 = last_pose
    w, x, y, z = p7[3:7]
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    center = -R.T @ p7[0:3]
    err = np.linalg.norm(center - np.array([dx, 0.0, 0.0]))
    assert err < 0.08, f"post-merge pose off by {err:.3f} m"
