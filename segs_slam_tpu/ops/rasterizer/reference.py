"""Slow, exact NumPy re-implementation of the reference rasterizer semantics.

This is the test oracle: an independent transcription of the math in
cuda_rasterizer/forward.cu (preprocess + renderCUDA) used to golden-check the
production XLA+Pallas path on small synthetic scenes. O(pixels x instances);
never used in the hot path.
"""

from __future__ import annotations

import math

import numpy as np


def _quat_rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def render_reference(
    means3d,
    scales,
    quats,
    opacities,
    colors,
    world_view_transform,
    full_proj_transform,
    width,
    height,
    tan_fovx,
    tan_fovy,
    bg,
    tile=16,
    scale_modifier=1.0,
):
    """Returns dict(image [3,H,W], final_T [H,W], n_contrib [H,W], radii [N])."""
    means3d = np.asarray(means3d, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    quats = np.asarray(quats, dtype=np.float64)
    opacities = np.asarray(opacities, dtype=np.float64).reshape(-1)
    colors = np.asarray(colors, dtype=np.float64)
    wvt = np.asarray(world_view_transform, dtype=np.float64)
    fpt = np.asarray(full_proj_transform, dtype=np.float64)
    bg = np.asarray(bg, dtype=np.float64)

    n = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    tx_tiles = (width + tile - 1) // tile
    ty_tiles = (height + tile - 1) // tile

    mean2d = np.zeros((n, 2))
    conic = np.zeros((n, 3))
    depth = np.zeros(n)
    radii = np.zeros(n, dtype=np.int32)
    rects = np.zeros((n, 4), dtype=np.int64)  # min_x, min_y, max_x, max_y

    W2C = wvt.T
    for i in range(n):
        p = means3d[i]
        hom = np.append(p, 1.0)
        p_view = hom @ wvt
        if p_view[2] <= 0.2:
            continue
        p_hom = hom @ fpt
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w

        # cov3d
        R = _quat_rotmat(quats[i])
        M = R @ np.diag(scales[i] * scale_modifier)
        sigma = M @ M.T

        # cov2d (EWA with view clamp)
        t = W2C[:3, :3] @ p + W2C[:3, 3]
        limx = 1.3 * tan_fovx
        limy = 1.3 * tan_fovy
        txz = t[0] / t[2]
        tyz = t[1] / t[2]
        t0 = min(limx, max(-limx, txz)) * t[2]
        t1 = min(limy, max(-limy, tyz)) * t[2]
        J = np.array(
            [
                [focal_x / t[2], 0, -(focal_x * t0) / (t[2] * t[2])],
                [0, focal_y / t[2], -(focal_y * t1) / (t[2] * t[2])],
            ]
        )
        JW = J @ W2C[:3, :3]
        cov = JW @ sigma @ JW.T
        a = cov[0, 0] + 0.3
        b = cov[0, 1]
        c = cov[1, 1] + 0.3

        det = a * c - b * b
        if det == 0.0:
            continue
        inv_det = 1.0 / det
        mid = 0.5 * (a + c)
        lam1 = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3.0 * math.sqrt(lam1))
        px = ((p_proj[0] + 1.0) * width - 1.0) * 0.5
        py = ((p_proj[1] + 1.0) * height - 1.0) * 0.5

        rmin_x = min(tx_tiles, max(0, int((px - radius) / tile)))
        rmin_y = min(ty_tiles, max(0, int((py - radius) / tile)))
        rmax_x = min(tx_tiles, max(0, int((px + radius + tile - 1) / tile)))
        rmax_y = min(ty_tiles, max(0, int((py + radius + tile - 1) / tile)))
        if (rmax_x - rmin_x) * (rmax_y - rmin_y) == 0:
            continue

        mean2d[i] = (px, py)
        conic[i] = (c * inv_det, -b * inv_det, a * inv_det)
        depth[i] = p_view[2]
        radii[i] = radius
        rects[i] = (rmin_x, rmin_y, rmax_x, rmax_y)

    image = np.zeros((3, height, width))
    final_T = np.ones((height, width))
    n_contrib = np.zeros((height, width), dtype=np.int32)

    # Per-tile instance lists sorted by depth (stable; ties keep gaussian order,
    # matching the stable radix sort on [tile|depth]).
    for tyi in range(ty_tiles):
        for txi in range(tx_tiles):
            members = [
                i
                for i in range(n)
                if radii[i] > 0
                and rects[i, 0] <= txi < rects[i, 2]
                and rects[i, 1] <= tyi < rects[i, 3]
            ]
            members.sort(key=lambda i: depth[i])
            for pyy in range(tyi * tile, min((tyi + 1) * tile, height)):
                for pxx in range(txi * tile, min((txi + 1) * tile, width)):
                    T = 1.0
                    C = np.zeros(3)
                    contributor = 0
                    last_contributor = 0
                    for i in members:
                        contributor += 1
                        d = mean2d[i] - (pxx, pyy)
                        power = (
                            -0.5 * (conic[i, 0] * d[0] * d[0] + conic[i, 2] * d[1] * d[1])
                            - conic[i, 1] * d[0] * d[1]
                        )
                        if power > 0.0:
                            continue
                        alpha = min(0.99, opacities[i] * math.exp(power))
                        if alpha < 1.0 / 255.0:
                            continue
                        test_T = T * (1 - alpha)
                        if test_T < 1.0e-4:
                            break
                        C += colors[i] * alpha * T
                        T = test_T
                        last_contributor = contributor
                    image[:, pyy, pxx] = C + T * bg
                    final_T[pyy, pxx] = T
                    n_contrib[pyy, pxx] = last_contributor

    return {
        "image": image,
        "final_T": final_T,
        "n_contrib": n_contrib,
        "radii": radii,
        "mean2d": mean2d,
        "conic": conic,
        "depth": depth,
    }
