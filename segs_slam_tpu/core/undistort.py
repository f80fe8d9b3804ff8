"""Camera undistortion: rectify maps + undistort masks, host-side numpy.

Replaces the reference's OpenCV initUndistortRectifyMap / remap plumbing and
the white-image undistort mask (reference: Camera::initUndistortRectifyMap-
AndMask, include/camera.h:76-113; cv::remap of an all-white image produces
the valid-pixel mask used to gate the photometric loss).

Model: OpenCV radial-tangential (k1, k2, p1, p2, k3). The map is built once
per camera (forward-distortion evaluated at every target pixel); application
is a bilinear gather — numpy at keyframe rate.
"""

from __future__ import annotations

import numpy as np

from segs_slam_tpu.core.camera import Camera


class UndistortMap:
    def __init__(self, camera: Camera):
        self.camera = camera
        k1, k2, p1, p2, k3 = camera.dist_coeffs
        h, w = camera.height, camera.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        # normalized coords in the ideal (undistorted) camera
        x = (xs - camera.cx) / camera.fx
        y = (ys - camera.cy) / camera.fy
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        self.map_x = (x_d * camera.fx + camera.cx).astype(np.float32)
        self.map_y = (y_d * camera.fy + camera.cy).astype(np.float32)
        self.mask = (
            (self.map_x >= 0)
            & (self.map_x <= w - 1)
            & (self.map_y >= 0)
            & (self.map_y <= h - 1)
        ).astype(np.float32)

    @property
    def is_identity(self) -> bool:
        return not any(self.camera.dist_coeffs)

    def remap(self, image: np.ndarray) -> np.ndarray:
        """Bilinear remap of (H, W) or (H, W, C) images."""
        if self.is_identity:
            return image
        h, w = self.map_x.shape
        x0 = np.clip(np.floor(self.map_x).astype(int), 0, w - 1)
        y0 = np.clip(np.floor(self.map_y).astype(int), 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        fx = np.clip(self.map_x - x0, 0, 1)
        fy = np.clip(self.map_y - y0, 0, 1)
        if image.ndim == 2:
            img = image[..., None]
        else:
            img = image
        out = (
            img[y0, x0] * ((1 - fx) * (1 - fy))[..., None]
            + img[y0, x1] * (fx * (1 - fy))[..., None]
            + img[y1, x0] * ((1 - fx) * fy)[..., None]
            + img[y1, x1] * (fx * fy)[..., None]
        )
        out = out * self.mask[..., None]
        return out[..., 0] if image.ndim == 2 else out
