"""Synthetic multi-view scenes for self-contained quality gates.

With no datasets on disk (and zero egress), end-to-end quality is validated
the way the reference validates against Replica: render ground-truth views of
a KNOWN scene, then train the anchor model to reproduce them and measure
PSNR/SSIM. The known scene is a set of explicit gaussians rendered by our own
(reference-verified) rasterizer, so the target is exactly representable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.core import se3
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize


def make_room_scene(n_gaussians: int = 4000, seed: int = 0):
    """A colored 'room': gaussians on the walls/floor of a box + clutter."""
    rng = np.random.default_rng(seed)
    n_wall = n_gaussians * 3 // 4
    n_free = n_gaussians - n_wall

    # box [-2, 2] x [-1.5, 1.5] x [0, 6]
    pts = []
    cols = []
    for _ in range(n_wall):
        face = rng.integers(0, 5)
        u, v = rng.uniform(0, 1, 2)
        if face == 0:  # back wall
            p = [-2 + 4 * u, -1.5 + 3 * v, 6.0]
            c = [0.8 * u, 0.3, 0.8 * v]
        elif face == 1:  # floor
            p = [-2 + 4 * u, 1.5, 6.0 * v]
            c = [0.2, 0.7 * u, 0.4 * v]
        elif face == 2:  # ceiling
            p = [-2 + 4 * u, -1.5, 6.0 * v]
            c = [0.9, 0.8, 0.6 * u]
        elif face == 3:  # left wall
            p = [-2, -1.5 + 3 * u, 6.0 * v]
            c = [0.5 + 0.5 * v, 0.2 + 0.5 * u, 0.1]
        else:  # right wall
            p = [2, -1.5 + 3 * u, 6.0 * v]
            c = [0.1, 0.4 + 0.4 * u, 0.6 + 0.4 * v]
        pts.append(p)
        cols.append(c)
    pts = np.array(pts)
    cols = np.array(cols)
    free_pts = rng.uniform([-1.5, -1.0, 1.5], [1.5, 1.2, 5.0], size=(n_free, 3))
    free_cols = rng.uniform(0.1, 1.0, size=(n_free, 3))
    means = np.concatenate([pts, free_pts]).astype(np.float32)
    colors = np.concatenate([cols, free_cols]).astype(np.float32)

    scales = np.exp(rng.uniform(-4.3, -3.0, (n_gaussians, 3))).astype(np.float32)
    quats = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    # near-opaque: indoor surfaces are opaque, and a depth sensor reports the
    # surface depth. Semi-transparent blobs make the alpha-weighted mean
    # depth channel front-biased (~10% below the parallax-consistent depth on
    # this scene), which injects a systematic scale error into any RGB-D
    # consumer of the rendered dataset — a bias no real sensor has.
    opac = rng.uniform(0.90, 0.99, n_gaussians).astype(np.float32)
    return means, scales, quats, opac, colors


def make_trajectory(n_views: int, seed: int = 0):
    """Camera poses looking into the room from jittered positions near the
    opening (z ~ 0), as (quat wxyz, trans) world-to-camera pairs."""
    poses = []
    for i in range(n_views):
        # camera center in world — smooth path (trackable frame-to-frame)
        t_frac = i / max(n_views - 1, 1)
        center = np.array([
            -1.0 + 2.0 * t_frac + 0.05 * np.sin(11 * t_frac * np.pi),
            0.2 * np.sin(3 * t_frac * np.pi),
            0.3 + 0.2 * (1 - np.cos(5 * t_frac * np.pi)),
        ])
        look = np.array([0.0, 0.0, 4.5]) - center
        look /= np.linalg.norm(look)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, look)
        right /= np.linalg.norm(right)
        up2 = np.cross(look, right)
        # rows of R are camera axes (world->camera)
        R = np.stack([right, up2, look], axis=0)
        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(R)))
        t = -R @ center
        poses.append((q, t))
    return poses


def render_gt_views(
    means, scales, quats, opac, colors, poses, camera: Camera,
    config: RasterConfig | None = None, interpret=None,
):
    """Render ground-truth images ((3,H,W) f32 each) for the given poses."""
    if config is None:
        config = RasterConfig(tile=16, compact=2**14, kmax=16, chunk=128)
    args = [
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(colors),
    ]

    @jax.jit
    def _render(wvt, fpt):
        return rasterize(
            *args, wvt, fpt, camera.width, camera.height,
            camera.tan_fovx, camera.tan_fovy, jnp.zeros(3),
            config=config, interpret=interpret,
        )["image"]

    images = []
    kfs = []
    for i, (q, t) in enumerate(poses):
        kf = Keyframe(kf_id=i, camera=camera, quat=q, trans=t)
        img = _render(
            jnp.asarray(kf.world_view_transform),
            jnp.asarray(kf.full_proj_transform),
        )
        kf.image = np.asarray(img)
        images.append(kf.image)
        kfs.append(kf)
    return kfs, images
