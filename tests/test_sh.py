"""SH color-evaluation mode (reference: include/sh_utils.h:64-123,
computeColorFromSH in cuda_rasterizer/forward.cu:20-71)."""

import numpy as np
import jax.numpy as jnp

from segs_slam_tpu.ops.sh import (
    eval_sh,
    num_sh_coeffs,
    rgb_to_sh,
    sh_to_rgb,
    sh_to_color,
)
from segs_slam_tpu.ops.rasterizer import RasterConfig, rasterize


def _numpy_eval_sh(deg, sh, dirs):
    """Independent scalar-loop oracle of the real-SH basis."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    out = np.zeros(sh.shape[:-2] + (sh.shape[-1],))
    for i in range(sh.shape[0]):
        x, y, z = dirs[i]
        r = C0 * sh[i, 0]
        if deg > 0:
            r = r - C1 * y * sh[i, 1] + C1 * z * sh[i, 2] - C1 * x * sh[i, 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            r = (r + C2[0] * x * y * sh[i, 4] + C2[1] * y * z * sh[i, 5]
                 + C2[2] * (2 * zz - xx - yy) * sh[i, 6]
                 + C2[3] * x * z * sh[i, 7] + C2[4] * (xx - yy) * sh[i, 8])
        if deg > 2:
            xx, yy, zz = x * x, y * y, z * z
            r = (r + C3[0] * y * (3 * xx - yy) * sh[i, 9]
                 + C3[1] * x * y * z * sh[i, 10]
                 + C3[2] * y * (4 * zz - xx - yy) * sh[i, 11]
                 + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[i, 12]
                 + C3[4] * x * (4 * zz - xx - yy) * sh[i, 13]
                 + C3[5] * z * (xx - yy) * sh[i, 14]
                 + C3[6] * x * (xx - 3 * yy) * sh[i, 15])
        out[i] = r
    return out


def test_eval_sh_matches_oracle():
    rng = np.random.default_rng(0)
    n = 64
    for deg in (0, 1, 2, 3):
        k = num_sh_coeffs(deg)
        sh = rng.normal(size=(n, k, 3)).astype(np.float32)
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        got = np.asarray(eval_sh(deg, jnp.asarray(sh),
                                 jnp.asarray(dirs.astype(np.float32))))
        want = _numpy_eval_sh(deg, sh, dirs)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (10, 3)),
                      jnp.float32)
    np.testing.assert_allclose(np.asarray(sh_to_rgb(rgb_to_sh(rgb))),
                               np.asarray(rgb), atol=1e-6)


def test_rasterize_sh_deg0_matches_precomp():
    """Degree-0 SH with DC = RGB2SH(c) must render identically to
    colors_precomp = c."""
    rng = np.random.default_rng(2)
    n = 128
    means = rng.uniform([-1, -1, 2], [1, 1, 5], (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)

    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe

    cam = Camera(camera_id=0, width=64, height=64, fx=60, fy=60, cx=32, cy=32)
    kf = Keyframe(kf_id=0, camera=cam, quat=[1, 0, 0, 0], trans=[0, 0, 0])
    cfg = RasterConfig(tile=16, compact=1024, kmax=16, chunk=128)
    common = dict(
        world_view_transform=jnp.asarray(kf.world_view_transform),
        full_proj_transform=jnp.asarray(kf.full_proj_transform),
        width=64, height=64, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        bg=jnp.zeros(3), config=cfg, interpret=True,
    )
    args = [jnp.asarray(x) for x in (means, scales, quats, opac)]
    img_pre = rasterize(*args, jnp.asarray(colors), **common)["image"]
    shs = np.zeros((n, 1, 3), np.float32)
    shs[:, 0, :] = np.asarray(rgb_to_sh(jnp.asarray(colors)))
    img_sh = rasterize(*args, jnp.zeros((n, 3)), shs=jnp.asarray(shs),
                       sh_degree=0, **common)["image"]
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_pre),
                               atol=1e-5)


def test_sh_view_dependence():
    """A deg-1 SH lobe must change color with viewing direction."""
    sh = np.zeros((1, 4, 3), np.float32)
    sh[0, 0] = 0.5
    sh[0, 3] = 1.0  # x lobe
    means = jnp.zeros((1, 3))
    c1 = sh_to_color(1, jnp.asarray(sh), means, jnp.asarray([-2.0, 0, 0]))
    c2 = sh_to_color(1, jnp.asarray(sh), means, jnp.asarray([2.0, 0, 0]))
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
