"""SE(3) / quaternion utilities (host + device).

Quaternion convention is (w, x, y, z), matching the reference's rotation
construction (reference: cuda_rasterizer/forward.cu:118-152 `computeCov3D`,
include/general_utils.h:31 `build_rotation`).

All functions are pure and work on both numpy and jax.numpy arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q):
    """Quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3).

    Matches the (unnormalized-input) matrix of the reference rasterizer
    (cuda_rasterizer/forward.cu:127-138); callers are responsible for
    normalizing when the reference does (general_utils.h normalizes,
    the rasterizer's computeCov3D does not re-normalize).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize_quat(q, eps: float = 1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a, b):
    """Hamilton product of (..., 4) (w,x,y,z) quaternions: rot(a∘b) =
    rot(a)·rot(b)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rotmat_to_quat(R):
    """Rotation matrix (3, 3) -> quaternion (w, x, y, z), w >= 0."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 0.0)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s])

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s])

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 0.0)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s])

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 0.0)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s])

    use_w = tr > 0.0
    use_x = (m00 >= m11) & (m00 >= m22)
    use_y = m11 >= m22
    q = jnp.where(
        use_w,
        case_w(),
        jnp.where(use_x, case_x(), jnp.where(use_y, case_y(), case_z())),
    )
    return jnp.where(q[0] < 0, -q, q)


def se3_matrix(q, t):
    """(w,x,y,z) quaternion + translation -> 4x4 world-to-camera matrix Rt.

    Mirrors GaussianKeyframe::getWorld2View2's Rt assembly
    (reference: src/gaussian_keyframe.cpp:230-249).
    """
    R = quat_to_rotmat(q)
    Rt = jnp.zeros(q.shape[:-1] + (4, 4), dtype=q.dtype)
    Rt = Rt.at[..., :3, :3].set(R)
    Rt = Rt.at[..., :3, 3].set(t)
    Rt = Rt.at[..., 3, 3].set(1.0)
    return Rt


def se3_inverse(T):
    """Invert a rigid 4x4 transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rinv)
    out = out.at[..., :3, 3].set(tinv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(T, pts):
    """Apply a 4x4 rigid/similarity transform to (N, 3) points.

    TPU-native replacement for the reference's transformPoints CUDA kernel
    (src/operate_points.cu:38-94): a single batched matmul.
    """
    return pts @ T[:3, :3].T + T[:3, 3]


def scale_and_transform_points(T, scale, pts):
    """Masked scale+transform used by loop-closure map correction
    (reference: src/operate_points.cu:96-143)."""
    return (pts * scale) @ T[:3, :3].T + T[:3, 3]
