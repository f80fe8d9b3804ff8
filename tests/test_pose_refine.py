"""Photometric keyframe-pose refinement (Trainer.refine_keyframe_pose):
perturbed pose recovers toward ground truth through the differentiable
renderer. Beyond-reference capability (the reference takes SLAM poses as
given)."""

import numpy as np
import jax.numpy as jnp

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core import se3
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer
from segs_slam_tpu.utils.synthetic import (
    make_room_scene,
    make_trajectory,
    render_gt_views,
)


def test_pose_refinement_recovers_perturbation():
    cam = Camera(camera_id=0, width=96, height=96, fx=86, fy=86, cx=48,
                 cy=48)
    means, scales, quats, opac, colors = make_room_scene(1200)
    poses = make_trajectory(6)
    kfs, _ = render_gt_views(means, scales, quats, opac, colors, poses, cam)

    mc = ModelConfig(capacity=4096, n_offsets=4, feat_dim=16,
                     appearance_dim=8, embedding_dim=4, voxel_size=0.03)
    oc = OptimizationConfig(use_frequency_regularization=False)
    rc = RasterConfig(tile=16, compact=8192, kmax=8, chunk=128)
    tr = Trainer(mc, oc, rc, width=96, height=96, interpret=True)
    tr.scene.add_camera(cam)
    for kf in kfs:
        kf.image = np.asarray(kf.image)
        tr.add_keyframe(kf)
    rng = np.random.default_rng(0)
    tr.initialize_map(means[rng.choice(len(means), 800, replace=False)])
    for _ in range(300):
        tr.train_iteration()

    kf = kfs[2]
    q0, t0 = kf.quat.copy(), kf.trans.copy()
    ang = np.deg2rad(1.5)
    dR = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ])
    Rn = dR @ kf.rotation_matrix()
    qn = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rn, jnp.float32)))
    kf.set_pose(qn, dR @ t0 + np.array([0.02, -0.015, 0.01]))
    tr._cam_cache.pop(kf.kf_id, None)

    err0 = np.linalg.norm(kf.trans - t0)
    for _ in range(6):
        tr.refine_keyframe_pose(kf, steps=5, lr=4e-3)
    err1 = np.linalg.norm(kf.trans - t0)
    dq = min(np.linalg.norm(kf.quat - q0), np.linalg.norm(kf.quat + q0))
    assert err1 < 0.6 * err0, (err0, err1)
    assert dq < 0.01, dq
