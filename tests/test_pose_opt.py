"""In-step photometric pose optimization (train/step.py apply_pose_delta +
per-keyframe SE3 tangent deltas trained jointly with the map). Beyond
reference — the reference takes SLAM poses as given."""

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


def _make_trainer(optimize_poses):
    cam = Camera(camera_id=0, width=96, height=96, fx=86, fy=86, cx=48,
                 cy=48)
    means, scales, quats, opac, colors = make_room_scene(1200)
    poses = make_trajectory(6)
    kfs, _ = render_gt_views(means, scales, quats, opac, colors, poses, cam)

    mc = ModelConfig(capacity=4096, n_offsets=4, feat_dim=16,
                     appearance_dim=8, embedding_dim=4, voxel_size=0.03)
    oc = OptimizationConfig(use_frequency_regularization=False,
                            pose_lr_init=2e-3, pose_lr_final=2e-3)
    rc = RasterConfig(tile=16, compact=8192, kmax=8, chunk=128)
    tr = Trainer(mc, oc, rc, width=96, height=96, interpret=True,
                 optimize_poses=optimize_poses, max_pose_kfs=16)
    tr.scene.add_camera(cam)
    for kf in kfs:
        kf.image = np.asarray(kf.image)
        tr.add_keyframe(kf)
    rng = np.random.default_rng(0)
    tr.initialize_map(means[rng.choice(len(means), 800, replace=False)])
    return tr, kfs


def _perturb(kf, ang_deg=1.0, dt=(0.02, -0.015, 0.01)):
    q0, t0 = kf.quat.copy(), kf.trans.copy()
    ang = np.deg2rad(ang_deg)
    dR = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ])
    Rn = dR @ kf.rotation_matrix()
    qn = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rn, jnp.float32)))
    kf.set_pose(qn, dR @ t0 + np.asarray(dt))
    return q0, t0


def test_in_step_pose_optimization_responds_to_pose_error():
    # Train the map at true poses first, then FREEZE everything except the
    # pose deltas (all other LRs -> 0) so the test isolates the pose-opt
    # mechanism. NOTE: absolute-pose recovery is NOT the contract here —
    # with any map error present, joint photometric optimization trades
    # absolute pose accuracy for map consistency (which is the quantity that
    # matters for rendering quality). The contract is: a pose error creates
    # photometric loss; training the delta reduces it; folding composes the
    # delta exactly (fold exactness is asserted bit-level in
    # test_fold_matches_apply_pose_delta).
    tr, kfs = _make_trainer(optimize_poses=True)
    assert tr.state.pose.shape == (16, 6)
    for _ in range(300):
        tr.train_iteration()

    import dataclasses as _dc

    frozen = {f: 0.0 for f in (
        "position_lr_init", "position_lr_final", "offset_lr_init",
        "offset_lr_final", "feature_lr", "opacity_lr", "scaling_lr",
        "rotation_lr", "mlp_opacity_lr_init", "mlp_opacity_lr_final",
        "mlp_cov_lr_init", "mlp_cov_lr_final", "mlp_color_lr_init",
        "mlp_color_lr_final", "mlp_featurebank_lr_init",
        "mlp_featurebank_lr_final", "appearance_lr_init",
        "appearance_lr_final")}
    tr.opt_config = _dc.replace(tr.opt_config, update_until=0, **frozen)
    tr._steps.clear()

    kf = kfs[2]
    _perturb(kf)
    tr._cam_cache.pop(kf.kf_id, None)

    # keep re-arming the sampler on kf2 so every iteration trains its delta
    def step_on_kf():
        kf.remaining_times_of_use = max(kf.remaining_times_of_use, 1)
        for other in kfs:
            if other is not kf:
                other.remaining_times_of_use = 0
        return tr.train_iteration()

    loss0 = float(step_on_kf()["loss"])
    for _ in range(80):
        m = step_on_kf()
    loss1 = float(m["loss"])
    row = tr._pose_rows[kf.kf_id]
    d = np.asarray(tr.state.pose[row])
    assert np.any(d), "pose delta never moved"
    assert loss1 < 0.93 * loss0, (loss0, loss1)

    # folding composes deltas into keyframe poses and clears the table
    base_q = kf.quat.copy()
    n = tr.fold_pose_deltas()
    assert n >= 1
    assert not np.asarray(tr.state.pose).any()
    assert not np.allclose(kf.quat, base_q) or np.any(d[3:])


def test_fold_matches_apply_pose_delta():
    from segs_slam_tpu.core.camera import Camera as Cam
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.train.step import apply_pose_delta

    q0 = np.array([0.9, 0.1, 0.3, -0.2])
    q0 /= np.linalg.norm(q0)
    cam = Cam(camera_id=0, width=96, height=96, fx=86, fy=86, cx=48, cy=48)
    kf = Keyframe(kf_id=0, camera=cam, quat=q0, trans=[0.3, -0.2, 1.0])
    cam_in = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
    d = jnp.asarray([0.01, -0.02, 0.015, 0.03, -0.01, 0.02], jnp.float32)
    adj = apply_pose_delta(cam_in, d)
    q, t = Trainer._fold_delta_np(kf.quat, kf.trans, np.asarray(d))
    kf.set_pose(q, t)
    cam2 = kf.render_inputs()
    for key in ("world_view_transform", "full_proj_transform",
                "camera_center"):
        np.testing.assert_allclose(np.asarray(adj[key]), cam2[key],
                                   atol=5e-7)


def test_set_keyframe_pose_resets_delta_row():
    tr, kfs = _make_trainer(optimize_poses=True)
    for _ in range(60):
        tr.train_iteration()
    kf = kfs[1]
    row = tr._pose_rows[kf.kf_id]
    tr.state = tr.state._replace(
        pose=tr.state.pose.at[row].set(jnp.ones(6) * 1e-3))
    tr.set_keyframe_pose(kf, kf.quat, kf.trans + 0.01)
    assert not np.asarray(tr.state.pose[row]).any()


def test_pose_table_absent_when_disabled():
    tr, _ = _make_trainer(optimize_poses=False)
    assert tr.state.pose.shape == (0, 6)
    m = tr.train_iteration()
    assert m is not None and np.isfinite(float(m["loss"]))


def test_ema_prior_tracks_delta_and_resets():
    """pose_prior_mode="ema": the EMA row follows only the trained row and
    pose-row resets clear it too."""
    import dataclasses as _dc

    tr, kfs = _make_trainer(optimize_poses=True)
    tr.opt_config = _dc.replace(tr.opt_config, pose_prior_mode="ema",
                                pose_ema_decay=0.5)
    tr._steps.clear()
    kf = kfs[2]
    _perturb(kf)
    tr._cam_cache.pop(kf.kf_id, None)

    def step_on_kf():
        kf.remaining_times_of_use = max(kf.remaining_times_of_use, 1)
        for other in kfs:
            if other is not kf:
                other.remaining_times_of_use = 0
        return tr.train_iteration()

    for _ in range(25):
        step_on_kf()
    row = tr._pose_rows[kf.kf_id]
    pose = np.asarray(tr.state.pose)
    ema = np.asarray(tr.state.pose_ema)
    assert np.any(pose[row]), "pose delta never moved"
    assert np.any(ema[row]), "ema row never updated"
    # ema lags the delta but tracks it (same sign on the largest component)
    j = int(np.argmax(np.abs(pose[row])))
    assert np.sign(ema[row][j]) == np.sign(pose[row][j])
    # rows that were never trained keep a zero ema
    other_rows = [r for k, r in tr._pose_rows.items() if k != kf.kf_id]
    for r in other_rows:
        assert not np.any(ema[r])
    # a base-pose refresh clears both the delta and its ema anchor
    tr.set_keyframe_pose(kf, kf.quat, kf.trans)
    assert not np.any(np.asarray(tr.state.pose)[row])
    assert not np.any(np.asarray(tr.state.pose_ema)[row])


def test_optimizer_pose_modes_step_scaling():
    """adam keeps ~lr-sized steps at tiny gradients (the random walk);
    amsmax steps shrink proportionally once the running max is set; sgd
    steps are plain bias-corrected momentum."""
    from segs_slam_tpu.train import optimizer

    lr = 1e-3

    def run(mode, grads_seq):
        params = {"pose": jnp.zeros((1, 6), jnp.float32)}
        st = optimizer.init(params)
        lr_tree = {"pose": lr}
        mode_fn = (lambda path: mode)
        steps = []
        for g in grads_seq:
            prev = params["pose"]
            # b2=0.9 so adam's second moment adapts within the test window
            # (at the default 0.999 the same re-inflation takes ~1000 steps;
            # amsmax never re-inflates regardless of b2)
            params, st = optimizer.update(
                params, {"pose": g}, st, lr_tree, b2=0.9, mode_fn=mode_fn)
            steps.append(float(jnp.max(jnp.abs(params["pose"] - prev))))
        return steps

    big = jnp.full((1, 6), 1.0, jnp.float32)
    tiny = jnp.full((1, 6), 1e-4, jnp.float32)
    seq = [big] * 5 + [tiny] * 250

    adam_steps = run("adam", seq)
    ams_steps = run("amsmax", seq)
    sgd_steps = run("sgd", seq)

    # once nu re-adapts to the tiny gradients, adam's step is back to ~lr
    # even though the gradient dropped 1e4x ...
    assert adam_steps[-1] > 0.3 * lr
    # ... while amsmax scales with |g| / sqrt(max g^2) = 1e-4
    assert ams_steps[-1] < 5e-4 * lr
    # both are identically conditioned on the very first step (sign step)
    assert abs(adam_steps[0] - ams_steps[0]) < 1e-9
    # sgd: step -> lr * g at stationarity
    assert abs(sgd_steps[-1] - lr * 1e-4) < 5e-8


def test_optimizer_mode_fn_leaves_other_groups_adam():
    from segs_slam_tpu.train import optimizer

    params = {"pose": jnp.ones((1, 6)), "anchors": jnp.ones((4, 3))}
    st = optimizer.init(params)
    lr_tree = {"pose": 1e-2, "anchors": 1e-2}

    def mode_fn(path):
        return "sgd" if path[0].key == "pose" else "adam"

    g = {"pose": jnp.full((1, 6), 2.0), "anchors": jnp.full((4, 3), 2.0)}
    params2, st2 = optimizer.update(params, g, st, lr_tree, mode_fn=mode_fn)
    # anchors took an adam sign-step of size lr; pose took lr*g
    assert abs(float(params2["anchors"][0, 0]) - (1.0 - 1e-2)) < 1e-6
    assert abs(float(params2["pose"][0, 0]) - (1.0 - 1e-2 * 2.0)) < 1e-6
    # sgd leaves the second moment untouched (zeros)
    assert not np.any(np.asarray(st2.nu["pose"]))


def test_pose_opt_start_gates_delta_updates():
    """pose_opt_start freezes the delta rows until the given iteration."""
    import dataclasses as _dc

    tr, kfs = _make_trainer(optimize_poses=True)
    tr.opt_config = _dc.replace(tr.opt_config, pose_opt_start=20)
    tr._steps.clear()
    kf = kfs[2]
    _perturb(kf)
    tr._cam_cache.pop(kf.kf_id, None)

    def step_on_kf():
        kf.remaining_times_of_use = max(kf.remaining_times_of_use, 1)
        for other in kfs:
            if other is not kf:
                other.remaining_times_of_use = 0
        return tr.train_iteration()

    for _ in range(10):
        step_on_kf()
    row = tr._pose_rows[kf.kf_id]
    assert not np.any(np.asarray(tr.state.pose)[row]), (
        "delta moved before pose_opt_start")
    for _ in range(15):
        step_on_kf()
    assert np.any(np.asarray(tr.state.pose)[row]), (
        "delta still frozen after pose_opt_start")
