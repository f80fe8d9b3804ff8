import numpy as np

from segs_slam_tpu.eval import metrics as M


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    # random rotation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    s_true, t_true = 2.5, np.array([0.3, -1.0, 0.7])
    dst = s_true * (R @ src.T).T + t_true
    s, R2, t = M.umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_aligned():
    rng = np.random.default_rng(1)
    traj = rng.normal(size=(30, 3))
    res = M.ate_rmse(traj * 3.0 + 1.0, traj, correct_scale=True)
    assert res["ate_rmse"] < 1e-6
    res2 = M.ate_rmse(traj + rng.normal(0, 0.01, traj.shape), traj)
    assert 0.001 < res2["ate_rmse"] < 0.05


def test_tum_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    times = np.arange(5.0)
    pos = rng.normal(size=(5, 3))
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    path = tmp_path / "traj.txt"
    M.save_tum_trajectory(path, times, pos, q)
    t2, p2, q2 = M.load_tum_trajectory(path)
    np.testing.assert_allclose(t2, times, atol=1e-5)
    np.testing.assert_allclose(p2, pos, atol=1e-6)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_fps_from_times():
    np.testing.assert_allclose(M.fps_from_times(np.full(10, 0.02)), 50.0)
    assert M.fps_from_times(np.array([])) == 0.0


def test_recorder_and_harness(tmp_path):
    """Recorder writes the reference artifact layout; harness aggregates."""
    import jax
    import jax.numpy as jnp
    from segs_slam_tpu.core.camera import Camera
    from segs_slam_tpu.core.keyframe import Keyframe
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.ops.rasterizer import RasterConfig
    from segs_slam_tpu.train.config import OptimizationConfig
    from segs_slam_tpu.train.trainer import Trainer
    from segs_slam_tpu.eval.recorder import record_all_keyframes
    from segs_slam_tpu.eval.harness import evaluate_run

    W = H = 32
    cam = Camera(camera_id=0, width=W, height=H, fx=28.0, fy=28.0,
                 cx=16, cy=16)
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=8,
                     embedding_dim=4, capacity=64, voxel_size=0.05)
    oc = OptimizationConfig(use_frequency_regularization=False)
    rc = RasterConfig(tile=16, compact=128, kmax=16, chunk=64)
    trainer = Trainer(mc, oc, rc, width=W, height=H)
    rng = np.random.default_rng(0)
    for i in range(2):
        kf = Keyframe(kf_id=i, camera=cam, quat=[1, 0, 0, 0],
                      trans=[0.1 * i, 0, 0],
                      image=rng.uniform(0.1, 1, (3, H, W)).astype(np.float32))
        trainer.add_keyframe(kf)
    trainer.initialize_map(
        rng.uniform([-0.5, -0.5, 1], [0.5, 0.5, 3], (50, 3))
    )
    run_dir = tmp_path / "run0"
    agg = record_all_keyframes(trainer, run_dir, tracking_times=[0.01, 0.012],
                               total_runtime_s=12.5)
    for f in ["render_time.txt", "psnr.txt", "dssim.txt",
              "psnr_gaussian_splatting.txt", "gaussians_num.txt",
              "TrackingTime.txt", "RunningTime.txt"]:
        assert (run_dir / f).exists(), f
    assert (run_dir / "rendered").is_dir()
    res = evaluate_run(run_dir)
    assert "psnr" in res and "render_fps" in res and "tracking_fps" in res
    assert np.isfinite(res["psnr"])

    # all-frames eval (renderAndRecordAllframes equivalent) writes the
    # <iter>_images layout AND must not retrace the chained renderer the
    # keyframe eval already compiled (a retrace on the TPU recompiles a
    # minutes-long sort program; regression guard for the recorder's
    # input staging)
    from segs_slam_tpu.eval.recorder import record_all_frames

    class _FakeFrame:
        def __init__(self, img, ts):
            self._img = img
            self.timestamp = ts

        def load_rgb(self):
            return self._img

    frames = [
        _FakeFrame(rng.uniform(0.1, 1, (3, H, W)).astype(np.float32),
                   float(i))
        for i in range(3)
    ]
    est = [([1.0, 0.0, 0.0, 0.0], [0.05 * i, 0.0, 0.0]) for i in range(3)]
    chain_fns = trainer._eval_render()
    sizes_before = [f._cache_size() for f in chain_fns.jits()] \
        if hasattr(chain_fns, "jits") else None
    agg2 = record_all_frames(trainer, run_dir, frames, est, cam,
                             record_images=True, image_stride=1, batch=2)
    assert agg2["n_frames"] == 3
    it_dir = run_dir / f"{trainer.iteration}_images"
    for f in ["psnr.txt", "dssim.txt", "render_time.txt",
              "AllCameraTrajectory_TUM.txt"]:
        assert (it_dir / f).exists(), f
    assert (it_dir / "all_image").is_dir()
    if sizes_before is not None:
        sizes_after = [f._cache_size() for f in chain_fns.jits()]
        assert sizes_after == sizes_before, (
            "all-frames eval retraced the chained renderer: "
            f"{sizes_before} -> {sizes_after}")


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from segs_slam_tpu.models.anchors import empty_state, insert_points
    from segs_slam_tpu.models.config import ModelConfig
    from segs_slam_tpu.models.decoders import init_decoders
    from segs_slam_tpu.train.step import init_train_state
    from segs_slam_tpu.io.checkpoint import (
        load_train_state,
        save_mlp_checkpoints_txt,
        save_train_state,
    )

    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=8,
                     embedding_dim=4, capacity=32, voxel_size=0.05)
    rng = np.random.default_rng(0)
    anchors, _ = insert_points(
        empty_state(mc), rng.uniform(-1, 1, (20, 3)), mc
    )
    ts = init_train_state(anchors, init_decoders(jax.random.PRNGKey(0), mc), mc)
    path = tmp_path / "ckpt"
    save_train_state(path, ts)
    restored = load_train_state(path, ts)
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    mlp_dir = tmp_path / "mlps"
    save_mlp_checkpoints_txt(mlp_dir, ts.decoders)
    assert (mlp_dir / "mlp_opacity_l1_weight.txt").exists()
    assert (mlp_dir / "embedding_appearance.txt").exists()
