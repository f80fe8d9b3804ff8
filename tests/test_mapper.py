"""End-to-end online mapper test with the synthetic oracle producer.

The fake-SLAM-producer gate of SURVEY §4: the mapper loop runs against a
recorded/synthesized MappingOperation stream with no tracker present.
"""

import numpy as np
import pytest

from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.slam.mapper import Mapper, MapperConfig
from segs_slam_tpu.slam.producers import SyntheticOracleProducer
from segs_slam_tpu.slam.protocol import (
    MappingQueue,
    OperationKind,
    record_stream,
    replay_stream,
)
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer

W = H = 32


def _make_setup():
    cam = Camera(camera_id=0, width=W, height=H, fx=28.0, fy=28.0,
                 cx=W / 2, cy=H / 2)
    rng = np.random.default_rng(0)
    kfs = []
    for i in range(6):
        img = rng.uniform(0.1, 0.9, (3, H, W)).astype(np.float32)
        kf = Keyframe(kf_id=i, camera=cam, quat=[1, 0, 0, 0],
                      trans=[0.05 * i, 0, 0], image=img)
        kfs.append(kf)
    mc = ModelConfig(feat_dim=8, n_offsets=4, appearance_dim=8,
                     embedding_dim=4, capacity=128, voxel_size=0.05)
    oc = OptimizationConfig(use_frequency_regularization=False,
                            start_stat=2, update_from=5, update_interval=10,
                            update_until=100)
    rc = RasterConfig(tile=16, compact=256, kmax=16, chunk=64)
    trainer = Trainer(mc, oc, rc, width=W, height=H)
    trainer.scene.add_camera(cam)
    return cam, kfs, trainer


def _sparse_fn(rng):
    def fn(kf):
        return rng.uniform([-0.6, -0.5, 1.2], [0.6, 0.5, 3.0], (60, 3))
    return fn


def test_mapper_end_to_end():
    cam, kfs, trainer = _make_setup()
    queue = MappingQueue()
    rng = np.random.default_rng(1)
    producer = SyntheticOracleProducer(
        kfs, cam, queue, sparse_points_fn=_sparse_fn(rng)
    )
    mapper = Mapper(queue, trainer, cam,
                    MapperConfig(min_num_initial_map_kfs=3))
    producer.run()  # fill the queue synchronously
    mapper.run(max_iterations=12)
    assert mapper.initialized
    assert trainer.iteration == 12
    assert len(trainer.scene.keyframes) == 6
    assert int(trainer.state.anchors.num_active()) > 0


def test_mapper_pose_update_and_loop_closure():
    cam, kfs, trainer = _make_setup()
    queue = MappingQueue()
    rng = np.random.default_rng(2)
    producer = SyntheticOracleProducer(
        kfs, cam, queue, sparse_points_fn=_sparse_fn(rng)
    )
    producer.run()
    mapper = Mapper(queue, trainer, cam,
                    MapperConfig(min_num_initial_map_kfs=2))
    mapper.run(max_iterations=4)

    from segs_slam_tpu.slam.protocol import MappingOperation

    new_pose = (np.array([0.9, 0.1, 0.0, 0.0]) / np.linalg.norm([0.9, 0.1, 0, 0]),
                np.array([0.3, 0.1, -0.2]))
    op = MappingOperation(
        kind=OperationKind.LOOP_CLOSING_BA,
        pose_updates={2: new_pose},
    )
    queue.push(op)
    mapper.run(max_iterations=6)
    kf2 = trainer.scene.keyframes[2]
    np.testing.assert_allclose(kf2.trans, new_pose[1])
    assert mapper.loop_closure_iteration


def test_mapper_scale_refinement():
    cam, kfs, trainer = _make_setup()
    queue = MappingQueue()
    rng = np.random.default_rng(3)
    producer = SyntheticOracleProducer(
        kfs, cam, queue, sparse_points_fn=_sparse_fn(rng)
    )
    producer.run()
    mapper = Mapper(queue, trainer, cam,
                    MapperConfig(min_num_initial_map_kfs=2))
    mapper.run(max_iterations=3)
    a_before = np.asarray(trainer.state.anchors.anchor).copy()
    n_act = int(trainer.state.anchors.num_active())

    from segs_slam_tpu.slam.protocol import MappingOperation

    op = MappingOperation(kind=OperationKind.SCALE_REFINEMENT, scale=2.0,
                          transform=np.eye(4))
    queue.push(op)
    # drain any remaining producer ops plus the scale op
    mapper.run(max_iterations=3 + queue._q.qsize() + 1)
    a_after = np.asarray(trainer.state.anchors.anchor)
    np.testing.assert_allclose(a_after[:n_act], a_before[:n_act] * 2.0,
                               rtol=1e-4)


def test_record_replay_stream(tmp_path):
    cam, kfs, trainer = _make_setup()
    queue = MappingQueue()
    rng = np.random.default_rng(4)
    producer = SyntheticOracleProducer(
        kfs, cam, queue, sparse_points_fn=_sparse_fn(rng)
    )
    producer.run()
    ops = queue.drain()
    path = tmp_path / "stream.pkl"
    record_stream(ops, path)
    replayed = list(replay_stream(path))
    assert len(replayed) == len(ops)
    assert replayed[0].kind == OperationKind.LOCAL_MAPPING_BA
    np.testing.assert_allclose(
        replayed[0].keyframes[0].image, ops[0].keyframes[0].image
    )


def test_tracker_pose_updates_mapping():
    """Native frame ordinals map to dataset frame ids; out-of-range ordinals
    are dropped (producers.tracker_pose_updates)."""
    import numpy as np
    from segs_slam_tpu.slam.producers import tracker_pose_updates

    fed = [3, 7, 11]  # dataset frame ids in feed order
    poses = np.arange(3 * 7, dtype=float).reshape(3, 7)
    upd = tracker_pose_updates(fed, [0, 2, 5], poses)
    assert set(upd) == {3, 11}  # ordinal 5 out of range -> dropped
    q, t = upd[11]
    np.testing.assert_allclose(t, poses[1, 0:3])
    np.testing.assert_allclose(q, poses[1, 3:7])


def test_pose_refine_on_arrival_runs_before_training():
    """MapperConfig.pose_refine_on_arrival: each post-initialization
    keyframe gets frame-to-model alignment before add_keyframe."""
    cam, kfs, trainer = _make_setup()
    queue = MappingQueue()
    rng = np.random.default_rng(1)
    producer = SyntheticOracleProducer(
        kfs, cam, queue, sparse_points_fn=_sparse_fn(rng)
    )
    refined = []
    orig = trainer.refine_keyframe_pose

    def spy(kf, steps=5, lr=4e-3):
        refined.append((kf.kf_id, steps))
        assert kf.kf_id not in trainer.scene.keyframes  # before add
        return orig(kf, steps=steps, lr=lr)

    trainer.refine_keyframe_pose = spy
    mapper = Mapper(queue, trainer, cam,
                    MapperConfig(min_num_initial_map_kfs=3,
                                 pose_refine_on_arrival=2))
    producer.run()
    mapper.run(max_iterations=10)
    assert mapper.initialized
    # keyframes 0-2 initialize the map (no refinement possible); 3-5 arrive
    # after initialization and must each have been aligned with the
    # configured step count
    assert [r[0] for r in refined] == [3, 4, 5]
    assert all(steps == 2 for _, steps in refined)
