"""Online RGB-D SLAM + mapping — the replica_rgbd / tum_rgbd equivalent.

Pipeline (mirroring the entry-point skeleton of examples/tum_rgbd.cpp:119-268):
native dataloader (C++ worker pool) -> tracking (native ORB+PnP frontend or
ground-truth pose oracle) -> MappingOperation queue -> Mapper thread driving
the jitted TPU train step -> shutdown artifacts (trajectory, metrics,
rendered keyframes, PLY).

Usage:
  python -m segs_slam_tpu.apps.slam_rgbd --dataset replica --path <seq_dir> \
      --out results/replica_room0 [--tracker native|oracle] [--iters-budget N]
"""

from __future__ import annotations

import argparse
import os
import threading
import time
from pathlib import Path

import numpy as np

from segs_slam_tpu.apps.common import (
    add_common_args,
    maybe_start_live_viewer,
    resolve_configs,
    resolve_dist_coeffs,
)
from segs_slam_tpu.core.camera import Camera
from segs_slam_tpu.eval import metrics as M
from segs_slam_tpu.eval.recorder import record_all_keyframes
from segs_slam_tpu.io import datasets
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.slam.mapper import Mapper, MapperConfig
from segs_slam_tpu.slam.protocol import (
    KeyframeData,
    MappingOperation,
    MappingQueue,
    OperationKind,
)
from segs_slam_tpu.slam import frontends
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.trainer import Trainer

# Per-dataset camera intrinsics defaults (reference: cfg/ORB_SLAM3 yamls)
DATASET_DEFAULTS = {
    "replica": dict(fx=600.0, fy=600.0, cx=599.5, cy=339.5, w=1200, h=680,
                    depth_scale=6553.5),
    "tum": dict(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
                w=640, h=480, depth_scale=5000.0),
    # ScanNet exports per-scene intrinsics (intrinsic/intrinsic_color.txt) —
    # read at load time; these are scene0000-style fallbacks.
    "scannet": dict(fx=1169.62, fy=1167.11, cx=646.295, cy=489.927,
                    w=1296, h=968, depth_scale=1000.0),
}


def run_producer(frames, camera, queue, tracker_kind, depth_scale,
                 keyframe_every, points_per_kf, tracking_times, stop_event,
                 fps=0.0, dist_coeffs=None, imu=None, data_fps=30.0):
    """Tracking thread: decode + undistort + track + push keyframe ops.

    When `dist_coeffs` is set, images are undistorted before anything sees
    them (reference: Camera::initUndistortRectifyMapAndMask,
    include/camera.h:76-113) — natively in the loader worker pool, or via
    core.undistort.UndistortMap on the fallback path. Out-of-map border
    pixels come back black, which the photometric losses already mask
    (gt != 0), matching the reference's white-image undistort mask.
    """
    rng = np.random.default_rng(0)
    next_pid = [0]

    try:
        from segs_slam_tpu.native import NativeLoader, NativeTracker, native_available
        use_native_loader = native_available()
    except Exception:
        use_native_loader = False

    umap = None
    if dist_coeffs is not None and not use_native_loader:
        import dataclasses as _dc

        from segs_slam_tpu.core.undistort import UndistortMap

        umap = UndistortMap(_dc.replace(camera, dist_coeffs=tuple(dist_coeffs)))

    tracker = None
    if tracker_kind == "native":
        from segs_slam_tpu.native import NativeTracker

        tracker = NativeTracker(camera.fx, camera.fy, camera.cx, camera.cy)

    from segs_slam_tpu.slam.producers import tracker_pose_updates

    fed_frames: list[int] = []  # tracker frame_no -> dataset frame index

    def _tracker_pose_updates(frame_nos, poses7):
        return tracker_pose_updates(fed_frames, frame_nos, poses7)

    def push_keyframe(i, fr, rgb, depth, quat, trans, kp=None,
                      pose_updates=None):
        kfd = KeyframeData(
            kf_id=i, camera_id=camera.camera_id, quat=quat, trans=trans,
            image=rgb, depth=depth, timestamp=fr.timestamp,
            keypoint_pixels=kp[:, :2] if kp is not None else None,
            keypoint_points=kp[:, 2:5] if kp is not None else None,
        )
        op = MappingOperation(kind=OperationKind.LOCAL_MAPPING_BA,
                              keyframes=[kfd])
        if pose_updates:
            op.pose_updates = pose_updates
        if depth is not None:
            pts = frontends.backproject_depth(depth, camera, quat, trans,
                                              0.05, 20.0, stride=8)
            if len(pts) > points_per_kf:
                pts = pts[rng.choice(len(pts), points_per_kf, replace=False)]
            op.points_xyz = pts
            op.point_ids = np.arange(next_pid[0], next_pid[0] + len(pts))
            next_pid[0] += len(pts)
        queue.push(op)

    if use_native_loader:
        from segs_slam_tpu.native import NativeLoader

        loader = NativeLoader(
            [f.rgb_path for f in frames],
            [f.depth_path for f in frames],
            depth_scale=depth_scale,
            n_threads=4,
            dist_coeffs=dist_coeffs,
            intrinsics=(camera.fx, camera.fy, camera.cx, camera.cy),
        )
        frame_iter = ((i, rgb, depth) for i, rgb, depth in loader)
    else:
        def _it():
            for i, f in enumerate(frames):
                rgb = f.load_rgb()
                depth = f.load_depth(depth_scale)
                if umap is not None:
                    rgb = umap.remap(rgb)
                    if depth is not None:
                        depth = umap.remap(depth)
                yield i, rgb, depth
        frame_iter = _it()

    est_rows = []
    frame_interval = (1.0 / fps) if fps else 0.0
    for i, rgb, depth in frame_iter:
        if stop_event.is_set():
            break
        if frame_interval:
            time.sleep(frame_interval)
        fr = frames[i]
        t0 = time.perf_counter()
        pose_updates = None
        loop_cand = -1
        if tracker is not None and imu is not None:
            # feed IMU samples up to this frame's timestamp; the tracker
            # preintegrates them into the motion prior (reference:
            # ORB-SLAM3 Tracking.cc PreintegrateIMU / PredictStateIMU)
            imu_times, imu_gyro, imu_accel, imu_cursor = imu
            t_frame = i / data_fps
            dt_s = (imu_times[1] - imu_times[0]) if len(imu_times) > 1 else 0.0
            while (imu_cursor[0] < len(imu_times)
                   and imu_times[imu_cursor[0]] < t_frame - 1e-9):
                k = imu_cursor[0]
                tracker.feed_imu(dt_s, imu_gyro[k], imu_accel[k])
                imu_cursor[0] += 1
        if tracker is not None and depth is not None:
            fed_frames.append(i)
            gray = (rgb.mean(axis=2) * 255).astype(np.uint8)
            if os.environ.get("SG_ABL_FORCE_GT"):
                # diagnostic ablation: run the full tracker (keyframe
                # selection, BA, timing) but pin its output poses to ground
                # truth — isolates pose-error-driven mapping loss
                tracker.set_gt_hint(np.concatenate([fr.trans, fr.quat]))
            status, pose7, _ = tracker.track(gray, depth)
            quat = pose7[3:7]
            trans = pose7[0:3]
            if os.environ.get("SG_ABL_FORCE_GT"):
                quat, trans = fr.quat.copy(), np.asarray(fr.trans).copy()
            is_kf = status == 1
            if is_kf:
                kp = tracker.keyframe_points()
                # post-BA window poses → LOCAL_MAPPING_BA pose refreshes
                # (reference: LocalMapping.cc:149-160)
                _, fnos, poses = tracker.window_poses()
                pose_updates = _tracker_pose_updates(fnos, poses)
                if os.environ.get("SG_ABL_NO_POSE_UPDATES"):
                    pose_updates = None  # diagnostic: isolate the refresh
                    # stream's times-of-use / delta-reset side effects
                loop_cand = tracker.poll_loop()
            else:
                kp = None
        else:  # pose oracle from the dataset ground truth
            quat, trans = fr.quat, fr.trans
            is_kf = i % keyframe_every == 0
            kp = None
        tracking_times.append(time.perf_counter() - t0)
        # carry the dataset frame index so the final-trajectory rewrite keys
        # rows by frame id (est_rows gets a row for EVERY frame while
        # fed_frames only appends on the native-tracker branch — positional
        # indexing misaligns as soon as one frame falls to the oracle branch)
        est_rows.append((i, fr.timestamp, quat.copy(),
                         np.asarray(trans).copy()))
        if is_kf:
            push_keyframe(i, fr, rgb, depth, np.asarray(quat),
                          np.asarray(trans), kp, pose_updates)
        if loop_cand >= 0:
            # trajectory was rigidly corrected: refresh every keyframe pose
            # (reference: LoopClosing.cc:1201 pushes LoopClosingBA)
            _, fnos, poses = tracker.trajectory()
            op = MappingOperation(kind=OperationKind.LOOP_CLOSING_BA)
            op.pose_updates = _tracker_pose_updates(fnos, poses)
            queue.push(op)
            print(f"[tracker] loop closure at frame {i} "
                  f"(candidate kf {loop_cand}), "
                  f"{len(op.pose_updates)} poses corrected", flush=True)

    if tracker is not None:
        # final-trajectory pose rewrite at shutdown: every mapped keyframe
        # adopts its final optimized pose before the tail optimization
        # (reference: src/gaussian_mapper.cpp:684-761)
        _, fnos, poses = tracker.trajectory()
        op = MappingOperation(kind=OperationKind.LOCAL_MAPPING_BA)
        op.pose_updates = _tracker_pose_updates(fnos, poses)
        queue.push(op)
        # overwrite est_rows poses for keyframe frames with final poses,
        # keyed by dataset frame index (NOT positional — see est_rows note)
        final = {fed_frames[f]: p for f, p in zip(fnos, poses)
                 if 0 <= f < len(fed_frames)}
        for j, (fi, ts, q, t) in enumerate(est_rows):
            if fi in final:
                p = final[fi]
                est_rows[j] = (fi, ts, p[3:7].copy(), p[0:3].copy())
    return [(ts, q, t) for _, ts, q, t in est_rows]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["replica", "tum", "scannet"],
                   required=True)
    p.add_argument("--path", required=True)
    p.add_argument("--out", default="results/run")
    p.add_argument("--tracker", choices=["native", "oracle"], default="native")
    p.add_argument("--keyframe-every", type=int, default=10)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--iters-budget", type=int, default=30_000)
    add_common_args(p)
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--fps", type=float, default=0.0,
                  help="pace the frame feed (0 = free-run)")
    p.add_argument("--min-init-kfs", type=int, default=10)
    p.add_argument("--debug-ckpt-at", type=int, default=0)
    p.add_argument("--pose-refine-on-arrival", type=int, default=0,
                   help="LM photometric frame-to-model alignment steps for "
                        "each new keyframe against the current map (0 = "
                        "off); corrects tracker pose error before it blurs "
                        "the map")
    p.add_argument("--pose-refine-every", type=int, default=0,
                   help="photometric keyframe-pose refinement cadence "
                        "(0 = off; try 25 with --tracker native)")
    p.add_argument("--shutdown-pose-refine", type=int, default=0,
                   help="rounds of shutdown pose refinement: after the "
                        "training budget, re-estimate every keyframe pose "
                        "against the converged map (photometric+depth LM) "
                        "then re-fit the map (0 = off; try 3)")
    p.add_argument("--shutdown-pose-refine-iters", type=int, default=400,
                   help="re-fit train iterations per shutdown-refine round")
    p.add_argument("--optimize-poses", choices=["auto", "on", "off"],
                   default="auto",
                   help="in-step photometric pose optimization (per-keyframe "
                        "SE3 deltas trained jointly with the map); auto = "
                        "off — the round-3 ablation showed the delta random "
                        "walk costs more map quality than the pose "
                        "correction recovers (RESULTS.md)")
    p.add_argument("--all-frames-eval", action="store_true",
                   help="post-run novel-view eval over EVERY tracked frame "
                        "(reference: renderAndRecordAllframes)")
    p.add_argument("--all-frames-images", action="store_true",
                   help="also dump strided renders/GT pngs for the "
                        "all-frames eval")
    # intrinsic overrides (e.g. synthetic datasets)
    p.add_argument("--fx", type=float, default=0)
    p.add_argument("--fy", type=float, default=0)
    p.add_argument("--cx", type=float, default=-1)
    p.add_argument("--cy", type=float, default=-1)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--height", type=int, default=0)
    args = p.parse_args(argv)

    d = dict(DATASET_DEFAULTS[args.dataset])
    if args.dataset == "scannet":
        intr = datasets.load_scannet_intrinsics(args.path)
        if intr:
            d.update(intr)
        # the intrinsic export carries no image size; it is always calibrated
        # for the exported color resolution, so adopt the first frame's size
        probe_frames = datasets.load_scannet(args.path)
        if probe_frames:
            ph, pw = probe_frames[0].load_rgb().shape[:2]
            d["w"], d["h"] = pw, ph
    if args.width:
        d["w"] = args.width
    if args.height:
        d["h"] = args.height
    if args.fx:
        d["fx"] = args.fx
    if args.fy:
        d["fy"] = args.fy
    if args.cx >= 0:
        d["cx"] = args.cx
    if args.cy >= 0:
        d["cy"] = args.cy
    s = args.downscale
    cam = Camera(camera_id=0, width=d["w"] // s, height=d["h"] // s,
                 fx=d["fx"] / s, fy=d["fy"] / s,
                 cx=d["cx"] / s, cy=d["cy"] / s)

    if args.dataset == "replica":
        frames = datasets.load_replica(args.path)
    elif args.dataset == "scannet":
        frames = datasets.load_scannet(args.path)
    else:
        frames = datasets.load_tum_rgbd(args.path)
    if args.max_frames:
        frames = frames[: args.max_frames]
    print(f"{len(frames)} frames")
    if frames:
        probe = frames[0].load_rgb()
        if probe.shape[:2] != (cam.height, cam.width):
            raise SystemExit(
                f"dataset images are {probe.shape[1]}x{probe.shape[0]} but the "
                f"camera is configured {cam.width}x{cam.height} (the "
                f"'{args.dataset}' preset). Pass --width/--height/--fx/--fy/"
                f"--cx/--cy to match the dataset."
            )

    mc, oc, mpc, rc, trainer_kwargs = resolve_configs(
        args, args.iters_budget,
        mapper_overrides=dict(
            min_num_initial_map_kfs=args.min_init_kfs,
            pose_refine_every=args.pose_refine_every,
            pose_refine_on_arrival=args.pose_refine_on_arrival,
            shutdown_pose_refine_rounds=args.shutdown_pose_refine,
            shutdown_pose_refine_iters=args.shutdown_pose_refine_iters),
    )
    # "auto" resolves to OFF since the round-3 ablation matrix (RESULTS.md):
    # in-step joint pose optimization costs 0.6-2.7 dB of map quality (the
    # per-keyframe deltas random-walk under Adam noise); the decoupled LM
    # refinement (--pose-refine-every) is the supported pose-correction path.
    if args.optimize_poses == "on":
        trainer_kwargs["optimize_poses"] = True
    trainer = Trainer(mc, oc, rc, width=cam.width, height=cam.height,
                      **trainer_kwargs)
    trainer.scene.add_camera(cam)
    queue = MappingQueue()
    mapper = Mapper(queue, trainer, cam, mpc)
    maybe_start_live_viewer(args, trainer)
    mapper.debug_ckpt_at = args.debug_ckpt_at
    dist_coeffs = resolve_dist_coeffs(args, args.dataset)
    if dist_coeffs is not None:
        print(f"undistortion on: k={dist_coeffs}")

    tracking_times: list[float] = []
    stop_event = threading.Event()
    est_rows_box: list = []

    # optional inertial stream: <path>/imu.txt rows `t gx gy gz ax ay az`
    # (written by utils/make_rgbd_dataset --imu; EuRoC-convention units).
    # Fed to the native tracker's preintegration between frames.
    imu = None
    imu_path = Path(args.path) / "imu.txt"
    if args.tracker == "native" and imu_path.exists():
        from segs_slam_tpu.utils.make_imu import load_imu_txt

        ts_imu, gy, ac = load_imu_txt(imu_path)
        imu = (ts_imu, gy, ac, [0])
        print(f"IMU stream: {len(ts_imu)} samples from {imu_path}")

    def producer():
        est_rows_box.extend(
            run_producer(frames, cam, queue, args.tracker, d["depth_scale"],
                         args.keyframe_every, 300, tracking_times, stop_event,
                         fps=args.fps, dist_coeffs=dist_coeffs, imu=imu)
        )
        mapper.signal_stop()

    t0 = time.time()
    prod_thread = threading.Thread(target=producer, daemon=True)
    prod_thread.start()
    mapper.run(max_iterations=args.iters_budget)
    prod_thread.join()
    runtime = time.time() - t0
    nfold = trainer.fold_pose_deltas()
    if nfold:
        print(f"folded in-step pose deltas into {nfold} keyframes")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # trajectories (estimated + gt) in TUM format
    if est_rows_box:
        times = [r[0] for r in est_rows_box]
        centers, quats = [], []
        for _, q, t in est_rows_box:
            w_, x_, y_, z_ = q
            R = np.array([
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
            ])
            centers.append(-R.T @ t)
            qc = np.array([w_, x_, y_, z_])
            quats.append(qc)
        M.save_tum_trajectory(out / "CameraTrajectory_TUM.txt", times, centers,
                              quats)
        gt_centers = []
        gt_quats = []
        for fr in frames:
            R = None
            w_, x_, y_, z_ = fr.quat
            R = np.array([
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
            ])
            gt_centers.append(-R.T @ fr.trans)
            gt_quats.append(fr.quat)
        M.save_tum_trajectory(out / "groundtruth.txt",
                              [f.timestamp for f in frames], gt_centers,
                              gt_quats)

    agg = record_all_keyframes(trainer, out, tracking_times=tracking_times,
                               total_runtime_s=runtime)
    if args.all_frames_eval and est_rows_box:
        from segs_slam_tpu.eval.recorder import record_all_frames

        est_poses = [(q, t) for _, q, t in est_rows_box]
        af = record_all_frames(trainer, out, frames, est_poses, cam,
                               record_images=args.all_frames_images)
        print("all-frames eval:", {k: round(v, 3) for k, v in af.items()})
    trainer.save_ply(out / "anchors.ply")
    from segs_slam_tpu.io.checkpoint import save_mlp_checkpoints_txt, save_cameras_json

    save_mlp_checkpoints_txt(out / "mlps", trainer.state.decoders)
    save_cameras_json(out / "cameras.json", trainer.scene.keyframes)
    print("done:", {k: round(v, 3) for k, v in agg.items()},
          f"runtime {runtime:.0f}s, {trainer.iteration} iters")
    return agg


if __name__ == "__main__":
    main()
