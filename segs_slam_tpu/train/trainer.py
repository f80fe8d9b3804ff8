"""Offline trainer — the `trainColmap` equivalent.

Drives the jitted train step over a fixed keyframe set with the mapper's
sliding-window sampler and periodic anchor adjustment
(reference: GaussianMapper::trainColmap, src/gaussian_mapper.cpp:797-820 +
trainForOneIteration :823-1031). Keeps the device busy: steps are dispatched
asynchronously and the host syncs only for logging / densification cadence.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from segs_slam_tpu.core.keyframe import Keyframe
from segs_slam_tpu.models.anchors import empty_state, insert_points
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders
from segs_slam_tpu.models.renderer import render
from segs_slam_tpu.ops.rasterizer import RasterConfig
from segs_slam_tpu.slam.scene import Scene
from segs_slam_tpu.train import losses
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.densify import make_adjust_anchor
from segs_slam_tpu.train.step import TrainState, init_train_state, make_train_step


@dataclass
class Trainer:
    model_config: ModelConfig
    opt_config: OptimizationConfig
    raster_config: RasterConfig
    width: int
    height: int
    white_background: bool = False
    seed: int = 0
    keyframe_times_of_use: int = 8  # Mapper.new_keyframe_times_of_use
    interpret: bool | None = None
    # Gaussian-pyramid coarse-to-fine supervision (reference:
    # GausPyramid.* keys + src/gaussian_mapper.cpp:837-859)
    num_pyramid_sub_levels: int = 0
    pyramid_times_of_use: int = 8
    # in-step photometric pose optimization: per-keyframe SE3 tangent deltas
    # trained jointly with the map (train/step.py apply_pose_delta; beyond
    # reference). Rows are assigned per keyframe in arrival order; keyframes
    # beyond max_pose_kfs train at their base pose.
    optimize_poses: bool = False
    max_pose_kfs: int = 512

    scene: Scene = field(init=False)
    state: TrainState = field(init=False, default=None)
    iteration: int = field(init=False, default=0)

    def __post_init__(self):
        self.scene = Scene(seed=self.seed)
        self._bg = jnp.asarray(
            np.ones(3, np.float32) if self.white_background else np.zeros(3, np.float32)
        )
        self._steps: dict[tuple[int, int], callable] = {}
        self._adjust = jax.jit(make_adjust_anchor(self.model_config, self.opt_config))
        self._rng = jax.random.PRNGKey(self.seed)
        self._cam_cache: dict[int, dict] = {}
        self._gt_cache: dict[tuple[int, int], jnp.ndarray] = {}
        # sensor-depth planes for lambda_depth supervision (full-res level
        # only; zeros when a keyframe carries no depth)
        self._depth_cache: dict[int, jnp.ndarray] = {}
        self._pose_rows: dict[int, int] = {}  # kf_id -> pose-table row
        # pyramid level sizes: level i < num_sub_levels is w / 2^(num-i),
        # rounded to a multiple of 16 (reference: graphics_utils.h:26-40)
        self._level_sizes = []
        for i in range(self.num_pyramid_sub_levels):
            f = 2 ** (self.num_pyramid_sub_levels - i)
            self._level_sizes.append(
                (max(16, self.width // f // 16 * 16),
                 max(16, self.height // f // 16 * 16))
            )
        self._level_sizes.append((self.width, self.height))

    def _step_for(self, w: int, h: int):
        key = (w, h)
        if key not in self._steps:
            self._steps[key] = jax.jit(
                make_train_step(
                    self.model_config,
                    self.opt_config,
                    self.raster_config,
                    w,
                    h,
                    interpret=self.interpret,
                )
            )
        return self._steps[key]

    @property
    def _step(self):
        return self._step_for(self.width, self.height)

    # --- setup ---
    def add_keyframe(self, kf: Keyframe) -> None:
        kf.remaining_times_of_use = self.keyframe_times_of_use
        if self.num_pyramid_sub_levels and kf.gaus_pyramid_times_of_use is None:
            kf.gaus_pyramid_times_of_use = [
                self.pyramid_times_of_use
            ] * self.num_pyramid_sub_levels
        self.scene.add_keyframe(kf)
        self._cam_cache.pop(kf.kf_id, None)
        for lvl in range(self.num_pyramid_sub_levels + 1):
            self._gt_cache.pop((kf.kf_id, lvl), None)
        if (self.optimize_poses and kf.kf_id not in self._pose_rows
                and len(self._pose_rows) < self.max_pose_kfs):
            self._pose_rows[kf.kf_id] = len(self._pose_rows)

    def initialize_map(self, points: np.ndarray) -> int:
        # cameras_extent -> spatial_lr_scale (reference: getNerfppNorm radius
        # feeding trainingSetup, src/gaussian_mapper.cpp:651-654). Requires
        # rebuilding the step closure since schedules bake the scale in.
        if self.scene.keyframes:
            import dataclasses as _dc

            radius = self.scene.nerfpp_norm_radius()
            self.opt_config = _dc.replace(self.opt_config, spatial_lr_scale=radius)
            self._steps.clear()
            self._adjust = jax.jit(
                make_adjust_anchor(self.model_config, self.opt_config)
            )
        anchors, n = insert_points(
            empty_state(self.model_config), points, self.model_config
        )
        decoders = init_decoders(
            jax.random.PRNGKey(self.seed), self.model_config
        )
        self.state = init_train_state(
            anchors, decoders, self.model_config,
            max_pose_kfs=self.max_pose_kfs if self.optimize_poses else 0,
        )
        return n

    def insert_points(self, points: np.ndarray) -> int:
        anchors, n = insert_points(self.state.anchors, points, self.model_config)
        self.state = self.state._replace(anchors=anchors)
        return n

    def apply_similarity(self, transform: np.ndarray | None, scale: float) -> None:
        """Similarity correction of the map (scale refinement / loop close,
        reference: scaleAndTransformThenMarkVisiblePoints,
        src/operate_points.cu:96-143 + combineMappingOperations :1165-1196).
        Applies p' = R (s p) + t to anchors and cached points, log-scales the
        anchor scalings, rotates the learned per-anchor offset vectors (they
        decode in world axes: xyz = anchor + offset * exp(scaling[:, :3])),
        and composes the anchor rotation quats with R. (The reference's
        applyScaledTransformation is an empty stub.)"""
        T = np.eye(4) if transform is None else np.asarray(transform)
        for pid, p in list(self.scene.cached_points.items()):
            self.scene.cached_points[pid] = (T[:3, :3] @ (scale * p) + T[:3, 3]).astype(
                np.float32
            )
        if self.state is None:
            return
        import jax.numpy as jnp

        from segs_slam_tpu.core.se3 import normalize_quat, quat_mul, rotmat_to_quat

        a = self.state.anchors
        R = jnp.asarray(T[:3, :3], jnp.float32)
        t = jnp.asarray(T[:3, 3], jnp.float32)
        # Exact offset correction through the per-axis scale basis:
        # world offset = offset * exp(s3); rotate+scale it, then re-express
        # in the new basis exp(s3') = s * exp(s3).
        e3 = jnp.exp(a.scaling[:, :3])  # (cap, 3)
        off_world = (a.offset * e3[:, None, :] * scale) @ R.T
        new_offset = off_world / jnp.maximum(e3[:, None, :] * scale, 1e-12)
        qR = rotmat_to_quat(R)
        anchors = a._replace(
            anchor=(a.anchor * scale) @ R.T + t,
            scaling=a.scaling + np.log(scale),
            offset=new_offset,
            rotation=normalize_quat(quat_mul(qR[None, :], a.rotation)),
        )
        self.state = self.state._replace(anchors=anchors)

    # --- training ---
    def _kf_inputs(self, kf: Keyframe, level: int | None = None):
        if level is None:
            level = self.num_pyramid_sub_levels
        cam = self._cam_cache.get(kf.kf_id)
        if cam is None:
            cam = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
            self._cam_cache[kf.kf_id] = cam
        gt = self._gt_cache.get((kf.kf_id, level))
        if gt is None:
            img = kf.image
            if img.shape[0] != 3:  # HWC -> CHW
                img = np.transpose(img, (2, 0, 1))
            if level < self.num_pyramid_sub_levels:
                w, h = self._level_sizes[level]
                import jax.image

                img = np.asarray(
                    jax.image.resize(jnp.asarray(img), (3, h, w), "bilinear")
                )
            gt = jnp.asarray(img, jnp.float32)
            self._gt_cache[(kf.kf_id, level)] = gt
        return cam, gt

    # --- in-step pose optimization bookkeeping ------------------------------
    @staticmethod
    def _fold_delta_np(q0, t0, delta):
        """Compose exp(delta) with a base (quat, trans) pose; numpy mirror of
        train/step.py apply_pose_delta. Returns (quat, trans)."""
        from segs_slam_tpu.core import se3

        delta = np.asarray(delta, np.float64)
        w, v = delta[:3], delta[3:]
        th = np.linalg.norm(w) + 1e-12
        K = np.array([
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ])
        R = (np.eye(3) + np.sin(th) / th * K
             + (1 - np.cos(th)) / th**2 * (K @ K))
        R0 = np.asarray(
            se3.quat_to_rotmat(jnp.asarray(q0, jnp.float32)), np.float64)
        Rn = R @ R0
        tn = R @ np.asarray(t0, np.float64) + v
        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rn, jnp.float32)))
        return q, tn

    def set_keyframe_pose(self, kf: Keyframe, quat, trans) -> None:
        """Adopt an externally-refreshed pose (SLAM BA / loop / scale op) and
        drop any learned photometric delta for that keyframe — the delta was
        relative to the stale base."""
        kf.set_pose(quat, trans)
        self._cam_cache.pop(kf.kf_id, None)
        row = self._pose_rows.get(kf.kf_id)
        if row is not None and self.state is not None \
                and self.state.pose.shape[0]:
            from segs_slam_tpu.train import optimizer as _opt

            mask = jnp.arange(self.state.pose.shape[0]) == row
            adam = _opt.reset_rows(
                self.state.adam, lambda p: p[0].key == "pose", mask)
            self.state = self.state._replace(
                pose=self.state.pose.at[row].set(0.0),
                pose_ema=self.state.pose_ema.at[row].set(0.0), adam=adam)

    def pose_delta_np(self, kf_id: int):
        """Current learned SE3 delta for a keyframe, or None."""
        row = self._pose_rows.get(kf_id)
        if row is None or self.state is None or not self.state.pose.shape[0]:
            return None
        d = np.asarray(self.state.pose[row])
        return d if np.any(d) else None

    def refined_cam(self, kf: Keyframe) -> dict:
        """Render inputs at the pose-optimized camera (base ∘ exp(delta))."""
        cam, _ = self._kf_inputs(kf)
        d = self.pose_delta_np(kf.kf_id)
        if d is None:
            return cam
        from segs_slam_tpu.train.step import apply_pose_delta

        return apply_pose_delta(cam, jnp.asarray(d, jnp.float32))

    def fold_pose_deltas(self) -> int:
        """Fold every learned pose delta into its keyframe's base pose and
        clear the table (+ Adam moments). Call before exporting poses /
        final evaluation so all downstream consumers (PLY, cameras.json,
        trajectory rewrite, recorder) see the optimized poses. Returns the
        number of keyframes updated."""
        if self.state is None or not self.state.pose.shape[0]:
            return 0
        table = np.asarray(self.state.pose)
        n = 0
        for kf_id, row in self._pose_rows.items():
            d = table[row]
            if not np.any(d):
                continue
            kf = self.scene.keyframes.get(kf_id)
            if kf is None:
                continue
            q, t = self._fold_delta_np(kf.quat, kf.trans, d)
            kf.set_pose(q, t)
            self._cam_cache.pop(kf_id, None)
            n += 1
        if n:
            from segs_slam_tpu.train import optimizer as _opt

            full = jnp.ones((self.state.pose.shape[0],), bool)
            adam = _opt.reset_rows(
                self.state.adam, lambda p: p[0].key == "pose", full)
            self.state = self.state._replace(
                pose=jnp.zeros_like(self.state.pose),
                pose_ema=jnp.zeros_like(self.state.pose_ema), adam=adam)
        return n

    # --- photometric keyframe-pose refinement -------------------------------
    # The reference takes the SLAM poses as given; a differentiable renderer
    # makes poses optimizable directly: a few steepest-descent steps on an
    # SE3 tangent delta minimizing the photometric L1 against the keyframe
    # image. Absorbs visual-odometry pose error (the dominant quality gap
    # between native-tracker and pose-oracle runs).
    def _pose_refine_fn(self):
        if not hasattr(self, "_pose_refine_jit"):
            mc, rc = self.model_config, self.raster_config
            width, height, bg = self.width, self.height, self._bg

            from segs_slam_tpu.core import se3

            def _delta_cam(delta, wvt0, projmat, tanfx, tanfy, pose7):
                # left-multiply exp(delta) onto W2C: delta = (omega, ups)
                w, v = delta[:3], delta[3:]
                # smooth at w=0: plain norm has a NaN gradient there, which
                # poisons the very first descent step (delta starts at 0)
                th = jnp.sqrt(jnp.sum(w * w) + 1e-16)
                K = jnp.array([
                    [0.0, -w[2], w[1]],
                    [w[2], 0.0, -w[0]],
                    [-w[1], w[0], 0.0],
                ])
                R = (jnp.eye(3) + jnp.sin(th) / th * K
                     + (1 - jnp.cos(th)) / th**2 * (K @ K))
                W2C0 = wvt0.T
                Rn = R @ W2C0[:3, :3]
                tn = R @ W2C0[:3, 3] + v
                W2C = jnp.eye(4).at[:3, :3].set(Rn).at[:3, 3].set(tn)
                wvt = W2C.T
                return {
                    "world_view_transform": wvt,
                    "full_proj_transform": wvt @ projmat,
                    "camera_center": -Rn.T @ tn,
                    # appearance input held at the ORIGINAL pose: gradients
                    # must flow through geometry, not through the appearance
                    # MLP's color modulation
                    "pose7": pose7,
                    "tan_fovx": tanfx,
                    "tan_fovy": tanfy,
                }

            def _pool(img, p):
                # pxp average pooling widens the photometric basin (p=1: none)
                if p <= 1:
                    return img
                c, hh, ww = img.shape
                hp, wp = (hh // p) * p, (ww // p) * p
                return img[:, :hp, :wp].reshape(
                    c, hp // p, p, wp // p, p
                ).mean(axis=(2, 4))

            def _loss(delta, anchors, decoders, wvt0, projmat, tanfx, tanfy,
                      pose7, gt, gt_depth, use_depth, pool):
                cam = _delta_cam(delta, wvt0, projmat, tanfx, tanfy, pose7)
                out = render(anchors, decoders, cam, width, height, bg, mc,
                             rc, interpret=self.interpret)
                img = out.image
                mask = jnp.any(gt != 0.0, axis=0, keepdims=True)
                l = jnp.abs(_pool(img * mask, pool)
                            - _pool(gt * mask, pool)).mean()
                if use_depth:
                    # sensor-depth residual (SplaTAM-style RGB-D alignment):
                    # constrains the view-axis translation the photometric
                    # term barely observes. Rendered expected depth is
                    # alpha-normalized before comparison; only confident
                    # (opacity > 0.5), valid-sensor pixels contribute.
                    opac = 1.0 - out.final_T
                    dr = out.depth_map / jnp.maximum(opac, 1e-6)
                    dm = ((gt_depth > 0.0) & (opac > 0.5)).astype(jnp.float32)
                    dres = jnp.abs(dr - gt_depth) * dm
                    # relative-depth units so the weight is scene-scale-free
                    l = l + 0.2 * jnp.sum(
                        dres / jnp.maximum(gt_depth, 0.1)
                    ) / jnp.maximum(jnp.sum(dm), 1.0)
                return l

            def _refine(anchors, decoders, wvt0, projmat, tanfx, tanfy,
                        pose7, gt, gt_depth, lr, steps, use_depth, pool):
                args = (anchors, decoders, wvt0, projmat, tanfx, tanfy,
                        pose7, gt, gt_depth, use_depth, pool)
                vg = jax.value_and_grad(_loss)

                def body(i, carry):
                    delta, best = carry
                    _, g = vg(delta, *args)
                    gr = g[:3] / (jnp.linalg.norm(g[:3]) + 1e-12)
                    gt_ = g[3:] / (jnp.linalg.norm(g[3:]) + 1e-12)
                    d = jnp.concatenate([gr, gt_])
                    # backtracking: try three step lengths, keep the best
                    cands = jnp.stack([
                        delta - lr * d,
                        delta - 0.3 * lr * d,
                        delta - 0.1 * lr * d,
                    ])
                    ls = jnp.stack([
                        _loss(cands[0], *args),
                        _loss(cands[1], *args),
                        _loss(cands[2], *args),
                    ])
                    j = jnp.argmin(ls)
                    better = ls[j] < best
                    delta = jnp.where(better, cands[j], delta)
                    best = jnp.where(better, ls[j], best)
                    return delta, best

                d0 = jnp.zeros(6, jnp.float32)
                l0 = _loss(d0, *args)
                delta, l1 = jax.lax.fori_loop(0, steps, body, (d0, l0))
                return jnp.where(l1 < l0, delta, d0), l0, l1

            self._pose_refine_jit = jax.jit(
                _refine, static_argnames=("steps", "use_depth", "pool"))
        return self._pose_refine_jit

    def refine_keyframe_pose(self, kf: Keyframe, steps: int = 5,
                             lr: float = 4e-3, pool: int = 4) -> float:
        """Refine one keyframe's pose photometrically (+ sensor-depth
        residual when the keyframe carries depth); updates the keyframe in
        place and returns the loss improvement (>= 0). pool=4 widens the
        photometric basin for online use; pool=1 is the full-resolution
        variant for shutdown refinement against a converged map."""
        cam, gt = self._kf_inputs(kf)
        use_depth = kf.depth is not None
        gt_depth = jnp.asarray(
            kf.depth if use_depth else np.zeros((self.height, self.width)),
            jnp.float32)
        delta, l0, l1 = self._pose_refine_fn()(
            self.state.anchors, self.state.decoders,
            cam["world_view_transform"], jnp.asarray(kf.projection),
            cam["tan_fovx"], cam["tan_fovy"], cam["pose7"], gt, gt_depth,
            lr, steps, use_depth, pool,
        )
        delta = np.asarray(delta, np.float64)
        if not np.any(delta):
            return 0.0
        w, v = delta[:3], delta[3:]
        th = np.linalg.norm(w) + 1e-12
        K = np.array([
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ])
        R = (np.eye(3) + np.sin(th) / th * K
             + (1 - np.cos(th)) / th**2 * (K @ K))
        R0 = kf.rotation_matrix()
        t0 = np.asarray(kf.trans)
        Rn = R @ R0
        tn = R @ t0 + v
        from segs_slam_tpu.core import se3

        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rn, jnp.float32)))
        kf.set_pose(q, tn)
        self._cam_cache.pop(kf.kf_id, None)
        return float(l0 - l1)

    def train_iteration(self):
        kf = self.scene.sample_sliding_window_keyframe()
        if kf is None:
            return None
        self.iteration += 1
        level = (
            kf.next_pyramid_level(self.num_pyramid_sub_levels)
            if self.num_pyramid_sub_levels
            else self.num_pyramid_sub_levels
        )
        w, h = self._level_sizes[level] if self._level_sizes else (self.width, self.height)
        cam, gt = self._kf_inputs(kf, level)
        row = self._pose_rows.get(kf.kf_id) if self.optimize_poses else None
        kw = {}
        if (self.opt_config.lambda_depth > 0.0
                and (w, h) == (self.width, self.height)):
            d = self._depth_cache.get(kf.kf_id)
            if d is None:
                d = jnp.asarray(
                    kf.depth if kf.depth is not None
                    else np.zeros((self.height, self.width)), jnp.float32)
                self._depth_cache[kf.kf_id] = d
            kw["gt_depth"] = d
        if row is not None:
            self.state, metrics = self._step_for(w, h)(
                self.state, cam, gt, self._bg, jnp.int32(row), **kw)
        else:
            self.state, metrics = self._step_for(w, h)(
                self.state, cam, gt, self._bg, **kw)

        oc = self.opt_config
        it = self.iteration
        if (
            it < oc.update_until
            and it > oc.update_from
            and it % oc.update_interval == 0
        ):
            self._rng, sub = jax.random.split(self._rng)
            self.state = self._adjust(self.state, sub)
        return metrics

    def train(self, iterations: int, log_every: int = 0, log_fn=print):
        last = None
        t0 = time.time()
        for _ in range(iterations):
            m = self.train_iteration()
            if m is None:
                break
            last = m
            if log_every and self.iteration % log_every == 0:
                mm = {k: float(v) for k, v in jax.tree.map(np.asarray, m).items()}
                dt = (time.time() - t0) * 1000 / log_every
                t0 = time.time()
                log_fn(
                    f"iter {self.iteration}: loss={mm['loss']:.4f} "
                    f"psnr={mm['psnr']:.2f} active={int(mm['n_active'])} "
                    f"({dt:.1f} ms/iter)"
                )
                self._warn_capacity(mm, log_fn)
        return last

    def _warn_capacity(self, mm: dict, log_fn=print) -> None:
        """Surface silent static-capacity truncations (advisor finding r1):
        visible gaussians beyond RasterConfig.compact are dropped with their
        gradients; footprints beyond kmax tiles are shrunk."""
        nc = mm.get("num_compact")
        if nc is not None and nc > self.raster_config.compact:
            log_fn(
                f"WARNING: {int(nc)} visible gaussians exceed the compaction "
                f"capacity {self.raster_config.compact}; overflow is dropped "
                "(raise RasterConfig.compact)"
            )
        nt = mm.get("num_kmax_truncated")
        if nt:
            log_fn(
                f"note: {int(nt)} gaussian footprints truncated to "
                f"kmax={self.raster_config.kmax} tiles"
            )

    # --- evaluation (reference: renderAndRecordKeyframe,
    # src/gaussian_mapper.cpp:1769-1907) ---
    def _eval_render(self):
        """Fused single-jit eval renderer with packed binning sorts
        (EvalRenderer): true-sync timing showed one dispatch beats the
        round-2 three-stage chain — see PERF_NOTES.md for why the old
        chained-vs-fused comparison was an async-ack artifact."""
        if not hasattr(self, "_eval_render_chain"):
            from segs_slam_tpu.models.renderer import (
                EvalRenderer,
                calibrate_eval_config,
            )

            # round-5 production eval config: the 65k-sweep winner
            # (sel_direct + pack8 + 3-tier; PERF_NOTES.md) when the packed
            # constraints hold, else the training config unchanged. Tier
            # prefixes are CALIBRATED against the live map's footprint
            # histogram over a few keyframe views — static formula sizes
            # measured a 12 dB dimming haze on real maps (renderer.py
            # calibrate_eval_config).
            kfs = sorted(self.scene.keyframes.items())
            step = max(1, len(kfs) // 4)
            cams = [self.refined_cam(kf) for _, kf in kfs[::step][:4]]
            rc = calibrate_eval_config(
                self.raster_config, self.model_config, self.state.anchors,
                self.state.decoders, cams, self.width, self.height,
            ) if cams and not self.interpret else \
                self.raster_config.eval_variant(self.width, self.height)
            self._eval_render_chain = EvalRenderer(
                self.model_config, rc, self.width,
                self.height, self._bg, interpret=self.interpret)
        return self._eval_render_chain

    def render_keyframe(self, kf: Keyframe):
        cam = self.refined_cam(kf)
        return self._eval_render()(self.state.anchors, self.state.decoders, cam)

    def _eval_metrics(self):
        """Small masked-metrics jit: (img, gt) -> (img_m, psnr, ssim, psnr_gs)."""
        if not hasattr(self, "_eval_render_metrics_jit"):
            def _rm(img, gt):
                mask = jnp.any(gt != 0.0, axis=0, keepdims=True).astype(
                    jnp.float32
                )
                img_m, gt_m = img * mask, gt * mask
                return (
                    img_m,
                    losses.psnr(img_m, gt_m),
                    losses.ssim(img_m, gt_m),
                    losses.psnr_gaussian_splatting(img_m, gt_m),
                )

            self._eval_render_metrics_jit = jax.jit(_rm)
        return self._eval_render_metrics_jit

    def _eval_render_metrics(self):
        """(anchors, decoders, cam, gt) -> (img_m, psnr, ssim, psnr_gs) via
        the chained renderer + a metrics jit — four async dispatches that
        pipeline back-to-back exactly like the old fused call."""
        chain = self._eval_render()
        metrics = self._eval_metrics()

        def _f(anchors, decoders, cam, gt):
            return metrics(chain(anchors, decoders, cam), gt)

        return _f

    def render_and_measure_keyframe(self, kf: Keyframe):
        """Async-dispatched (img_masked, psnr, ssim, psnr_gs) device tuple."""
        cam, gt = self._kf_inputs(kf)
        d = self.pose_delta_np(kf.kf_id)
        if d is not None:
            from segs_slam_tpu.train.step import apply_pose_delta

            cam = apply_pose_delta(cam, jnp.asarray(d, jnp.float32))
        return self._eval_render_metrics()(
            self.state.anchors, self.state.decoders, cam, gt
        )

    def evaluate(self) -> dict:
        # single render per keyframe, dispatched back-to-back (async), one
        # sync at the end
        outs = [self.render_and_measure_keyframe(kf)
                for kf in self.scene.keyframes.values()]
        jax.block_until_ready(outs)
        psnrs = [float(p) for _, p, _, _ in outs]
        ssims = [float(s) for _, _, s, _ in outs]
        psnr_gs = [float(pg) for _, _, _, pg in outs]
        return {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "psnr_gs": float(np.mean(psnr_gs)),
            "n_keyframes": len(psnrs),
        }

    def save_ply(self, path) -> None:
        from segs_slam_tpu.io.ply import save_anchor_ply

        a = self.state.anchors
        n = int(a.num_active())
        save_anchor_ply(
            path,
            np.asarray(a.anchor[:n]),
            np.asarray(a.feat[:n]),
            np.asarray(a.offset[:n]),
            np.asarray(a.opacity[:n]),
            np.asarray(a.scaling[:n]),
            np.asarray(a.rotation[:n]),
        )
