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

    scene: Scene = field(init=False)
    state: TrainState = field(init=False, default=None)
    iteration: int = field(init=False, default=0)

    def __post_init__(self):
        self.scene = Scene(seed=self.seed)
        self._bg = jnp.asarray(
            np.ones(3, np.float32) if self.white_background else np.zeros(3, np.float32)
        )
        self._step = jax.jit(
            make_train_step(
                self.model_config,
                self.opt_config,
                self.raster_config,
                self.width,
                self.height,
                interpret=self.interpret,
            )
        )
        self._adjust = jax.jit(make_adjust_anchor(self.model_config, self.opt_config))
        self._rng = jax.random.PRNGKey(self.seed)
        self._cam_cache: dict[int, dict] = {}
        self._gt_cache: dict[int, jnp.ndarray] = {}

    # --- setup ---
    def add_keyframe(self, kf: Keyframe) -> None:
        kf.remaining_times_of_use = self.keyframe_times_of_use
        self.scene.add_keyframe(kf)
        self._cam_cache.pop(kf.kf_id, None)
        self._gt_cache.pop(kf.kf_id, None)

    def initialize_map(self, points: np.ndarray) -> int:
        # cameras_extent -> spatial_lr_scale (reference: getNerfppNorm radius
        # feeding trainingSetup, src/gaussian_mapper.cpp:651-654). Requires
        # rebuilding the step closure since schedules bake the scale in.
        if self.scene.keyframes:
            import dataclasses as _dc

            radius = self.scene.nerfpp_norm_radius()
            self.opt_config = _dc.replace(self.opt_config, spatial_lr_scale=radius)
            self._step = jax.jit(
                make_train_step(
                    self.model_config,
                    self.opt_config,
                    self.raster_config,
                    self.width,
                    self.height,
                    interpret=self.interpret,
                )
            )
            self._adjust = jax.jit(
                make_adjust_anchor(self.model_config, self.opt_config)
            )
        anchors, n = insert_points(
            empty_state(self.model_config), points, self.model_config
        )
        decoders = init_decoders(
            jax.random.PRNGKey(self.seed), self.model_config
        )
        self.state = init_train_state(anchors, decoders, self.model_config)
        return n

    def insert_points(self, points: np.ndarray) -> int:
        anchors, n = insert_points(self.state.anchors, points, self.model_config)
        self.state = self.state._replace(anchors=anchors)
        return n

    def apply_similarity(self, transform: np.ndarray | None, scale: float) -> None:
        """Similarity correction of the map (scale refinement / loop close,
        reference: scaleAndTransformThenMarkVisiblePoints,
        src/operate_points.cu:96-143 + combineMappingOperations :1165-1196).
        Applies p' = R (s p) + t to anchors and cached points; log-scales the
        anchor scalings and offsets accordingly."""
        T = np.eye(4) if transform is None else np.asarray(transform)
        for pid, p in list(self.scene.cached_points.items()):
            self.scene.cached_points[pid] = (T[:3, :3] @ (scale * p) + T[:3, 3]).astype(
                np.float32
            )
        if self.state is None:
            return
        import jax.numpy as jnp

        a = self.state.anchors
        R = jnp.asarray(T[:3, :3], jnp.float32)
        t = jnp.asarray(T[:3, 3], jnp.float32)
        anchors = a._replace(
            anchor=(a.anchor * scale) @ R.T + t,
            scaling=a.scaling + np.log(scale),
        )
        self.state = self.state._replace(anchors=anchors)

    # --- training ---
    def _kf_inputs(self, kf: Keyframe):
        cam = self._cam_cache.get(kf.kf_id)
        if cam is None:
            cam = {k: jnp.asarray(v) for k, v in kf.render_inputs().items()}
            self._cam_cache[kf.kf_id] = cam
        gt = self._gt_cache.get(kf.kf_id)
        if gt is None:
            img = kf.image
            if img.shape[0] != 3:  # HWC -> CHW
                img = np.transpose(img, (2, 0, 1))
            gt = jnp.asarray(img, jnp.float32)
            self._gt_cache[kf.kf_id] = gt
        return cam, gt

    def train_iteration(self):
        kf = self.scene.sample_sliding_window_keyframe()
        if kf is None:
            return None
        self.iteration += 1
        cam, gt = self._kf_inputs(kf)
        self.state, metrics = self._step(self.state, cam, gt, self._bg)

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
        return last

    # --- evaluation (reference: renderAndRecordKeyframe,
    # src/gaussian_mapper.cpp:1769-1907) ---
    def render_keyframe(self, kf: Keyframe):
        cam, _ = self._kf_inputs(kf)
        out = render(
            self.state.anchors,
            self.state.decoders,
            cam,
            self.width,
            self.height,
            self._bg,
            self.model_config,
            self.raster_config,
            interpret=self.interpret,
        )
        return out.image

    def evaluate(self) -> dict:
        psnrs, ssims, psnr_gs = [], [], []
        for kf in self.scene.keyframes.values():
            cam, gt = self._kf_inputs(kf)
            img = self.render_keyframe(kf)
            mask = jnp.any(gt != 0.0, axis=0, keepdims=True).astype(jnp.float32)
            img_m, gt_m = img * mask, gt * mask
            psnrs.append(float(losses.psnr(img_m, gt_m)))
            ssims.append(float(losses.ssim(img_m, gt_m)))
            psnr_gs.append(float(losses.psnr_gaussian_splatting(img_m, gt_m)))
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
