"""Fixed-capacity anchor state — the functional heart of the Gaussian map.

The reference grows/shrinks its anchor tensors by reallocation + Adam-state
surgery on every densify step (reference: src/gaussian_model.cpp:327-381
createFromPcd, :443-594 increasePcd, :1505-1558 prune_anchor, :1559-1699
anchor_growing). A TPU-native map instead lives in ONE fixed-capacity padded
pytree with an active mask, so the jitted train step never re-traces as the
map evolves; growth writes into free slots and pruning clears the mask (and
the optimizer moments) in place.

State tensors mirror the reference's 6 anchor parameter groups
(include/gaussian_model.h:242-309):
  anchor (cap,3)  offset (cap,K,3)  feat (cap,F)
  scaling (cap,6) log-space         rotation (cap,4)  opacity (cap,1) logit

The reference creates `rotation`/`opacity` with requires_grad=false
(src/gaussian_model.cpp:372-373) — they sit in optimizer groups but never
receive gradients, i.e. they are constants (identity quat, logit(0.1)). We
keep them in the state for checkpoint parity and because anchor_growing
re-initializes them per anchor.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.ops.knn import mean_knn_sq_dist


def inverse_sigmoid(x: float) -> float:
    return math.log(x / (1.0 - x))


class AnchorState(NamedTuple):
    anchor: jnp.ndarray  # (cap, 3)
    offset: jnp.ndarray  # (cap, K, 3)
    feat: jnp.ndarray  # (cap, F)
    scaling: jnp.ndarray  # (cap, 6) log-space
    rotation: jnp.ndarray  # (cap, 4)
    opacity: jnp.ndarray  # (cap, 1) logit
    active: jnp.ndarray  # (cap,) bool

    @property
    def capacity(self) -> int:
        return self.anchor.shape[0]

    @property
    def n_offsets(self) -> int:
        return self.offset.shape[1]

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    def params(self) -> dict:
        """The trainable subset, mirroring the reference's anchor param
        groups (trainingSetup, src/gaussian_model.cpp:636-652)."""
        return {
            "anchor": self.anchor,
            "offset": self.offset,
            "feat": self.feat,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
        }

    def replace_params(self, p: dict) -> "AnchorState":
        return self._replace(
            anchor=p["anchor"],
            offset=p["offset"],
            feat=p["feat"],
            scaling=p["scaling"],
            rotation=p["rotation"],
            opacity=p["opacity"],
        )


def empty_state(config: ModelConfig) -> AnchorState:
    cap, k, f = config.capacity, config.n_offsets, config.feat_dim
    rot = np.zeros((cap, 4), np.float32)
    rot[:, 0] = 1.0
    return AnchorState(
        anchor=jnp.zeros((cap, 3), jnp.float32),
        offset=jnp.zeros((cap, k, 3), jnp.float32),
        feat=jnp.zeros((cap, f), jnp.float32),
        scaling=jnp.zeros((cap, 6), jnp.float32),
        rotation=jnp.asarray(rot),
        opacity=jnp.full((cap, 1), inverse_sigmoid(0.1), jnp.float32),
        active=jnp.zeros((cap,), bool),
    )


def voxelize(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """round-to-grid + unique, host-side
    (reference: src/gaussian_model.cpp:344-346; note the reference multiplies
    the COARSE grid coords by the fine voxel_size in createCoarseAnchorFromPcd
    — we reproduce only the fine path, which multiplies by the same size it
    divided by)."""
    scaled = np.round(np.asarray(points, np.float64) / voxel_size)
    uniq = np.unique(scaled, axis=0)
    return (uniq * voxel_size).astype(np.float32)


def insert_points(
    state: AnchorState,
    points: np.ndarray,
    config: ModelConfig,
) -> tuple[AnchorState, int]:
    """Voxelize `points` and append the fused cloud into free slots.

    Mirrors createFromPcd / increasePcd (scales = log sqrt(mean 3-NN squared
    distance among the NEW cloud), identity rotations, logit(0.1) opacity,
    zero offsets/features). Returns (new_state, n_inserted). Points beyond
    the remaining capacity are dropped (reported via n_inserted).
    """
    fused = voxelize(points, config.voxel_size)
    n_new = fused.shape[0]
    if n_new == 0:
        return state, 0

    n_active = int(state.num_active())
    space = state.capacity - n_active
    if n_new > space:
        fused = fused[:space]
        n_new = space
    if n_new == 0:
        return state, 0

    # 3-NN distances for the new cloud. Divergence from the reference (which
    # measures distances within the new batch only, src/gaussian_model.cpp
    # :443-594): sparse incremental batches (e.g. 300 SLAM map points) would
    # get meter-scale gaussians that veil the image; including the EXISTING
    # active anchors as neighbor candidates gives scales consistent with the
    # map density. Shapes are padded to static buckets so the knn jit
    # compiles once per capacity.
    bucket = 1 << max(10, (n_new - 1).bit_length())
    total = bucket + state.capacity
    pts_pad = np.zeros((total, 3), np.float32)
    valid = np.zeros((total,), bool)
    pts_pad[:n_new] = fused
    valid[:n_new] = True
    if n_active > 0:
        pts_pad[bucket : bucket + n_active] = np.asarray(state.anchor[:n_active])
        valid[bucket : bucket + n_active] = True
    dist2_all = np.asarray(
        mean_knn_sq_dist(jnp.asarray(pts_pad), jnp.asarray(valid))
    )
    dist2 = dist2_all[:n_new]
    # With < k+1 valid points total, the masked-to-inf self/invalid rows
    # leak inf into the mean; fall back to a voxel-sized scale so tiny
    # initial clouds don't get inf log-scales (NaN-poisoning new anchors).
    dist2 = np.where(np.isfinite(dist2), dist2, config.voxel_size**2)
    dist2 = np.maximum(dist2, 1e-7)
    scales = np.log(np.sqrt(dist2)).astype(np.float32)[:, None].repeat(6, axis=1)

    sl = slice(n_active, n_active + n_new)
    anchor = state.anchor.at[sl].set(fused)
    scaling = state.scaling.at[sl].set(scales)
    rot = np.zeros((n_new, 4), np.float32)
    rot[:, 0] = 1.0
    rotation = state.rotation.at[sl].set(rot)
    opacity = state.opacity.at[sl].set(inverse_sigmoid(0.1))
    offset = state.offset.at[sl].set(0.0)
    feat = state.feat.at[sl].set(0.0)
    active = state.active.at[sl].set(True)
    return (
        state._replace(
            anchor=anchor,
            offset=offset,
            feat=feat,
            scaling=scaling,
            rotation=rotation,
            opacity=opacity,
            active=active,
        ),
        n_new,
    )
