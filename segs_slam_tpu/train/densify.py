"""Anchor densification: multi-level voxel growth + opacity pruning, in-jit.

Functional re-design of GaussianModel::adjust_anchor / anchor_growing /
prune_anchor (reference: src/gaussian_model.cpp:1505-1762). The reference
reallocates tensors and performs Adam exp_avg surgery per change; here the
fixed-capacity state is edited in place:

  * growth per level: threshold+random candidate selection, voxel dedup AND
    existing-anchor-cell rejection in ONE lexicographic sort over
    [anchor cells ++ candidate cells] (anchors sort first within a cell, so
    "previous row has the same cell" simultaneously rejects occupied cells
    and deduplicates candidates), feature init by segment-max over candidate
    cellmates (the reference's scatter_max, :1635-1637),
  * new anchors are appended into free slots; their Adam moments and stats
    are zeroed (the reference's torch::zeros_like extension),
  * prune clears the active mask, then a stable compaction permutation keeps
    active slots contiguous (the reference's index_select surgery),
  * the reference's scaling clamp quirk is preserved: every prune pass clamps
    log-scaling[:, 3:] to <= 0.05 for all surviving anchors (:1525-1532).

Runs every update_interval iterations; not latency critical.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from segs_slam_tpu.models.anchors import AnchorState, inverse_sigmoid
from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.train import optimizer
from segs_slam_tpu.train.config import OptimizationConfig
from segs_slam_tpu.train.step import DensifyStats, TrainState

_SENTINEL = jnp.int32(2**30)


def _anchor_path(path) -> bool:
    return path[0].key == "anchors"


def _grow_level(
    ts: TrainState,
    level: int,
    cand_base: jnp.ndarray,  # (CK,) candidate pre-mask (grad thr & offset_mask)
    cand_xyz: jnp.ndarray,  # (CK, 3)
    cand_feat: jnp.ndarray,  # (CK, F) anchor feats repeated per offset
    rng: jnp.ndarray,
    model_config: ModelConfig,
    opt_config: OptimizationConfig,
    grads_norm: jnp.ndarray,  # (CK,)
) -> TrainState:
    cap = model_config.capacity
    ck = cand_xyz.shape[0]
    fdim = cand_feat.shape[1]

    thr = opt_config.densify_grad_threshold * (
        math.floor(model_config.update_hierachy_factor / 2) ** level
    )
    size_factor = int(
        model_config.update_init_factor
        / (model_config.update_hierachy_factor**level)
    )
    cur_size = model_config.voxel_size * size_factor

    keep_prob = 1.0 - 0.5 ** (level + 1)
    rand_keep = jax.random.uniform(rng, (ck,)) <= keep_prob
    cand = cand_base & (grads_norm >= thr) & rand_keep

    anchors = ts.anchors
    active = anchors.active
    n_active = jnp.sum(active.astype(jnp.int32))

    # Cells: anchors first (tag 0), candidates second (tag 1).
    a_cell = jnp.round(anchors.anchor / cur_size).astype(jnp.int32)
    c_cell = jnp.round(cand_xyz / cur_size).astype(jnp.int32)
    cells = jnp.concatenate([a_cell, c_cell], axis=0)
    tag = jnp.concatenate(
        [jnp.zeros(cap, jnp.int32), jnp.ones(ck, jnp.int32)], axis=0
    )
    row_valid = jnp.concatenate([active, cand], axis=0)
    cells = jnp.where(row_valid[:, None], cells, _SENTINEL)

    idx = jnp.arange(cap + ck, dtype=jnp.int32)
    cx, cy, cz, tg, src = lax.sort(
        (cells[:, 0], cells[:, 1], cells[:, 2], tag, idx),
        num_keys=4,
        is_stable=True,
    )

    same_as_prev = jnp.concatenate(
        [
            jnp.array([False]),
            (cx[1:] == cx[:-1]) & (cy[1:] == cy[:-1]) & (cz[1:] == cz[:-1]),
        ]
    )
    new_cell = ~same_as_prev
    sorted_valid = cx < _SENTINEL
    keep = (tg == 1) & new_cell & sorted_valid

    # Per-cell feature max over CANDIDATE cellmates (anchors excluded).
    seg_id = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    feat_all = jnp.concatenate(
        [jnp.full((cap, fdim), -jnp.inf, jnp.float32), cand_feat], axis=0
    )
    feat_sorted = jnp.where((tg == 1)[:, None], feat_all[src], -jnp.inf)
    seg_max = jax.ops.segment_max(
        feat_sorted, seg_id, num_segments=cap + ck, indices_are_sorted=True
    )
    kept_feat = seg_max[seg_id]
    kept_feat = jnp.where(jnp.isfinite(kept_feat), kept_feat, 0.0)

    # Destination slots for kept candidates.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, n_active + rank, cap)  # cap = dropped
    dest = jnp.where(dest < cap, dest, cap)

    new_anchor_pos = jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32) * cur_size
    log_scale = math.log(cur_size)

    anchor = anchors.anchor.at[dest].set(new_anchor_pos, mode="drop")
    scaling = anchors.scaling.at[dest].set(log_scale, mode="drop")
    rot_new = jnp.zeros((cap + ck, 4), jnp.float32).at[:, 0].set(1.0)
    rotation = anchors.rotation.at[dest].set(rot_new, mode="drop")
    opacity = anchors.opacity.at[dest].set(inverse_sigmoid(0.1), mode="drop")
    feat = anchors.feat.at[dest].set(kept_feat, mode="drop")
    offset = anchors.offset.at[dest].set(0.0, mode="drop")
    activated = jnp.zeros(cap, bool).at[dest].set(keep, mode="drop")
    new_active = active | activated

    new_anchors = anchors._replace(
        anchor=anchor,
        scaling=scaling,
        rotation=rotation,
        opacity=opacity,
        feat=feat,
        offset=offset,
        active=new_active,
    )

    # Fresh slots start with zero Adam moments and zero stats.
    adam = optimizer.reset_rows(ts.adam, _anchor_path, activated)
    stats = DensifyStats(
        opacity_accum=jnp.where(activated, 0.0, ts.stats.opacity_accum),
        anchor_demon=jnp.where(activated, 0.0, ts.stats.anchor_demon),
        offset_grad_accum=jnp.where(
            activated[:, None], 0.0, ts.stats.offset_grad_accum
        ),
        offset_denom=jnp.where(activated[:, None], 0.0, ts.stats.offset_denom),
    )
    return ts._replace(anchors=new_anchors, adam=adam, stats=stats)


def make_adjust_anchor(model_config: ModelConfig, opt_config: OptimizationConfig):
    cap, k = model_config.capacity, model_config.n_offsets

    def adjust(ts: TrainState, rng: jnp.ndarray) -> TrainState:
        stats = ts.stats
        denom = stats.offset_denom
        grads = stats.offset_grad_accum / jnp.where(denom == 0, 1.0, denom)
        grads = jnp.where(denom == 0, 0.0, grads)
        grads_norm = jnp.abs(grads).reshape(-1)  # (CK,)
        offset_mask = (
            denom
            > opt_config.update_interval * opt_config.success_threshold * 0.5
        ).reshape(-1)

        anchors = ts.anchors
        scale3 = jnp.exp(anchors.scaling[:, :3])
        cand_xyz = (
            anchors.anchor[:, None, :] + anchors.offset * scale3[:, None, :]
        ).reshape(-1, 3)
        cand_feat = jnp.repeat(anchors.feat, k, axis=0)
        cand_base = offset_mask & jnp.repeat(anchors.active, k)

        keys = jax.random.split(rng, model_config.update_depth)
        for level in range(model_config.update_depth):
            ts = _grow_level(
                ts, level, cand_base, cand_xyz, cand_feat, keys[level],
                model_config, opt_config, grads_norm,
            )

        # Reset the accumulators that passed the offset_mask threshold
        # (reference: adjust_anchor, src/gaussian_model.cpp:1714-1724).
        stats = ts.stats
        om = offset_mask.reshape(cap, k)
        stats = stats._replace(
            offset_denom=jnp.where(om, 0.0, stats.offset_denom),
            offset_grad_accum=jnp.where(om, 0.0, stats.offset_grad_accum),
        )

        # Prune (reference: :1726-1759).
        active = ts.anchors.active
        prune = (
            stats.opacity_accum
            < opt_config.min_opacity * stats.anchor_demon
        )
        anchors_mask = (
            stats.anchor_demon
            > opt_config.update_interval * opt_config.success_threshold
        )
        prune = prune & anchors_mask & active

        # Stats reset for well-observed anchors (pruned or not).
        reset = anchors_mask
        stats = stats._replace(
            opacity_accum=jnp.where(reset | prune, 0.0, stats.opacity_accum),
            anchor_demon=jnp.where(reset | prune, 0.0, stats.anchor_demon),
            offset_denom=jnp.where(prune[:, None], 0.0, stats.offset_denom),
            offset_grad_accum=jnp.where(
                prune[:, None], 0.0, stats.offset_grad_accum
            ),
        )

        new_active = active & ~prune
        # Scaling clamp quirk applied on every prune pass (see docstring).
        scaling = ts.anchors.scaling
        scaling = scaling.at[:, 3:].set(jnp.minimum(scaling[:, 3:], 0.05))
        anchors = ts.anchors._replace(active=new_active, scaling=scaling)

        # Compaction: stable partition active-first, applied to every
        # per-anchor row array (params, moments, stats).
        perm = jnp.argsort(~new_active, stable=True)
        anchors = AnchorState(
            anchor=anchors.anchor[perm],
            offset=anchors.offset[perm],
            feat=anchors.feat[perm],
            scaling=anchors.scaling[perm],
            rotation=anchors.rotation[perm],
            opacity=anchors.opacity[perm],
            active=new_active[perm],
        )
        adam = optimizer.permute_rows(ts.adam, _anchor_path, perm)
        # Pruned rows keep garbage values but active=False; zero their
        # moments so re-activation starts clean.
        inactive = ~anchors.active
        adam = optimizer.reset_rows(adam, _anchor_path, inactive)
        stats = DensifyStats(
            opacity_accum=stats.opacity_accum[perm],
            anchor_demon=stats.anchor_demon[perm],
            offset_grad_accum=stats.offset_grad_accum[perm],
            offset_denom=stats.offset_denom[perm],
        )

        return ts._replace(anchors=anchors, adam=adam, stats=stats)

    return adjust
