"""Masked multi-group Adam with in-jit learning-rate schedules.

The reference drives one torch Adam with 9-23 param groups, each with its own
(scheduled) LR, and performs explicit exp_avg/exp_avg_sq surgery when anchors
grow or are pruned (reference: src/gaussian_model.cpp:620-872 trainingSetup,
:874-998 updateLearningRate, :1505-1558 / :1769-1823 state surgery).

TPU-native equivalent: a hand-rolled functional Adam over an arbitrary pytree
where
  * each leaf gets an LR from a schedule keyed by its path (evaluated on the
    traced step, so LR updates cost nothing),
  * updates can be masked per-row (inactive anchor slots receive no update
    and their moments stay zero),
  * densification surgery is just masked writes into the moment pytree —
    no reallocation, no optimizer rebuild.

eps matches the reference's 1e-15 (torch AdamOptions, gaussian_model.cpp:634).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray  # () int32
    mu: Any  # first moments, same pytree as params
    nu: Any  # second moments


def init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, params))


def update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr_tree: Any,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    row_mask_fn: Callable[[tuple], jnp.ndarray | None] | None = None,
    paths: Any = None,
    mode_fn: Callable[[tuple], str] | None = None,
) -> tuple[Any, AdamState]:
    """One Adam step.

    lr_tree: pytree of scalar LRs matching `params` structure (leaves may be
    traced). row_mask_fn(path)->(rows,) bool or None: rows where the update
    applies (used to freeze inactive anchor slots).
    mode_fn(path)->{"adam","sgd","amsmax"}: per-leaf optimizer family
    (default "adam"). "sgd" = bias-corrected momentum (nu unused, step
    proportional to the gradient); "amsmax" = second moment is a
    non-decaying elementwise running max of g^2 (AMSGrad with b2=1): steps
    are Adam-conditioned early and gradient-proportional at stationarity —
    used for the pose group where Adam's scale-free steps random-walk
    (OptimizationConfig.pose_opt_mode)."""
    count = state.step + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1**c
    bc2 = 1.0 - b2**c

    flat_params, treedef = jax.tree.flatten_with_path(params)
    flat_grads = jax.tree.leaves(grads)
    flat_mu = jax.tree.leaves(state.mu)
    flat_nu = jax.tree.leaves(state.nu)
    flat_lr = jax.tree.leaves(lr_tree)
    assert len(flat_params) == len(flat_lr), (len(flat_params), len(flat_lr))

    new_p, new_mu, new_nu = [], [], []
    for (path, p), g, mu, nu, lr in zip(
        flat_params, flat_grads, flat_mu, flat_nu, flat_lr
    ):
        mode = mode_fn(path) if mode_fn is not None else "adam"
        mu2 = b1 * mu + (1 - b1) * g
        if mode == "sgd":
            nu2 = nu
            upd = lr * (mu2 / bc1)
        elif mode == "amsmax":
            nu2 = jnp.maximum(nu, g * g)
            upd = lr * (mu2 / bc1) / (jnp.sqrt(nu2) + eps)
        else:
            nu2 = b2 * nu + (1 - b2) * (g * g)
            upd = lr * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
        mask = row_mask_fn(path) if row_mask_fn is not None else None
        if mask is not None:
            shape = (-1,) + (1,) * (p.ndim - 1)
            m = mask.reshape(shape)
            p2 = jnp.where(m, p - upd, p)
            mu2 = jnp.where(m, mu2, mu)
            nu2 = jnp.where(m, nu2, nu)
        else:
            p2 = p - upd
        new_p.append(p2)
        new_mu.append(mu2)
        new_nu.append(nu2)

    unflatten = jax.tree.unflatten
    return (
        unflatten(treedef, new_p),
        AdamState(
            step=count,
            mu=unflatten(treedef, new_mu),
            nu=unflatten(treedef, new_nu),
        ),
    )


def _map_selected(state: AdamState, path_pred: Callable[[tuple], bool],
                  fn: Callable) -> AdamState:
    def apply(path, x):
        return fn(x) if path_pred(path) else x

    return state._replace(
        mu=jax.tree_util.tree_map_with_path(apply, state.mu),
        nu=jax.tree_util.tree_map_with_path(apply, state.nu),
    )


def reset_rows(state: AdamState, path_pred: Callable[[tuple], bool],
               mask: jnp.ndarray) -> AdamState:
    """Zero the moments on masked rows of leaves selected by path (the
    moment-surgery half of the reference's prune/grow: fresh rows start with
    zero exp_avg/exp_avg_sq)."""

    def zero_masked(x):
        shape = (-1,) + (1,) * (x.ndim - 1)
        return jnp.where(mask.reshape(shape), jnp.zeros_like(x), x)

    return _map_selected(state, path_pred, zero_masked)


def permute_rows(state: AdamState, path_pred: Callable[[tuple], bool],
                 perm: jnp.ndarray) -> AdamState:
    """Apply a row permutation to selected leaves' moments (used by
    prune-compaction, mirroring the reference's index_select surgery)."""
    return _map_selected(state, path_pred, lambda x: x[perm])
