"""Neural-Gaussian decoder MLPs as plain-pytree functional modules.

Architectures are exactly the reference's inline torch::nn::Sequential stacks
(reference: src/gaussian_model.cpp:62-98):

  opacity:    Linear(F+3[+1] -> F) . ReLU . Linear(F -> K)       . Tanh
  cov:        Linear(F+3[+1] -> F) . ReLU . Linear(F -> 7K)
  color:      Linear(F+3[+1]+A -> F) . ReLU . Linear(F -> 3K)    . Sigmoid
  appearance: Linear(7 -> A)            (pose -> appearance code)
  feat_bank:  Linear(4 -> F) . ReLU . Linear(F -> 3) . Softmax   (optional)

Plain dict pytrees (not flax modules) so the training state composes
naturally with the masked custom optimizer and densification state surgery —
there is no framework layer between the step function and the arrays.

Initialization follows torch.nn.Linear's default (kaiming-uniform weights
with a=sqrt(5) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias) so training dynamics match the reference.

Parity quirk preserved: the reference also allocates a per-keyframe
`Embedding` table (embedding_dim x appearance_dim) that is REGISTERED in the
optimizer but never used by the live renderer — the live appearance signal is
mlp_appearance(pose7) (reference: src/gaussian_model.cpp:667-684 vs
src/gaussian_renderer.cpp:256-270). We allocate it too ("embedding") so
checkpoints and optimizer-group layouts are interconvertible.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from segs_slam_tpu.models.config import ModelConfig


def _linear_init(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _mlp2_init(key, d_in: int, d_hidden: int, d_out: int):
    k1, k2 = jax.random.split(key)
    return {
        "l1": _linear_init(k1, d_in, d_hidden),
        "l2": _linear_init(k2, d_hidden, d_out),
    }


def init_decoders(key, config: ModelConfig) -> dict:
    keys = jax.random.split(key, 6)
    params = {
        "opacity": _mlp2_init(keys[0], config.opacity_in, config.feat_dim,
                              config.n_offsets),
        "cov": _mlp2_init(keys[1], config.cov_in, config.feat_dim,
                          7 * config.n_offsets),
        "color": _mlp2_init(keys[2], config.color_in, config.feat_dim,
                            3 * config.n_offsets),
    }
    if config.appearance_dim > 0:
        params["appearance"] = _linear_init(keys[3], 7, config.appearance_dim)
        # Legacy optimizer-registered-but-unused table (see module docstring).
        params["embedding"] = {
            "table": jax.random.normal(
                keys[4], (config.embedding_dim, config.appearance_dim), jnp.float32
            )
        }
    if config.use_feat_bank:
        params["feat_bank"] = _mlp2_init(keys[5], 4, config.feat_dim, 3)
    return params


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _mlp2(p, x, act_out: Callable | None):
    h = jax.nn.relu(_linear(p["l1"], x))
    y = _linear(p["l2"], h)
    return act_out(y) if act_out is not None else y


class DecoderApply:
    """Stateless apply namespace for the decoder pytree."""

    @staticmethod
    def opacity(params, x):
        return jnp.tanh(_mlp2(params["opacity"], x, None))

    @staticmethod
    def cov(params, x):
        return _mlp2(params["cov"], x, None)

    @staticmethod
    def color(params, x):
        return jax.nn.sigmoid(_mlp2(params["color"], x, None))

    @staticmethod
    def appearance(params, pose7):
        return _linear(params["appearance"], pose7)

    @staticmethod
    def feat_bank(params, x):
        return jax.nn.softmax(_mlp2(params["feat_bank"], x, None), axis=-1)
