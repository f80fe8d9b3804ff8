"""K-nearest-neighbor mean squared distance for anchor scale initialization.

TPU-native replacement of simple-knn's Morton-sort + box-culling CUDA kernels
(reference: third_party/simple-knn/simple_knn.cu, spatial.cu:15-26
`distCUDA2`): on TPU the all-pairs distance block is a single MXU matmul, so
a chunked brute-force top-k is both simpler and fast enough for the
init/insert path where it is used.

Matches distCUDA2 semantics: mean of the SQUARED distances to the 3 nearest
neighbors (excluding self).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def mean_knn_sq_dist(points: jnp.ndarray, valid: jnp.ndarray | None = None,
                     k: int = 3, block: int = 1024) -> jnp.ndarray:
    """points (N, 3) -> (N,) mean of squared distances to k nearest others.

    `valid` masks padded rows (invalid rows are excluded as neighbors and get
    output 0).
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    sq = jnp.sum(points * points, axis=-1)  # (N,)

    pad = (-n) % block
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    sq_p = jnp.pad(sq, (0, pad))
    nb = (n + pad) // block

    def body(carry, i):
        q = jax.lax.dynamic_slice_in_dim(pts_p, i * block, block)  # (B, 3)
        q_sq = jax.lax.dynamic_slice_in_dim(sq_p, i * block, block)
        q_valid = jax.lax.dynamic_slice_in_dim(valid_p, i * block, block)
        # d2[b, j] = |q_b - p_j|^2 via the MXU inner product.
        cross = q @ points.T  # (B, N)
        d2 = q_sq[:, None] - 2.0 * cross + sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        # exclude self and invalid neighbors
        idx = i * block + jnp.arange(block)
        self_mask = idx[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask | ~valid[None, :], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        mean_d2 = jnp.mean(-neg_top, axis=-1)
        mean_d2 = jnp.where(q_valid, mean_d2, 0.0)
        return carry, mean_d2

    _, out = jax.lax.scan(body, None, jnp.arange(nb))
    return out.reshape(-1)[:n]
