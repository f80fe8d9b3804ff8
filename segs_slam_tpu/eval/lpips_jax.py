"""LPIPS (AlexNet variant) in JAX, weights supplied by the user.

Architecture port of lpipsPyTorch (reference: lpipsPyTorch/modules/ —
AlexNet features at 5 stages, unit-normalized, 1x1 linear heads, spatial
mean). Pretrained weights cannot be fetched in this environment; the user
exports them once (e.g. from torchvision + lpips on any machine) to a pickle
of numpy arrays:

  {"conv1_w": (64,3,11,11), "conv1_b": (64,), ... "conv5_w", "conv5_b",
   "lin0".."lin4": (C,) per-channel weights, "shift": (3,), "scale": (3,)}
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _conv(x, w, b, stride, padding):
    out = lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + jnp.asarray(b).reshape(1, -1, 1, 1)


def _maxpool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True))
    return feat / (norm + eps)


def make_lpips(params: dict, normalize: bool = False):
    """Build lpips(img1, img2) on (3, H, W) images in [0, 1].

    normalize mirrors the lpips package's flag: True rescales [0,1] input to
    [-1,1] before the shift/scale layer (the documented convention); False
    feeds the input straight to shift/scale. The reference's eval calls
    lpips.LPIPS WITHOUT normalize on [0,1] to_tensor images
    (/root/reference/eval/utils.py:16-20, run.py:123-130) — a range quirk
    shared across the 3DGS ecosystem — so parity with the reference's
    committed LPIPS numbers requires the default normalize=False.
    """
    shift = jnp.asarray(params["shift"]).reshape(1, 3, 1, 1)
    scale = jnp.asarray(params["scale"]).reshape(1, 3, 1, 1)

    def features(x):
        if normalize:
            x = 2.0 * x - 1.0
        x = (x - shift) / scale
        feats = []
        h = jnp.maximum(_conv(x, params["conv1_w"], params["conv1_b"], 4, 2), 0)
        feats.append(h)
        h = _maxpool(h)
        h = jnp.maximum(_conv(h, params["conv2_w"], params["conv2_b"], 1, 2), 0)
        feats.append(h)
        h = _maxpool(h)
        h = jnp.maximum(_conv(h, params["conv3_w"], params["conv3_b"], 1, 1), 0)
        feats.append(h)
        h = jnp.maximum(_conv(h, params["conv4_w"], params["conv4_b"], 1, 1), 0)
        feats.append(h)
        h = jnp.maximum(_conv(h, params["conv5_w"], params["conv5_b"], 1, 1), 0)
        feats.append(h)
        return feats

    def lpips(img1, img2):
        """img1, img2: (3, H, W) in [0, 1]."""
        f1 = features(img1[None])
        f2 = features(img2[None])
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (_normalize(a) - _normalize(b)) ** 2
            w = jnp.asarray(params[f"lin{i}"]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total

    return lpips
