"""Photometric and frequency-domain losses.

Re-implementations of loss_utils (reference: include/loss_utils.h:29-237) in
JAX. All functions take images as (3, H, W) float32 in [0, 1].

IMPORTANT parity note on the frequency losses: the reference's
high_pass_filter/low_pass_filter build their masks with
`mask.index_put_({Slice(crow-r, crow+r), Slice(ccol-r, ccol+r)}, v)` on a
(3, H, W) tensor (loss_utils.h:138-140, 178-180) — indexing the CHANNEL and
HEIGHT dims, with slice bounds computed from H/2 and W/2 that exceed the
3-channel dim. The slices are therefore empty and the masks are no-ops:
as built, `high_frequency_loss` compares FULL amplitude spectra and
`low_freq_loss` is identically zero. `freq_mode="reference"` (default)
reproduces that behavior exactly (it is what produced the paper's numbers);
`freq_mode="ideal"` implements the intended radial masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """reference: loss_utils.h:29-32"""
    return jnp.abs(pred - gt).mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """reference: loss_utils.h:39-43"""
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_gaussian_splatting(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-channel-mean variant (reference: loss_utils.h:45-49)."""
    mse = jnp.mean((pred - gt).reshape(pred.shape[0], -1) ** 2, axis=1)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(mse)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """reference: loss_utils.h:51-76 (gaussian + create_window)"""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


@functools.lru_cache(maxsize=16)
def _blur_band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix applying the 1D Gaussian window with zero 'same'
    padding: out[a] = sum_b M[a, b] x[b]."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    g = (g / g.sum()).astype(np.float32)
    pad = window_size // 2
    m = np.zeros((n, n), np.float32)
    for k, w in zip(range(-pad, pad + 1), g):
        diag = np.full(n - abs(k), w, np.float32)
        m += np.diag(diag, k)
    return m


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM with an 11x11 Gaussian window, same (zero) padding — the
    formula of the reference (loss_utils.h:78-124) with the depthwise conv
    recast as two banded-matrix matmuls (separable Gaussian): a C=3
    depthwise conv lowers catastrophically on the TPU conv unit (~11 ms
    fwd+bwd at 640x480) while the same blur as (H,H) and (W,W) matmuls is
    MXU work (<1 ms)."""
    _, h, w = img1.shape
    mh = jnp.asarray(_blur_band_matrix(h, window_size, sigma))
    mw = jnp.asarray(_blur_band_matrix(w, window_size, sigma))

    def conv(x):
        # Precision.HIGHEST is load-bearing: the E[x^2] - mu^2 cancellation
        # below has absolute error ~1e-3 under bf16 matmuls — larger than
        # C2=9e-4 — which drives window variances negative and makes
        # ssim_map (and its gradient) unbounded.
        y = jnp.einsum("ab,cbw->caw", mh, x,
                       precision=lax.Precision.HIGHEST)
        return jnp.einsum("ab,chb->cha", mw, y,
                          precision=lax.Precision.HIGHEST)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def _fft2_shifted(img: jnp.ndarray) -> jnp.ndarray:
    """fft2 over the last two dims + fftshift over ALL dims (the reference
    calls torch.fft.fftshift without dim, which shifts the channel dim too —
    irrelevant for amplitude losses but kept for faithfulness)."""
    f = jnp.fft.fft2(img)
    return jnp.fft.fftshift(f)


def _safe_abs(z: jnp.ndarray) -> jnp.ndarray:
    """|z| with a finite gradient at z == 0 (jnp.abs of a zero complex bin
    has gradient z/|z| = nan, which poisons the whole backward — exactly-zero
    spectrum bins DO occur on masked images)."""
    return jnp.sqrt(z.real**2 + z.imag**2 + 1e-20)


def high_frequency_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cutoff_ratio: float = 0.4,
    freq_mode: str = "reference",
) -> jnp.ndarray:
    """reference: loss_utils.h:147-165 (see module docstring for the mask
    no-op analysis behind freq_mode="reference")."""
    f1 = _fft2_shifted(img1)
    f2 = _fft2_shifted(img2)
    if freq_mode == "ideal":
        _, h, w = img1.shape
        r = int(cutoff_ratio * min(h, w) / 2)
        mask = np.ones((h, w), np.float32)
        mask[h // 2 - r : h // 2 + r, w // 2 - r : w // 2 + r] = 0.0
        m = jnp.asarray(mask)
        f1 = f1 * m
        f2 = f2 * m
    return jnp.mean(jnp.abs(_safe_abs(f1) - _safe_abs(f2)))


def low_freq_loss(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    cutoff_ratio: float = 0.2,
    freq_mode: str = "reference",
) -> jnp.ndarray:
    """reference: loss_utils.h:187-205. As built this is identically zero
    (zero mask, see module docstring); "reference" mode returns 0 without
    wasting FFTs."""
    if freq_mode == "reference":
        return jnp.zeros((), img1.dtype)
    c, h, w = img1.shape
    f1 = _fft2_shifted(img1)
    f2 = _fft2_shifted(img2)
    r = int(cutoff_ratio * min(h, w) / 2)
    mask = np.zeros((h, w), np.float32)
    mask[h // 2 - r : h // 2 + r, w // 2 - r : w // 2 + r] = 1.0
    m = jnp.asarray(mask)
    f1 = f1 * m
    f2 = f2 * m
    norm = float(h * w * c)
    loss_la = jnp.sum(jnp.abs(_safe_abs(f1) - _safe_abs(f2))) / norm
    loss_lp = jnp.sum(jnp.abs(jnp.angle(f1) - jnp.angle(f2))) / norm
    return loss_la + loss_lp


def _bilinear_resize(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    """torch F.interpolate(..., bilinear, align_corners=False) equivalent."""
    c, h, w = img.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return jax.image.resize(img, (c, nh, nw), method="bilinear")


def multi_scale_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    scales: tuple = (1.0, 0.5, 0.25),
    freq_mode: str = "reference",
) -> jnp.ndarray:
    """Pyramid of (scaled) high-frequency losses, weighted by the scale
    (reference: loss_utils.h:208-237; scales = 1/2^i per
    src/gaussian_mapper.cpp:514-518)."""
    loss = jnp.zeros(())
    for s in scales:
        p = _bilinear_resize(pred, s)
        g = _bilinear_resize(gt, s)
        loss = loss + s * high_frequency_loss(p, g, freq_mode=freq_mode)
    return loss
