import numpy as np
import jax.numpy as jnp

from segs_slam_tpu.train import losses


def _imgs(seed=0, h=24, w=32):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (3, h, w)), jnp.float32)
    return a, b


def test_l1_and_psnr():
    a, b = _imgs()
    assert float(losses.l1_loss(a, a)) == 0.0
    l1 = float(losses.l1_loss(a, b))
    np.testing.assert_allclose(l1, np.abs(np.asarray(a) - np.asarray(b)).mean(),
                               rtol=1e-6)
    assert float(losses.psnr(a, b)) < 60
    # identical images -> psnr inf-ish (mse 0 -> inf); use near-identical
    eps = a + 1e-4
    assert float(losses.psnr(a, eps)) > 70


def test_ssim_identity_and_range():
    a, b = _imgs(1)
    s_same = float(losses.ssim(a, a))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    s_diff = float(losses.ssim(a, b))
    assert -1.0 <= s_diff < 0.9


def test_ssim_blurs_use_highest_precision():
    """On TPU, default-precision matmuls multiply in bf16; the E[x^2]-mu^2
    cancellation then exceeds C2 and ssim_map becomes unbounded (observed:
    ssim values of 5.8 / -622 on real renders). The blur matmuls must carry
    Precision.HIGHEST. CPU ignores precision, so check the jaxpr."""
    import jax
    from jax import lax

    a, b = _imgs(3)
    jaxpr = jax.make_jaxpr(losses.ssim)(a, b)
    dots = [e for e in jaxpr.jaxpr.eqns
            if e.primitive.name == "dot_general"]
    assert dots, "ssim no longer uses dot_general blur matmuls?"
    for e in dots:
        assert e.params["precision"] == (
            lax.Precision.HIGHEST, lax.Precision.HIGHEST
        ), f"ssim blur precision regressed: {e.params['precision']}"


def test_ssim_matches_reference_formula():
    """Cross-check against a direct numpy conv implementation."""
    from scipy.signal import convolve2d

    a, b = _imgs(2, h=20, w=20)
    an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
    xs = np.arange(11) - 5
    g = np.exp(-(xs**2) / (2 * 1.5**2))
    g /= g.sum()
    w2 = np.outer(g, g)

    def conv(img):
        return np.stack(
            [convolve2d(img[c], w2[::-1, ::-1], mode="same") for c in range(3)]
        )

    mu1, mu2 = conv(an), conv(bn)
    s1 = conv(an * an) - mu1**2
    s2 = conv(bn * bn) - mu2**2
    s12 = conv(an * bn) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    np.testing.assert_allclose(float(losses.ssim(a, b)), smap.mean(), atol=1e-5)


def test_frequency_losses_reference_mode():
    a, b = _imgs(3)
    # as-built reference behavior: low-freq loss is identically zero
    assert float(losses.low_freq_loss(a, b)) == 0.0
    hf = float(losses.high_frequency_loss(a, b))
    # full-spectrum amplitude L1 (the masks are no-ops in the reference)
    fa = np.fft.fftshift(np.fft.fft2(np.asarray(a)))
    fb = np.fft.fftshift(np.fft.fft2(np.asarray(b)))
    expected = np.abs(np.abs(fa) - np.abs(fb)).mean()
    np.testing.assert_allclose(hf, expected, rtol=1e-4)
    assert float(losses.high_frequency_loss(a, a)) == 0.0


def test_frequency_losses_ideal_mode():
    a, b = _imgs(4)
    hf = float(losses.high_frequency_loss(a, b, freq_mode="ideal"))
    lf = float(losses.low_freq_loss(a, b, freq_mode="ideal"))
    assert hf > 0 and lf > 0
    full = float(losses.high_frequency_loss(a, b))
    assert hf < full  # masked spectrum has less energy


def test_multi_scale_loss_runs():
    a, b = _imgs(5, h=32, w=32)
    v = float(losses.multi_scale_loss(a, b, (1.0, 0.5, 0.25)))
    assert np.isfinite(v) and v > 0


def test_psnr_gs_variant():
    a, b = _imgs(6)
    v = float(losses.psnr_gaussian_splatting(a, b))
    mse = np.mean((np.asarray(a) - np.asarray(b)).reshape(3, -1) ** 2, axis=1)
    expected = np.mean(20 * np.log10(1.0 / np.sqrt(mse)))
    np.testing.assert_allclose(v, expected, rtol=1e-5)


def test_frequency_loss_gradient_finite_on_zero_images():
    """Zero spectrum bins used to give d|F|/dF = nan and poison training."""
    import jax

    zero = jnp.zeros((3, 16, 16))
    b = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (3, 16, 16)),
                    jnp.float32)
    g = jax.grad(lambda x: losses.high_frequency_loss(x, b))(zero)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda x: losses.multi_scale_loss(x, b, (1.0, 0.5)))(zero)
    assert np.isfinite(np.asarray(g2)).all()
