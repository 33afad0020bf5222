"""Loss-function tests: golden values vs independent numpy implementations
(the reference's losses are tf.image-based, dl4ds/losses.py; TF is not
available here, so the SSIM reference below is computed directly from the
Wang et al. 2004 formulas with an 11x11 Gaussian window)."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from dl4ds_tpu import losses
from dl4ds_tpu.ops.ssim import ssim, ssim_multiscale, psnr


def _np_gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _np_ssim(img1, img2, max_val, k1=0.01, k2=0.03):
    """Independent per-image SSIM (VALID windows, per channel)."""
    from scipy.signal import convolve2d
    kern = _np_gaussian_kernel()
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    vals = []
    for b in range(img1.shape[0]):
        ch_vals = []
        for c in range(img1.shape[-1]):
            a = img1[b, :, :, c].astype(np.float64)
            d = img2[b, :, :, c].astype(np.float64)
            mu1 = convolve2d(a, kern, mode='valid')
            mu2 = convolve2d(d, kern, mode='valid')
            mu11 = convolve2d(a * a, kern, mode='valid')
            mu22 = convolve2d(d * d, kern, mode='valid')
            mu12 = convolve2d(a * d, kern, mode='valid')
            s1 = mu11 - mu1 ** 2
            s2 = mu22 - mu2 ** 2
            s12 = mu12 - mu1 * mu2
            l = (2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)
            cs = (2 * s12 + c2) / (s1 + s2 + c2)
            ch_vals.append(np.mean(l * cs))
        vals.append(np.mean(ch_vals))
    return np.array(vals)


def test_mae_mse_golden(rng):
    a = rng.standard_normal((4, 16, 16, 1)).astype('float32')
    b = rng.standard_normal((4, 16, 16, 1)).astype('float32')
    np.testing.assert_allclose(float(losses.mae(a, b)),
                               np.abs(a - b).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(losses.mse(a, b)),
                               ((a - b) ** 2).mean(), rtol=1e-6)


def test_ssim_matches_numpy_reference(rng):
    a = rng.random((3, 32, 32, 1)).astype('float32')
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype('float32')
    got = np.asarray(ssim(a, b, max_val=1.0))
    ref = _np_ssim(a, b, 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ssim_identity_is_one(rng):
    a = rng.random((2, 24, 24, 1)).astype('float32')
    np.testing.assert_allclose(np.asarray(ssim(a, a, 1.0)), 1.0, atol=1e-5)


def test_dssim_zero_for_identical(rng):
    a = rng.random((2, 24, 24, 1)).astype('float32')
    assert abs(float(losses.dssim(a, a))) < 1e-5


def test_dssim_negative_shift_quirk(rng):
    """The reference shifts negatively-valued inputs before SSIM
    (dl4ds/losses.py:44-51); dssim must be insensitive to a shared negative
    offset in the same way."""
    a = rng.random((2, 24, 24, 1)).astype('float32')
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1).astype('float32')
    d1 = float(losses.dssim(a, b))
    d2 = float(losses.dssim(a - 5.0, b - 5.0))
    np.testing.assert_allclose(d1, d2, atol=1e-4)


def test_combo_losses_arithmetic(rng):
    a = rng.random((2, 24, 24, 1)).astype('float32')
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype('float32')
    d = float(losses.dssim(a, b))
    m1 = float(losses.mae(a, b))
    m2 = float(losses.mse(a, b))
    np.testing.assert_allclose(float(losses.dssim_mae(a, b)),
                               0.8 * d + 0.2 * m1, rtol=1e-5)
    np.testing.assert_allclose(float(losses.dssim_mse(a, b)),
                               0.8 * d + 0.2 * m2, rtol=1e-5)
    np.testing.assert_allclose(float(losses.dssim_mae_mse(a, b)),
                               0.6 * d + 0.2 * m1 + 0.2 * m2, rtol=1e-5)


def test_msdssim_runs_on_large_grid(rng):
    a = rng.random((2, 96, 96, 1)).astype('float32')
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype('float32')
    v = float(losses.msdssim(a, b))
    assert 0.0 <= v <= 0.5
    assert abs(float(losses.msdssim(a, a))) < 1e-5
    m1, m2 = float(losses.mae(a, b)), float(losses.mse(a, b))
    np.testing.assert_allclose(float(losses.msdssim_mae(a, b)),
                               0.8 * v + 0.2 * m1, rtol=1e-4)
    np.testing.assert_allclose(float(losses.msdssim_mae_mse(a, b)),
                               0.6 * v + 0.2 * m1 + 0.2 * m2, rtol=1e-4)


def test_psnr_golden(rng):
    a = rng.random((2, 16, 16, 1)).astype('float32')
    b = np.clip(a + 0.1, 0, 1).astype('float32')
    got = np.asarray(psnr(a, b, 1.0))
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got, 10 * np.log10(1.0 / mse), rtol=1e-5)


def test_losses_are_jittable_and_differentiable(rng):
    import jax
    a = rng.random((2, 24, 24, 1)).astype('float32')
    b = rng.random((2, 24, 24, 1)).astype('float32')
    for name in ['mae', 'mse', 'dssim', 'dssim_mae']:
        f = getattr(losses, name)
        g = jax.jit(jax.grad(lambda y_pred: f(a, y_pred)))(b)
        assert np.isfinite(np.asarray(g)).all(), name


def test_losses_accept_bfloat16(rng):
    import jax.numpy as jnp
    a = jnp.asarray(rng.random((2, 24, 24, 1)), jnp.bfloat16)
    b = jnp.asarray(rng.random((2, 24, 24, 1)), jnp.bfloat16)
    for name in ['mae', 'mse', 'dssim']:
        v = float(getattr(losses, name)(a, b))
        assert np.isfinite(v), name
