"""
Loss library — jnp ports of the reference's 9 losses (dl4ds/losses.py).

All functions take (y_true, y_pred) as [..., H, W, C] arrays and return a
scalar. The DSSIM family keeps the reference's quirks for output parity:
dynamic range computed over *both* arrays, and a shift to non-negative values
before SSIM when a minimum is negative (dl4ds/losses.py:41-51, :113-123).
"""

import jax.numpy as jnp

from .ops.ssim import ssim as _ssim, ssim_multiscale as _ssim_multiscale

__all__ = ['mae', 'mse', 'dssim', 'dssim_mae', 'dssim_mse', 'dssim_mae_mse',
           'msdssim', 'msdssim_mae', 'msdssim_mae_mse']


def mae(y_true, y_pred):
    """Mean absolute error (L1 pixel loss)."""
    return jnp.mean(jnp.abs(jnp.asarray(y_true) - jnp.asarray(y_pred)))


def mse(y_true, y_pred):
    """Mean squared error (L2 pixel loss)."""
    d = jnp.asarray(y_true) - jnp.asarray(y_pred)
    return jnp.mean(d * d)


def _shift_nonneg(a):
    m = jnp.min(a)
    return jnp.where(m < 0, a - m, a)


def _drange(y_true, y_pred):
    maxv = jnp.maximum(jnp.max(y_true), jnp.max(y_pred))
    minv = jnp.minimum(jnp.min(y_true), jnp.min(y_pred))
    return maxv - minv


def dssim(y_true, y_pred):
    """Structural dissimilarity: mean((1 - SSIM) / 2)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    drange = _drange(y_true, y_pred)
    s = _ssim(_shift_nonneg(y_true), _shift_nonneg(y_pred), max_val=drange,
              filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03)
    return jnp.mean((1.0 - s) / 2.0)


def dssim_mae(y_true, y_pred):
    """0.8 * DSSIM + 0.2 * MAE."""
    return 0.8 * dssim(y_true, y_pred) + 0.2 * mae(y_true, y_pred)


def dssim_mse(y_true, y_pred):
    """0.8 * DSSIM + 0.2 * MSE."""
    return 0.8 * dssim(y_true, y_pred) + 0.2 * mse(y_true, y_pred)


def dssim_mae_mse(y_true, y_pred):
    """0.6 * DSSIM + 0.2 * MAE + 0.2 * MSE."""
    return (0.6 * dssim(y_true, y_pred) + 0.2 * mae(y_true, y_pred)
            + 0.2 * mse(y_true, y_pred))


def msdssim(y_true, y_pred):
    """Multiscale structural dissimilarity with the reference's 4 power
    factors (dl4ds/losses.py:124-126); input spatial dims must be >= 88."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    drange = _drange(y_true, y_pred)
    s = _ssim_multiscale(
        _shift_nonneg(y_true), _shift_nonneg(y_pred), max_val=drange,
        filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03,
        power_factors=(0.0448, 0.2856, 0.3001, 0.2363))
    return jnp.mean((1.0 - s) / 2.0)


def msdssim_mae(y_true, y_pred):
    """0.8 * MSDSSIM + 0.2 * MAE."""
    return 0.8 * msdssim(y_true, y_pred) + 0.2 * mae(y_true, y_pred)


def msdssim_mae_mse(y_true, y_pred):
    """0.6 * MSDSSIM + 0.2 * MAE + 0.2 * MSE."""
    return (0.6 * msdssim(y_true, y_pred) + 0.2 * mae(y_true, y_pred)
            + 0.2 * mse(y_true, y_pred))
