"""
SSIM, multiscale SSIM and PSNR in pure jnp, matching the tf.image semantics
the reference's losses depend on (dl4ds/losses.py:52-53 uses tf.image.ssim
with filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03; :124-126 uses
tf.image.ssim_multiscale with power factors (0.0448, 0.2856, 0.3001, 0.2363)).

Implementation notes (mirrors the published SSIM definition and TF's choices):
  * 11x11 separable Gaussian window, sigma 1.5, VALID padding;
  * statistics via E[xy] - E[x]E[y] on filtered images;
  * per-channel SSIM averaged over space and channels -> one value per image;
  * MS-SSIM: relu-ed contrast-structure terms at each scale, 2x average-pool
    downsampling with symmetric padding to even sizes between scales, and a
    weighted geometric mean.

Convolutions are expressed as two small separable matmul contractions so XLA
maps them onto the MXU and fuses the elementwise SSIM algebra around them.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['ssim', 'ssim_multiscale', 'psnr']

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel1d(size, sigma):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def band_matrix(kernel1d, n):
    """(n-k+1, n) banded matrix applying a 1-D VALID filter — the shared
    builder for the SSIM filters here and the fused-kernel variants in
    ops/pallas_ops."""
    k = kernel1d.shape[0]
    m = np.zeros((n - k + 1, n), dtype=np.float32)
    for i in range(n - k + 1):
        m[i, i:i + k] = kernel1d
    return m


def _filter_valid(x, kernel1d):
    """Separable VALID 2D filtering over the (-3, -2) spatial axes of
    [..., H, W, C], via two windowed matmuls with static weight matrices."""
    k = kernel1d.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    if h < k or w < k:
        raise ValueError(
            f'image ({h}x{w}) is smaller than the {k}x{k} SSIM filter '
            f'window (tf.image semantics; for MS-SSIM every scale must '
            f'stay >= the window)')

    def band(n):
        return jnp.asarray(band_matrix(kernel1d, n))

    hp = jax.lax.Precision.HIGHEST
    y = jnp.tensordot(x, band(h), axes=[[-3], [1]], precision=hp)
    y = jnp.moveaxis(y, -1, -3)
    y = jnp.tensordot(y, band(w), axes=[[-2], [1]], precision=hp)
    y = jnp.moveaxis(y, -1, -2)
    return y


def _ssim_per_channel(img1, img2, max_val, filter_size, filter_sigma, k1, k2):
    """Returns (ssim, cs) per image: mean over VALID spatial window positions,
    shape [..., C] reduced over channels by the caller.

    The five required filtered moments (mu1, mu2, E[x^2], E[y^2], E[xy]) are
    stacked on a leading axis and filtered with ONE pair of banded matmuls —
    a 5x larger MXU contraction instead of five small ones."""
    kernel = _gaussian_kernel1d(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    stacked = jnp.stack(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    mu1, mu2, mu11, mu22, mu12 = _filter_valid(stacked, kernel)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = mu11 - mu1_sq
    sigma2_sq = mu22 - mu2_sq
    sigma12 = mu12 - mu1_mu2

    luminance = (2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)
    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = luminance * cs
    axes = (-3, -2)
    return jnp.mean(ssim_map, axis=axes), jnp.mean(cs, axis=axes)


def ssim(img1, img2, max_val, filter_size=11, filter_sigma=1.5, k1=0.01,
         k2=0.03):
    """Structural similarity per image for NHWC (or [..., H, W, C]) inputs.
    Returns shape [...] (channel-averaged), like tf.image.ssim."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    s, _ = _ssim_per_channel(img1, img2, max_val, filter_size, filter_sigma,
                             k1, k2)
    return jnp.mean(s, axis=-1)


def _downsample_2x(x):
    """Symmetric-pad to even spatial dims then 2x2 VALID average pool,
    matching tf.image.ssim_multiscale's inter-scale reduction."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        cfg = [(0, 0)] * x.ndim
        cfg[-3] = (0, pad_h)
        cfg[-2] = (0, pad_w)
        x = jnp.pad(x, cfg, mode='symmetric')
        h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, x.shape[-1])
    return x.mean(axis=(-4, -2))


def ssim_multiscale(img1, img2, max_val, power_factors=_MSSSIM_WEIGHTS,
                    filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03):
    """Multiscale SSIM per image (tf.image.ssim_multiscale semantics)."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    n_scales = len(power_factors)
    mcs = []
    val = None
    for k in range(n_scales):
        s, cs = _ssim_per_channel(img1, img2, max_val, filter_size,
                                  filter_sigma, k1, k2)
        if k < n_scales - 1:
            mcs.append(jax.nn.relu(cs))
            img1 = _downsample_2x(img1)
            img2 = _downsample_2x(img2)
        else:
            val = jax.nn.relu(s)
    result = val ** power_factors[-1]
    for w_k, cs_k in zip(power_factors[:-1], mcs):
        result = result * (cs_k ** w_k)
    return jnp.mean(result, axis=-1)


def psnr(img1, img2, max_val):
    """Peak signal-to-noise ratio per image, like tf.image.psnr."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    mse = jnp.mean((img1 - img2) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10((max_val ** 2) / mse)
