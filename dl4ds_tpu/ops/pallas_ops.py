"""
Pallas TPU kernels for the framework's fused hot ops.

`fused_channel_attention` fuses the squeeze-excite gate of
ChannelAttention2D (reference op chain: dl4ds/models/blocks.py:585-593 —
global avg-pool -> 1x1 conv -> relu -> 1x1 conv -> sigmoid -> multiply) into
ONE kernel per sample: the feature map is read into VMEM once, the two tiny
matmuls run on-chip, and the gated output is written back — removing the
intermediate HBM round-trips of the unfused op chain.

The op is differentiable via jax.custom_vjp (backward in plain XLA — it is
bandwidth-trivial relative to the forward). On non-TPU backends (tests) the
kernel runs in interpreter mode; an `interpret` override is exposed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_channel_attention', 'channel_attention_reference']

# Per-sample VMEM budget for holding x twice (in + out) with headroom.
_VMEM_LIMIT_BYTES = 6 * 1024 * 1024


def channel_attention_reference(x, w1, b1, w2, b2):
    """Unfused XLA implementation (also the numerical reference)."""
    m = jnp.mean(x, axis=(-3, -2))                        # [..., C]
    h = jax.nn.relu(
        jnp.einsum('...c,cr->...r', m, w1.astype(m.dtype)) + b1)
    g = jax.nn.sigmoid(
        jnp.einsum('...r,rc->...c', h, w2.astype(m.dtype)) + b2)
    return x * g[..., None, None, :]


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]                                          # [H, W, C]
    hw = x.shape[0] * x.shape[1]
    m = jnp.sum(x.astype(jnp.float32), axis=(0, 1), keepdims=False) / hw
    m = m.reshape(1, -1)                                  # [1, C]
    h = jax.nn.relu(
        jnp.dot(m, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:])
    g = jax.nn.sigmoid(
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:])
    o_ref[0] = x * g.reshape(1, 1, -1).astype(x.dtype)


def _forward_pallas(x, w1, b1, w2, b2, interpret):
    b, h, w, c = x.shape
    cr = w1.shape[-1]
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cr, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ca(x, w1, b1, w2, b2, interpret):
    return _forward_pallas(x, w1, b1, w2, b2, interpret)


def _fused_ca_fwd(x, w1, b1, w2, b2, interpret):
    y = _forward_pallas(x, w1, b1, w2, b2, interpret)
    return y, (x, w1, b1, w2, b2)


def _fused_ca_bwd(interpret, res, dy):
    x, w1, b1, w2, b2 = res
    f32 = jnp.float32
    hw = x.shape[-3] * x.shape[-2]
    m = jnp.mean(x.astype(f32), axis=(-3, -2))                 # [B, C]
    h_pre = m @ w1.astype(f32) + b1.astype(f32)
    hh = jax.nn.relu(h_pre)
    g_pre = hh @ w2.astype(f32) + b2.astype(f32)
    g = jax.nn.sigmoid(g_pre)

    dyf = dy.astype(f32)
    xf = x.astype(f32)
    dx_direct = dyf * g[:, None, None, :]
    dg = jnp.sum(dyf * xf, axis=(-3, -2))                      # [B, C]
    dg_pre = dg * g * (1.0 - g)
    dw2 = hh.T @ dg_pre
    db2 = jnp.sum(dg_pre, axis=0)
    dh = dg_pre @ w2.astype(f32).T
    dh_pre = dh * (h_pre > 0)
    dw1 = m.T @ dh_pre
    db1 = jnp.sum(dh_pre, axis=0)
    dm = dh_pre @ w1.astype(f32).T                             # [B, C]
    dx = dx_direct + dm[:, None, None, :] / hw
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_fused_ca.defvjp(_fused_ca_fwd, _fused_ca_bwd)


def fused_channel_attention(x, w1, b1, w2, b2, interpret=None):
    """Fused squeeze-excite channel attention: y = x * sigmoid((relu(mean_hw(x)
    @ w1 + b1)) @ w2 + b2).

    x: [..., H, W, C] (leading dims flattened internally); w1: [C, Cr];
    b1: [Cr]; w2: [Cr, C]; b2: [C]. Falls back to the unfused XLA formulation
    when the per-sample feature map would not fit comfortably in VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    *lead, h, w, c = x.shape
    per_sample = h * w * c * x.dtype.itemsize * 2
    if per_sample > _VMEM_LIMIT_BYTES:
        return channel_attention_reference(x, w1, b1, w2, b2)
    xf = x.reshape((-1, h, w, c))
    y = _fused_ca(xf, w1, b1, w2, b2, interpret)
    return y.reshape(x.shape)


# =============================================================================
# Fused SSIM (single-channel): both separable Gaussian filterings + SSIM
# algebra + spatial reduction in one VMEM pass per sample
# =============================================================================

_SSIM_TILE = 8  # samples per program (sublane alignment)


def _ssim_kernel(x1_ref, x2_ref, by_ref, bx_ref, cc_ref, ssim_ref):
    by = by_ref[:]                             # [Hv, H]
    bx = bx_ref[:]                             # [Wv, W]
    c1 = cc_ref[0, 0]
    c2 = cc_ref[0, 1]

    hp = jax.lax.Precision.HIGHEST  # f32 accumulate on the MXU

    def filt(p):
        t = jnp.dot(by, p, preferred_element_type=jnp.float32,
                    precision=hp)                                    # [Hv, W]
        return jnp.dot(t, bx.T, preferred_element_type=jnp.float32,
                       precision=hp)                                 # [Hv,Wv]

    for j in range(_SSIM_TILE):                # static unroll over the tile
        a = x1_ref[j].astype(jnp.float32)      # [H, W]
        b = x2_ref[j].astype(jnp.float32)
        mu1 = filt(a)
        mu2 = filt(b)
        mu11 = filt(a * a)
        mu22 = filt(b * b)
        mu12 = filt(a * b)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        lum = (2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)
        cs = (2.0 * (mu12 - mu1_mu2) + c2) / (mu11 - mu1_sq
                                              + mu22 - mu2_sq + c2)
        ssim_ref[j, :] = jnp.full((128,), jnp.mean(lum * cs), jnp.float32)


def _band_matrix(n, kernel1d):
    from .ssim import band_matrix    # single shared builder
    return band_matrix(kernel1d, n)


def fused_ssim_per_image(img1, img2, max_val, filter_size=11,
                         filter_sigma=1.5, k1=0.01, k2=0.03, interpret=None):
    """Pallas-fused SSIM for single-channel [B, H, W, 1] images: one kernel
    per sample computes the 5 Gaussian-filtered moments as two banded
    matmuls each (MXU) plus the SSIM algebra and spatial mean, without
    materializing any filtered map in HBM. Returns per-image SSIM [B].

    Differentiable: backward runs the XLA formulation (ops/ssim.py) under
    jax.vjp — the forward saves only the inputs. Falls back to the XLA
    path for multi-channel inputs or oversized grids.

    Measured on v5e (B=128, 64x64): forward-only 0.38 ms vs 0.41 ms XLA
    (~7% faster); full value_and_grad 0.77 ms vs 0.63 ms (slower — the
    XLA-vjp backward recomputes the forward). Use for inference-time
    SSIM evaluation; training losses keep the XLA formulation.
    """
    from .ssim import ssim as xla_ssim, _gaussian_kernel1d
    if img1.ndim != 4:
        # the XLA formulation handles [..., H, W, C]
        return xla_ssim(img1, img2, max_val, filter_size, filter_sigma,
                        k1, k2)
    b, h, w, c = img1.shape
    # a program holds a _SSIM_TILE-sample block of BOTH images plus ~5
    # filtered f32 temporaries per unrolled sample and the two band
    # matrices — budget the real working set, not one sample
    per_program = (_SSIM_TILE * 2 * h * w * 4      # input blocks
                   + 7 * h * w * 4                 # live temporaries
                   + 2 * h * w * 4)                # band matrices (<= h*w)
    if c != 1 or per_program > _VMEM_LIMIT_BYTES or h < filter_size \
            or w < filter_size:
        return xla_ssim(img1, img2, max_val, filter_size, filter_sigma,
                        k1, k2)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    kern = _gaussian_kernel1d(filter_size, filter_sigma)
    by = jnp.asarray(_band_matrix(h, kern))
    bx = jnp.asarray(_band_matrix(w, kern))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    cc = jnp.stack([c1, c2]).astype(jnp.float32).reshape(1, 2)

    @jax.custom_vjp
    def _run(x1, x2, cc):
        return _ssim_forward(x1, x2, cc)

    def _ssim_forward(x1, x2, cc):
        hv, wv = h - filter_size + 1, w - filter_size + 1
        t = _SSIM_TILE
        b_pad = -(-b // t) * t
        x1p = x1[..., 0]
        x2p = x2[..., 0]
        if b_pad != b:
            pad = ((0, b_pad - b), (0, 0), (0, 0))
            x1p = jnp.pad(x1p, pad)
            x2p = jnp.pad(x2p, pad)
        s = pl.pallas_call(
            _ssim_kernel,
            grid=(b_pad // t,),
            in_specs=[
                pl.BlockSpec((t, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hv, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wv, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
            interpret=interpret,
        )(x1p, x2p, by, bx, cc)
        return s[:b, 0]

    def _fwd(x1, x2, cc):
        return _ssim_forward(x1, x2, cc), (x1, x2)

    def _bwd(res, g):
        x1, x2 = res
        _, vjp = jax.vjp(
            lambda a, bb: xla_ssim(a, bb, max_val, filter_size,
                                   filter_sigma, k1, k2), x1, x2)
        d1, d2 = vjp(g)
        return d1, d2, None

    _run.defvjp(_fwd, _bwd)
    return _run(img1, img2, cc)
