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
