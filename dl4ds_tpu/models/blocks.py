"""
Model building blocks (Flax linen, NHWC).

TPU-first re-designs of the reference's Keras layers
(dl4ds/models/blocks.py): same computational contracts, but expressed as
functional Flax modules with static shapes, `lax.scan`-based recurrence for
the ConvLSTM, and reshape/transpose pixel shuffle that XLA fuses with the
producing convolution. Compute dtype is configurable (bfloat16 on TPU);
parameters stay float32.

Deviations from the reference (intentional, documented):
  * DeconvolutionBlock with scale=4 applies exactly two stride-2 transposed
    convs (the reference's if/else chain at blocks.py:525-534 makes scale=4
    also fall through to the stride-4 deconv, producing a 16x output — a
    latent bug that breaks training for 'dc'+scale=4).
  * ConvNextBlock defaults to LayerNorm when `normalization` is None (the
    reference crashes on None at blocks.py:174).
"""

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.array import depth_to_space
from ..interpolation import resize2d
from ..utils import checkarg_dropout_variant

__all__ = ['ConvBlock', 'ResidualBlock', 'DenseBlock', 'TransitionBlock',
           'ConvNextBlock', 'DropPath', 'LocalizedConvBlock',
           'RecurrentConvBlock', 'SubpixelConvolutionBlock',
           'ResizeConvolutionBlock', 'DeconvolutionBlock',
           'ChannelAttention2D', 'EncoderBlock', 'PadConcat', 'pad_concat',
           'get_activation', 'Dropout', 'get_dropout_layer', 'MCDropout',
           'MCGaussianDropout', 'MCSpatialDropout2D', 'MCSpatialDropout3D']

Dtype = Any

# Keras parity: the reference's Conv2D / Conv2DTranspose / Dense layers all
# use the Keras default `glorot_uniform` kernel initializer
# (dl4ds/models/blocks.py passes no kernel_initializer anywhere), while
# Flax's default is `lecun_normal`. Keras and jax.nn.initializers compute
# the same fans for conv kernels (receptive_field * channels), and glorot is
# symmetric in fan_in/fan_out, so these subclasses make the *distribution of
# initial weights* match the reference exactly. The class names are kept as
# 'Conv'/'ConvTranspose' so Flax auto-naming (param tree keys 'Conv_0', ...)
# is identical to using nn.Conv directly.
_GLOROT = nn.initializers.glorot_uniform()


class Conv(nn.Conv):
    kernel_init: Any = _GLOROT


class ConvTranspose(nn.ConvTranspose):
    kernel_init: Any = _GLOROT


def get_activation(name):
    """Resolve an activation name to a jax.nn function ('relu', 'gelu', ...).
    None (or 'linear') is identity."""
    if name is None or name == 'linear':
        return lambda x: x
    table = {
        'relu': jax.nn.relu,
        'gelu': jax.nn.gelu,
        'elu': jax.nn.elu,
        'selu': jax.nn.selu,
        'leaky_relu': jax.nn.leaky_relu,
        'crelu': jax.nn.relu,   # concat-relu is not used by any config path
        'sigmoid': jax.nn.sigmoid,
        'tanh': jnp.tanh,
    }
    if name not in table:
        raise ValueError(f'Unsupported activation: {name}')
    return table[name]


def _hard_sigmoid(x):
    """Keras hard_sigmoid: clip(0.2 x + 0.5, 0, 1) — ConvLSTM gate default."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


class Dropout(nn.Module):
    """All reference dropout variants in one module
    (reference: dl4ds/models/blocks.py:659-706).

    variant: None/'vanilla' | 'gaussian' | 'spatial' | 'mcdrop' |
             'mcgaussiandrop' | 'mcspatialdrop'. The mc* variants stay active
    at inference (Monte-Carlo dropout). `dim` 2 -> spatial dropout broadcasts
    over (H, W); 3 -> over (T, H, W).
    """
    rate: float
    variant: Optional[str] = None
    dim: int = 2

    @nn.compact
    def __call__(self, x, training: bool = False):
        variant = checkarg_dropout_variant(self.variant)
        if self.rate <= 0.0:
            return x
        is_mc = variant in ('mcdrop', 'mcgaussiandrop', 'mcspatialdrop')
        active = training or is_mc
        if not active:
            return x
        if self.has_rng('dropout'):
            rng = self.make_rng('dropout')
        elif is_mc and not training:
            # MC variants are active at inference, but plain predict()/
            # export/quantize apply without rngs — fall back to a FIXED
            # mask (one deterministic ensemble member) instead of
            # crashing; `predict_mc` supplies real per-member rngs.
            rng = jax.random.PRNGKey(0)
        else:
            rng = self.make_rng('dropout')   # raise flax's clear error
        if variant in ('gaussian', 'mcgaussiandrop'):
            # multiplicative 1-centred gaussian noise, keras semantics
            stddev = (self.rate / (1.0 - self.rate)) ** 0.5
            noise = 1.0 + stddev * jax.random.normal(rng, x.shape, x.dtype)
            return x * noise
        if variant in ('spatial', 'mcspatialdrop'):
            # Drop whole channels: broadcast mask over the spatial dims, and —
            # when dim == 3 (SpatialDropout3D, ref blocks.py:659-676) — also
            # over the time axis, so a dropped channel is zero across the
            # entire (T, H, W) volume, matching keras semantics.
            n_bcast = 3 if (self.dim == 3 and x.ndim >= 5) else 2
            shape = list(x.shape)
            for ax in range(x.ndim - 1 - n_bcast, x.ndim - 1):
                shape[ax] = 1
            keep = 1.0 - self.rate
            mask = jax.random.bernoulli(rng, keep, tuple(shape))
            return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def get_dropout_layer(dropout_rate=0.2, dropout_variant=None, dim=2):
    """Reference-vocabulary factory (ref blocks.py:679-706): resolve a
    dropout variant name to a `Dropout` module (identity when rate=0 — the
    module itself short-circuits)."""
    return Dropout(dropout_rate, dropout_variant, dim=dim)


def MCDropout(rate, **kwargs):
    """Monte-Carlo dropout — active at inference (ref blocks.py:659-663)."""
    return Dropout(rate, variant='mcdrop', **kwargs)


def MCGaussianDropout(rate, **kwargs):
    """MC multiplicative gaussian noise (ref blocks.py:665-668)."""
    return Dropout(rate, variant='mcgaussiandrop', **kwargs)


def MCSpatialDropout2D(rate, **kwargs):
    """MC channel dropout over (H, W) (ref blocks.py:670-672)."""
    return Dropout(rate, variant='mcspatialdrop', dim=2, **kwargs)


def MCSpatialDropout3D(rate, **kwargs):
    """MC channel dropout over (T, H, W) (ref blocks.py:674-676)."""
    return Dropout(rate, variant='mcspatialdrop', dim=3, **kwargs)


class _Norm(nn.Module):
    """'bn' | 'ln' | None normalization over the channel axis."""
    kind: Optional[str]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.kind is None:
            return x
        if self.kind == 'bn':
            return nn.BatchNorm(use_running_average=not training,
                                momentum=0.99, epsilon=1e-3,
                                dtype=self.dtype)(x)
        if self.kind == 'ln':
            return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(x)
        raise ValueError(f'Normalization not supported, got {self.kind}')


class ChannelAttention2D(nn.Module):
    """Squeeze-and-excite channel attention
    (reference: dl4ds/models/blocks.py:537-599): global average pool ->
    1x1 conv C/r -> relu -> 1x1 conv C -> sigmoid gate.

    A fused Pallas kernel for the whole gate is available
    (ops/pallas_ops.fused_channel_attention, identical math, golden-tested).
    Measured on v5e it is throughput-neutral for this zoo's small channel
    counts (3742 vs 3794 patches/s on the bench workload), so the default
    is the XLA formulation; opt in with use_pallas=True or
    DL4DS_USE_PALLAS=1.

    Reference quirk replicated via `time_window`: the reference pools with
    `tf.reduce_mean(x, axis=[1, 2])` (ref blocks.py:588) — correct (H, W)
    pooling on rank-4 maps, but its spatio-temporal OUTPUT HEADS apply the
    same layer to rank-5 [B, T, H, W, C] tensors (spt_postups.py:154),
    where axis=[1, 2] pools over (T, H) and the gate varies along (W, C)
    and is shared across time. Reference-trained recnet head weights
    learned THAT gate, so the recnet heads here pass `time_window` to
    reproduce it on the [B*T]-flattened layout (everything else in the
    head is 1x1/3x3 convs, identical per timestep either way)."""
    nf: int
    r: int = 4
    use_pallas: Optional[bool] = None
    time_window: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_ops import (fused_channel_attention,
                                      channel_attention_reference)
        c = x.shape[-1]
        cr = max(int(self.nf / self.r), 1)
        # Keras parity: the reference implements these as 1x1 Conv2D layers
        # with the default glorot_uniform initializer (ref blocks.py:542).
        w1 = self.param('w1', _GLOROT, (c, cr))
        b1 = self.param('b1', nn.initializers.zeros, (cr,))
        w2 = self.param('w2', _GLOROT, (cr, self.nf))
        b2 = self.param('b2', nn.initializers.zeros, (self.nf,))
        if self.time_window is not None and self.time_window > 1:
            # rank-5 reference semantics on the [B*T, H, W, C] layout:
            # mean over (T, H), gate per (W, C), broadcast over (T, H)
            t = self.time_window
            bt, h, w, _ = x.shape
            xr = x.reshape(bt // t, t, h, w, c)
            m = jnp.mean(xr, axis=(1, 2))                    # [B, W, C]
            hdn = jax.nn.relu(
                jnp.einsum('bwc,cr->bwr', m, w1.astype(m.dtype)) + b1)
            g = jax.nn.sigmoid(
                jnp.einsum('bwr,rc->bwc', hdn, w2.astype(m.dtype)) + b2)
            y = xr * g[:, None, None, :, :]
            return y.reshape(bt, h, w, c)
        use_pallas = self.use_pallas
        if use_pallas is None:
            import os
            use_pallas = (jax.default_backend() == 'tpu'
                          and isinstance(x.shape[0], int)  # no poly-batch
                          and bool(os.environ.get('DL4DS_USE_PALLAS')))
        if use_pallas:
            return fused_channel_attention(x, w1, b1, w2, b2)
        return channel_attention_reference(x, w1, b1, w2, b2)


def _conv(filters, ks, strides=1, use_bias=True, separable=False,
          dtype=jnp.float32, name=None):
    if separable:
        return _SeparableConv(filters, ks, strides, use_bias, dtype, name=name)
    return Conv(filters, ks if isinstance(ks, tuple) else (ks, ks),
                   strides=(strides, strides), padding='SAME',
                   use_bias=use_bias, dtype=dtype, name=name)


class _SeparableConv(nn.Module):
    """Depthwise-separable conv (depthwise ks + pointwise 1x1)."""
    filters: int
    ks: Union[int, Tuple[int, int]]
    strides: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        ks = self.ks if isinstance(self.ks, tuple) else (self.ks, self.ks)
        x = Conv(cin, ks, strides=(self.strides, self.strides),
                    padding='SAME', feature_group_count=cin, use_bias=False,
                    dtype=self.dtype)(x)
        return Conv(self.filters, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype)(x)


class ConvBlock(nn.Module):
    """Two-conv block (reference: dl4ds/models/blocks.py:13-103):
    [dropout] -> conv -> [norm] -> act -> [dropout] -> conv -> [norm] -> act
    -> [channel attention]."""
    filters: int
    strides: int = 1
    ks_cl1: Tuple[int, int] = (3, 3)
    ks_cl2: Tuple[int, int] = (3, 3)
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    attention: bool = False
    # reference rank-5 attention quirk (see ChannelAttention2D): set by
    # the recnet output heads to their time_window
    attention_time: Optional[int] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    depthwise_separable: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        use_bias = self.normalization is None
        y = Dropout(self.dropout_rate, self.dropout_variant)(x, training)
        y = _conv(self.filters, self.ks_cl1, self.strides, use_bias,
                  self.depthwise_separable, self.dtype)(y)
        y = _Norm(self.normalization, self.dtype)(y, training)
        y = act(y)
        y = Dropout(self.dropout_rate, self.dropout_variant)(y, training)
        y = _conv(self.filters, self.ks_cl2, 1, use_bias,
                  self.depthwise_separable, self.dtype)(y)
        y = _Norm(self.normalization, self.dtype)(y, training)
        y = act(y)
        if self.attention:
            y = ChannelAttention2D(self.filters,
                                   time_window=self.attention_time,
                                   dtype=self.dtype)(y)
        return y


class ResidualBlock(nn.Module):
    """Residual block (reference: dl4ds/models/blocks.py:187-230). With
    normalization=None this is the EDSR-style block."""
    filters: int
    strides: int = 1
    ks_cl1: Tuple[int, int] = (3, 3)
    ks_cl2: Tuple[int, int] = (3, 3)
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    attention: bool = False
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    use_1x1conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        use_bias = self.normalization is None
        y = Dropout(self.dropout_rate, self.dropout_variant)(x, training)
        y = _conv(self.filters, self.ks_cl1, self.strides, use_bias,
                  dtype=self.dtype)(y)
        y = _Norm(self.normalization, self.dtype)(y, training)
        y = act(y)
        y = Dropout(self.dropout_rate, self.dropout_variant)(y, training)
        y = _conv(self.filters, self.ks_cl2, 1, use_bias, dtype=self.dtype)(y)
        y = _Norm(self.normalization, self.dtype)(y, training)
        if self.attention:
            y = ChannelAttention2D(self.filters, dtype=self.dtype)(y)
        if self.use_1x1conv:
            x = Conv(self.filters, (1, 1), dtype=self.dtype)(x)
        return act(y + x)


class DenseBlock(nn.Module):
    """DenseNet-style block (reference: dl4ds/models/blocks.py:233-277):
    1x1 conv to 4*filters -> [norm] -> act -> [dropout] -> 3x3 conv ->
    [attention] -> concat with input."""
    filters: int
    strides: int = 1
    ks_cl1: Tuple[int, int] = (1, 1)
    ks_cl2: Tuple[int, int] = (3, 3)
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    attention: bool = False
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        y = _conv(4 * self.filters, self.ks_cl1, self.strides,
                  dtype=self.dtype)(x)
        y = _Norm(self.normalization, self.dtype)(y, training)
        y = act(y)
        y = Dropout(self.dropout_rate, self.dropout_variant)(y, training)
        y = _conv(self.filters, self.ks_cl2, 1, dtype=self.dtype)(y)
        if self.attention:
            y = ChannelAttention2D(self.filters, dtype=self.dtype)(y)
        return jnp.concatenate([y, x], axis=-1)


class TransitionBlock(nn.Module):
    """1x1-conv channel controller (reference: dl4ds/models/blocks.py:280-309):
    with 'bn': bn -> act -> conv; otherwise conv -> act."""
    filters: int
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        if self.normalization == 'bn':
            y = _Norm('bn', self.dtype)(x, training)
            y = act(y)
            return Conv(self.filters, (1, 1), dtype=self.dtype)(y)
        y = Conv(self.filters, (1, 1), dtype=self.dtype)(x)
        return act(y)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference: dl4ds/models/blocks.py:106-128)."""
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class ConvNextBlock(nn.Module):
    """ConvNeXt block (reference: dl4ds/models/blocks.py:131-184): 7x7
    depthwise conv -> LN -> pointwise 4x expand -> GELU -> pointwise project,
    optional layer-scale gamma and stochastic depth, residual add (optionally
    through a 1x1 conv)."""
    filters: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 0.0
    use_1x1conv: bool = False
    activation: Optional[str] = 'gelu'
    normalization: Optional[str] = 'ln'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        inp = x
        cin = x.shape[-1]
        y = Conv(cin, (7, 7), padding='SAME', feature_group_count=cin,
                    dtype=self.dtype)(x)
        norm = self.normalization or 'ln'
        if norm == 'bn':
            y = _Norm('bn', self.dtype)(y, training)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
        y = nn.Dense(4 * self.filters, dtype=self.dtype)(y)
        y = act(y)
        y = nn.Dense(self.filters, dtype=self.dtype)(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                'gamma',
                lambda k, s: self.layer_scale_init_value * jnp.ones(s),
                (self.filters,))
            # params live in f32; compute in the block dtype like nn.Conv
            y = gamma.astype(y.dtype) * y
        if self.use_1x1conv:
            inp = Conv(self.filters, (1, 1), dtype=self.dtype)(inp)
        return inp + DropPath(self.drop_path)(y, training)


class LocalizedConvBlock(nn.Module):
    """Location-specific weights (reference: dl4ds/models/blocks.py:312-336):
    transition to `filters` channels, then a per-pixel 1x1 locally connected
    layer — expressed here as a [H, W, Cin, F] weight tensor contracted with
    einsum, which XLA lowers to one batched matmul. Requires static spatial
    dims (same constraint as the reference, sp_preups.py:96-99)."""
    filters: int = 2
    activation: Optional[str] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = TransitionBlock(self.filters, dtype=self.dtype)(x, training)
        h, w, cin = y.shape[-3], y.shape[-2], y.shape[-1]
        # Per-position glorot (fans = cin/filters, h*w treated as batch):
        # matches the per-position Dense semantics of the reference's 1x1
        # LocallyConnected2D (ref blocks.py:321-327, glorot_uniform default).
        kernel = self.param(
            'local_kernel',
            nn.initializers.glorot_uniform(batch_axis=(0, 1)),
            (h, w, cin, self.filters))
        out = jnp.einsum('...hwc,hwcf->...hwf', y,
                         kernel.astype(y.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        if self.use_bias:
            bias = self.param('local_bias', nn.initializers.zeros,
                              (h, w, self.filters))
            out = out + bias.astype(y.dtype)
        return get_activation(self.activation)(out)


class _ConvLSTMCell(nn.Module):
    """One ConvLSTM step given precomputed input-gate activations. Keras gate
    semantics: i, f, c, o order; hard-sigmoid recurrent activation; tanh
    state activation."""
    filters: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, zx_t):
        h_t, c_t = carry
        z = zx_t + Conv(4 * self.filters, self.kernel_size, padding='SAME',
                           use_bias=False, dtype=self.dtype,
                           kernel_init=nn.initializers.orthogonal(),
                           name='recurrent_conv')(h_t)
        zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
        i = _hard_sigmoid(zi)
        f = _hard_sigmoid(zf)
        c_new = f * c_t + i * jnp.tanh(zc)
        o = _hard_sigmoid(zo)
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new


def _unit_forget_bias(key, shape, dtype=jnp.float32):
    """Keras ConvLSTM2D unit_forget_bias=True: bias zeros except the
    forget-gate quarter set to 1 (gate order i, f, c, o) — the forget gate
    starts open (~hard_sigmoid(1) = 0.7) so early gradients flow through
    the cell state."""
    (n4,) = shape
    f = n4 // 4
    return jnp.zeros(shape, dtype).at[f:2 * f].set(1.0)


class _ConvParamShim(nn.Module):
    """Creates conv kernel (+ optional bias) params at an nn.Conv-compatible
    path and with matching initializers, so the fused-Pallas whole-layer
    path shares checkpoints interchangeably with the step-wise XLA path
    (input_conv/{kernel,bias} and cell/recurrent_conv/kernel)."""
    shape: Tuple[int, int, int, int]                      # [kh, kw, Cin, Co]
    use_bias: bool = False
    kernel_init: Any = _GLOROT
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', self.kernel_init, self.shape)
        if not self.use_bias:
            return kernel, None
        return kernel, self.param('bias', self.bias_init,
                                  (self.shape[-1],))


class _CellShim(nn.Module):
    """Nests the recurrent-conv param under the 'cell' scope, matching the
    scan/loop path's `_ConvLSTMCell(name='cell')` tree."""
    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        k, _ = _ConvParamShim(self.shape, use_bias=False,
                              kernel_init=nn.initializers.orthogonal(),
                              name='recurrent_conv')()
        return k


class ConvLSTM2D(nn.Module):
    """ConvLSTM over [B, T, H, W, C] returning sequences (reference backbone
    layer: dl4ds/models/blocks.py:350-355 uses keras ConvLSTM2D).

    Keras-default initializers (glorot_uniform input kernel, orthogonal
    recurrent kernel, unit_forget_bias) on both the fused and XLA paths.

    TPU-first structure: the input convolution is hoisted out of the
    recurrence and applied to the whole window at once (one big MXU conv over
    B*T samples); only the recurrent conv + gates run inside the recurrence.
    On TPU the recurrence itself runs as ONE fused Pallas kernel per batch
    tile (ops/pallas_convlstm: h/c stay in VMEM for the whole window,
    im2col+MXU recurrent conv, BPTT backward fused the same way) — XLA's
    step-wise lowering pays ~6 kernel launches of fixed overhead per
    timestep at dl4ds state sizes. Set DL4DS_NO_PALLAS_CONVLSTM=1 to force
    the XLA path. Off-TPU (and as the fallback for shapes that don't fit
    VMEM): short windows are UNROLLED as a plain loop, long windows use
    `nn.scan`; `unroll=None` picks automatically (full unroll for
    T <= _UNROLL_MAX_T)."""
    filters: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32
    unroll: Optional[int] = None
    use_pallas: Optional[bool] = None

    _UNROLL_MAX_T = 16

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, t, h, w, cin = x.shape
        f = self.filters
        use_pallas = self.use_pallas
        if use_pallas is None:
            import os
            # default-on for TPU, single- or multi-device: the kernel
            # carries an explicit custom_partitioning rule (batch sharded,
            # weights replicated, weight-grads psum-reduced), so under a
            # data-parallel mesh each device runs the validated single-chip
            # lowering on its local batch — no silent all-gather. The
            # partitioning behavior is pinned by tests on the 8-device CPU
            # mesh (test_pallas_ops.py::test_fused_convlstm_under_batch_
            # sharding); DL4DS_NO_PALLAS_CONVLSTM=1 forces the XLA path.
            # A symbolic batch dim (jax.export batch='poly' traces) cannot
            # be tiled by the kernel — fall back to the XLA recurrence.
            use_pallas = (jax.default_backend() == 'tpu'
                          and isinstance(b, int)
                          and not os.environ.get('DL4DS_NO_PALLAS_CONVLSTM'))
        if use_pallas:
            from ..ops.pallas_convlstm import fused_convlstm
            kh, kw = self.kernel_size
            wx, bxb = _ConvParamShim(
                (kh, kw, cin, 4 * f), use_bias=True,
                kernel_init=nn.initializers.glorot_uniform(),
                bias_init=_unit_forget_bias, name='input_conv')()
            wh = _CellShim((kh, kw, f, 4 * f), name='cell')()
            # cast inputs like Conv(dtype=...) would on the XLA path;
            # `training` is a MODE hint for the dispatcher — the cin=F=16
            # valley runs the fused forward for inference (2.6x XLA) but
            # XLA's joint fwd+bwd program for training (measured faster
            # than fused-fwd + split-bwd; dispatch_info 'train-slower')
            return fused_convlstm(x.astype(self.dtype),
                                  wx.astype(self.dtype),
                                  bxb.astype(self.dtype),
                                  wh.astype(self.dtype),
                                  training=training)
        # Input conv over the whole window at once, with [B, T] flattened to
        # one batch axis: XLA:TPU lowers rank-5 convs far slower than the
        # identical rank-4 program (see nets.py head note; measured ~25x).
        zx = Conv(4 * f, self.kernel_size, padding='SAME',
                     dtype=self.dtype,
                     kernel_init=nn.initializers.glorot_uniform(),
                     bias_init=_unit_forget_bias, name='input_conv')(
                         x.reshape(b * t, h, w, cin))
        zx = zx.reshape(b, t, h, w, 4 * f)                    # [B,T,H,W,4F]
        unroll = self.unroll
        if unroll is None:
            unroll = t if t <= self._UNROLL_MAX_T else 1
        # carry in self.dtype (NOT x.dtype): for bf16 models the fused
        # Pallas kernel runs and returns bf16 end-to-end, so the XLA path
        # must too — an f32 carry here would make the two paths diverge in
        # both numerics and output dtype (toggling DL4DS_NO_PALLAS_CONVLSTM
        # or moving CPU<->TPU would change model behavior)
        init = (jnp.zeros((b, h, w, f), self.dtype),
                jnp.zeros((b, h, w, f), self.dtype))
        if unroll >= t:
            # Full unroll as a plain loop: slice zx[:, i] in place instead of
            # transposing to [T,B,...] and scanning — avoids the moveaxis
            # transposes and per-step output stacking XLA emits for scan.
            cell = _ConvLSTMCell(self.filters, self.kernel_size, self.dtype,
                                 name='cell')
            carry, ys = init, []
            for i in range(t):
                carry, y = cell(carry, zx[:, i])
                ys.append(y)
            return jnp.stack(ys, axis=1)                      # [B,T,H,W,F]
        zx = jnp.moveaxis(zx, 1, 0)                           # [T,B,H,W,4F]
        scan = nn.scan(_ConvLSTMCell, variable_broadcast='params',
                       split_rngs={'params': False}, in_axes=0, out_axes=0,
                       unroll=unroll)
        _, ys = scan(self.filters, self.kernel_size, self.dtype,
                     name='cell')(init, zx)
        return jnp.moveaxis(ys, 0, 1)                         # [B,T,H,W,F]


class RecurrentConvBlock(nn.Module):
    """Two stacked ConvLSTM layers with norm/activation/dropout
    (reference: dl4ds/models/blocks.py:339-398)."""
    filters: int
    ks_cl1: Tuple[int, int] = (5, 5)
    ks_cl2: Tuple[int, int] = (3, 3)
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        y = Dropout(self.dropout_rate, self.dropout_variant, dim=3)(x, training)
        y = ConvLSTM2D(self.filters, self.ks_cl1, dtype=self.dtype)(
            y, training)
        y = _Norm(self.normalization, self.dtype)(y, training)
        y = act(y)
        y = Dropout(self.dropout_rate, self.dropout_variant, dim=3)(y, training)
        y = ConvLSTM2D(self.filters, self.ks_cl2, dtype=self.dtype)(
            y, training)
        y = _Norm(self.normalization, self.dtype)(y, training)
        return act(y)


class SubpixelConvolutionBlock(nn.Module):
    """Sub-pixel convolution upsampler (reference: dl4ds/models/blocks.py:
    401-454): conv to filters*r^2 then pixel shuffle; composite factors
    2*2=4, 2*2*2=8, 2*5=10, 2*2*5=20, direct otherwise. Like the
    reference (blocks.py:415, one `self.conv2x` layer reused by every x2
    stage), the x2 conv weights are SHARED across stages — scale 4/8 is a
    weight-tied repeated pixel-shuffle, not independent convs."""
    scale: int
    n_filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # single module instances, reused -> tied params (ref blocks.py:415)
        conv2x = Conv(self.n_filters * 4, (3, 3), padding='SAME',
                         dtype=self.dtype, name='conv2x')
        conv5x = Conv(self.n_filters * 25, (3, 3), padding='SAME',
                         dtype=self.dtype, name='conv5x')

        def up(x, factor):
            if factor == 2:
                y = conv2x(x)
            elif factor == 5:
                y = conv5x(x)
            else:
                y = Conv(self.n_filters * factor ** 2, (3, 3),
                            padding='SAME', dtype=self.dtype,
                            name='convNx')(x)
            return depth_to_space(y, factor)

        s = self.scale
        if s == 2:
            return up(x, 2)
        if s == 4:
            return up(up(x, 2), 2)
        if s == 8:
            return up(up(up(x, 2), 2), 2)
        if s == 10:
            return up(up(x, 2), 5)
        if s == 20:
            return up(up(up(x, 2), 2), 5)
        return up(x, s)


# keras.Resizing vocabulary -> interpolation.py engine modes. 'gaussian'
# and 'mitchellcubic' are documented APPROXIMATIONS (nearest smooth
# kernels the matmul engine implements); anything else raises.
_RC_INTERP = {'bilinear': 'bilinear', 'nearest': 'nearest',
              'bicubic': 'bicubic', 'area': 'inter_area',
              'inter_area': 'inter_area', 'lanczos3': 'lanczos',
              'lanczos5': 'lanczos', 'lanczos': 'lanczos',
              'gaussian': 'bilinear', 'mitchellcubic': 'bicubic'}


class ResizeConvolutionBlock(nn.Module):
    """Interpolation upsampling followed by a 3x3 conv — the
    anti-checkerboard upsampler (reference: dl4ds/models/blocks.py:457-491)."""
    scale: int
    n_filters: int
    interpolation: str = 'bilinear'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        if self.interpolation not in _RC_INTERP:
            raise ValueError(
                f'unknown rc interpolation {self.interpolation!r}; one of '
                f'{sorted(_RC_INTERP)}')
        y = resize2d(x, (int(h * self.scale), int(w * self.scale)),
                     _RC_INTERP[self.interpolation])
        return Conv(self.n_filters, (3, 3), padding='SAME',
                       dtype=self.dtype)(y.astype(x.dtype))


class DeconvolutionBlock(nn.Module):
    """Transposed-convolution upsampler (reference: dl4ds/models/blocks.py:
    494-534): 9x9 kernels, x2 chains for scales 4 and 8."""
    scale: int
    n_filters: int
    output_activation: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.output_activation)

        def deconv(x, stride, name, activate):
            y = ConvTranspose(self.n_filters, (9, 9),
                                 strides=(stride, stride), padding='SAME',
                                 use_bias=False, dtype=self.dtype,
                                 name=name)(x)
            return act(y) if activate else y

        if self.scale == 4:
            x = deconv(x, 2, 'deconv_1of2', False)
            return deconv(x, 2, 'deconv_2of2', True)
        if self.scale == 8:
            # the reference REUSES its second deconv for the third stage
            # (blocks.py:528-531 applies conv2dtranspose2 twice) — tie the
            # weights so parameter counts and weight transplant match
            x = deconv(x, 2, 'deconv_1of3', False)
            stage23 = ConvTranspose(self.n_filters, (9, 9),
                                       strides=(2, 2), padding='SAME',
                                       use_bias=False, dtype=self.dtype,
                                       name='deconv_2of3')
            x = act(stage23(x))
            return act(stage23(x))
        return deconv(x, self.scale, f'deconv_x{self.scale}', True)


class EncoderBlock(nn.Module):
    """U-Net encoder step: ConvBlock then 2x2 maxpool; returns
    (downsampled, skip) (reference: dl4ds/models/blocks.py:602-618)."""
    n_filters: int
    activation: Optional[str] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    normalization: Optional[str] = None
    attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = ConvBlock(self.n_filters, activation=self.activation,
                      dropout_rate=self.dropout_rate,
                      dropout_variant=self.dropout_variant,
                      normalization=self.normalization,
                      attention=self.attention, dtype=self.dtype)(x, training)
        down = nn.max_pool(y, (2, 2), strides=(2, 2))
        return down, y


class PadConcat(nn.Module):
    """Module form of `pad_concat` (reference class name,
    dl4ds/models/blocks.py:621-656)."""

    @nn.compact
    def __call__(self, t1, t2):
        return pad_concat(t1, t2)


def pad_concat(t1, t2):
    """Zero-pad two NHWC tensors to matching spatial dims and concatenate on
    channels (reference: dl4ds/models/blocks.py:621-656)."""
    y1, x1 = t1.shape[-3], t1.shape[-2]
    y2, x2 = t2.shape[-3], t2.shape[-2]

    def pad_to(t, ty, tx):
        cfg = [(0, 0)] * t.ndim
        cfg[-3] = (0, ty - t.shape[-3])
        cfg[-2] = (0, tx - t.shape[-2])
        return jnp.pad(t, cfg)

    ty, tx = max(y1, y2), max(x1, x2)
    if (y1, x1) != (ty, tx):
        t1 = pad_to(t1, ty, tx)
    if (y2, x2) != (ty, tx):
        t2 = pad_to(t2, ty, tx)
    return jnp.concatenate([t1, t2], axis=-1)
