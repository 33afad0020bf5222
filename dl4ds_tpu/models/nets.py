"""
Network architectures (Flax linen).

Re-designs of the reference's five model factories and the conditional
discriminator (dl4ds/models/sp_postups.py, sp_preups.py, spt_postups.py,
spt_preups.py, discriminator.py). Structure and channel-growth schedules are
kept for weight-count parity; the implementation is functional Flax with a
shared backbone builder.

All modules take NHWC ([B, H, W, C]) or NTHWC ([B, T, H, W, C]) inputs and
support an optional HR auxiliary input `aux` ([B, H, W, A]). Convs accept
any leading batch dims, so spatio-temporal models apply their 2D heads
per-timestep without explicit TimeDistributed wrappers.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import (ConvBlock, ResidualBlock, DenseBlock, TransitionBlock,
                     ConvNextBlock, LocalizedConvBlock, RecurrentConvBlock,
                     SubpixelConvolutionBlock, ResizeConvolutionBlock,
                     DeconvolutionBlock, EncoderBlock, Dropout, pad_concat,
                     get_activation, Conv)
from ..interpolation import resize2d

Dtype = Any


class _Backbone(nn.Module):
    """Shared backbone: stem conv + N blocks with filters growing as
    i * n_filters, followed by the reference's per-backbone merge with the
    stem (reference: dl4ds/models/sp_postups.py:118-168)."""
    backbone: str
    n_filters: int
    n_blocks: int
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    attention: bool = False
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        bb, f0 = self.backbone, self.n_filters
        # rematerialization: recompute block activations in the backward pass
        # instead of storing them (jax.checkpoint via nn.remat) — trades
        # FLOPs for HBM on deep backbones / large patches
        wrap = nn.remat if self.remat else (lambda cls: cls)
        ConvBlock_, ResidualBlock_, DenseBlock_, ConvNextBlock_ = (
            wrap(ConvBlock), wrap(ResidualBlock), wrap(DenseBlock),
            wrap(ConvNextBlock))
        ks = (7, 7) if bb == 'convnext' else (3, 3)
        stem = Conv(f0, ks, padding='SAME', dtype=self.dtype,
                       name='stem')(x)
        b = stem
        n_filters = f0
        if bb == 'convnext':
            for i in range(self.n_blocks):
                n_filters = f0 * (i + 1)
                b = ConvNextBlock_(
                    filters=n_filters, drop_path=0.0,
                    normalization=self.normalization,
                    use_1x1conv=(i != 0), activation=self.activation,
                    dtype=self.dtype, name=f'ConvNextBlock{i + 1}')(b, training)
            skip = TransitionBlock(n_filters, activation=self.activation,
                                   dtype=self.dtype)(stem, training)
            return skip + b, n_filters
        for i in range(self.n_blocks):
            n_filters = f0 * (i + 1)
            if bb == 'convnet':
                b = ConvBlock_(
                    n_filters, activation=self.activation,
                    dropout_rate=self.dropout_rate,
                    dropout_variant=self.dropout_variant,
                    normalization=self.normalization,
                    attention=self.attention, dtype=self.dtype,
                    name=f'ConvBlock{i + 1}')(b, training)
            elif bb == 'resnet':
                b = ResidualBlock_(
                    n_filters, activation=self.activation,
                    dropout_rate=self.dropout_rate,
                    dropout_variant=self.dropout_variant,
                    normalization=self.normalization,
                    use_1x1conv=(i != 0), attention=self.attention,
                    dtype=self.dtype, name=f'ResidualBlock{i + 1}')(b, training)
            elif bb == 'densenet':
                b = DenseBlock_(
                    n_filters, activation=self.activation,
                    dropout_rate=self.dropout_rate,
                    dropout_variant=self.dropout_variant,
                    normalization=self.normalization,
                    attention=self.attention, dtype=self.dtype,
                    name=f'DenseBlock{i + 1}')(b, training)
                b = TransitionBlock(b.shape[-1] // 2, dtype=self.dtype,
                                    name=f'Transition{i + 1}')(b, training)
            else:
                raise ValueError(f'unsupported backbone {bb}')
        b = Conv(n_filters, ks, padding='SAME', dtype=self.dtype,
                    name='backbone_out_conv')(b)
        b = get_activation(self.activation)(b)
        b = Dropout(self.dropout_rate, self.dropout_variant)(b, training)
        if bb == 'convnet':
            x_out = b
        elif bb == 'resnet':
            skip = TransitionBlock(n_filters, activation=self.activation,
                                   dtype=self.dtype)(stem, training)
            x_out = skip + b
        elif bb == 'densenet':
            x_out = jnp.concatenate([stem, b], axis=-1)
            x_out = TransitionBlock(n_filters, activation=self.activation,
                                    dtype=self.dtype,
                                    name='TransitionBackboneLast')(x_out,
                                                                   training)
        return x_out, n_filters


class _OutputModule(nn.Module):
    """Shared output head: Transition -> ConvBlock(attention) ->
    ConvBlock(n_channels_out) (reference: dl4ds/models/sp_postups.py:205-212).
    """
    n_filters: int
    n_channels_out: int
    ks: Tuple[int, int] = (3, 3)
    activation: Optional[str] = 'relu'
    output_activation: Optional[str] = None
    normalization: Optional[str] = None
    dropout_rate: float = 0.0
    attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = TransitionBlock(self.n_filters, dtype=self.dtype,
                            name='TransitionLast')(x, training)
        x = ConvBlock(self.n_filters, ks_cl1=self.ks, ks_cl2=self.ks,
                      activation=None, dropout_rate=self.dropout_rate,
                      normalization=self.normalization,
                      attention=self.attention,
                      dtype=self.dtype)(x, training)
        x = ConvBlock(self.n_channels_out, ks_cl1=self.ks, ks_cl2=self.ks,
                      activation=self.output_activation, dropout_rate=0.0,
                      normalization=self.normalization, attention=False,
                      dtype=self.dtype)(x, training)
        return x


class _AuxBranch(nn.Module):
    """Processes the HR auxiliary (static vars + season) input
    (reference: dl4ds/models/sp_postups.py:190-201)."""
    backbone: str
    n_filters: int
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s, training: bool = False):
        if self.backbone == 'convnext':
            return ConvNextBlock(
                filters=self.n_filters, drop_path=0.0,
                normalization=self.normalization, use_1x1conv=True,
                activation=self.activation, dtype=self.dtype,
                name='ConvNextBlock_aux')(s, training)
        return ConvBlock(self.n_filters, activation=self.activation,
                         dropout_rate=0.0, normalization=self.normalization,
                         attention=False, dtype=self.dtype,
                         name='ConvBlock_aux')(s, training)


class NetPostupsampling(nn.Module):
    """Spatial model with a post-upsampling head
    (reference: dl4ds/models/sp_postups.py:14-217). Input [B, h, w, C] at LR;
    output [B, h*scale, w*scale, n_channels_out]."""
    backbone: str
    upsampling: str
    scale: int
    n_channels_out: int = 1
    n_filters: int = 8
    n_blocks: int = 6
    normalization: Optional[str] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    attention: bool = False
    activation: Optional[str] = 'relu'
    output_activation: Optional[str] = None
    rc_interpolation: str = 'bilinear'
    localcon_layer: bool = False
    output_attention: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux=None, training: bool = False):
        ks = (7, 7) if self.backbone == 'convnext' else (3, 3)
        x, n_filters = _Backbone(
            self.backbone, self.n_filters, self.n_blocks, self.activation,
            self.normalization, self.attention, self.dropout_rate,
            self.dropout_variant, remat=self.remat, dtype=self.dtype)(
                x, training)
        if self.upsampling == 'spc':
            x = SubpixelConvolutionBlock(self.scale, n_filters,
                                         dtype=self.dtype)(x)
        elif self.upsampling == 'rc':
            x = ResizeConvolutionBlock(self.scale, n_filters,
                                       interpolation=self.rc_interpolation,
                                       dtype=self.dtype)(x)
        elif self.upsampling == 'dc':
            x = TransitionBlock(self.n_filters, activation=self.activation,
                                dtype=self.dtype,
                                name='TransitionDC')(x, training)
            x = DeconvolutionBlock(self.scale, n_filters,
                                   self.activation, dtype=self.dtype)(x)
        else:
            raise ValueError(f'bad post-upsampling: {self.upsampling}')
        if self.localcon_layer:
            lws = LocalizedConvBlock(filters=2, use_bias=True,
                                     dtype=self.dtype)(x, training)
            x = jnp.concatenate([x, lws], axis=-1)
        if aux is not None:
            s = _AuxBranch(self.backbone, n_filters, self.activation,
                           self.normalization, dtype=self.dtype)(aux, training)
            x = jnp.concatenate([x, s], axis=-1)
        return _OutputModule(self.n_filters, self.n_channels_out, ks,
                             self.activation, self.output_activation,
                             self.normalization, self.dropout_rate,
                             attention=self.output_attention,
                             dtype=self.dtype)(x, training)


class NetPIN(nn.Module):
    """Spatial pre-upsampled (pin) model
    (reference: dl4ds/models/sp_preups.py:13-189). Input already interpolated
    to the HR grid: [B, H, W, C] -> [B, H, W, n_channels_out]."""
    backbone: str
    n_channels_out: int = 1
    n_filters: int = 8
    n_blocks: int = 6
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    normalization: Optional[str] = None
    attention: bool = False
    activation: Optional[str] = 'relu'
    output_activation: Optional[str] = None
    localcon_layer: bool = False
    output_attention: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux=None, training: bool = False):
        ks = (7, 7) if self.backbone == 'convnext' else (3, 3)
        x, n_filters = _Backbone(
            self.backbone, self.n_filters, self.n_blocks, self.activation,
            self.normalization, self.attention, self.dropout_rate,
            self.dropout_variant, remat=self.remat, dtype=self.dtype)(
                x, training)
        if self.localcon_layer:
            lws = LocalizedConvBlock(filters=2, use_bias=True,
                                     dtype=self.dtype)(x, training)
            x = jnp.concatenate([x, lws], axis=-1)
        if aux is not None:
            s = _AuxBranch(self.backbone, n_filters, self.activation,
                           self.normalization, dtype=self.dtype)(aux, training)
            x = jnp.concatenate([x, s], axis=-1)
        return _OutputModule(self.n_filters, self.n_channels_out, ks,
                             self.activation, self.output_activation,
                             self.normalization, self.dropout_rate,
                             attention=self.output_attention,
                             dtype=self.dtype)(x, training)


class UnetPIN(nn.Module):
    """U-Net encoder/decoder with pre-upsampling
    (reference: dl4ds/models/sp_preups.py:192-315). Filters double per
    encoder level, capped at `width_cap`; decoder upsamples 2x per level with
    the chosen method and concatenates padded skip connections."""
    backbone: str = 'unet'
    n_channels_out: int = 1
    n_filters: int = 8
    n_blocks: int = 6
    activation: Optional[str] = 'relu'
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    normalization: Optional[str] = None
    attention: bool = False
    decoder_upsampling: str = 'rc'
    rc_interpolation: str = 'bilinear'
    output_activation: Optional[str] = None
    width_cap: int = 256
    localcon_layer: bool = False
    output_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux=None, training: bool = False):
        # depth is pinned at BUILD time by the factory (_check_nblocks on
        # hr_size, like the reference's static Input shape) — recomputing
        # it from the runtime input would change the parameter tree when a
        # patch-trained model runs full-grid inference
        n_blocks = self.n_blocks
        n_filters = self.n_filters
        skips, filt_list = [], []
        for i in range(n_blocks):
            x, skip = EncoderBlock(
                n_filters=n_filters, activation=self.activation,
                dropout_rate=0.0, dropout_variant=self.dropout_variant,
                normalization=self.normalization, attention=self.attention,
                dtype=self.dtype, name=f'EncoderBlock{i + 1}')(x, training)
            skips.append(skip)
            filt_list.append(n_filters)
            n_filters = min(self.width_cap, n_filters * 2)
        # bottleneck without normalization, following Isola et al. 2016
        x = ConvBlock(n_filters, activation=self.activation,
                      dropout_rate=self.dropout_rate,
                      dropout_variant=self.dropout_variant,
                      normalization=None, dtype=self.dtype,
                      name='Bottleneck')(x, training)
        for j, skip in enumerate(reversed(skips)):
            n_filters = filt_list[::-1][j]
            if self.decoder_upsampling == 'spc':
                x = SubpixelConvolutionBlock(2, n_filters,
                                             dtype=self.dtype)(x)
            elif self.decoder_upsampling == 'rc':
                x = ResizeConvolutionBlock(
                    2, n_filters, interpolation=self.rc_interpolation,
                    dtype=self.dtype)(x)
            elif self.decoder_upsampling == 'dc':
                x = DeconvolutionBlock(2, n_filters, self.activation,
                                       dtype=self.dtype)(x)
            else:
                raise ValueError(
                    f'bad decoder_upsampling: {self.decoder_upsampling}')
            x = pad_concat(x, skip)
            x = ConvBlock(n_filters, activation=self.activation,
                          dropout_rate=0.0,
                          dropout_variant=self.dropout_variant,
                          normalization=self.normalization,
                          attention=self.attention, dtype=self.dtype,
                          name=f'DecoderConvBlock{j + 1}')(x, training)
        x = Dropout(self.dropout_rate, self.dropout_variant)(x, training)
        if self.localcon_layer:
            lws = LocalizedConvBlock(filters=2, use_bias=True,
                                     dtype=self.dtype)(x, training)
            x = jnp.concatenate([x, lws], axis=-1)
        if aux is not None:
            s = ConvBlock(n_filters, activation=self.activation,
                          dropout_rate=0.0, normalization=self.normalization,
                          attention=False, dtype=self.dtype)(aux, training)
            x = jnp.concatenate([x, s], axis=-1)
        return _OutputModule(self.n_filters, self.n_channels_out, (3, 3),
                             self.activation, self.output_activation,
                             self.normalization, self.dropout_rate,
                             attention=self.output_attention,
                             dtype=self.dtype)(x, training)


def _check_nblocks(shape, power):
    """Auto-shrink U-Net depth so the grid stays >= 2 px at the bottleneck
    (reference: dl4ds/models/sp_preups.py:318-324); warns like the
    reference when shrinking."""
    requested = power
    while shape[0] // 2 ** power < 2 or shape[1] // 2 ** power < 2:
        power -= 1
    if power != requested:
        import warnings
        warnings.warn(
            f'`n_blocks` of the U-Net encoder reduced {requested} -> '
            f'{power} so the {shape} grid stays >= 2 px at the bottleneck',
            RuntimeWarning)
    return power


class _RecBackbone(nn.Module):
    """Spatio-temporal backbone: stem RecurrentConvBlock + N recurrent blocks
    + merge (reference: dl4ds/models/spt_postups.py:105-123)."""
    backbone: str
    n_filters: int
    n_blocks: int
    activation: Optional[str] = 'relu'
    normalization: Optional[str] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, trunk_fn=None):
        x0 = b = RecurrentConvBlock(
            self.n_filters, activation=self.activation,
            normalization=self.normalization, dtype=self.dtype,
            name='RecurrentConvBlock1')(x, training)
        if trunk_fn is not None:
            # pipeline-parallel hook (parallel.make_pipeline_step): the
            # homogeneous trunk (blocks 2..n_blocks+1, all width n_filters)
            # is computed externally — e.g. rotated across a 'pipe' mesh
            # axis — from the stem output; those submodules are then never
            # instantiated here, so their params live outside this tree
            b = trunk_fn(x0)
        else:
            for i in range(self.n_blocks):
                b = RecurrentConvBlock(
                    self.n_filters, activation=self.activation,
                    normalization=self.normalization,
                    dropout_rate=self.dropout_rate,
                    dropout_variant=self.dropout_variant, dtype=self.dtype,
                    name=f'RecurrentConvBlock{i + 2}')(b, training)
        b = Dropout(self.dropout_rate, self.dropout_variant, dim=3)(b,
                                                                    training)
        if self.backbone == 'convnet':
            return b
        if self.backbone == 'resnet':
            return x0 + b
        if self.backbone == 'densenet':
            return jnp.concatenate([x0, b], axis=-1)
        raise ValueError(f'unsupported recurrent backbone {self.backbone}')


class RecNetPostupsampling(nn.Module):
    """Spatio-temporal (ConvLSTM) model with post-upsampling
    (reference: dl4ds/models/spt_postups.py:12-163). Input [B, T, h, w, C];
    the upsampling head and LCB apply per-timestep; the aux branch output is
    broadcast over time."""
    backbone: str
    upsampling: str
    scale: int
    time_window: int
    n_channels_out: int = 1
    n_filters: int = 8
    n_blocks: int = 4
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    normalization: Optional[str] = None
    attention: bool = False
    activation: Optional[str] = 'relu'
    output_activation: Optional[str] = None
    rc_interpolation: str = 'bilinear'
    localcon_layer: bool = False
    # global channel attention in the output head (reference parity);
    # False makes halo-tiled inference exact (same knob as the spatial nets)
    output_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux=None, training: bool = False, trunk_fn=None):
        x = _RecBackbone(self.backbone, self.n_filters, self.n_blocks,
                         self.activation, self.normalization,
                         self.dropout_rate, self.dropout_variant,
                         dtype=self.dtype)(x, training, trunk_fn)
        n_filters_ups = x.shape[-1] if self.backbone == 'densenet' \
            else self.n_filters
        # The whole head is per-timestep ("TimeDistributed" in the
        # reference); run it with [B, T] flattened to one batch axis —
        # XLA:TPU lowers rank-5 convs/pixel-shuffles ~25x slower than the
        # identical rank-4 program (measured: spc head 1.54 ms vs 0.06 ms).
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b * t, *x.shape[2:])
        if self.upsampling == 'spc':
            x = SubpixelConvolutionBlock(self.scale, n_filters_ups,
                                         dtype=self.dtype)(x)
        elif self.upsampling == 'rc':
            x = ResizeConvolutionBlock(self.scale, n_filters_ups,
                                       interpolation=self.rc_interpolation,
                                       dtype=self.dtype)(x)
        elif self.upsampling == 'dc':
            x = DeconvolutionBlock(self.scale, n_filters_ups,
                                   dtype=self.dtype)(x)
        else:
            raise ValueError(f'bad post-upsampling: {self.upsampling}')
        if aux is not None:
            s = ConvBlock(self.n_filters, activation=self.activation,
                          dropout_rate=0.0, normalization=None,
                          attention=self.attention, dtype=self.dtype)(aux,
                                                                      training)
            s = jnp.repeat(s, t, axis=0)   # broadcast over time ([b*t] major)
            x = jnp.concatenate([x, s], axis=-1)
        if self.localcon_layer:
            lws = LocalizedConvBlock(filters=2, use_bias=True,
                                     dtype=self.dtype)(x, training)
            x = jnp.concatenate([x, lws], axis=-1)
        x = TransitionBlock(x.shape[-1] // 2, dtype=self.dtype,
                            name='TransitionLast')(x, training)
        x = ConvBlock(self.n_filters, activation=None,
                      dropout_rate=self.dropout_rate,
                      normalization=self.normalization,
                      attention=self.output_attention,
                      # reference rank-5 quirk: the spt head's attention
                      # pools over (T, H) and gates per (W, C) — see
                      # ChannelAttention2D.time_window
                      attention_time=t,
                      dtype=self.dtype)(x, training)
        x = ConvBlock(self.n_channels_out,
                      activation=self.output_activation, dropout_rate=0.0,
                      normalization=self.normalization, attention=False,
                      dtype=self.dtype)(x, training)
        return x.reshape(b, t, *x.shape[1:])


class RecNetPIN(nn.Module):
    """Spatio-temporal pre-upsampled model
    (reference: dl4ds/models/spt_preups.py:12-144). Input [B, T, H, W, C]."""
    backbone: str
    time_window: int
    n_channels_out: int = 1
    n_filters: int = 8
    n_blocks: int = 6
    normalization: Optional[str] = None
    dropout_rate: float = 0.0
    dropout_variant: Optional[str] = None
    attention: bool = False
    activation: Optional[str] = 'relu'
    output_activation: Optional[str] = None
    localcon_layer: bool = False
    # see RecNetPostupsampling.output_attention
    output_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, aux=None, training: bool = False, trunk_fn=None):
        x = _RecBackbone(self.backbone, self.n_filters, self.n_blocks,
                         self.activation, self.normalization,
                         self.dropout_rate, self.dropout_variant,
                         dtype=self.dtype)(x, training, trunk_fn)
        # Per-timestep head on a flattened [B*T] batch axis (see
        # RecNetPostupsampling: rank-5 convs are ~25x slower on XLA:TPU).
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b * t, *x.shape[2:])
        if aux is not None:
            s = ConvBlock(self.n_filters, activation=self.activation,
                          dropout_rate=0.0, normalization=None,
                          attention=self.attention, dtype=self.dtype)(aux,
                                                                      training)
            s = jnp.repeat(s, t, axis=0)   # broadcast over time ([b*t] major)
            x = jnp.concatenate([x, s], axis=-1)
        if self.localcon_layer:
            lws = LocalizedConvBlock(filters=2, use_bias=True,
                                     dtype=self.dtype)(x, training)
            x = jnp.concatenate([x, lws], axis=-1)
        x = TransitionBlock(self.n_filters, dtype=self.dtype,
                            name='TransitionLast')(x, training)
        x = ConvBlock(self.n_filters, activation=None,
                      dropout_rate=self.dropout_rate,
                      normalization=self.normalization,
                      attention=self.output_attention,
                      # reference rank-5 quirk: the spt head's attention
                      # pools over (T, H) and gates per (W, C) — see
                      # ChannelAttention2D.time_window
                      attention_time=t,
                      dtype=self.dtype)(x, training)
        x = ConvBlock(self.n_channels_out,
                      activation=self.output_activation, dropout_rate=0.0,
                      normalization=self.normalization, attention=False,
                      dtype=self.dtype)(x, training)
        return x.reshape(b, t, *x.shape[1:])


class ResidualDiscriminator(nn.Module):
    """Two-branch conditional discriminator
    (reference: dl4ds/models/discriminator.py:11-81): an LR-input branch and
    an HR-candidate branch downsampled to the LR grid, concatenated, pooled
    and classified. For post-upsampling models the HR branch is reduced by
    strided convs: scale == 4 uses two SAME stride-2 convs, scale == 5 uses
    the reference's two VALID stride-2 convs + bottom/right crop
    (discriminator.py:54-57) whenever that chain lands exactly on
    ``lr_size`` (it does for e.g. LR 8 or 10, the tutorial sizes, but is
    shape-inconsistent for e.g. LR 12 — there, and for all other scales,
    bilinear resize is used; the reference would crash at concat)."""
    n_channels: int
    upsampling: str
    is_spatiotemporal: bool
    scale: int
    lr_size: Tuple[int, int]
    n_filters: int = 8
    n_res_blocks: int = 4
    normalization: Optional[str] = None
    activation: Optional[str] = 'relu'
    attention: bool = False
    dtype: Dtype = jnp.float32

    def _valid_chain_fits(self, hr_shape):
        """True iff the reference's scale-5 chain (two 3x3 VALID stride-2
        convs, then crop 1 from bottom/right) maps this HR shape exactly
        onto ``lr_size`` so the two branches can concatenate."""
        def out(n):
            return (n - 3) // 2 + 1
        h, w = hr_shape[-3], hr_shape[-2]
        return (out(out(h)) - 1, out(out(w)) - 1) == tuple(self.lr_size)

    @nn.compact
    def __call__(self, x, x_ref, training: bool = False):
        f = self.n_filters
        # branch 1: LR input
        bt = None
        if self.is_spatiotemporal:
            x1 = b = RecurrentConvBlock(f, activation=self.activation,
                                        normalization='ln', dropout_rate=0.0,
                                        dtype=self.dtype)(x, training)
            # Everything after the recurrent stem is per-timestep: run it
            # with [B, T] flattened to one batch axis (rank-5 convs are ~25x
            # slower on XLA:TPU, see RecNetPostupsampling) and undo the
            # flattening at the global pool, where mean over the merged rows
            # equals the reference's GlobalAveragePooling3D over (T, H, W).
            bt = (x1.shape[0], x1.shape[1])
            x1 = b = x1.reshape(bt[0] * bt[1], *x1.shape[2:])
            x_ref = x_ref.reshape(bt[0] * bt[1], *x_ref.shape[2:])
        else:
            x1 = b = Conv(f, (3, 3), padding='SAME', dtype=self.dtype)(x)
        for i in range(self.n_res_blocks):
            b = ResidualBlock(f, normalization=self.normalization,
                              attention=self.attention, dtype=self.dtype,
                              name=f'ResidualBlock{i + 1}_branch1')(b, training)
        b = Conv(f, (3, 3), padding='SAME', dtype=self.dtype)(b)
        x1 = x1 + b
        # branch 2: HR reference or generated candidate
        x2 = c = Conv(f, (3, 3), padding='SAME', dtype=self.dtype)(x_ref)
        for i in range(self.n_res_blocks):
            c = ResidualBlock(f, normalization=self.normalization,
                              attention=self.attention, dtype=self.dtype,
                              name=f'ResidualBlock{i + 1}_branch2')(c, training)
        from .. import POSTUPSAMPLING_METHODS
        if self.upsampling in POSTUPSAMPLING_METHODS:
            if self.scale == 4:
                c = Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                            dtype=self.dtype)(c)
                x2 = Conv(f, (3, 3), strides=(2, 2), padding='SAME',
                             dtype=self.dtype)(c)
            elif self.scale == 5 and self._valid_chain_fits(c.shape):
                c = Conv(f, (3, 3), strides=(2, 2), padding='VALID',
                            dtype=self.dtype)(c)
                x2 = Conv(f, (3, 3), strides=(2, 2), padding='VALID',
                             dtype=self.dtype)(c)
                x2 = x2[..., :-1, :-1, :]  # Cropping2D ((0,1),(0,1))
            else:
                x2 = resize2d(c, self.lr_size, 'bilinear').astype(c.dtype)
        else:  # pin
            c = Conv(f, (3, 3), padding='SAME', dtype=self.dtype)(c)
            x2 = x2 + c
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ResidualBlock(x.shape[-1], normalization=self.normalization,
                          attention=self.attention, dtype=self.dtype)(x,
                                                                      training)
        # global average pool over all non-batch, non-channel dims; for the
        # flattened spatio-temporal case also pool the window back to [B, C]
        axes = tuple(range(1, x.ndim - 1))
        x = jnp.mean(x, axis=axes)
        if bt is not None:
            x = x.reshape(*bt, x.shape[-1]).mean(axis=1)
        x = Dropout(0.4)(x, training)
        x = nn.Dense(32, dtype=self.dtype)(x)
        x = jax.nn.sigmoid(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x)
