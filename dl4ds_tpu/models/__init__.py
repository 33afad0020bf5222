"""
Model factories with the reference's public signatures
(dl4ds/models/__init__.py:1-6): net_postupsampling, net_pin, unet_pin,
recnet_postupsampling, recnet_pin, residual_discriminator — plus a single
`build_model(config)` dispatcher for the TPU-first API.

Factories return a `DSModel` wrapper: a Flax module bound to its metadata
(model name string with the `_spc/_rc/_dc/_pin` suffix contract the
reference's Predictor relies on — dl4ds/inference.py:172 — plus input specs
used for initialization and inference).
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils import (checkarg_backbone, checkarg_upsampling,
                     checkarg_dropout_variant)
from .nets import (NetPostupsampling, NetPIN, UnetPIN, RecNetPostupsampling,
                   RecNetPIN, ResidualDiscriminator, _check_nblocks)
from . import blocks

__all__ = ['DSModel', 'net_postupsampling', 'net_pin', 'unet_pin',
           'recnet_postupsampling', 'recnet_pin', 'residual_discriminator',
           'build_model', 'blocks', 'save_model', 'load_model']


@dataclasses.dataclass
class DSModel:
    """A configured model: Flax module + name + input specs.

    `name` follows the reference convention '<backbone>_<upsampling>' (e.g.
    'resnet_spc', 'recconvnet_pin') so downstream code can infer the
    upsampling mode from the suffix.
    """
    module: nn.Module
    name: str
    input_shape: Tuple[int, ...]                 # per-sample, no batch dim
    aux_shape: Optional[Tuple[int, ...]] = None  # per-sample, no batch dim

    @property
    def upsampling(self):
        return self.name.split('_')[-1]

    def dummy_inputs(self, batch_size=1, dtype=jnp.float32):
        x = jnp.zeros((batch_size,) + tuple(self.input_shape), dtype)
        aux = (jnp.zeros((batch_size,) + tuple(self.aux_shape), dtype)
               if self.aux_shape is not None else None)
        return x, aux

    def init(self, key, batch_size=1):
        """Initialize all variable collections (params [+ batch_stats])."""
        x, aux = self.dummy_inputs(batch_size)
        return self.module.init({'params': key, 'dropout': key}, x, aux,
                                training=False)

    def apply(self, variables, x, aux=None, training=False, rngs=None,
              mutable=False):
        return self.module.apply(variables, x, aux, training=training,
                                 rngs=rngs, mutable=mutable)

    def param_count(self, variables):
        return sum(p.size for p in jax.tree_util.tree_leaves(
            variables['params']))

    def summary(self, variables=None):
        lines = [f'Model: {self.name}',
                 f'  input: {self.input_shape}  aux: {self.aux_shape}']
        if variables is not None:
            lines.append(f'  parameters: {self.param_count(variables):,}')
        return '\n'.join(lines)


def net_postupsampling(backbone_block, upsampling, scale, n_channels,
                       n_aux_channels, lr_size, n_channels_out=1, n_filters=8,
                       n_blocks=6, normalization=None, dropout_rate=0,
                       dropout_variant=None, attention=False,
                       activation='relu', output_activation=None,
                       rc_interpolation='bilinear', localcon_layer=False,
                       output_attention=True, remat=False,
                       dtype=jnp.float32):
    """Spatial network + post-upsampling head
    (reference factory: dl4ds/models/sp_postups.py:14). `output_attention`
    keeps the reference's always-on output-head channel attention; set False
    for exact halo-tiled inference (see parallel.predict_tiled)."""
    backbone_block = checkarg_backbone(backbone_block)
    upsampling = checkarg_upsampling(upsampling)
    dropout_variant = checkarg_dropout_variant(dropout_variant)
    h_lr, w_lr = lr_size
    module = NetPostupsampling(
        backbone=backbone_block, upsampling=upsampling, scale=scale,
        n_channels_out=n_channels_out, n_filters=n_filters, n_blocks=n_blocks,
        normalization=normalization, dropout_rate=dropout_rate,
        dropout_variant=dropout_variant, attention=attention,
        activation=activation, output_activation=output_activation,
        rc_interpolation=rc_interpolation, localcon_layer=localcon_layer,
        output_attention=output_attention, remat=remat, dtype=dtype)
    aux_shape = ((int(h_lr * scale), int(w_lr * scale), n_aux_channels)
                 if n_aux_channels > 0 else None)
    return DSModel(module, f'{backbone_block}_{upsampling}',
                   (h_lr, w_lr, n_channels), aux_shape)


def net_pin(backbone_block, n_channels, n_aux_channels, hr_size,
            n_channels_out=1, n_filters=8, n_blocks=6, dropout_rate=0,
            dropout_variant=None, normalization=None, attention=False,
            activation='relu', output_activation=None, localcon_layer=False,
            output_attention=True, remat=False, dtype=jnp.float32):
    """Spatial pre-upsampled network
    (reference factory: dl4ds/models/sp_preups.py:13)."""
    backbone_block = checkarg_backbone(backbone_block)
    dropout_variant = checkarg_dropout_variant(dropout_variant)
    h_hr, w_hr = hr_size
    module = NetPIN(
        backbone=backbone_block, n_channels_out=n_channels_out,
        n_filters=n_filters, n_blocks=n_blocks, dropout_rate=dropout_rate,
        dropout_variant=dropout_variant, normalization=normalization,
        attention=attention, activation=activation,
        output_activation=output_activation, localcon_layer=localcon_layer,
        output_attention=output_attention, remat=remat, dtype=dtype)
    aux_shape = ((h_hr, w_hr, n_aux_channels) if n_aux_channels > 0 else None)
    return DSModel(module, f'{backbone_block}_pin', (h_hr, w_hr, n_channels),
                   aux_shape)


def unet_pin(backbone_block, n_channels, n_aux_channels, hr_size,
             n_filters=8, n_blocks=6, n_channels_out=1, activation='relu',
             dropout_rate=0, dropout_variant=None, normalization=None,
             attention=False, decoder_upsampling='rc',
             rc_interpolation='bilinear', output_activation=None,
             width_cap=256, localcon_layer=False, output_attention=True,
             dtype=jnp.float32):
    """U-Net pre-upsampled network
    (reference factory: dl4ds/models/sp_preups.py:192)."""
    backbone_block = checkarg_backbone(backbone_block)
    dropout_variant = checkarg_dropout_variant(dropout_variant)
    h_hr, w_hr = hr_size
    n_blocks = _check_nblocks((h_hr, w_hr), n_blocks)
    module = UnetPIN(
        backbone=backbone_block, n_channels_out=n_channels_out,
        n_filters=n_filters, n_blocks=n_blocks, activation=activation,
        dropout_rate=dropout_rate, dropout_variant=dropout_variant,
        normalization=normalization, attention=attention,
        decoder_upsampling=decoder_upsampling,
        rc_interpolation=rc_interpolation,
        output_activation=output_activation, width_cap=width_cap,
        localcon_layer=localcon_layer, output_attention=output_attention,
        dtype=dtype)
    aux_shape = ((h_hr, w_hr, n_aux_channels) if n_aux_channels > 0 else None)
    return DSModel(module, f'{backbone_block}_pin', (h_hr, w_hr, n_channels),
                   aux_shape)


def recnet_postupsampling(backbone_block, upsampling, scale, n_channels,
                          n_aux_channels, lr_size, time_window,
                          n_channels_out=1, n_filters=8, n_blocks=4,
                          dropout_rate=0, dropout_variant=None,
                          normalization=None, attention=False,
                          activation='relu', output_activation=None,
                          rc_interpolation='bilinear', localcon_layer=False,
                          output_attention=True, dtype=jnp.float32):
    """Spatio-temporal (ConvLSTM) network + post-upsampling head
    (reference factory: dl4ds/models/spt_postups.py:12)."""
    backbone_block = checkarg_backbone(backbone_block)
    upsampling = checkarg_upsampling(upsampling)
    dropout_variant = checkarg_dropout_variant(dropout_variant)
    h_lr, w_lr = lr_size
    module = RecNetPostupsampling(
        backbone=backbone_block, upsampling=upsampling, scale=scale,
        time_window=time_window, n_channels_out=n_channels_out,
        n_filters=n_filters, n_blocks=n_blocks, dropout_rate=dropout_rate,
        dropout_variant=dropout_variant, normalization=normalization,
        attention=attention, activation=activation,
        output_activation=output_activation,
        rc_interpolation=rc_interpolation, localcon_layer=localcon_layer,
        output_attention=output_attention, dtype=dtype)
    aux_shape = ((int(h_lr * scale), int(w_lr * scale), n_aux_channels)
                 if n_aux_channels > 0 else None)
    return DSModel(module, f'rec{backbone_block}_{upsampling}',
                   (time_window, h_lr, w_lr, n_channels), aux_shape)


def recnet_pin(backbone_block, n_channels, n_aux_channels, hr_size,
               time_window, n_channels_out=1, n_filters=8, n_blocks=6,
               normalization=None, dropout_rate=0, dropout_variant=None,
               attention=False, activation='relu', output_activation=None,
               localcon_layer=False, output_attention=True,
               dtype=jnp.float32):
    """Spatio-temporal pre-upsampled network
    (reference factory: dl4ds/models/spt_preups.py:12)."""
    backbone_block = checkarg_backbone(backbone_block)
    dropout_variant = checkarg_dropout_variant(dropout_variant)
    h_hr, w_hr = hr_size
    module = RecNetPIN(
        backbone=backbone_block, time_window=time_window,
        n_channels_out=n_channels_out, n_filters=n_filters,
        n_blocks=n_blocks, normalization=normalization,
        dropout_rate=dropout_rate, dropout_variant=dropout_variant,
        attention=attention, activation=activation,
        output_activation=output_activation, localcon_layer=localcon_layer,
        output_attention=output_attention, dtype=dtype)
    aux_shape = ((h_hr, w_hr, n_aux_channels) if n_aux_channels > 0 else None)
    return DSModel(module, f'rec{backbone_block}_pin',
                   (time_window, h_hr, w_hr, n_channels), aux_shape)


def residual_discriminator(n_channels, upsampling, is_spatiotemporal, scale,
                           lr_size, n_filters=8, n_res_blocks=4,
                           normalization=None, activation='relu',
                           attention=False, time_window=None,
                           dtype=jnp.float32):
    """Two-branch conditional discriminator for CGAN training
    (reference factory: dl4ds/models/discriminator.py:11)."""
    module = ResidualDiscriminator(
        n_channels=n_channels, upsampling=upsampling,
        is_spatiotemporal=is_spatiotemporal, scale=scale,
        lr_size=tuple(lr_size), n_filters=n_filters,
        n_res_blocks=n_res_blocks, normalization=normalization,
        activation=activation, attention=attention, dtype=dtype)
    from .. import POSTUPSAMPLING_METHODS
    h_lr, w_lr = lr_size
    # the conditioned input is the *model input*: LR-sized for
    # post-upsampling generators, HR-sized (pre-upsampled) for 'pin'
    # (reference: discriminator.py:26-29 takes the generator's input)
    h_in, w_in = ((h_lr, w_lr) if upsampling in POSTUPSAMPLING_METHODS
                  else (h_lr * scale, w_lr * scale))
    if is_spatiotemporal:
        tw = time_window or 1
        in_shape = (tw, h_in, w_in, n_channels)
        ref_shape = (tw, h_lr * scale, w_lr * scale, 1)
    else:
        in_shape = (h_in, w_in, n_channels)
        ref_shape = (h_lr * scale, w_lr * scale, 1)
    return DSModel(module, 'discriminator', in_shape, ref_shape)


_MODULE_CLASSES = {c.__name__: c for c in
                   (NetPostupsampling, NetPIN, UnetPIN, RecNetPostupsampling,
                    RecNetPIN, ResidualDiscriminator)}


def save_model(model, variables, path):
    """Persist a DSModel: architecture config (JSON) + variables (orbax).
    Counterpart of the reference's SavedModel export (base.py:177) — the
    model can be reloaded standalone with `load_model`."""
    import json
    import os
    import numpy as np
    os.makedirs(path, exist_ok=True)
    cfg = {f.name: getattr(model.module, f.name)
           for f in dataclasses.fields(type(model.module))
           if f.name not in ('parent', 'name')}
    cfg['dtype'] = jnp.dtype(cfg.get('dtype', jnp.float32)).name
    meta = {'module_class': type(model.module).__name__,
            'config': cfg, 'name': model.name,
            'input_shape': list(model.input_shape),
            'aux_shape': (list(model.aux_shape)
                          if model.aux_shape is not None else None)}
    with open(os.path.join(path, 'model_config.json'), 'w') as fh:
        json.dump(meta, fh, indent=2)
    payload = jax.tree_util.tree_map(np.asarray, variables)
    try:
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(os.path.join(path, 'variables')), payload,
            force=True)
    except Exception as exc:  # noqa: BLE001 — orbax optional/failable
        import pickle
        import shutil
        import warnings
        warnings.warn(
            f'orbax save failed at {path!r} ({exc!r}); falling back to '
            f'variables.pkl', RuntimeWarning)
        # remove any partial orbax dir so load_model takes the pickle path
        shutil.rmtree(os.path.join(path, 'variables'), ignore_errors=True)
        with open(os.path.join(path, 'variables.pkl'), 'wb') as fh:
            pickle.dump(payload, fh)


def load_model(path):
    """Rebuild a DSModel from `save_model` output; returns
    (model, variables)."""
    import json
    import os
    with open(os.path.join(path, 'model_config.json')) as fh:
        meta = json.load(fh)
    cfg = meta['config']
    cfg['dtype'] = jnp.dtype(cfg['dtype'])
    for key in ('ks_cl1', 'ks_cl2', 'kernel_size', 'lr_size'):
        if key in cfg and isinstance(cfg[key], list):
            cfg[key] = tuple(cfg[key])
    module = _MODULE_CLASSES[meta['module_class']](**cfg)
    model = DSModel(module, meta['name'], tuple(meta['input_shape']),
                    tuple(meta['aux_shape']) if meta['aux_shape'] else None)
    var_dir = os.path.abspath(os.path.join(path, 'variables'))
    if os.path.isdir(var_dir):
        import orbax.checkpoint as ocp
        variables = ocp.PyTreeCheckpointer().restore(var_dir)
    else:
        import pickle
        with open(os.path.join(path, 'variables.pkl'), 'rb') as fh:
            variables = pickle.load(fh)
    return model, variables


def build_model(backbone, upsampling, scale, n_channels, n_aux_channels,
                lr_size, hr_size, time_window=None, **params):
    """Single dispatcher over the 5 model factories — the decision tree the
    reference embeds in its trainers (dl4ds/training/supervised.py:271-317).
    """
    from .. import POSTUPSAMPLING_METHODS
    from ..utils import check_compatibility_upsbackb
    spatiotemporal = time_window is not None and time_window > 1
    check_compatibility_upsbackb(backbone, upsampling,
                                 time_window if spatiotemporal else None)
    if upsampling in POSTUPSAMPLING_METHODS:
        if spatiotemporal:
            return recnet_postupsampling(
                backbone_block=backbone, upsampling=upsampling, scale=scale,
                n_channels=n_channels, n_aux_channels=n_aux_channels,
                lr_size=lr_size, time_window=time_window, **params)
        return net_postupsampling(
            backbone_block=backbone, upsampling=upsampling, scale=scale,
            n_channels=n_channels, n_aux_channels=n_aux_channels,
            lr_size=lr_size, **params)
    if upsampling == 'pin':
        if spatiotemporal:
            return recnet_pin(
                backbone_block=backbone, n_channels=n_channels,
                n_aux_channels=n_aux_channels, hr_size=hr_size,
                time_window=time_window, **params)
        if backbone == 'unet':
            return unet_pin(
                backbone_block=backbone, n_channels=n_channels,
                n_aux_channels=n_aux_channels, hr_size=hr_size, **params)
        return net_pin(
            backbone_block=backbone, n_channels=n_channels,
            n_aux_channels=n_aux_channels, hr_size=hr_size, **params)
    raise ValueError(f'unrecognized upsampling: {upsampling}')
