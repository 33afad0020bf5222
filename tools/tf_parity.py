#!/usr/bin/env python
"""True-parity harness against the ACTUAL TensorFlow reference.

Runs /root/reference/dl4ds (TF 2.x + legacy Keras; `xarray`/`ecubevis`
import-time deps stubbed) side by side with dl4ds_tpu and records real
deltas — converting BASELINE.json's north-star claims ("<=1e-5 RMSE delta
vs TF", ">=10x patches/sec/chip over CPU TF") from proxy to fact.

Sections (select with --sections a,b,...; default: all but throughput/train):

  dataprep    golden-compare `create_pair_hr_lr` / `create_batch_hr_lr`
              against the reference's (dl4ds/dataloader.py:11-360) on
              identical inputs — full-grid AND seeded random crops (both
              sides draw y,x from the global np.random in the same order).
  losses      all 9 loss functions vs the reference tf.image-based
              implementations (dl4ds/losses.py:5-147) on random tensors.
  transplant  forward-pass parity with IDENTICAL weights: build TF
              reference models (convnet_pin sp_preups.py:13, resnet_spc
              sp_postups.py:14, recnet_pin spt_preups.py:12, unet_pin
              sp_preups.py:192) and their Flax twins, transplant the TF
              weights into the Flax param trees, compare outputs on the
              same input — covers the ConvLSTM gate math and the U-Net
              encoder/PadConcat ladder in addition to the plain CNNs.
  train       the tutorial workload (convnet_pin 4x) trained end-to-end by
              BOTH frameworks on the same data; RMSE/SSIM of each vs the
              held-out ground truth, and the deltas.
  throughput  real CPU-TF patches/sec of the reference SupervisedTrainer
              on the bench workload (resnet_spc 4x patch64 batch128,
              dl4ds/training/supervised.py:28) — becomes bench.py's
              vs_baseline denominator.

Results are merged into PARITY_TF.json at the repo root.

Usage:  python tools/tf_parity.py [--sections dataprep,losses,...]
(The script forces CPU for both frameworks and legacy Keras itself.)
"""

import argparse
import json
import os
import sys
import time
import types

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
# oneDNN reorders f32 accumulation and alone accounts for ~3e-4 max output
# delta on the transplant test; without it the delta is ~4e-9
os.environ.setdefault('TF_ENABLE_ONEDNN_OPTS', '0')
os.environ['TF_CPP_MIN_LOG_LEVEL'] = '2'
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, 'PARITY_TF.json')
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _import_reference():
    """Import the TF reference with xarray/ecubevis stubbed.

    The reference only ever uses `xr.DataArray` (isinstance checks) and
    `ecv.plot_ndarray` (debug plots) — verified by grep over
    /root/reference/dl4ds. Nothing else from either package is touched.
    """
    if 'xarray' not in sys.modules:
        xr = types.ModuleType('xarray')

        class DataArray:  # never instantiated by this harness
            pass

        xr.DataArray = DataArray
        sys.modules['xarray'] = xr
    if 'ecubevis' not in sys.modules:
        ecv = types.ModuleType('ecubevis')
        ecv.plot_ndarray = lambda *a, **k: None
        sys.modules['ecubevis'] = ecv
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import dl4ds as ref  # noqa: PLC0415
    assert ref.__file__.startswith('/root/reference')
    return ref


def _jax_cpu():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    return jax


def _maxdiff(a, b):
    """Max |a-b|, tolerating a trailing singleton-channel mismatch (the
    reference drops the channel dim of spatio-temporal post-ups patches —
    dataloader.py:209-210 checkarray_ndim(·, 3) is a no-op on rank-3 — while
    dl4ds_tpu keeps the rank-4 [T,H,W,C] the models require)."""
    a, b = np.asarray(a, 'float64'), np.asarray(b, 'float64')
    if a.shape != b.shape:
        if a.ndim + 1 == b.ndim and b.shape[-1] == 1 and a.shape == b.shape[:-1]:
            b = b[..., 0]
        elif b.ndim + 1 == a.ndim and a.shape[-1] == 1 and b.shape == a.shape[:-1]:
            a = a[..., 0]
    assert a.shape == b.shape, f'shape mismatch {a.shape} vs {b.shape}'
    return float(np.max(np.abs(a - b))) if a.size else 0.0


# ---------------------------------------------------------------------------
# dataprep
# ---------------------------------------------------------------------------

def section_dataprep(ref):
    _jax_cpu()   # the env var alone cannot override a sitecustomize pin
    import dl4ds_tpu.dataloader as mine

    rng = np.random.default_rng(7)
    n, hr = 10, 32
    scale = 4
    lr = hr // scale
    data = rng.standard_normal((n, hr, hr, 1)).astype('float32')
    data_lr = rng.standard_normal((n, lr, lr, 1)).astype('float32')
    preds = rng.standard_normal((n, hr, hr, 2)).astype('float32')
    topo = rng.standard_normal((hr, hr)).astype('float32')
    mask = (rng.random((hr, hr)) > 0.5).astype('float32')

    pair_cases = []
    for interp in ('inter_area', 'bicubic', 'bilinear', 'nearest'):
        for ups in ('spc', 'pin'):
            pair_cases.append(dict(upsampling=ups, interpolation=interp,
                                   patch_size=None, lr_given=False,
                                   statics=True, preds=True, season=None))
    # NOTE: post-upsampling + patch + implicit LR + predictors is EXCLUDED:
    # the reference itself crashes there (dataloader.py:180-189 resizes the
    # cropped HR patch to the full-grid LR size, so the concat with the
    # patch-cropped predictors fails: 8 vs 4). dl4ds_tpu handles that
    # config (LR patch = patch/scale); recorded below as reference_bugs.
    pair_cases += [
        dict(upsampling='spc', interpolation='inter_area', patch_size=16,
             lr_given=True, statics=True, preds=True, season='winter'),
        dict(upsampling='pin', interpolation='bicubic', patch_size=16,
             lr_given=False, statics=True, preds=False, season='summer'),
        dict(upsampling='spc', interpolation='inter_area', patch_size=16,
             lr_given=False, statics=True, preds=False, season=None),
        dict(upsampling='pin', interpolation='inter_area', patch_size=None,
             lr_given=True, statics=True, preds=True, season='autumn'),
        dict(upsampling='dc', interpolation='bilinear', patch_size=12,
             lr_given=True, statics=True, preds=True, season='spring'),
        dict(upsampling='rc', interpolation='nearest', patch_size=None,
             lr_given=False, statics=False, preds=False, season=None),
    ]

    results = []
    worst = 0.0
    for case in pair_cases:
        kw = dict(
            array=data[0], upsampling=case['upsampling'], scale=scale,
            patch_size=case['patch_size'],
            array_lr=data_lr[0] if case['lr_given'] else None,
            static_vars=[topo, mask] if case['statics'] else None,
            predictors=preds[0] if case['preds'] else None,
            season=case['season'], interpolation=case['interpolation'])
        np.random.seed(1234)
        out_ref = ref.dataloader.create_pair_hr_lr(**kw)
        np.random.seed(1234)
        out_mine = mine.create_pair_hr_lr(**kw)
        if not isinstance(out_ref, tuple):
            out_ref, out_mine = (out_ref,), (out_mine,)
        assert len(out_ref) == len(out_mine), case
        d = max(_maxdiff(r, m) for r, m in zip(out_ref, out_mine))
        worst = max(worst, d)
        results.append({**{k: v for k, v in case.items()}, 'max_abs_delta': d})

    # batch factory: spatial and spatio-temporal windows, with seeded crops
    batch_cases = [
        dict(upsampling='spc', patch_size=16, time_window=None,
             statics=True, preds=True, lr_given=True),
        dict(upsampling='pin', patch_size=None, time_window=None,
             statics=True, preds=True, lr_given=False),
        dict(upsampling='spc', patch_size=16, time_window=3,
             statics=True, preds=False, lr_given=False),
        # pin + time_window + patch is NOT tested: the reference crashes
        # (dataloader.py:110 squeezes the [T,H,W,1] window to rank-3 and
        # crop_array then treats [t,y,x] as [y,x,c], so patch > T raises)
        dict(upsampling='pin', patch_size=None, time_window=3,
             statics=False, preds=False, lr_given=False),
    ]
    for case in batch_cases:
        idx = np.arange(6)
        kw = dict(
            all_indices=idx, index=0, array=data,
            array_lr=data_lr if case['lr_given'] else None,
            upsampling=case['upsampling'], scale=scale, batch_size=6,
            patch_size=case['patch_size'], time_window=case['time_window'],
            static_vars=[topo, mask] if case['statics'] else None,
            predictors=preds if case['preds'] else None,
            interpolation='inter_area')
        np.random.seed(99)
        out_ref = ref.dataloader.create_batch_hr_lr(**kw)
        np.random.seed(99)
        out_mine = mine.create_batch_hr_lr(**kw)
        flat_r = [a for part in out_ref for a in
                  (part if isinstance(part, list) else [part])]
        flat_m = [a for part in out_mine for a in
                  (part if isinstance(part, list) else [part])]
        assert len(flat_r) == len(flat_m)
        d = max(_maxdiff(np.asarray(r), np.asarray(m))
                for r, m in zip(flat_r, flat_m))
        worst = max(worst, d)
        results.append({'batch': True, **case, 'max_abs_delta': d})

    return {'n_cases': len(results), 'max_abs_delta': worst,
            'pass_1e-5': bool(worst <= 1e-5), 'cases': results,
            'reference_bugs': [
                'post-upsampling + patch_size + implicit LR + predictors '
                'crashes in the reference (dataloader.py:180-189: cropped '
                'HR patch resized to full-grid LR size -> concat shape '
                'mismatch); dl4ds_tpu uses the LR patch size there',
                'pin + time_window + patch_size crashes in the reference '
                '(dataloader.py:110: the [T,H,W,1] window is squeezed to '
                'rank-3 and crop_array treats [t,y,x] as [y,x,c]); '
                'dl4ds_tpu crops the spatial axes of the window']}


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def section_losses(ref):
    import tensorflow as tf
    jax = _jax_cpu()
    import jax.numpy as jnp
    import dl4ds_tpu.losses as mine

    rng = np.random.default_rng(11)
    shape = (4, 128, 128, 1)
    pairs = {
        'unit_range': (rng.random(shape, dtype=np.float32),
                       rng.random(shape, dtype=np.float32)),
        'with_negatives': (
            rng.standard_normal(shape).astype('float32') * 3.0 - 1.0,
            rng.standard_normal(shape).astype('float32') * 3.0 - 1.0),
    }
    names = ['mae', 'mse', 'dssim', 'dssim_mae', 'dssim_mse',
             'dssim_mae_mse', 'msdssim', 'msdssim_mae', 'msdssim_mae_mse']
    out = {}
    worst = 0.0
    for tag, (yt, yp) in pairs.items():
        per = {}
        for name in names:
            rv = float(tf.reduce_mean(
                getattr(ref.losses, name)(tf.constant(yt), tf.constant(yp))))
            mv = float(jnp.mean(
                getattr(mine, name)(jnp.asarray(yt), jnp.asarray(yp))))
            d = abs(rv - mv)
            per[name] = {'tf': rv, 'jax': mv, 'abs_delta': d}
            worst = max(worst, d)
        out[tag] = per
    return {'max_abs_delta': worst, 'pass_1e-5': bool(worst <= 1e-5),
            'detail': out}


# ---------------------------------------------------------------------------
# transplant — identical weights, same input, compare outputs
# ---------------------------------------------------------------------------

def _transplant_convnet_pin(tf_model, params, n_blocks):
    """Map the TF reference convnet_pin weights onto the Flax param tree.

    Layer creation order in the reference (sp_preups.py:105-180):
    stem Conv2D, N ConvBlocks (2 convs each), backbone concat-merge Conv2D,
    TransitionLast 1x1, attention ConvBlock (2 convs + two 1x1 attention
    convs), final ConvBlock (2 convs). `tf_model.weights` lists (kernel,
    bias) pairs in exactly that order.
    """
    import copy
    w = [v.numpy() for v in tf_model.weights]
    p = copy.deepcopy(jax_tree_to_dict(params))
    bb = p['_Backbone_0']
    om = p['_OutputModule_0']
    i = 0

    def take():
        nonlocal i
        k, b = w[i], w[i + 1]
        i += 2
        return k, b

    def set_conv(dst):
        k, b = take()
        assert dst['kernel'].shape == k.shape, (dst['kernel'].shape, k.shape)
        dst['kernel'], dst['bias'] = k, b

    set_conv(bb['stem'])
    for j in range(1, n_blocks + 1):
        set_conv(bb[f'ConvBlock{j}']['Conv_0'])
        set_conv(bb[f'ConvBlock{j}']['Conv_1'])
    set_conv(bb['backbone_out_conv'])
    set_conv(om['TransitionLast']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_1'])
    att = om['ConvBlock_0']['ChannelAttention2D_0']
    k1, b1 = take()
    k2, b2 = take()
    att['w1'], att['b1'] = k1[0, 0], b1  # 1x1 conv == matmul over channels
    att['w2'], att['b2'] = k2[0, 0], b2
    set_conv(om['ConvBlock_1']['Conv_0'])
    set_conv(om['ConvBlock_1']['Conv_1'])
    assert i == len(w), f'consumed {i} of {len(w)} weights'
    return p


def jax_tree_to_dict(tree):
    """flax FrozenDict / dict -> plain nested dict of numpy arrays."""
    if hasattr(tree, 'items'):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return np.asarray(tree)


def _transplant_resnet_spc(tf_model, params, n_blocks):
    """Map the TF reference resnet_spc (4x) weights onto the Flax tree.

    TF creation order (sp_postups.py:118-212): stem, N ResidualBlocks
    (2 convs + 1x1 skip conv when widths change, blocks.py:206-208),
    backbone merge conv, long-skip TransitionBlock, SPC head (ONE shared
    conv2x for both x2 stages, blocks.py:415), TransitionLast, attention
    ConvBlock, final ConvBlock."""
    import copy
    w = [v.numpy() for v in tf_model.weights]
    p = copy.deepcopy(jax_tree_to_dict(params))
    bb = p['_Backbone_0']
    om = p['_OutputModule_0']
    i = 0

    def take():
        nonlocal i
        k, b = w[i], w[i + 1]
        i += 2
        return k, b

    def set_conv(dst):
        k, b = take()
        assert dst['kernel'].shape == k.shape, (dst['kernel'].shape, k.shape)
        dst['kernel'], dst['bias'] = k, b

    set_conv(bb['stem'])
    for j in range(1, n_blocks + 1):
        blk = bb[f'ResidualBlock{j}']
        set_conv(blk['Conv_0'])
        set_conv(blk['Conv_1'])
        if 'Conv_2' in blk:        # 1x1 skip conv (width changed)
            set_conv(blk['Conv_2'])
    set_conv(bb['backbone_out_conv'])
    set_conv(bb['TransitionBlock_0']['Conv_0'])
    set_conv(p['SubpixelConvolutionBlock_0']['conv2x'])
    set_conv(om['TransitionLast']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_1'])
    att = om['ConvBlock_0']['ChannelAttention2D_0']
    k1, b1 = take()
    k2, b2 = take()
    att['w1'], att['b1'] = k1[0, 0], b1
    att['w2'], att['b2'] = k2[0, 0], b2
    set_conv(om['ConvBlock_1']['Conv_0'])
    set_conv(om['ConvBlock_1']['Conv_1'])
    assert i == len(w), f'consumed {i} of {len(w)} weights'
    return p


def _transplant_recnet_pin(tf_model, params, n_blocks):
    """Map the TF reference recnet_pin weights onto the Flax tree.

    TF creation order (spt_preups.py:100-140): stem RecurrentConvBlock +
    n_blocks more, each = 2 ConvLSTM2D layers whose weights list as
    [kernel (kh,kw,Cin,4F), recurrent_kernel (kh,kw,F,4F), bias (4F)] —
    Keras gate order i,f,c,o matches _ConvLSTMCell (models/blocks.py:418);
    then TransitionLast, attention ConvBlock, output ConvBlock. The Flax
    split of each ConvLSTM into input_conv/{kernel,bias} +
    cell/recurrent_conv/kernel (the hoisted-input-conv layout both the XLA
    and fused-Pallas paths share) takes the same three tensors directly."""
    import copy
    w = [v.numpy() for v in tf_model.weights]
    p = copy.deepcopy(jax_tree_to_dict(params))
    bb = p['_RecBackbone_0']
    i = 0

    def take():
        nonlocal i
        k, b = w[i], w[i + 1]
        i += 2
        return k, b

    def set_conv(dst):
        k, b = take()
        assert dst['kernel'].shape == k.shape, (dst['kernel'].shape, k.shape)
        dst['kernel'], dst['bias'] = k, b

    for j in range(1, n_blocks + 2):          # stem + n_blocks
        blk = bb[f'RecurrentConvBlock{j}']
        for cl in ('ConvLSTM2D_0', 'ConvLSTM2D_1'):
            k, rk, b = w[i], w[i + 1], w[i + 2]
            i += 3
            d = blk[cl]
            assert d['input_conv']['kernel'].shape == k.shape
            assert d['cell']['recurrent_conv']['kernel'].shape == rk.shape
            d['input_conv']['kernel'], d['input_conv']['bias'] = k, b
            d['cell']['recurrent_conv']['kernel'] = rk
    set_conv(p['TransitionLast']['Conv_0'])
    set_conv(p['ConvBlock_0']['Conv_0'])
    set_conv(p['ConvBlock_0']['Conv_1'])
    att = p['ConvBlock_0']['ChannelAttention2D_0']
    k1, b1 = take()
    k2, b2 = take()
    att['w1'], att['b1'] = k1[0, 0], b1
    att['w2'], att['b2'] = k2[0, 0], b2
    set_conv(p['ConvBlock_1']['Conv_0'])
    set_conv(p['ConvBlock_1']['Conv_1'])
    assert i == len(w), f'consumed {i} of {len(w)} weights'
    return p


def _transplant_unet_pin(tf_model, params, n_blocks):
    """Map the TF reference unet_pin (spc decoder) weights onto the Flax
    tree. TF creation order (sp_preups.py:252-310): n encoder ConvBlocks,
    Bottleneck ConvBlock, then per decoder level SubpixelConvolutionBlock
    conv2x + DecoderConvBlock, then TransitionLast + attention ConvBlock +
    output ConvBlock. (Unbuilt layers — e.g. conv5x — never appear in
    tf_model.weights.)"""
    import copy
    w = [v.numpy() for v in tf_model.weights]
    p = copy.deepcopy(jax_tree_to_dict(params))
    om = p['_OutputModule_0']
    i = 0

    def take():
        nonlocal i
        k, b = w[i], w[i + 1]
        i += 2
        return k, b

    def set_conv(dst):
        k, b = take()
        assert dst['kernel'].shape == k.shape, (dst['kernel'].shape, k.shape)
        dst['kernel'], dst['bias'] = k, b

    for j in range(1, n_blocks + 1):
        set_conv(p[f'EncoderBlock{j}']['ConvBlock_0']['Conv_0'])
        set_conv(p[f'EncoderBlock{j}']['ConvBlock_0']['Conv_1'])
    set_conv(p['Bottleneck']['Conv_0'])
    set_conv(p['Bottleneck']['Conv_1'])
    for j in range(n_blocks):
        set_conv(p[f'SubpixelConvolutionBlock_{j}']['conv2x'])
        set_conv(p[f'DecoderConvBlock{j + 1}']['Conv_0'])
        set_conv(p[f'DecoderConvBlock{j + 1}']['Conv_1'])
    set_conv(om['TransitionLast']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_0'])
    set_conv(om['ConvBlock_0']['Conv_1'])
    att = om['ConvBlock_0']['ChannelAttention2D_0']
    k1, b1 = take()
    k2, b2 = take()
    att['w1'], att['b1'] = k1[0, 0], b1
    att['w2'], att['b2'] = k2[0, 0], b2
    set_conv(om['ConvBlock_1']['Conv_0'])
    set_conv(om['ConvBlock_1']['Conv_1'])
    assert i == len(w), f'consumed {i} of {len(w)} weights'
    return p


def section_transplant(ref):
    jax = _jax_cpu()
    import jax.numpy as jnp
    from dl4ds_tpu.models import (net_pin, net_postupsampling, recnet_pin,
                                  unet_pin)

    out = {}

    # --- convnet_pin -----------------------------------------------------
    n_blocks, n_filters, hr = 3, 8, 32
    tfm = ref.net_pin('convnet', n_channels=1, n_aux_channels=0,
                      hr_size=(hr, hr), n_filters=n_filters,
                      n_blocks=n_blocks, attention=False)
    mm = net_pin('convnet', n_channels=1, n_aux_channels=0,
                 hr_size=(hr, hr), n_filters=n_filters, n_blocks=n_blocks,
                 attention=False)
    variables = mm.init(jax.random.PRNGKey(0), batch_size=1)
    params = _transplant_convnet_pin(tfm, variables['params'], n_blocks)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, hr, hr, 1)).astype('float32')
    y_tf = tfm.predict(x, verbose=0)
    y_jx = np.asarray(mm.module.apply({'params': params}, jnp.asarray(x),
                                      None, training=False))
    rmse = float(np.sqrt(np.mean((y_tf - y_jx) ** 2)))
    out['convnet_pin'] = {
        'model': 'convnet_pin (3 blocks, 8 filters, attention head)',
        'n_weights': int(len(tfm.weights)),
        'max_abs_delta': _maxdiff(y_tf, y_jx),
        'output_rmse': rmse, 'pass_1e-5': bool(rmse <= 1e-5)}

    # --- resnet_spc 4x (the flagship/bench config) -----------------------
    lr = 8
    tfm2 = ref.net_postupsampling(
        'resnet', 'spc', scale=4, n_channels=1, n_aux_channels=0,
        lr_size=(lr, lr), n_filters=8, n_blocks=2, attention=False)
    mm2 = net_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                             n_aux_channels=0, lr_size=(lr, lr), n_filters=8,
                             n_blocks=2, attention=False)
    v2 = mm2.init(jax.random.PRNGKey(0), batch_size=1)
    n_tf = int(tfm2.count_params())
    n_jx = int(sum(np.asarray(leaf).size
                   for leaf in jax.tree_util.tree_leaves(v2)))
    p2 = _transplant_resnet_spc(tfm2, v2['params'], 2)
    x2 = rng.standard_normal((4, lr, lr, 1)).astype('float32')
    y_tf2 = tfm2.predict(x2, verbose=0)
    y_jx2 = np.asarray(mm2.module.apply({'params': p2}, jnp.asarray(x2),
                                        None, training=False))
    rmse2 = float(np.sqrt(np.mean((y_tf2 - y_jx2) ** 2)))
    out['resnet_spc_4x'] = {
        'model': 'resnet_spc 4x (2 blocks, 8 filters, tied-conv2x SPC '
                 'head, attention head)',
        'n_weights': int(len(tfm2.weights)),
        'tf_params': n_tf, 'jax_params': n_jx,
        'param_count_equal': n_tf == n_jx,
        'max_abs_delta': _maxdiff(y_tf2, y_jx2),
        'output_rmse': rmse2, 'pass_1e-5': bool(rmse2 <= 1e-5)}

    # --- recnet_pin (ConvLSTM gate math vs keras ConvLSTM2D) -------------
    tw, hr3 = 3, 16
    tfm3 = ref.recnet_pin('resnet', n_channels=1, n_aux_channels=0,
                          hr_size=(hr3, hr3), time_window=tw, n_filters=8,
                          n_blocks=1, attention=False)
    mm3 = recnet_pin('resnet', n_channels=1, n_aux_channels=0,
                     hr_size=(hr3, hr3), time_window=tw, n_filters=8,
                     n_blocks=1, attention=False)
    v3 = mm3.init(jax.random.PRNGKey(0), batch_size=1)
    n_tf3, n_jx3 = _param_counts(tfm3, v3, jax)
    p3 = _transplant_recnet_pin(tfm3, v3['params'], 1)
    x3 = rng.standard_normal((2, tw, hr3, hr3, 1)).astype('float32')
    y_tf3 = tfm3.predict(x3, verbose=0)
    y_jx3 = np.asarray(mm3.module.apply({'params': p3}, jnp.asarray(x3),
                                        None, training=False))
    rmse3 = float(np.sqrt(np.mean((y_tf3 - y_jx3) ** 2)))
    out['recresnet_pin_tw3'] = {
        'model': 'recresnet_pin (stem + 1 RecurrentConvBlock = 4 ConvLSTM2D '
                 'layers, resnet merge, attention head)',
        'n_weights': int(len(tfm3.weights)),
        'tf_params': n_tf3, 'jax_params': n_jx3,
        'param_count_equal': n_tf3 == n_jx3,
        'max_abs_delta': _maxdiff(y_tf3, y_jx3),
        'output_rmse': rmse3, 'pass_1e-5': bool(rmse3 <= 1e-5)}

    # --- unet_pin (encoder ladder + PadConcat + spc decoder) -------------
    # non-square grid: the reference's square-grid unet builds None-shaped
    # inputs and its PadConcat crashes on them (sp_preups.py:244-247,281 —
    # documented in PARITY.md); (32,48) forces static shapes on both sides
    hu, wu = 32, 48
    tfm4 = ref.unet_pin('unet', n_channels=1, n_aux_channels=0, n_filters=8,
                        n_blocks=2, hr_size=(hu, wu), attention=False,
                        decoder_upsampling='spc')
    mm4 = unet_pin('unet', n_channels=1, n_aux_channels=0, hr_size=(hu, wu),
                   n_filters=8, n_blocks=2, attention=False,
                   decoder_upsampling='spc')
    v4 = mm4.init(jax.random.PRNGKey(0), batch_size=1)
    n_tf4, n_jx4 = _param_counts(tfm4, v4, jax)
    p4 = _transplant_unet_pin(tfm4, v4['params'], 2)
    x4 = rng.standard_normal((3, hu, wu, 1)).astype('float32')
    y_tf4 = tfm4.predict(x4, verbose=0)
    y_jx4 = np.asarray(mm4.module.apply({'params': p4}, jnp.asarray(x4),
                                        None, training=False))
    rmse4 = float(np.sqrt(np.mean((y_tf4 - y_jx4) ** 2)))
    out['unet_pin_spc'] = {
        'model': 'unet_pin (2 encoder levels, bottleneck, spc decoder, '
                 'PadConcat skips, attention head; 32x48 grid)',
        'n_weights': int(len(tfm4.weights)),
        'tf_params': n_tf4, 'jax_params': n_jx4,
        'param_count_equal': n_tf4 == n_jx4,
        'max_abs_delta': _maxdiff(y_tf4, y_jx4),
        'output_rmse': rmse4, 'pass_1e-5': bool(rmse4 <= 1e-5)}

    worst = max(v['max_abs_delta'] for v in out.values())
    return {'max_abs_delta': worst,
            'pass_1e-5': bool(all(v['pass_1e-5'] for v in out.values())),
            'models': out}


def _param_counts(tf_model, variables, jax):
    n_tf = int(tf_model.count_params())
    n_jx = int(sum(np.asarray(leaf).size
                   for leaf in jax.tree_util.tree_leaves(variables)))
    return n_tf, n_jx


def section_discriminator(ref):
    """Weight-count parity of the CGAN discriminator, incl. the reference's
    scale==5 valid-conv+crop branch (discriminator.py:54-57 — the trainers'
    default scale)."""
    jax = _jax_cpu()
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from dl4ds_tpu.models.nets import ResidualDiscriminator

    out = {}
    worst = 0
    for scale, lr in ((5, 8), (4, 8)):
        tfm = ref.residual_discriminator(
            n_channels=1, upsampling='spc', is_spatiotemporal=False,
            scale=scale, lr_size=(lr, lr))
        mine = ResidualDiscriminator(
            n_channels=1, upsampling='spc', is_spatiotemporal=False,
            scale=scale, lr_size=(lr, lr))
        v = mine.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, lr, lr, 1)),
                      jnp.zeros((1, lr * scale, lr * scale, 1)))
        n_tf = int(tfm.count_params())
        n_jx = int(sum(x.size for x in jtu.tree_leaves(v)))
        out[f'scale{scale}'] = {'tf_params': n_tf, 'jax_params': n_jx,
                                'equal': n_tf == n_jx}
        worst = max(worst, abs(n_tf - n_jx))
    out['max_param_count_delta'] = worst
    return out


# ---------------------------------------------------------------------------
# train — tutorial workload end-to-end with both frameworks
# ---------------------------------------------------------------------------

def _toy_field(n=128, size=48, seed=0):
    """Synthetic t2m-like field: smooth flow + topography-correlated fine
    structure above the 4x LR Nyquist (same recipe as bench.py's
    accuracy_bench)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    topo = (np.sin(0.21 * yy) * np.cos(0.17 * xx)
            + 0.5 * np.sin(0.53 * yy + 1.3) * np.cos(0.47 * xx)
            + 0.8 * np.sin(1.3 * yy) * np.cos(1.1 * xx))
    frames = [(np.sin(0.07 * yy + 0.05 * k) * np.cos(0.09 * xx - 0.04 * k)
               + 0.4 * (1.0 + 0.5 * np.sin(0.1 * k)) * topo
               + 0.02 * rng.standard_normal((size, size)))
              for k in range(n)]
    return np.stack(frames)[..., None].astype('float32')


def _rmse_ssim(truth, pred):
    _jax_cpu()
    import jax.numpy as jnp
    from dl4ds_tpu.ops.ssim import ssim as jssim
    truth = truth.astype('float32')
    pred = np.asarray(pred, 'float32')
    rmse = float(np.sqrt(np.mean((truth - pred) ** 2)))
    drange = float(truth.max() - truth.min())
    s = float(np.mean(np.asarray(jssim(jnp.asarray(truth),
                                       jnp.asarray(pred), max_val=drange))))
    return rmse, s


def section_train(ref, epochs=40, seeds=5):
    """Trained-accuracy parity, MULTI-SEED: `seeds` independent runs per
    framework (init + shuffle seed varied together), so seed noise is
    distinguishable from a systematic gap. Single-seed r3 data could not
    (VERDICT r3 weak #1)."""
    jax = _jax_cpu()
    import dl4ds_tpu as dds

    n, size, scale = 128, 48, 4
    data = _toy_field(n, size)
    i1, i2 = 96, 112
    common = dict(backbone='convnet', upsampling='pin',
                  data_train=data[:i1], data_val=data[i1:i2],
                  data_test=data[i2:], scale=scale, patch_size=None,
                  interpolation='inter_area', batch_size=16, loss='mae',
                  epochs=epochs, learning_rate=(1e-3, 1e-4),
                  n_filters=16, n_blocks=3, save=False, verbose=False)
    truth = data[i2:]

    def run_tf(seed):
        import tensorflow as tf
        tf.keras.utils.set_random_seed(seed)   # python/np/tf init + shuffle
        t0 = time.perf_counter()
        tr = ref.SupervisedTrainer(device='CPU', show_plot=False, **common)
        tr.run()
        secs = time.perf_counter() - t0
        y = ref.predict(tr.model, data[i2:], scale=scale, array_in_hr=True,
                        interpolation='inter_area', device='CPU')
        rmse, ssim = _rmse_ssim(truth, y)
        return {'seed': seed, 'rmse': rmse, 'ssim': ssim,
                'test_loss': float(tr.test_loss),
                'train_secs': round(secs, 1)}

    def run_jax(seed):
        t0 = time.perf_counter()
        tr = dds.SupervisedTrainer(seed=seed, **common)
        tr.run()
        secs = time.perf_counter() - t0
        y = dds.predict(tr, data[i2:], scale=scale, array_in_hr=True,
                        interpolation='inter_area')
        rmse, ssim = _rmse_ssim(truth, y)
        return {'seed': seed, 'rmse': rmse, 'ssim': ssim,
                'test_loss': float(tr.test_loss),
                'train_secs': round(secs, 1)}

    tf_runs, jax_runs = [], []
    for s in range(seeds):
        print(f'[tf_parity]   train seed {s}: tf...', flush=True)
        tf_runs.append(run_tf(s))
        print(f'[tf_parity]   train seed {s}: jax...', flush=True)
        jax_runs.append(run_jax(s))

    def agg(runs):
        out = {}
        for k in ('rmse', 'ssim', 'test_loss'):
            v = np.array([r[k] for r in runs], dtype='float64')
            out[k] = {'per_seed': [round(float(x), 6) for x in v],
                      'mean': float(v.mean()), 'std': float(v.std(ddof=1))}
        out['train_secs'] = [r['train_secs'] for r in runs]
        return out

    tf_a, jx_a = agg(tf_runs), agg(jax_runs)
    # overlap test: do the per-seed distributions overlap within 1 pooled std?
    gap = abs(tf_a['rmse']['mean'] - jx_a['rmse']['mean'])
    pooled = float(np.sqrt((tf_a['rmse']['std'] ** 2
                            + jx_a['rmse']['std'] ** 2) / 2.0))
    return {
        'workload': f'convnet_pin 4x tutorial toy grid ({n}x{size}px, '
                    f'{epochs} epochs, mae), {seeds} seeds per framework '
                    '(init + shuffle varied together)',
        'tf': tf_a, 'jax': jx_a,
        'rmse_gap_of_means': gap,
        'rmse_pooled_std': pooled,
        'rmse_gap_in_stds': (gap / pooled) if pooled > 0 else None,
        'ssim_gap_of_means': abs(tf_a['ssim']['mean']
                                 - jx_a['ssim']['mean']),
    }


# ---------------------------------------------------------------------------
# throughput — real CPU-TF patches/sec on the bench workload
# ---------------------------------------------------------------------------

def section_throughput(ref, epochs=3):
    import tensorflow as tf

    # bench.py's workload: resnet_spc 4x, patch 64, batch 128, 8 filters,
    # 6 blocks, attention, 256 samples of a 128px grid
    rng = np.random.default_rng(0)
    data = rng.standard_normal((256, 128, 128, 1)).astype('float32')

    epoch_times = []

    class EpochTimer(tf.keras.callbacks.Callback):
        def on_epoch_begin(self, epoch, logs=None):
            self._t0 = time.perf_counter()

        def on_epoch_end(self, epoch, logs=None):
            epoch_times.append(time.perf_counter() - self._t0)

    tr = ref.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:64], data_test=data[:64], scale=4, patch_size=64,
        batch_size=128, loss='mae', epochs=epochs, device='CPU',
        n_filters=8, n_blocks=6, attention=True, save=False, verbose=False,
        show_plot=False)
    # measure fit-loop epochs end-to-end (includes the reference's
    # host-side pair synthesis — its real bottleneck, supervised.py:397)

    def run_with_timer():
        tr.setup_datagen()
        tr.setup_model()
        import tensorflow as tf  # noqa: PLC0415
        opt = tf.keras.optimizers.Adam(learning_rate=1e-3)
        tr.model.compile(optimizer=opt, loss='mae')
        tr.model.fit(tr.ds_train, epochs=epochs, verbose=0,
                     callbacks=[EpochTimer()])

    run_with_timer()
    steps_per_epoch = len(tr.ds_train)
    # first epoch pays tf.function tracing; use the min of the rest
    t_epoch = min(epoch_times[1:]) if len(epoch_times) > 1 else epoch_times[0]
    pps = steps_per_epoch * 128 / t_epoch
    return {
        'workload': 'resnet_spc 4x patch64 batch128 f8 b6 attention '
                    '(bench.py workload), reference DataGenerator + '
                    'model.fit on CPU',
        'epochs_timed': epoch_times,
        'steps_per_epoch': int(steps_per_epoch),
        'tf_cpu_patches_per_sec': round(pps, 2),
    }


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sections', default='dataprep,losses,transplant')
    ap.add_argument('--epochs', type=int, default=40)
    ap.add_argument('--seeds', type=int, default=5,
                    help='independent runs per framework in --sections train')
    args = ap.parse_args()
    sections = [s for s in args.sections.split(',') if s]

    ref = _import_reference()
    result = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            result = json.load(fh)

    unknown = [n for n in sections
               if f'section_{n}' not in globals()]
    if unknown:
        raise SystemExit(f'unknown sections {unknown}; available: '
                         + ', '.join(sorted(
                             n[len('section_'):] for n in globals()
                             if n.startswith('section_'))))
    for name in sections:
        fn = globals()[f'section_{name}']
        print(f'[tf_parity] running {name}...', flush=True)
        t0 = time.perf_counter()
        if name in ('train',):
            result[name] = fn(ref, epochs=args.epochs, seeds=args.seeds)
        else:
            result[name] = fn(ref)
        print(f'[tf_parity] {name} done in '
              f'{time.perf_counter() - t0:.1f}s', flush=True)
        with open(OUT, 'w') as fh:   # persist per section: a later crash
            json.dump(result, fh, indent=2, default=float)   # loses nothing

    result['meta'] = {
        'reference': '/root/reference/dl4ds (TF ' + __import_tf_version()
                     + ', legacy keras)',
        'note': 'all sections CPU-only; stubs: xarray.DataArray, '
                'ecubevis.plot_ndarray',
    }
    with open(OUT, 'w') as fh:
        json.dump(result, fh, indent=2, default=float)
    summary = {k: (v.get('max_abs_delta') if isinstance(v, dict) else None)
               for k, v in result.items() if k != 'meta'}
    print(json.dumps({'written': OUT, 'summary': summary}, default=float))


def __import_tf_version():
    import tensorflow as tf
    return tf.__version__


if __name__ == '__main__':
    main()
