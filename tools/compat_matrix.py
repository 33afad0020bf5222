#!/usr/bin/env python
"""Weight-import parity matrix: build each reference TF model family,
import its weights via dl4ds_tpu.compat.import_keras_weights, and compare
the two frameworks' forward passes on the same input. Writes COMPAT.json
(consumed by tests/test_compat.py).

This doubles as transplant-level forward parity for the families
tools/tf_parity.py does not cover (densenet, convnext, rc, dc, localcon,
backbone attention, ln normalization).

Run: python tools/compat_matrix.py [case ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from tf_parity import _import_reference, _jax_cpu, _maxdiff  # noqa: E402

import numpy as np  # noqa: E402

CASES = [
    # (label, family, kwargs)
    ('resnet_spc', 'post', dict(backbone='resnet', upsampling='spc',
                                scale=4, aux=0, attention=False)),
    # reference spatial-rc models REQUIRE localcon (static shapes): the
    # Resizing layer crashes on None dims (ref sp_postups.py:112-117,183)
    ('convnet_rc_lcb', 'post', dict(backbone='convnet', upsampling='rc',
                                    scale=4, aux=0, attention=False,
                                    localcon=True)),
    ('densenet_spc', 'post', dict(backbone='densenet', upsampling='spc',
                                  scale=4, aux=0, attention=False)),
    ('resnet_dc2', 'post', dict(backbone='resnet', upsampling='dc',
                                scale=2, aux=0, attention=False)),
    ('resnet_spc_attn', 'post', dict(backbone='resnet', upsampling='spc',
                                     scale=4, aux=0, attention=True)),
    ('convnet_spc_aux', 'post', dict(backbone='convnet', upsampling='spc',
                                     scale=4, aux=3, attention=False)),
    ('densenet_pin', 'pin', dict(backbone='densenet', aux=0,
                                 attention=False)),
    # n_out=2: with a single output channel the final LayerNorm maps
    # everything to beta=0 in BOTH frameworks (a degenerate comparison)
    # ln tolerances: LayerNorm on untrained nets divides by the tiny std
    # of near-symmetric activations, amplifying both frameworks' f32
    # noise ~1000x (verified: the diff persists with JAX in f64, i.e. the
    # floor is TF-side); through a recurrent (ConvLSTM) stack the
    # amplification is chaotic, so that case is checked statistically.
    # Note LN ORDER itself is untestable on fresh models (gamma=1/beta=0
    # everywhere) — it is pinned by attribute-order analysis instead.
    ('convnext_pin', 'pin', dict(backbone='convnext', aux=0, n_out=2,
                                 attention=False, normalization='ln',
                                 tol=1e-3)),
    ('resnet_pin_ln', 'pin', dict(backbone='resnet', aux=0, n_out=2,
                                  attention=False, normalization='ln',
                                  tol=1e-3)),
    # exact recpin control: same topology as recresnet_pin_ln minus the
    # LayerNorms — isolates the statistical case's looseness to LN chaos
    ('recresnet_pin', 'recpin', dict(backbone='resnet', aux=0,
                                     attention=False, tol=1e-4)),
    ('recresnet_pin_ln', 'recpin', dict(backbone='resnet', aux=0, n_out=2,
                                        attention=False,
                                        normalization='ln', stat=True)),
    ('resnet_spc_lcb', 'post', dict(backbone='resnet', upsampling='spc',
                                    scale=4, aux=0, attention=False,
                                    localcon=True)),
    ('recresnet_spc', 'rec', dict(backbone='resnet', upsampling='spc',
                                  scale=4, aux=0, attention=False)),
    ('recdensenet_rc', 'rec', dict(backbone='densenet', upsampling='rc',
                                   scale=4, aux=0, attention=False)),
    ('unet_pin_spc', 'unet', dict(aux=0, attention=False,
                                  decoder_upsampling='spc')),
]


def build_pair(label, family, cfg, ref):
    jax = _jax_cpu()
    import jax.numpy as jnp  # noqa: F401
    import dl4ds_tpu as dds

    n_ch, n_blocks, n_filters = 1, 2, 6
    lr, scale = 8, cfg.get('scale', 4)
    tw = 3
    aux = cfg.get('aux', 0)
    norm = cfg.get('normalization')
    att = cfg.get('attention', False)
    lcb = cfg.get('localcon', False)
    n_out = cfg.get('n_out', 1)

    if family == 'post':
        tfm = ref.models.net_postupsampling(
            backbone_block=cfg['backbone'], upsampling=cfg['upsampling'],
            scale=scale, n_channels=n_ch, n_aux_channels=aux,
            lr_size=(lr, lr), n_filters=n_filters, n_blocks=n_blocks,
            normalization=norm, attention=att, localcon_layer=lcb)
        m = dds.net_postupsampling(
            cfg['backbone'], cfg['upsampling'], scale=scale,
            n_channels=n_ch, n_aux_channels=aux, lr_size=(lr, lr),
            n_filters=n_filters, n_blocks=n_blocks, normalization=norm,
            attention=att, localcon_layer=lcb)
        x = np.random.default_rng(3).standard_normal(
            (2, lr, lr, n_ch)).astype('float32')
    elif family == 'pin':
        hr = lr * scale
        tfm = ref.models.net_pin(
            backbone_block=cfg['backbone'], n_channels=n_ch,
            n_aux_channels=aux, hr_size=(hr, hr), n_filters=n_filters,
            n_blocks=n_blocks, n_channels_out=n_out, normalization=norm,
            attention=att, localcon_layer=lcb)
        m = dds.net_pin(
            cfg['backbone'], n_channels=n_ch, n_aux_channels=aux,
            hr_size=(hr, hr), n_filters=n_filters, n_blocks=n_blocks,
            n_channels_out=n_out, normalization=norm, attention=att,
            localcon_layer=lcb)
        x = np.random.default_rng(3).standard_normal(
            (2, hr, hr, n_ch)).astype('float32')
    elif family == 'rec':
        tfm = ref.models.recnet_postupsampling(
            backbone_block=cfg['backbone'], upsampling=cfg['upsampling'],
            scale=scale, n_channels=n_ch, n_aux_channels=aux,
            lr_size=(lr, lr), time_window=tw, n_filters=n_filters,
            n_blocks=n_blocks, normalization=norm, attention=att,
            localcon_layer=lcb)
        m = dds.recnet_postupsampling(
            cfg['backbone'], cfg['upsampling'], scale=scale,
            n_channels=n_ch, n_aux_channels=aux, lr_size=(lr, lr),
            time_window=tw, n_filters=n_filters, n_blocks=n_blocks,
            normalization=norm, attention=att, localcon_layer=lcb)
        x = np.random.default_rng(3).standard_normal(
            (2, tw, lr, lr, n_ch)).astype('float32')
    elif family == 'recpin':
        hr = lr * scale
        tfm = ref.models.recnet_pin(
            backbone_block=cfg['backbone'], n_channels=n_ch,
            n_aux_channels=aux, hr_size=(hr, hr), time_window=tw,
            n_filters=n_filters, n_blocks=1, n_channels_out=n_out,
            normalization=norm, attention=att, localcon_layer=lcb)
        m = dds.recnet_pin(
            cfg['backbone'], n_channels=n_ch, n_aux_channels=aux,
            hr_size=(hr, hr), time_window=tw, n_filters=n_filters,
            n_blocks=1, n_channels_out=n_out, normalization=norm,
            attention=att, localcon_layer=lcb)
        x = np.random.default_rng(3).standard_normal(
            (2, tw, hr, hr, n_ch)).astype('float32')
    elif family == 'unet':
        # non-square grid: the reference's square-grid unet builds
        # None-shaped inputs and its PadConcat crashes on them
        hu, wu = 32, 48
        tfm = ref.models.unet_pin(
            backbone_block='unet', n_channels=n_ch, n_aux_channels=aux,
            hr_size=(hu, wu), n_filters=n_filters, n_blocks=2,
            attention=att, decoder_upsampling=cfg['decoder_upsampling'],
            localcon_layer=lcb)
        m = dds.unet_pin(
            'unet', n_channels=n_ch, n_aux_channels=aux, hr_size=(hu, wu),
            n_filters=n_filters, n_blocks=2, attention=att,
            decoder_upsampling=cfg['decoder_upsampling'],
            localcon_layer=lcb)
        x = np.random.default_rng(3).standard_normal(
            (2, hu, wu, n_ch)).astype('float32')
    else:
        raise ValueError(family)

    s = None
    if aux:
        hw = lr * scale if family in ('post', 'rec') else lr * scale
        s = np.random.default_rng(4).standard_normal(
            (2, hw, hw, aux)).astype('float32') if family != 'rec' else \
            np.random.default_rng(4).standard_normal(
                (2, hw, hw, aux)).astype('float32')
    return tfm, m, x, s


def run_case(label, family, cfg, ref):
    import jax
    from dl4ds_tpu.compat import import_keras_weights
    tfm, m, x, s = build_pair(label, family, cfg, ref)
    variables = m.init(jax.random.PRNGKey(0), batch_size=x.shape[0])
    try:
        variables = import_keras_weights(m, variables, tfm)
    except Exception as e:
        print(f'{label}: IMPORT FAIL: {type(e).__name__}: {e}')
        return False, None
    inputs = [x] if s is None else [x, s]
    y_tf = np.asarray(tfm(inputs if len(inputs) > 1 else inputs[0],
                          training=False))
    y_jx = np.asarray(m.apply(variables, x, s, training=False))
    d = _maxdiff(y_tf, y_jx)
    if cfg.get('stat'):
        corr = float(np.corrcoef(np.asarray(y_tf).ravel(),
                                 np.asarray(y_jx).ravel())[0, 1])
        ok = corr > 0.95
        print(f'{label}: corr={corr:.4f} maxdiff={d:.3e} '
              f'{"OK" if ok else "MISMATCH"} (statistical: chaotic '
              'untrained-LN recurrence)')
        return ok, d
    ok = d < cfg.get('tol', 5e-5)
    print(f'{label}: maxdiff={d:.3e} {"OK" if ok else "MISMATCH"} '
          f'(tf {np.asarray(y_tf).shape} jx {np.asarray(y_jx).shape})')
    return ok, d


def main():
    import json
    only = sys.argv[1:] or None
    ref = _import_reference()
    results, fails = {}, 0
    for label, family, cfg in CASES:
        if only and label not in only:
            continue
        try:
            ok, d = run_case(label, family, cfg, ref)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f'{label}: ERROR {type(e).__name__}: {e}')
            ok, d = False, None
        results[label] = {
            'ok': bool(ok),
            'maxdiff': None if d is None else float(d),
            'criterion': ('corr>0.95' if cfg.get('stat') else
                          f"maxdiff<{cfg.get('tol', 5e-5):g}"),
        }
        fails += (not ok)
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'COMPAT.json')
        with open(out, 'w') as fh:
            json.dump({'note': 'forward parity of reference-trained Keras '
                               'weights imported via dl4ds_tpu.compat; '
                               'generated by tools/compat_matrix.py',
                       'cases': results}, fh, indent=2)
        print('wrote', out)
    print('FAILS:', fails)
    sys.exit(1 if fails else 0)


if __name__ == '__main__':
    main()
