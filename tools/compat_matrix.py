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
    # floor is TF-side). LN ORDER on fresh models is invisible
    # (gamma=1/beta=0 everywhere); the randomize=True cases pin it with
    # distinct per-tensor values.
    ('convnext_pin', 'pin', dict(backbone='convnext', aux=0, n_out=2,
                                 attention=False, normalization='ln',
                                 tol=1e-3)),
    ('resnet_pin_ln', 'pin', dict(backbone='resnet', aux=0, n_out=2,
                                  attention=False, normalization='ln',
                                  tol=1e-3)),
    # exact recpin control: same topology as recresnet_pin_ln minus the
    # LayerNorms
    ('recresnet_pin', 'recpin', dict(backbone='resnet', aux=0,
                                     attention=False, tol=1e-4)),
    # EXACT since round 5: this row was `corr>0.95` statistical through
    # round 4 (maxdiff ~1.97), attributed to untrained-LN recurrence
    # chaos — the true cause was the rank-5 head-attention quirk (the
    # reference pools over (T, H); see ChannelAttention2D.time_window).
    # With the quirk replicated the row is numerically exact. tol matches
    # the other LN rows (1e-3, vs 1e-4 for no-LN): f32 rsqrt differences
    # amplify through T=3 recurrent LayerNorms — measured maxdiff
    # ~1.6e-4, an order under the bound; the tw=2 row below pins the
    # MAPPING at 1e-4 before the recurrence can amplify.
    ('recresnet_pin_ln', 'recpin', dict(backbone='resnet', aux=0, n_out=2,
                                        attention=False,
                                        normalization='ln', tol=1e-3)),
    # step-bounded exact check for the recurrent-LN MAPPING: at tw=2 the
    # recurrent kernel wh contributes exactly once (h0=0 at tw=1 would
    # leave it untested), before the T-step LN chaos that forces the
    # tw=3 row above to a statistical criterion can amplify. randomize:
    # fresh LN weights are gamma=1/beta=0 everywhere (order invisible)
    # AND put the activations in the degenerate near-symmetric regime
    # whose tiny stds amplify f32 noise — distinct random weights pin
    # the LN order and keep the comparison in the well-conditioned regime
    ('recresnet_pin_ln_t2', 'recpin', dict(backbone='resnet', aux=0,
                                           n_out=2, attention=False,
                                           normalization='ln', tw=2,
                                           randomize=True, tol=1e-4)),
    ('resnet_spc_lcb', 'post', dict(backbone='resnet', upsampling='spc',
                                    scale=4, aux=0, attention=False,
                                    localcon=True)),
    ('recresnet_spc', 'rec', dict(backbone='resnet', upsampling='spc',
                                  scale=4, aux=0, attention=False)),
    ('recdensenet_rc', 'rec', dict(backbone='densenet', upsampling='rc',
                                   scale=4, aux=0, attention=False)),
    # recnet WITH an HR-aux branch: exercises _walk_rec's aux-BEFORE-
    # localcon auto-naming (ConvBlock_0 is the aux block)
    ('recresnet_spc_aux', 'rec', dict(backbone='resnet', upsampling='spc',
                                      scale=4, aux=2, attention=False)),
    # dc at scale 8: the tied deconv_2of3 two-use mapping
    ('resnet_dc8', 'post', dict(backbone='resnet', upsampling='dc',
                                scale=8, aux=0, attention=False)),
    ('unet_pin_spc', 'unet', dict(aux=0, attention=False,
                                  decoder_upsampling='spc')),
    ('unet_pin_rc', 'unet', dict(aux=0, attention=False,
                                 decoder_upsampling='rc')),
    ('unet_pin_dc', 'unet', dict(aux=0, attention=False,
                                 decoder_upsampling='dc')),
    # bn: Keras BatchNormalization -> flax params + batch_stats. Fresh
    # bn weights are degenerate (gamma=1, beta=0, mean=0, var=1 — any
    # ordering "matches"), so the REFERENCE weights are randomized first;
    # inference-mode bn is then a distinct affine per layer and a wrong
    # mapping cannot pass
    ('resnet_spc_bn', 'post', dict(backbone='resnet', upsampling='spc',
                                   scale=4, aux=0, attention=False,
                                   normalization='bn', randomize=True,
                                   tol=1e-3)),
]


def build_pair(label, family, cfg, ref):
    jax = _jax_cpu()
    import jax.numpy as jnp  # noqa: F401
    import dl4ds_tpu as dds

    n_ch, n_blocks, n_filters = 1, 2, 6
    lr, scale = 8, cfg.get('scale', 4)
    tw = cfg.get('tw', 3)
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
    if cfg.get('randomize'):
        # fresh norm weights are degenerate (see CASES comment); give the
        # reference model distinct values per tensor so the mapping order
        # is actually pinned. Variances must stay positive.
        rnd = np.random.default_rng(7)
        new = []
        for w in tfm.weights:
            a = (0.3 * rnd.standard_normal(w.shape)).astype('float32')
            if 'variance' in w.name:
                a = np.abs(a) + 0.5
            new.append(a)
        tfm.set_weights(new)
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
            # consumers scanning 'ok' must see HOW a row passed: 'exact'
            # rows are numeric maxdiff bounds; 'statistical' rows
            # (untrained-LN recurrence chaos) pass on correlation, with a
            # step-bounded exact companion row (recresnet_pin_ln_t2)
            # pinning that the weight MAPPING itself is exact
            'criterion_kind': ('statistical' if cfg.get('stat')
                               else 'exact'),
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
