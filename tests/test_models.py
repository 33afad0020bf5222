"""Model-zoo tests: init/forward shapes for all families x backbones, the
name-suffix contract, aux branches, LCB, dropout variants and normalization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl4ds_tpu.models import (net_postupsampling, net_pin, unet_pin,
                              recnet_postupsampling, recnet_pin,
                              residual_discriminator, build_model)

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize('backbone', ['convnet', 'resnet', 'densenet',
                                      'convnext'])
@pytest.mark.parametrize('upsampling', ['spc', 'rc', 'dc'])
def test_net_postupsampling_shapes(backbone, upsampling):
    model = net_postupsampling(backbone, upsampling, scale=4, n_channels=2,
                               n_aux_channels=0, lr_size=(8, 8), n_filters=4,
                               n_blocks=2)
    assert model.name == f'{backbone}_{upsampling}'
    variables = model.init(KEY, batch_size=2)
    x = jnp.zeros((2, 8, 8, 2))
    y = model.apply(variables, x)
    assert y.shape == (2, 32, 32, 1)


@pytest.mark.parametrize('backbone', ['convnet', 'resnet', 'densenet',
                                      'convnext'])
def test_net_pin_shapes(backbone):
    model = net_pin(backbone, n_channels=1, n_aux_channels=0,
                    hr_size=(16, 16), n_filters=4, n_blocks=2)
    assert model.name == f'{backbone}_pin'
    variables = model.init(KEY, batch_size=2)
    y = model.apply(variables, jnp.zeros((2, 16, 16, 1)))
    assert y.shape == (2, 16, 16, 1)


def test_net_with_aux_branch():
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=3,
                               n_aux_channels=2, lr_size=(8, 8), n_filters=4,
                               n_blocks=2)
    variables = model.init(KEY, batch_size=2)
    x = jnp.zeros((2, 8, 8, 3))
    aux = jnp.zeros((2, 32, 32, 2))
    y = model.apply(variables, x, aux)
    assert y.shape == (2, 32, 32, 1)


def test_localcon_layer():
    model = net_pin('resnet', n_channels=1, n_aux_channels=0,
                    hr_size=(16, 16), n_filters=4, n_blocks=1,
                    localcon_layer=True)
    variables = model.init(KEY, batch_size=2)
    y = model.apply(variables, jnp.zeros((2, 16, 16, 1)))
    assert y.shape == (2, 16, 16, 1)
    # locally connected kernel is per-pixel: [H, W, Cin, F]
    flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    assert any('local_kernel' in jax.tree_util.keystr(p) for p, _ in flat)


@pytest.mark.parametrize('decoder_upsampling', ['rc', 'spc', 'dc'])
def test_unet_pin_shapes(decoder_upsampling):
    model = unet_pin('unet', n_channels=1, n_aux_channels=0,
                     hr_size=(32, 32), n_filters=4, n_blocks=3,
                     decoder_upsampling=decoder_upsampling)
    variables = model.init(KEY, batch_size=2)
    y = model.apply(variables, jnp.zeros((2, 32, 32, 1)))
    assert y.shape == (2, 32, 32, 1)


def test_unet_autoshrink_depth():
    # 16x16 grid cannot downsample 6 times; depth must auto-shrink
    model = unet_pin('unet', n_channels=1, n_aux_channels=0,
                     hr_size=(16, 16), n_filters=4, n_blocks=6)
    variables = model.init(KEY, batch_size=1)
    y = model.apply(variables, jnp.zeros((1, 16, 16, 1)))
    assert y.shape == (1, 16, 16, 1)


@pytest.mark.parametrize('backbone', ['convnet', 'resnet', 'densenet'])
def test_recnet_postupsampling_shapes(backbone):
    model = recnet_postupsampling(backbone, 'spc', scale=4, n_channels=1,
                                  n_aux_channels=0, lr_size=(8, 8),
                                  time_window=3, n_filters=4, n_blocks=1)
    assert model.name == f'rec{backbone}_spc'
    variables = model.init(KEY, batch_size=2)
    y = model.apply(variables, jnp.zeros((2, 3, 8, 8, 1)))
    assert y.shape == (2, 3, 32, 32, 1)


@pytest.mark.parametrize('backbone', ['convnet', 'resnet', 'densenet'])
def test_recnet_pin_shapes(backbone):
    model = recnet_pin(backbone, n_channels=1, n_aux_channels=0,
                       hr_size=(16, 16), time_window=3, n_filters=4,
                       n_blocks=1)
    assert model.name == f'rec{backbone}_pin'
    variables = model.init(KEY, batch_size=2)
    y = model.apply(variables, jnp.zeros((2, 3, 16, 16, 1)))
    assert y.shape == (2, 3, 16, 16, 1)


def test_recnet_with_aux():
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=1, lr_size=(8, 8),
                                  time_window=3, n_filters=4, n_blocks=1)
    variables = model.init(KEY, batch_size=2)
    x = jnp.zeros((2, 3, 8, 8, 1))
    aux = jnp.zeros((2, 16, 16, 1))
    y = model.apply(variables, x, aux)
    assert y.shape == (2, 3, 16, 16, 1)


@pytest.mark.parametrize('upsampling,spatiotemp', [('spc', False),
                                                   ('pin', False),
                                                   ('spc', True)])
def test_discriminator_shapes(upsampling, spatiotemp):
    model = residual_discriminator(
        n_channels=1, upsampling=upsampling, is_spatiotemporal=spatiotemp,
        scale=4, lr_size=(8, 8), n_filters=4, n_res_blocks=2, time_window=3)
    if spatiotemp:
        x = jnp.zeros((2, 3, 8, 8, 1))
        ref = jnp.zeros((2, 3, 32, 32, 1))
    else:
        x = jnp.zeros((2, 8, 8, 1)) if upsampling == 'spc' \
            else jnp.zeros((2, 32, 32, 1))
        ref = jnp.zeros((2, 32, 32, 1))
    variables = model.module.init({'params': KEY, 'dropout': KEY}, x, ref,
                                  training=False)
    y = model.module.apply(variables, x, ref, training=False)
    assert y.shape == (2, 1)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


def test_build_model_dispatch():
    m = build_model('resnet', 'spc', 4, 1, 0, (8, 8), (32, 32))
    assert m.name == 'resnet_spc'
    m = build_model('unet', 'pin', 4, 1, 0, (8, 8), (32, 32))
    assert m.name == 'unet_pin'
    m = build_model('resnet', 'pin', 4, 1, 0, (8, 8), (32, 32),
                    time_window=4)
    assert m.name == 'recresnet_pin'


@pytest.mark.parametrize('variant', ['vanilla', 'gaussian', 'spatial',
                                     'mcdrop'])
def test_dropout_variants_train_and_eval(variant):
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(16, 16), n_filters=4, n_blocks=1,
                    dropout_rate=0.3, dropout_variant=variant)
    variables = model.init(KEY, batch_size=2)
    x = jnp.ones((2, 16, 16, 1))
    y_eval = model.apply(variables, x, training=False,
                         rngs={'dropout': KEY})
    y_train = model.apply(variables, x, training=True,
                          rngs={'dropout': KEY})
    assert y_eval.shape == y_train.shape == (2, 16, 16, 1)
    if variant == 'mcdrop':
        # MC dropout is stochastic even at inference
        y2 = model.apply(variables, x, training=False,
                         rngs={'dropout': jax.random.PRNGKey(9)})
        assert not np.allclose(np.asarray(y_eval), np.asarray(y2))


def test_spatial_dropout_3d_constant_over_time():
    """SpatialDropout3D semantics (ref blocks.py:659-676): with dim=3 a
    dropped channel must be zero across the entire (T, H, W) volume — the
    mask is constant over the time axis, not redrawn per timestep."""
    from dl4ds_tpu.models.blocks import Dropout

    drop = Dropout(rate=0.5, variant='spatial', dim=3)
    x = jnp.ones((2, 6, 8, 8, 16))  # (B, T, H, W, C)
    y = np.asarray(drop.apply({}, x, training=True,
                              rngs={'dropout': jax.random.PRNGKey(3)}))
    zero = (y == 0.0)
    # per (batch, channel): dropped entirely or kept entirely
    frac = zero.mean(axis=(1, 2, 3))  # (B, C)
    assert np.all((frac == 0.0) | (frac == 1.0)), \
        'dim=3 spatial dropout mask varies within the (T,H,W) volume'
    assert 0.0 < frac.mean() < 1.0  # some channels dropped, some kept
    # dim=2 on 5D input still redraws per timestep (SpatialDropout2D applied
    # per frame) — guard that dim distinguishes the two behaviors
    drop2 = Dropout(rate=0.5, variant='spatial', dim=2)
    y2 = np.asarray(drop2.apply({}, x, training=True,
                                rngs={'dropout': jax.random.PRNGKey(3)}))
    frac2 = (y2 == 0.0).mean(axis=(1, 2, 3))
    assert not np.all((frac2 == 0.0) | (frac2 == 1.0))


@pytest.mark.parametrize('norm', ['bn', 'ln'])
def test_normalization_variants(norm):
    model = net_pin('resnet', n_channels=1, n_aux_channels=0,
                    hr_size=(16, 16), n_filters=4, n_blocks=1,
                    normalization=norm)
    variables = model.init(KEY, batch_size=2)
    x = jnp.ones((2, 16, 16, 1))
    if norm == 'bn':
        assert 'batch_stats' in variables
        y, updates = model.apply(variables, x, training=True,
                                 rngs={'dropout': KEY},
                                 mutable=['batch_stats'])
        assert 'batch_stats' in updates
    else:
        y = model.apply(variables, x, training=False)
    assert y.shape == (2, 16, 16, 1)


def test_fully_convolutional_any_size():
    """Spatial nets without LCB must run on any grid size (per-shape
    recompile, mirroring the reference's None-shaped inputs)."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8), n_filters=4,
                               n_blocks=1)
    variables = model.init(KEY, batch_size=1)
    for hw in [(8, 8), (12, 20), (31, 7)]:
        y = model.apply(variables, jnp.zeros((1, *hw, 1)))
        assert y.shape == (1, hw[0] * 2, hw[1] * 2, 1)


def test_save_load_model_roundtrip(tmp_path, rng):
    from dl4ds_tpu.models import save_model, load_model
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=2,
                               n_aux_channels=1, lr_size=(8, 8), n_filters=4,
                               n_blocks=2, attention=True)
    variables = model.init(KEY, batch_size=1)
    save_model(model, variables, str(tmp_path / 'm'))
    model2, variables2 = load_model(str(tmp_path / 'm'))
    assert model2.name == model.name
    assert model2.input_shape == model.input_shape
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype('float32'))
    aux = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype('float32'))
    y1 = model.apply(variables, x, aux)
    y2 = model2.apply(variables2, x, aux)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


@pytest.mark.parametrize('upsampling', ['rc', 'dc'])
def test_recnet_other_upsamplings(upsampling):
    model = recnet_postupsampling('resnet', upsampling, scale=2,
                                  n_channels=1, n_aux_channels=0,
                                  lr_size=(8, 8), time_window=3,
                                  n_filters=4, n_blocks=1)
    variables = model.init(KEY, batch_size=1)
    y = model.apply(variables, jnp.zeros((1, 3, 8, 8, 1)))
    assert y.shape == (1, 3, 16, 16, 1)


def test_unet_with_aux():
    model = unet_pin('unet', n_channels=2, n_aux_channels=3,
                     hr_size=(32, 32), n_filters=4, n_blocks=2)
    variables = model.init(KEY, batch_size=1)
    y = model.apply(variables, jnp.zeros((1, 32, 32, 2)),
                    jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 1)


def test_remat_backbone_same_outputs_and_grads(rng):
    """Rematerialized backbone computes identical outputs and gradients."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype('float32'))
    models = [net_pin('resnet', n_channels=1, n_aux_channels=0,
                      hr_size=(16, 16), n_filters=4, n_blocks=2, remat=r)
              for r in (False, True)]
    variables = models[0].init(KEY, batch_size=2)

    def loss(m, v):
        return lambda p: jnp.mean(m.apply({'params': p}, x) ** 2)

    y0 = models[0].apply(variables, x)
    y1 = models[1].apply(variables, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    g0 = jax.grad(loss(models[0], variables))(variables['params'])
    g1 = jax.grad(loss(models[1], variables))(variables['params'])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize('scale', [2, 5, 8, 10, 20])
def test_subpixel_scale_factorizations(scale):
    """Composite pixel-shuffle factorizations (2*2=4, 2*2*2=8, 2*5=10,
    2*2*5=20, direct otherwise) — reference blocks.py:433-454."""
    from dl4ds_tpu.models.blocks import SubpixelConvolutionBlock
    mod = SubpixelConvolutionBlock(scale, 4)
    x = jnp.zeros((1, 6, 6, 4))
    variables = mod.init(KEY, x)
    y = mod.apply(variables, x)
    assert y.shape == (1, 6 * scale, 6 * scale, 4)


@pytest.mark.parametrize('scale', [2, 4, 8, 5])
def test_deconv_scale_chains(scale):
    from dl4ds_tpu.models.blocks import DeconvolutionBlock
    mod = DeconvolutionBlock(scale, 4)
    x = jnp.zeros((1, 6, 6, 2))
    variables = mod.init(KEY, x)
    y = mod.apply(variables, x)
    assert y.shape == (1, 6 * scale, 6 * scale, 4)


@pytest.mark.parametrize('scale', [3, 5])
def test_resizeconv_scales(scale):
    from dl4ds_tpu.models.blocks import ResizeConvolutionBlock
    mod = ResizeConvolutionBlock(scale, 4)
    x = jnp.zeros((1, 6, 6, 2))
    variables = mod.init(KEY, x)
    y = mod.apply(variables, x)
    assert y.shape == (1, 6 * scale, 6 * scale, 4)


def test_trainer_scale5(rng):
    """Reference default scale is 5 (supervised.py:44)."""
    import dl4ds_tpu as dds
    data = rng.standard_normal((30, 20, 20, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:20],
        data_val=data[20:25], data_test=data[25:], scale=5, batch_size=2,
        epochs=1, steps_per_epoch=1, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_unet_odd_grid():
    """pad_concat reconciles odd encoder/decoder shapes
    (reference PadConcat, blocks.py:621-656)."""
    model = unet_pin('unet', n_channels=1, n_aux_channels=0,
                     hr_size=(25, 37), n_filters=4, n_blocks=3)
    variables = model.init(KEY, batch_size=1)
    y = model.apply(variables, jnp.zeros((1, 25, 37, 1)))
    assert y.shape == (1, 25, 37, 1)


def test_reference_vocabulary_aliases():
    """Reference public names resolve here (API-discoverability parity):
    MC dropout variants, get_dropout_layer, PadConcat, rank, train_step."""
    from dl4ds_tpu.models.blocks import (
        MCDropout, MCGaussianDropout, MCSpatialDropout2D, MCSpatialDropout3D,
        get_dropout_layer, PadConcat)
    from dl4ds_tpu.training.cgan import train_step
    from dl4ds_tpu.utils import rank

    assert rank(np.zeros((2, 3, 4, 5))) == 4
    assert MCDropout(0.2).variant == 'mcdrop'
    assert MCGaussianDropout(0.2).variant == 'mcgaussiandrop'
    assert MCSpatialDropout2D(0.2).dim == 2
    assert MCSpatialDropout3D(0.2).dim == 3
    assert get_dropout_layer(0.2, 'spatial', dim=3).dim == 3
    pc = PadConcat()
    out = pc.apply({}, jnp.ones((1, 5, 5, 2)), jnp.ones((1, 8, 8, 3)))
    assert out.shape == (1, 8, 8, 5)
    assert callable(train_step)


def test_convlstm_loop_vs_scan_parity():
    """The fully-unrolled plain-loop ConvLSTM path (TPU fast path, no
    [B,T]->[T,B] transposes) must match the lax.scan path exactly, with a
    shared checkpoint-compatible param tree."""
    from dl4ds_tpu.models.blocks import ConvLSTM2D
    x = jax.random.normal(KEY, (2, 4, 8, 8, 3))
    m_loop = ConvLSTM2D(5, (3, 3), unroll=4)   # >= T: plain loop
    m_scan = ConvLSTM2D(5, (3, 3), unroll=1)   # scan
    v = m_loop.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m_scan.init(jax.random.PRNGKey(1), x))
    y_loop = m_loop.apply(v, x)
    y_scan = m_scan.apply(v, x)
    assert y_loop.shape == (2, 4, 8, 8, 5)
    np.testing.assert_allclose(np.asarray(y_loop), np.asarray(y_scan),
                               atol=1e-6)


def test_recnet_merged_head_batch_time_layout():
    """The recnet heads run per-timestep ops on a flattened [B*T] batch axis
    (rank-5 convs are ~25x slower on XLA:TPU); the flattening must keep
    sample-major order: permuting the batch permutes the output identically,
    and the aux branch must broadcast one HR field per *sample* over its
    window."""
    from dl4ds_tpu.models.nets import RecNetPostupsampling
    m = RecNetPostupsampling(backbone='resnet', upsampling='spc', scale=4,
                             time_window=3, n_filters=4, n_blocks=1)
    x = jax.random.normal(KEY, (4, 3, 8, 8, 1))
    aux = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 2))
    v = m.init(jax.random.PRNGKey(2), x, aux)
    y = m.apply(v, x, aux)
    assert y.shape == (4, 3, 32, 32, 1)
    perm = jnp.array([3, 1, 0, 2])
    y_perm = m.apply(v, x[perm], aux[perm])
    np.testing.assert_allclose(np.asarray(y_perm), np.asarray(y[perm]),
                               atol=1e-6)


def test_convlstm_bf16_consistent_across_paths():
    """For bf16 models the XLA recurrence must run AND return bf16 like the
    fused Pallas kernel does — carry init in self.dtype, not x.dtype — so
    toggling DL4DS_NO_PALLAS_CONVLSTM / moving CPU<->TPU cannot change the
    model's numerics or output dtype (ADVICE r2)."""
    from dl4ds_tpu.models.blocks import ConvLSTM2D
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 8, 8, 4)), jnp.float32)
    layer = ConvLSTM2D(5, (3, 3), dtype=jnp.bfloat16, use_pallas=False)
    v = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(v, x)
    assert y.dtype == jnp.bfloat16
    # scan path (long window) agrees with the unrolled path in bf16
    layer_scan = ConvLSTM2D(5, (3, 3), dtype=jnp.bfloat16, use_pallas=False,
                            unroll=1)
    y2 = layer_scan.apply(v, x)
    assert y2.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, 'float32'),
                               np.asarray(y2, 'float32'), atol=1e-2)


def test_mc_dropout_plain_predict_does_not_crash(rng):
    """MC variants are active at inference; plain predict()/export apply
    without rngs must fall back to a fixed mask, not crash."""
    import dl4ds_tpu as dds
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(8, 8), n_filters=4, n_blocks=1,
                    dropout_rate=0.3, dropout_variant='mcdrop')
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    y1 = dds.predict((model, variables), x, scale=2, array_in_hr=True)
    y2 = dds.predict((model, variables), x, scale=2, array_in_hr=True)
    np.testing.assert_array_equal(y1, y2)   # fixed fallback mask
    # predict_mc draws real per-member rngs -> members differ
    mean, std = dds.predict_mc((model, variables), x, scale=2, n_members=4,
                               array_in_hr=True)
    assert float(np.max(std)) > 0


def test_deconv_scale8_ties_stages_like_reference(rng):
    from dl4ds_tpu.models.blocks import DeconvolutionBlock
    blk = DeconvolutionBlock(scale=8, n_filters=4)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)))
    names = sorted(v['params'].keys())
    assert names == ['deconv_1of3', 'deconv_2of3']   # stage 3 reuses stage 2
    y = blk.apply(v, jnp.zeros((1, 4, 4, 4)))
    assert y.shape == (1, 32, 32, 4)


def test_rc_unknown_interpolation_raises(rng):
    from dl4ds_tpu.models.blocks import ResizeConvolutionBlock
    blk = ResizeConvolutionBlock(2, 4, interpolation='bicubc')
    with pytest.raises(ValueError, match='unknown rc interpolation'):
        blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 1)))


def test_convlstm_keras_default_inits():
    """Unit forget bias + orthogonal recurrent kernel (keras parity)."""
    from dl4ds_tpu.models.blocks import ConvLSTM2D
    m = ConvLSTM2D(4, use_pallas=False)
    v = m.init({'params': jax.random.PRNGKey(0)},
               jnp.zeros((1, 2, 8, 8, 1)))
    bias = np.asarray(v['params']['input_conv']['bias'])
    np.testing.assert_array_equal(bias[4:8], 1.0)    # forget-gate quarter
    np.testing.assert_array_equal(bias[:4], 0.0)
    rk = np.asarray(v['params']['cell']['recurrent_conv']['kernel'])
    flat = rk.reshape(-1, rk.shape[-1])              # orthogonal columns
    gram = flat.T @ flat
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-5)


def test_unet_depth_pinned_at_build_time(rng):
    """A patch-trained U-Net must run full-grid inference with the SAME
    parameter tree (depth pinned from hr_size at build, like the
    reference's static Input shape)."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', RuntimeWarning)
        model = unet_pin('unet', n_channels=1, n_aux_channels=0,
                         hr_size=(16, 16), n_filters=4, n_blocks=6)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    small = np.asarray(model.module.apply(
        variables, jnp.zeros((1, 16, 16, 1)), None, training=False))
    big = np.asarray(model.module.apply(
        variables, jnp.zeros((1, 64, 64, 1)), None, training=False))
    assert small.shape == (1, 16, 16, 1) and big.shape == (1, 64, 64, 1)


def test_build_model_validates_combos():
    from dl4ds_tpu.models import build_model
    with pytest.raises(ValueError, match='unet'):
        build_model('unet', 'spc', scale=4, n_channels=1, n_aux_channels=0,
                    lr_size=(8, 8), hr_size=(32, 32))
    with pytest.raises(ValueError):
        build_model('convnext', 'spc', scale=4, n_channels=1,
                    n_aux_channels=0, lr_size=(8, 8), hr_size=(32, 32),
                    time_window=4)
