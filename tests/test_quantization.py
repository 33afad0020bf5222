"""Int8 post-training quantization: jaxpr-level conv rewrite
(dl4ds_tpu/quantization.py). Correctness vs the float forward on the
CPU mesh; the TPU speed claim lives in tools/int8_probe.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl4ds_tpu.models import (net_postupsampling, net_pin, unet_pin,
                              recnet_postupsampling)
from dl4ds_tpu.quantization import quantize_forward


def _rel_err(a, b):
    a, b = np.asarray(a, 'float32'), np.asarray(b, 'float32')
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-12))


def _calib(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        'float32')


def test_int8_resnet_spc_close_to_float():
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=8, n_blocks=2, attention=True)
    variables = model.init(jax.random.PRNGKey(0), batch_size=4)
    x = _calib((4, 16, 16, 1))
    qf = quantize_forward(model, variables, x)
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    y_q = qf(x)
    assert qf.n_sites >= 6          # stem + blocks + head convs
    assert y_q.shape == y_f32.shape
    assert _rel_err(y_q, y_f32) < 0.08

    # fresh inputs from the same distribution (calibration generalizes)
    x2 = _calib((4, 16, 16, 1), seed=1)
    y2 = model.module.apply(variables, jnp.asarray(x2), None,
                            training=False)
    assert _rel_err(qf(x2), y2) < 0.12


def test_weight_only_mode_tighter_than_int8():
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(32, 32), n_filters=8, n_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 32, 32, 1))
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    e_w = _rel_err(quantize_forward(model, variables, x,
                                    mode='weight-only')(x), y_f32)
    e_q = _rel_err(quantize_forward(model, variables, x)(x), y_f32)
    assert e_w < 0.04
    assert e_w <= e_q + 1e-6


def test_int8_unet_with_aux():
    model = unet_pin('unet', n_channels=1, n_aux_channels=1,
                     hr_size=(16, 16), n_filters=8, n_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 16, 16, 1))
    aux = _calib((2, 16, 16, 1), seed=3)
    qf = quantize_forward(model, variables, x, calibration_aux=aux)
    y_f32 = model.module.apply(variables, jnp.asarray(x), jnp.asarray(aux),
                               training=False)
    assert _rel_err(qf(x, aux), y_f32) < 0.06


def test_int8_spatiotemporal_convlstm():
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(8, 8),
                                  time_window=3, n_filters=8, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 3, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    assert _rel_err(qf(x), y_f32) < 0.08


def test_jit_compatible_and_deterministic():
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    y_eager = np.asarray(qf(x))
    y_jit = np.asarray(jax.jit(qf)(jnp.asarray(x)))
    np.testing.assert_allclose(y_eager, y_jit, atol=2e-5, rtol=2e-5)


def test_bad_mode_and_shape_errors():
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(8, 8), n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 8, 8, 1))
    with pytest.raises(ValueError, match='mode'):
        quantize_forward(model, variables, x, mode='int4')
    with pytest.raises(ValueError, match='calibration shape'):
        quantize_forward(model, variables, _calib((2, 8, 8, 3)))
    # spatial dims are free (fully convolutional): 12x12 calibrates fine
    assert quantize_forward(model, variables,
                            _calib((2, 12, 12, 1))).n_sites >= 1


def test_remat_backbone_convs_found():
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=2, remat=True)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    assert qf.n_sites >= 6          # convs inside remat bodies are reached
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    assert _rel_err(qf(x), y_f32) < 0.06


def test_quantized_forward_exports_to_stablehlo(tmp_path):
    """The quantized forward composes with jax.export: a frozen int8
    serving artifact (static shapes, variables + scales embedded)."""
    from jax import export as jexport

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    exp = jexport.export(jax.jit(qf))(
        jax.ShapeDtypeStruct((2, 8, 8, 1), jnp.float32))
    blob = exp.serialize()
    rt = jexport.deserialize(blob)
    np.testing.assert_allclose(np.asarray(rt.call(jnp.asarray(x))),
                               np.asarray(qf(x)), atol=2e-5, rtol=2e-5)


def test_scan_path_convlstm_does_not_crash():
    """time_window > 16 takes the nn.scan ConvLSTM path; scan bodies are
    default-bound (convs inside stay float) — the transform must still
    work and quantize the convs outside the recurrence."""
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(8, 8),
                                  time_window=17, n_filters=8, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = _calib((1, 17, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    assert qf.n_sites >= 1
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    assert _rel_err(qf(x), y_f32) < 0.1


def test_quantile_calibration_robust_to_outliers():
    """An outlier in the CALIBRATION batch inflates absmax scales, so
    clean serving inputs get coarse int8 resolution; quantile
    calibration keeps the scales matched to the bulk distribution."""
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(64, 64), n_filters=8, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=4)
    calib = _calib((4, 64, 64, 1))
    calib[0, 32, 32, 0] = 500.0    # polluted calibration batch
    x = _calib((4, 64, 64, 1), seed=7)   # clean serving inputs
    y_f32 = model.module.apply(variables, jnp.asarray(x), None,
                               training=False)
    e_absmax = _rel_err(quantize_forward(model, variables, calib)(x), y_f32)
    e_999 = _rel_err(quantize_forward(
        model, variables, calib, calibration_quantile=0.999)(x), y_f32)
    e_99 = _rel_err(quantize_forward(
        model, variables, calib, calibration_quantile=0.99)(x), y_f32)
    # measured on this workload: 2.59 (absmax) -> 0.44 (q=.999) -> 0.21
    assert e_99 < e_999 < e_absmax
    assert e_99 < 0.35


def test_int8_on_bf16_model():
    """bf16-dtype models (the serving default) quantize too; the replay
    returns the model's compute dtype."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=8, n_blocks=1, attention=True,
                               dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 8, 8, 1))
    qf = quantize_forward(model, variables, x)
    y_f = model.module.apply(variables, jnp.asarray(x), None, training=False)
    y_q = qf(x)
    assert y_q.dtype == y_f.dtype
    assert _rel_err(y_q, y_f) < 0.1


def test_predict_quantize_kwarg(rng):
    """predict(quantize='int8') serves the quantized forward, calibrated
    on the first device batch of the given input."""
    import dl4ds_tpu as dds
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = rng.standard_normal((5, 8, 8, 1)).astype('float32')
    y_f32 = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                        batch_size=2)
    y_q = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                      batch_size=2, quantize='int8',
                      calibration_quantile=0.999)
    assert y_q.shape == y_f32.shape == (5, 16, 16, 1)
    assert _rel_err(y_q, y_f32) < 0.2   # random-init net, 2-sample calib

    # tiled int8 (window dispatches through the calibrated replay): same
    # shape, and close to full precision up to tiling (the default output
    # head's GLOBAL channel attention sees windows, not the full grid)
    # and window-calibration differences
    y_qt = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                       quantize='int8', tile=4, halo=2, batch_size=2)
    assert y_qt.shape == y_f32.shape
    assert _rel_err(y_qt, y_f32) < 0.5


def test_predict_explicit_calibration_fixes_skewed_first_batch(rng):
    """VERDICT r3 #5: the default first-batch calibration mis-scales when
    that batch is unrepresentative; `calibration=` (a model-ready batch)
    restores accuracy on the clean samples."""
    import dl4ds_tpu as dds
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(64, 64), n_filters=8, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=4)
    x = rng.standard_normal((8, 64, 64, 1)).astype('float32')
    x[:4] *= 60.0        # skewed FIRST batch: absmax scales blow up
    clean_ref = rng.standard_normal((4, 64, 64, 1)).astype('float32')

    y_f32 = dds.predict((model, variables), x, scale=1, array_in_hr=True,
                        batch_size=4, interpolation='nearest')
    y_default = dds.predict((model, variables), x, scale=1,
                            array_in_hr=True, batch_size=4,
                            interpolation='nearest', quantize='int8')
    y_calib = dds.predict((model, variables), x, scale=1, array_in_hr=True,
                          batch_size=4, interpolation='nearest',
                          quantize='int8', calibration=clean_ref)
    # on the CLEAN tail samples the explicit calibration must beat the
    # skewed default by a wide margin and sit close to full precision
    e_default = _rel_err(y_default[4:], y_f32[4:])
    e_calib = _rel_err(y_calib[4:], y_f32[4:])
    assert e_calib < 0.1
    assert e_calib < 0.5 * e_default

    # fewer calibration samples than batch_size are cycled up
    y_small = dds.predict((model, variables), x, scale=1, array_in_hr=True,
                          batch_size=4, interpolation='nearest',
                          quantize='int8', calibration=clean_ref[:2])
    assert _rel_err(y_small[4:], y_f32[4:]) < 0.15

    # guard rails
    with pytest.raises(ValueError, match='calibration'):
        dds.predict((model, variables), x, scale=1, array_in_hr=True,
                    calibration=clean_ref)       # no quantize=
    with pytest.raises(ValueError, match='model-ready'):
        dds.predict((model, variables), x, scale=1, array_in_hr=True,
                    quantize='int8',
                    calibration=clean_ref[..., :0])  # wrong channels


def test_predict_calibration_aux_required_and_used(rng):
    """Models with an HR-aux branch require calibration_aux alongside
    calibration; passing both runs the quantized forward end to end."""
    import dl4ds_tpu as dds
    model = unet_pin('unet', n_channels=2, n_aux_channels=1,
                     hr_size=(16, 16), n_filters=8, n_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), batch_size=4)
    x = rng.standard_normal((4, 16, 16, 1)).astype('float32')
    static = [rng.standard_normal((16, 16)).astype('float32')]
    calib = rng.standard_normal((4, 16, 16, 2)).astype('float32')
    calib_aux = rng.standard_normal((4, 16, 16, 1)).astype('float32')

    with pytest.raises(ValueError, match='calibration_aux'):
        dds.predict((model, variables), x, scale=1, array_in_hr=True,
                    static_vars=static, interpolation='nearest',
                    batch_size=4, quantize='int8', calibration=calib)
    y_f32 = dds.predict((model, variables), x, scale=1, array_in_hr=True,
                        static_vars=static, interpolation='nearest',
                        batch_size=4)
    y_q = dds.predict((model, variables), x, scale=1, array_in_hr=True,
                      static_vars=static, interpolation='nearest',
                      batch_size=4, quantize='int8', calibration=calib,
                      calibration_aux=calib_aux)
    assert y_q.shape == y_f32.shape


@pytest.mark.smoke
def test_int8_narrow_width_warns_wide_does_not():
    """int8 on a narrow model is MEASURED slower than bf16 on v5e
    (INFER.json 0.759x at tutorial width vs INT8.json 1.7x at width 64),
    so quantize_forward must warn instead of silently deoptimizing;
    weight-only (float conv math) and wide models stay silent."""
    import warnings
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(16, 16), n_filters=8, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    x = _calib((2, 16, 16, 1))
    with pytest.warns(RuntimeWarning, match='width-8.*SLOWER'):
        quantize_forward(model, variables, x)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        quantize_forward(model, variables, x, mode='weight-only')

    wide = net_pin('convnet', n_channels=1, n_aux_channels=0,
                   hr_size=(8, 8), n_filters=64, n_blocks=1)
    wvars = wide.init(jax.random.PRNGKey(0), batch_size=1)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        quantize_forward(wide, wvars, _calib((1, 8, 8, 1)))
