"""Serving-artifact tests: jax.export round-trips of the frozen forward
(symbolic-batch StableHLO blob == direct apply)."""

import numpy as np
import jax
import jax.numpy as jnp

from dl4ds_tpu import save_serving_artifact, load_serving_artifact
from dl4ds_tpu.export import export_forward
from dl4ds_tpu.models import (net_postupsampling, recnet_postupsampling)


def test_export_poly_batch_roundtrip(rng, tmp_path):
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=2, attention=True)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    nbytes = save_serving_artifact(model, variables, str(tmp_path / 'm'))
    assert nbytes > 0
    call, meta = load_serving_artifact(str(tmp_path / 'm'))
    assert meta['name'] == model.name
    # ONE artifact serves multiple batch sizes (symbolic batch dim)
    for b in (2, 5):
        x = rng.standard_normal((b, 16, 16, 1)).astype('float32')
        y_direct = np.asarray(model.module.apply(
            variables, jnp.asarray(x), None, training=False))
        y_served = np.asarray(call(x))
        assert y_served.shape == (b, 64, 64, 1)
        np.testing.assert_allclose(y_served, y_direct, atol=1e-6)


def test_export_with_aux(rng, tmp_path):
    model = net_postupsampling('convnet', 'rc', scale=2, n_channels=1,
                               n_aux_channels=2, lr_size=(16, 16),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    save_serving_artifact(model, variables, str(tmp_path / 'm'))
    call, _ = load_serving_artifact(str(tmp_path / 'm'))
    x = rng.standard_normal((3, 16, 16, 1)).astype('float32')
    aux = rng.standard_normal((3, 32, 32, 2)).astype('float32')
    y_direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), jnp.asarray(aux), training=False))
    np.testing.assert_allclose(np.asarray(call(x, aux)), y_direct,
                               atol=1e-6)


def test_export_static_batch_spatiotemporal(rng, tmp_path):
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(16, 16),
                                  time_window=3, n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    exp = export_forward(model, variables, batch=2)
    x = rng.standard_normal((2, 3, 16, 16, 1)).astype('float32')
    y_direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    np.testing.assert_allclose(np.asarray(exp.call(jnp.asarray(x))),
                               y_direct, atol=1e-6)


def test_export_poly_batch_spatiotemporal_tpu_gate(rng, tmp_path,
                                                   monkeypatch):
    """batch='poly' export of a spatio-temporal model must trace even when
    the default backend reports TPU: the symbolic batch dim cannot be
    tiled by the fused Pallas ConvLSTM, so the gate (models/blocks.py)
    must fall back to the XLA recurrence instead of crashing on
    min(b, 32) / b % bt over a symbolic dimension."""
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(16, 16),
                                  time_window=3, n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((2, 3, 16, 16, 1)).astype('float32')
    y_direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    # patch ONLY the export trace (a concrete-batch apply under the patch
    # would try a real Mosaic lowering on CPU); lower for cpu so exp.call
    # runs here
    with monkeypatch.context() as m:
        m.setattr(jax, 'default_backend', lambda: 'tpu')
        exp = export_forward(model, variables, batch='poly',
                             platforms=['cpu'])
    np.testing.assert_allclose(np.asarray(exp.call(jnp.asarray(x))),
                               y_direct, atol=1e-6)


def test_export_spatial_size_override_full_grid(rng):
    """A patch-trained model exports a FULL-GRID artifact via
    spatial_size= (the networks are fully convolutional)."""
    from dl4ds_tpu.models import net_postupsampling
    from dl4ds_tpu.export import export_forward

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=1, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    exp = export_forward(model, variables, batch=2, spatial_size=(12, 12))
    x = rng.standard_normal((2, 12, 12, 1)).astype('float32')
    aux = rng.standard_normal((2, 24, 24, 1)).astype('float32')
    y = np.asarray(exp.call(jnp.asarray(x), jnp.asarray(aux)))
    y_ref = np.asarray(model.module.apply(variables, jnp.asarray(x),
                                          jnp.asarray(aux), training=False))
    assert y.shape == (2, 24, 24, 1)
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_export_meta_aux_shape_scales_with_spatial_size(tmp_path, rng):
    """serving_meta.json must describe the exported program's ACTUAL aux
    signature when spatial_size overrides the trace shape."""
    from dl4ds_tpu.models import net_postupsampling
    from dl4ds_tpu.export import save_serving_artifact, load_serving_artifact

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=1, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    save_serving_artifact(model, variables, str(tmp_path), batch=2,
                          spatial_size=(12, 12))
    call, meta = load_serving_artifact(str(tmp_path))
    assert meta['input_shape'] == [12, 12, 1]
    assert meta['aux_shape'] == [24, 24, 1]
    x = rng.standard_normal((2, *meta['input_shape'])).astype('float32')
    aux = rng.standard_normal((2, *meta['aux_shape'])).astype('float32')
    assert np.asarray(call(x, aux)).shape == (2, 24, 24, 1)


def test_export_quantized_int8_roundtrip(rng, tmp_path):
    """quantize='int8' freezes the calibrated int8 replay: the served
    artifact matches the LIVE quantize_forward exactly and stays close
    to the float forward; meta records the mode."""
    import pytest
    from dl4ds_tpu.quantization import quantize_forward

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    calib = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    save_serving_artifact(model, variables, str(tmp_path / 'q'),
                          batch=2, quantize='int8', calibration=calib)
    call, meta = load_serving_artifact(str(tmp_path / 'q'))
    assert meta['quantize'] == 'int8'
    assert meta['batch'] == 2
    qf = quantize_forward(model, variables, calib)
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    y_live = np.asarray(qf(jnp.asarray(x)))
    y_served = np.asarray(call(x))
    np.testing.assert_allclose(y_served, y_live, atol=1e-6)
    y_float = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    # int8 quantization error stays bounded relative to the output range
    # (loose: an UNTRAINED 4-filter model on N(0,1) inputs is the
    # worst case for per-tensor activation scales; trained-model int8
    # accuracy is covered by ACCURACY.json / tools/int8_probe.py)
    assert np.max(np.abs(y_served - y_float)) < 0.3 * np.ptp(y_float)
    # the replay is shape-pinned: wrong-batch calls fail loudly
    with pytest.raises(Exception):
        call(rng.standard_normal((3, 8, 8, 1)).astype('float32'))


def test_export_quantized_contracts(rng, tmp_path):
    """Shape-pinning contracts: poly batch, batch mismatch, spatial_size
    and missing calibration are all rejected with actionable errors."""
    import pytest

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    calib = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    with pytest.raises(ValueError, match='shape-pinned'):
        export_forward(model, variables, batch='poly', quantize='int8',
                       calibration=calib)
    with pytest.raises(ValueError, match='calibration batch'):
        export_forward(model, variables, batch=4, quantize='int8',
                       calibration=calib)
    with pytest.raises(ValueError, match='calibration'):
        export_forward(model, variables, batch=2, quantize='int8')
    with pytest.raises(ValueError, match='spatial_size'):
        export_forward(model, variables, batch=2, quantize='int8',
                       calibration=calib, spatial_size=(12, 12))


def test_export_quantized_with_aux_weight_only(rng, tmp_path):
    """weight-only export of an aux-input model round-trips through the
    server-side loader."""
    from dl4ds_tpu.quantization import quantize_forward

    model = net_postupsampling('convnet', 'rc', scale=2, n_channels=1,
                               n_aux_channels=2, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), batch_size=2)
    calib = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    calib_aux = rng.standard_normal((2, 16, 16, 2)).astype('float32')
    save_serving_artifact(model, variables, str(tmp_path / 'q'), batch=2,
                          quantize='weight-only', calibration=calib,
                          calibration_aux=calib_aux)
    call, meta = load_serving_artifact(str(tmp_path / 'q'))
    assert meta['quantize'] == 'weight-only'
    assert meta['aux_shape'] == [16, 16, 2]
    qf = quantize_forward(model, variables, calib, calibration_aux=calib_aux,
                          mode='weight-only')
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    aux = rng.standard_normal((2, 16, 16, 2)).astype('float32')
    np.testing.assert_allclose(
        np.asarray(call(x, aux)),
        np.asarray(qf(jnp.asarray(x), jnp.asarray(aux))), atol=1e-6)
