"""Scaler tests (parity with dl4ds/preprocessing.py semantics)."""

import numpy as np
import pytest

from dl4ds_tpu import MinMaxScaler, StandardScaler


def test_minmax_roundtrip(rng):
    x = rng.standard_normal((20, 8, 8)) * 7 + 3
    sc = MinMaxScaler(value_range=(0, 1))
    y = sc.fit_transform(x)
    assert y.min() >= 0 and y.max() <= 1
    np.testing.assert_allclose(sc.inverse_transform(y), x, atol=1e-9)


def test_minmax_custom_range(rng):
    x = rng.random((10, 4, 4))
    sc = MinMaxScaler(value_range=(-1, 1))
    y = sc.fit_transform(x)
    np.testing.assert_allclose(y.min(), -1, atol=1e-9)
    np.testing.assert_allclose(y.max(), 1, atol=1e-9)


def test_minmax_nan_handling(rng):
    x = rng.random((10, 4, 4))
    x[0, 0, 0] = np.nan
    sc = MinMaxScaler(fillnanto=-1)
    y = sc.fit_transform(x)
    assert y[0, 0, 0] == -1            # filled on transform
    assert not np.isnan(y).any()
    inv = sc.inverse_transform(y)
    assert np.isnan(inv[0, 0, 0])      # restored on inverse


def test_minmax_axiswise(rng):
    x = rng.random((30, 4, 4)) * np.array([1, 10, 100, 1000])
    sc = MinMaxScaler(axis=(0, 1))
    y = sc.fit_transform(x)
    np.testing.assert_allclose(y.max(axis=(0, 1)), 1.0, atol=1e-9)
    np.testing.assert_allclose(y.min(axis=(0, 1)), 0.0, atol=1e-9)


def test_standard_roundtrip(rng):
    x = rng.standard_normal((50, 6, 6)) * 4 - 2
    sc = StandardScaler()
    y = sc.fit_transform(x)
    np.testing.assert_allclose(y.mean(), 0, atol=1e-9)
    np.testing.assert_allclose(y.std(), 1, atol=1e-9)
    np.testing.assert_allclose(sc.inverse_transform(y), x, atol=1e-9)


def test_standard_nan(rng):
    x = rng.standard_normal((20, 4, 4))
    x[1, 1, 1] = np.nan
    sc = StandardScaler(fillnanto=0)
    y = sc.fit_transform(x)
    assert y[1, 1, 1] == 0
    inv = sc.inverse_transform(y)
    assert np.isnan(inv[1, 1, 1])


def test_not_fitted_raises(rng):
    with pytest.raises(RuntimeError):
        MinMaxScaler().transform(rng.random((4, 4)))
    with pytest.raises(RuntimeError):
        StandardScaler().inverse_transform(rng.random((4, 4)))


def test_constant_feature_no_nan(rng):
    x = np.ones((10, 4, 4))
    y = MinMaxScaler().fit_transform(x)
    assert np.isfinite(y).all()
    y = StandardScaler().fit_transform(x)
    assert np.isfinite(y).all()


def test_refit_clears_stale_nan_mask(rng):
    from dl4ds_tpu.preprocessing import MinMaxScaler, StandardScaler
    for cls in (MinMaxScaler, StandardScaler):
        s = cls()
        dirty = rng.standard_normal((4, 8, 8)).astype('float32')
        dirty[0, 0, 0] = np.nan
        s.fit(dirty)
        clean = rng.standard_normal((4, 8, 8)).astype('float32')
        s.fit(clean)
        out = s.inverse_transform(s.transform(clean))
        assert np.isfinite(out).all(), cls.__name__
