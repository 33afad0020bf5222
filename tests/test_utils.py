"""Utility tests: reshaping, cropping, validators, Timing, distributed
helpers."""

import numpy as np
import pytest

import dl4ds_tpu as dds
from dl4ds_tpu.utils import (crop_array, checkarray_ndim,
                             spatial_to_spatiotemporal_samples,
                             spatiotemporal_to_spatial_samples, Timing,
                             checkarg_loss)


def test_spatial_spatiotemporal_roundtrip(rng):
    x = rng.standard_normal((20, 8, 8, 1)).astype('float32')
    spt = spatial_to_spatiotemporal_samples(x, 5)
    assert spt.shape == (16, 5, 8, 8, 1)
    np.testing.assert_array_equal(spt[3], x[3:8])
    back = spatiotemporal_to_spatial_samples(spt, 5)
    np.testing.assert_array_equal(back, x)


def test_spatiotemporal_wrong_window_raises(rng):
    x = rng.standard_normal((4, 5, 8, 8, 1))
    with pytest.raises(ValueError):
        spatiotemporal_to_spatial_samples(x, 3)


def test_checkarray_ndim():
    x = np.zeros((4, 4))
    assert checkarray_ndim(x, 3, -1).shape == (4, 4, 1)
    assert checkarray_ndim(x, 4, 0).shape == (1, 1, 4, 4)
    assert checkarray_ndim(np.zeros((2, 3, 4)), 3).shape == (2, 3, 4)


@pytest.mark.parametrize('ndim,shape,spatial', [
    (2, (12, 14), (0, 1)),
    (3, (12, 14, 2), (0, 1)),
    (4, (5, 12, 14, 2), (1, 2)),
    (5, (5, 3, 12, 14, 2), (2, 3)),
])
def test_crop_array_axes(ndim, shape, spatial, rng):
    x = rng.standard_normal(shape)
    out, y, cx = crop_array(x, 8, position=True)
    assert out.shape[spatial[0]] == 8 and out.shape[spatial[1]] == 8
    out2 = crop_array(x, 8, yx=(y, cx))
    np.testing.assert_array_equal(out, out2)


def test_crop_array_errors(rng):
    with pytest.raises(ValueError):
        crop_array(rng.standard_normal((4, 4)), 8)
    with pytest.raises(TypeError):
        crop_array(rng.standard_normal((8, 8)), 4.5)
    with pytest.raises(TypeError):
        crop_array(rng.standard_normal((8,)), 4)


def test_checkarg_loss_resolution():
    from dl4ds_tpu import losses
    assert checkarg_loss('mae') is losses.mae
    assert checkarg_loss('msdssim_mae_mse') is losses.msdssim_mae_mse
    assert checkarg_loss(losses.mse) is losses.mse
    with pytest.raises(ValueError):
        checkarg_loss('nope')
    with pytest.raises(TypeError):
        checkarg_loss(3)


def test_timing_runs(capsys):
    t = Timing(verbose=True)
    t.checktime()
    t.runtime()
    assert t.running_time is not None
    assert len(t.checktimes) == 1


def test_distributed_helpers():
    from dl4ds_tpu import distributed
    assert distributed.process_index() == 0
    assert distributed.process_count() == 1
    assert not distributed.is_multi_host()
    mesh = distributed.global_mesh()
    assert mesh.size == 8


def test_pair_debug_mode(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    hr = rng.standard_normal((16, 16, 1)).astype('float32')
    dds.create_pair_hr_lr(hr, None, 'spc', scale=4, patch_size=8, debug=True)
    import os
    assert os.path.exists('dl4ds_pair_debug.png')


def test_plot_history_grid_and_extras(tmp_path):
    """plot_history parity features (ref utils.py:409-672): grid PNG,
    multi-run overlay, monitor-best marker, single_graphs, max_epochs."""
    import os
    from dl4ds_tpu.utils import plot_history
    import matplotlib.pyplot as plt

    h1 = {'loss': [3.0, 2.0, 1.0, 0.9], 'val_loss': [3.1, 2.5, 1.2, 1.3],
          'mae': [1.0, 0.8, 0.6, 0.5]}
    h2 = {'loss': [2.8, 1.9, 1.1], 'val_loss': [2.9, 2.2, 1.4]}
    p = str(tmp_path / 'curves.png')
    fig, axes = plot_history([h1, h2], path=p, monitor='val_loss',
                             monitor_mode='min', max_epochs='min')
    assert os.path.exists(p)
    plt.close(fig)
    figs, _ = plot_history(h1, path=str(tmp_path / 'single.png'),
                           single_graphs=True)
    assert os.path.exists(str(tmp_path / 'single_loss.png'))
    assert os.path.exists(str(tmp_path / 'single_mae.png'))
    for f in figs:
        plt.close(f)
    import pytest
    with pytest.raises(ValueError):
        plot_history(h1, monitor_mode='bogus')


def test_plot_history_positional_path_back_compat(tmp_path, monkeypatch):
    """Old positional signature plot_history(history, path) must keep working
    for any image extension, not just '.png' (regression: 'curve.jpeg' was
    consumed as a matplotlib style string and raised)."""
    import os
    import matplotlib.pyplot as plt
    from dl4ds_tpu.utils import plot_history

    monkeypatch.chdir(tmp_path)
    h = {'loss': [2.0, 1.0], 'val_loss': [2.2, 1.5]}
    for fname in ('curve.jpeg', 'curve.jpg', 'curve.pdf'):
        fig, _ = plot_history(h, fname)  # positional, no '/' in the path
        assert os.path.exists(str(tmp_path / fname))
        plt.close(fig)


def test_crop_array_with_modern_generator():
    """crop_array must accept np.random.default_rng() Generators (they have
    .integers, not .randint) as well as legacy RandomState/np.random."""
    from dl4ds_tpu.utils import crop_array
    arr = np.arange(32 * 32, dtype='float32').reshape(32, 32)
    out, y, x = crop_array(arr, 8, rng=np.random.default_rng(0),
                           position=True)
    assert out.shape == (8, 8)
    assert np.array_equal(out, arr[y:y + 8, x:x + 8])
    out2 = crop_array(arr, 8, rng=np.random.RandomState(0))
    assert out2.shape == (8, 8)


def test_crop_exclude_borders_raises_when_impossible(rng):
    from dl4ds_tpu.utils import crop_array
    with pytest.raises(ValueError, match='cannot crop'):
        crop_array(np.zeros((10, 10)), 9, exclude_borders=True)
    # still fine without the border exclusion
    out = crop_array(np.zeros((10, 10)), 9)
    assert out.shape == (9, 9)


def test_plot_history_val_only_and_empty(tmp_path):
    from dl4ds_tpu.utils import plot_history
    fig = plot_history({'val_loss': [0.5, 0.4]})
    assert fig is not None
    fig = plot_history({'loss': []})   # dead run: no crash
    assert fig is not None
