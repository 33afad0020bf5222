"""Predictor / predict and metrics-suite tests."""

import os

import numpy as np
import pytest

import dl4ds_tpu as dds


@pytest.fixture(scope='module')
def trained():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((40, 16, 16, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:24],
        data_val=data[24:32], data_test=data[32:], scale=4, batch_size=2,
        epochs=1, steps_per_epoch=2, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    return tr, data


@pytest.mark.smoke
def test_predict_hr_input(trained):
    tr, data = trained
    y = dds.predict(tr, data[32:], scale=4, array_in_hr=True)
    assert y.shape == (8, 16, 16, 1)


@pytest.mark.smoke
def test_predict_lr_input(trained):
    tr, data = trained
    lr = np.asarray(
        dds.resize_array(data[32:], (4, 4), 'inter_area', squeezed=False))
    y = dds.predict(tr, lr, scale=4, array_in_hr=False)
    assert y.shape == (8, 16, 16, 1)


def test_predictor_class_with_scaler_and_save(trained, tmp_path):
    tr, data = trained
    scaler = dds.StandardScaler()
    scaler.fit(data)
    pred = dds.Predictor(tr, data[32:], scale=4, array_in_hr=True,
                         scaler=scaler, save_path=str(tmp_path),
                         save_fname='y_hat.npy')
    y = pred.run()
    assert y.shape == (8, 16, 16)  # scaler squeezes
    assert os.path.exists(os.path.join(str(tmp_path), 'y_hat.npy'))


def test_predict_return_lr(trained):
    tr, data = trained
    y, lr = dds.predict(tr, data[32:], scale=4, array_in_hr=True,
                        return_lr=True)
    assert lr.shape == (8, 4, 4, 1)


@pytest.mark.smoke
def test_predict_infers_upsampling_from_name(trained):
    tr, _ = trained
    assert tr.model.name == 'resnet_spc'
    assert tr.model.upsampling == 'spc'


def test_predict_arbitrary_grid_size(trained):
    """Fully convolutional: predict on a grid the model never saw."""
    tr, _ = trained
    rng = np.random.default_rng(3)
    big = rng.standard_normal((2, 32, 32, 1)).astype('float32')
    y = dds.predict(tr, big, scale=4, array_in_hr=True)
    assert y.shape == (2, 32, 32, 1)


def test_predict_padded_buckets_share_one_compile(trained):
    """pad_to_multiple buckets nearby grid sizes into ONE compiled shape:
    20px, 28px and 32px HR grids (5/7/8 px LR) all pad to the 8px LR bucket,
    and the jitted apply is memoized on the model so the cache persists
    ACROSS predict calls."""
    tr, _ = trained
    rng = np.random.default_rng(3)
    if hasattr(tr.model, '_cached_jit_apply'):
        del tr.model._cached_jit_apply   # fresh cache for counting
    for size in (20, 28, 32):
        big = rng.standard_normal((2, size, size, 1)).astype('float32')
        y = dds.predict(tr, big, scale=4, array_in_hr=True,
                        pad_to_multiple=8)
        assert y.shape == (2, size, size, 1), size
    # three grid sizes, one bucket shape, one jit -> exactly one compile
    assert tr.model._cached_jit_apply._cache_size() == 1
    # without bucketing, every size pays its own compile
    del tr.model._cached_jit_apply
    for size in (20, 28, 32):
        big = rng.standard_normal((2, size, size, 1)).astype('float32')
        dds.predict(tr, big, scale=4, array_in_hr=True)
    assert tr.model._cached_jit_apply._cache_size() == 3


def test_predict_padded_bucket_interior_exact_without_global_attn():
    """With output_attention=False the bucketed result matches the unpadded
    run away from the padded border (the docstring's exactness contract)."""
    rng = np.random.default_rng(11)
    data = rng.standard_normal((16, 80, 80, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:10],
        data_val=data[10:13], data_test=data[13:], scale=4, batch_size=2,
        epochs=1, steps_per_epoch=1, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, output_attention=False, save=False,
        verbose=False)
    tr.run()
    x = data[:2]                 # 80px HR -> 20px LR, bucketed up to 24
    y_pad = dds.predict(tr, x, scale=4, array_in_hr=True, pad_to_multiple=8)
    y_ref = dds.predict(tr, x, scale=4, array_in_hr=True)
    assert y_pad.shape == y_ref.shape == (2, 80, 80, 1)
    # interior = beyond the receptive field of the padded border: the conv
    # stack's RF is ~9 LR px + 4 padded px -> keep the first 7 LR px
    # (= 28 HR px) from the top/left, far from the padded right/bottom
    np.testing.assert_allclose(y_pad[:, :28, :28], y_ref[:, :28, :28],
                               atol=1e-5)


def test_compute_rmse_and_correlation(rng):
    y = rng.standard_normal((10, 8, 8, 1)).astype('float32')
    noise = 0.1 * rng.standard_normal(y.shape).astype('float32')
    y_hat = y + noise
    mse_map = dds.compute_rmse(y, y_hat, over='time')
    assert mse_map.shape == (8, 8)
    np.testing.assert_allclose(
        mse_map, np.mean(noise[..., 0] ** 2, axis=0), atol=1e-6)
    per_pair = dds.compute_rmse(y, y_hat, over='space')
    assert len(per_pair) == 10
    corr_map = dds.compute_correlation(y, y_hat, over='time', mode='pearson')
    assert corr_map.shape == (8, 8)
    assert np.nanmean(corr_map) > 0.9
    sp = dds.compute_correlation(y, y_hat, over='space', mode='spearman')
    assert len(sp) == 10 and np.mean(sp) > 0.9


def test_correlation_matches_scipy(rng):
    from scipy.stats import pearsonr, spearmanr
    y = rng.standard_normal((30, 4, 4, 1))
    y_hat = y + 0.5 * rng.standard_normal(y.shape)
    cm = dds.compute_correlation(y, y_hat, over='time', mode='pearson')
    ref = pearsonr(y[:, 2, 3, 0], y_hat[:, 2, 3, 0])[0]
    np.testing.assert_allclose(cm[2, 3], ref, atol=1e-10)
    cm = dds.compute_correlation(y, y_hat, over='time', mode='spearman')
    ref = spearmanr(y[:, 1, 1, 0], y_hat[:, 1, 1, 0])[0]
    np.testing.assert_allclose(cm[1, 1], ref, atol=1e-10)


@pytest.mark.smoke
def test_compute_metrics_artifacts(rng, tmp_path):
    y = rng.random((10, 16, 16, 1)).astype('float32')
    y_hat = np.clip(y + 0.05 * rng.standard_normal(y.shape), 0,
                    1).astype('float32')
    mask = np.ones((16, 16))
    rmse_map, corrmap, bias = dds.compute_metrics(
        y, y_hat, mask=mask, save_path=str(tmp_path))
    assert rmse_map.shape == (16, 16)
    for fname in ['metrics_summary.txt', 'metrics_pergridpoint_rmse_map.npy',
                  'metrics_violin_plots.png', 'metrics_nmeanbias_map.npy']:
        assert os.path.exists(os.path.join(str(tmp_path), fname)), fname


def test_predict_spatiotemporal_collapse(rng):
    """5D spatio-temporal predictions collapse back to a spatial sequence
    (reference: inference.py:241-242)."""
    data = rng.standard_normal((30, 16, 16, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='spc', data_train=data[:20],
        data_val=data[20:25], data_test=data[25:], scale=4, time_window=3,
        batch_size=2, epochs=1, steps_per_epoch=1, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    y = dds.predict(tr, data[25:], scale=4, array_in_hr=True, time_window=3)
    # n_samples = 5 - (3-1) = 3 windows -> collapsed to 5 spatial grids
    assert y.shape == (5, 16, 16, 1)


@pytest.mark.smoke
def test_predict_sharded_over_mesh(trained):
    from dl4ds_tpu.training.base import make_mesh
    tr, data = trained
    y_single = dds.predict(tr, data[32:], scale=4, array_in_hr=True)
    y_mesh = dds.predict(tr, data[32:], scale=4, array_in_hr=True,
                         mesh=make_mesh())
    np.testing.assert_allclose(y_mesh, y_single, atol=1e-5)


def test_predict_mesh_nondivisible_samples(trained):
    """Sample counts not divisible by mesh.size (and below one global
    batch) must pad, not crash, in the sharded path."""
    from dl4ds_tpu.training.base import make_mesh
    tr, data = trained
    mesh = make_mesh()
    for n in (3, 10):   # both < batch_size*mesh and % mesh.size != 0
        y_mesh = dds.predict(tr, data[:n], scale=4, array_in_hr=True,
                             mesh=mesh, batch_size=64)
        y_ref = dds.predict(tr, data[:n], scale=4, array_in_hr=True)
        np.testing.assert_allclose(y_mesh, y_ref, atol=1e-5)


def test_predict_mc_uncertainty(rng):
    """MC-dropout ensemble: nonzero spread for mc variants."""
    data = rng.standard_normal((20, 16, 16, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:12],
        data_val=data[12:16], data_test=data[16:], scale=4, batch_size=2,
        epochs=1, steps_per_epoch=1, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, dropout_rate=0.3, dropout_variant='mcdrop',
        save=False, verbose=False)
    tr.run()
    mean, std = dds.predict_mc(tr, data[16:], scale=4, n_members=4,
                               array_in_hr=True)
    assert mean.shape == (4, 16, 16, 1)
    assert float(np.mean(std)) > 0  # stochastic members differ
    # pad_to_multiple is honored, not silently swallowed (regression): a
    # 14x14 grid padded to the 16-bucket still returns 14x14 output
    odd = rng.standard_normal((3, 14, 14, 1)).astype('float32')
    mean_p, std_p = dds.predict_mc(tr, odd, scale=4, n_members=2,
                                   array_in_hr=True, pad_to_multiple=16)
    assert mean_p.shape == (3, 14, 14, 1) and std_p.shape == (3, 14, 14, 1)
    # unknown predict options raise instead of being dropped by **kwargs
    with pytest.raises(TypeError, match='unsupported predict option'):
        dds.predict_mc(tr, data[16:], scale=4, n_members=2,
                       array_in_hr=True, bogus_option=1)


def test_plot_ndarray_georeferenced(tmp_path, rng):
    """ecubevis-style panel plotting: stacks/tuples, shared colorbar,
    geographic extent from lat/lon vectors, descending-lat orientation."""
    from dl4ds_tpu.utils import plot_ndarray
    a = rng.standard_normal((2, 20, 30)).astype('float32')
    f = plot_ndarray(a, subplot_titles=['one', 'two'], share_colorbar=True,
                     lats=np.linspace(60, 40, 20), lons=np.linspace(0, 15, 30),
                     plot_title='fields', save_fname=str(tmp_path / 'p.png'))
    assert (tmp_path / 'p.png').exists()
    # single 2-D field + tuple input
    plot_ndarray(a[0], save_fname=str(tmp_path / 'q.png'))
    plot_ndarray((a[0], a[1]), save_fname=str(tmp_path / 'r.png'))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        plot_ndarray(np.zeros((2, 2, 2, 2, 2)))


def test_compute_metrics_georeferenced_maps(tmp_path, rng):
    y = rng.standard_normal((8, 16, 16, 1)).astype('float32')
    yh = y + 0.1 * rng.standard_normal((8, 16, 16, 1)).astype('float32')
    dds.compute_metrics(y, yh, save_path=str(tmp_path) + '/',
                        lats=np.linspace(70, 40, 16),
                        lons=np.linspace(-10, 20, 16))
    assert (tmp_path / 'metrics_pergridpoint_rmse_map.png').exists()
    assert (tmp_path / 'metrics_summary.txt').exists()


def test_predict_device_cpu_and_mesh_conflicts(rng):
    from dl4ds_tpu.models import net_pin
    import jax as _jax
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(8, 8), n_filters=4, n_blocks=1)
    variables = model.init(_jax.random.PRNGKey(0), batch_size=2)
    x = rng.standard_normal((3, 8, 8, 1)).astype('float32')
    y_cpu = dds.predict((model, variables), x, scale=2, array_in_hr=True,
                        device='CPU')
    y_def = dds.predict((model, variables), x, scale=2, array_in_hr=True)
    np.testing.assert_allclose(y_cpu, y_def, atol=1e-5)
    from dl4ds_tpu.training.base import make_mesh
    with pytest.raises(ValueError, match='not both'):
        dds.predict((model, variables), x, scale=2, array_in_hr=True,
                    mesh=make_mesh(), spatial_mesh=make_mesh())


def test_rmse_map_excludes_premasked_pixels(rng):
    """Reference parity: pixels whose first frame is exactly 0 (masked)
    are NaN in the per-grid-point maps, so nanmean excludes them."""
    from dl4ds_tpu.metrics import compute_rmse, compute_correlation
    y = rng.standard_normal((6, 8, 8, 1)).astype('float32') + 3.0
    yh = y + 0.1
    y[:, :2, :, 0] = 0.0       # pre-masked band (first frame zero)
    m = compute_rmse(y, yh, over='time')
    assert np.isnan(m[:2]).all() and np.isfinite(m[2:]).all()
    c = compute_correlation(y, yh, mode='pearson', over='time')
    assert np.isnan(c[:2]).all()
