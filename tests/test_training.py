"""Trainer tests: supervised + CGAN end-to-end smokes on the 8-device CPU
mesh (the reference's --debug mode analogue: few epochs x few steps), plus
artifact outputs, early stopping and resume."""

import os

import numpy as np
import jax
import pytest

import dl4ds_tpu as dds


@pytest.fixture
def data(rng):
    return rng.standard_normal((40, 16, 16, 1)).astype('float32')


def _splits(data):
    return dict(data_train=data[:24], data_val=data[24:32],
                data_test=data[32:])


@pytest.mark.smoke
def test_supervised_pin_loss_decreases():
    # learnable smooth field (random noise has no LR->HR signal to learn)
    t = np.arange(40)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing='ij')
    data = np.stack([np.sin(0.3 * yy + 0.1 * k) * np.cos(0.4 * xx - 0.05 * k)
                     for k in t])[..., None].astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=5, loss='mae', n_filters=4, n_blocks=1,
        learning_rate=3e-3, save=False, verbose=False, seed=0)
    tr.run()
    hist = tr.fithist['loss']
    assert hist[-1] < hist[0]
    assert np.isfinite(tr.test_loss)


@pytest.mark.smoke
def test_supervised_spc_patches(data):
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', **_splits(data), scale=4,
        patch_size=8, batch_size=2, epochs=1, steps_per_epoch=2,
        validation_steps=1, test_steps=1, loss='mae', n_filters=4,
        n_blocks=1, save=False, verbose=False)
    tr.run()
    assert np.isfinite(tr.test_loss)


@pytest.mark.core
def test_supervised_batchnorm(data):
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, normalization='bn', n_filters=4, n_blocks=1,
        save=False, verbose=False)
    tr.run()
    assert 'batch_stats' in tr.variables
    assert np.isfinite(tr.test_loss)


@pytest.mark.smoke
def test_supervised_spatiotemporal(data):
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', **_splits(data), scale=4,
        time_window=3, batch_size=2, epochs=1, steps_per_epoch=2,
        validation_steps=1, test_steps=1, n_filters=4, n_blocks=1,
        save=False, verbose=False)
    tr.run()
    assert tr.model.name == 'recresnet_spc'
    assert np.isfinite(tr.test_loss)


@pytest.mark.core
def test_supervised_early_stopping(data):
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=50, steps_per_epoch=1, validation_steps=1,
        test_steps=1, early_stopping=True, patience=2, min_delta=10.0,
        n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    # min_delta=10 means no epoch ever "improves" -> stops after patience+1
    assert len(tr.fithist['loss']) <= 4


@pytest.mark.core
def test_supervised_resume(data):
    tr1 = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False)
    tr1.run()
    tr2 = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=2, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False,
        trained_model=(tr1.model, tr1.variables), trained_epochs=1)
    tr2.run()
    assert len(tr2.fithist['loss']) == 1  # epochs 1 -> 2


def test_supervised_save_artifacts(data, tmp_path):
    save_path = str(tmp_path) + '/'
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=True,
        save_path=save_path, verbose=False)
    tr.run()
    assert os.path.exists(save_path + 'running_time.txt')
    assert os.path.exists(save_path + 'test_loss.txt')
    assert os.path.exists(save_path + 'learning_curve.png')
    assert os.path.isdir(save_path + 'convnet_pin')


def test_checkpoint_save_failure_warns_and_falls_back(data, tmp_path,
                                                      monkeypatch):
    """A failing orbax save must warn loudly and drop a pickle fallback,
    never silently save nothing."""
    import pickle
    import warnings
    import orbax.checkpoint as ocp

    class Boom:
        def save(self, *a, **k):
            raise IOError('disk on fire')

    monkeypatch.setattr(ocp, 'PyTreeCheckpointer', Boom)
    save_path = str(tmp_path) + '/'
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False,
        save_bestmodel=True, save_path=save_path, verbose=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        tr.run()
    assert any('orbax checkpoint save failed' in str(w.message)
               for w in caught)
    fallback = save_path + 'best_model.pkl'
    assert os.path.exists(fallback)
    with open(fallback, 'rb') as fh:
        payload = pickle.load(fh)
    assert 'params' in payload


def test_steps_per_execution_no_tail_recompile(data):
    """steps=5 with steps_per_execution=2 must NOT recompile train_many for
    a ragged tail chunk — the epoch is padded to whole chunks."""
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=2, steps_per_epoch=5, steps_per_execution=2,
        validation_steps=1, test_steps=1, n_filters=4, n_blocks=1,
        save=False, verbose=False)
    tr.run()
    assert tr._train_many._cache_size() == 1
    assert len(tr.fithist['loss']) == 2


def test_predict_tail_batch_single_compile(data, monkeypatch):
    """predict over 10 samples with batch_size=4 pads the tail batch —
    exactly one XLA compile of the apply fn."""
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=1, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    jitted = []
    orig_jit = jax.jit

    def spy_jit(f, **kw):
        j = orig_jit(f, **kw)
        jitted.append(j)
        return j

    monkeypatch.setattr(jax, 'jit', spy_jit)
    y = dds.predict(tr, data[:10], scale=4, array_in_hr=True, batch_size=4)
    assert y.shape == (10, 16, 16, 1)
    # every jitted fn created inside predict (batch synthesis + model apply)
    # compiled exactly once — the ragged tail reuses the full-batch shape
    sizes = [j._cache_size() for j in jitted]
    assert sizes and all(s == 1 for s in sizes), sizes


@pytest.mark.core
def test_supervised_explicit_pairs(rng):
    hr = rng.standard_normal((30, 16, 16, 1)).astype('float32')
    from dl4ds_tpu.interpolation import resize2d
    lr = np.asarray(resize2d(hr, (4, 4), 'inter_area'))
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=hr[:20],
        data_val=hr[20:24], data_test=hr[24:], data_train_lr=lr[:20],
        data_val_lr=lr[20:24], data_test_lr=lr[24:], scale=4, batch_size=2,
        epochs=1, steps_per_epoch=2, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, save=False, verbose=False)
    tr.run()
    assert np.isfinite(tr.test_loss)


@pytest.mark.smoke
def test_cgan_trainer(data, tmp_path):
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, time_window=None,
        batch_size=2, epochs=2, steps_per_epoch=2, loss='mae',
        checkpoints_frequency=1, save=False,
        save_path=str(tmp_path) + '/', verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert len(tr.gentotal) == 2
    assert np.isfinite(tr.test_loss)
    assert os.path.exists(str(tmp_path) + '/losses.npy')
    losses = np.load(str(tmp_path) + '/losses.npy')
    assert losses.shape == (4, 2)


def test_cgan_load_checkpoint(data, tmp_path):
    save_path = str(tmp_path) + '/'
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, batch_size=2, epochs=1,
        steps_per_epoch=1, checkpoints_frequency=1, save=False,
        save_path=save_path, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    gen, gen_params, disc, disc_params = dds.load_checkpoint(
        save_path, 1, backbone='resnet', upsampling='spc', scale=4,
        input_height_width=(2, 2), n_blocks=(1, 1), n_filters=(4, 4))
    # restored generator params produce the same output as the trained one
    import jax.numpy as jnp
    x = jnp.ones((1, 2, 2, 1))
    y1 = gen.module.apply({'params': gen_params}, x, None, training=False)
    y2 = tr.generator.module.apply({'params': tr.gen_state.params}, x, None,
                                   training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_lr_scaling_with_mesh(data):
    """Goyal et al. linear LR scaling: LR multiplied by mesh size."""
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, learning_rate=1e-3, n_filters=4, n_blocks=1,
        save=False, verbose=False)
    tr._build_optimizer()
    assert tr.n_devices == 8
    assert np.isclose(float(tr._lr), 8e-3) or callable(tr._lr)


@pytest.mark.core
def test_supervised_host_streamer(data):
    """data_in_hbm=False: training streams batches from host RAM through the
    native gather/crop path. Val/test need >= one global batch
    (2 x 8 devices = 16 samples) — the streaming tier refuses undersized
    eval splits instead of silently evaluating nothing."""
    data2 = np.concatenate([data, data])
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data2[:24],
        data_val=data2[24:40], data_test=data2[40:56], scale=4,
        patch_size=8, batch_size=2, epochs=2, steps_per_epoch=3,
        validation_steps=1, test_steps=1, n_filters=4, n_blocks=1,
        save=False, verbose=False, data_in_hbm=False)
    tr.run()
    assert np.isfinite(tr.test_loss)
    assert len(tr.fithist['loss']) == 2


@pytest.mark.core
def test_cgan_spatiotemporal(data):
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, time_window=3,
        batch_size=2, epochs=1, steps_per_epoch=1, save=False,
        verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert tr.generator.name == 'recresnet_spc'
    assert np.isfinite(tr.test_loss)


@pytest.mark.core
def test_supervised_checkpoint_resume(data, tmp_path):
    """Periodic full-state checkpoints + resume_from_checkpoint."""
    save_path = str(tmp_path) + '/'
    tr1 = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=2, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False,
        save_path=save_path, verbose=False, checkpoints_frequency=1)
    tr1.run()
    ckpt = save_path + 'checkpoints/epoch-2'
    assert os.path.isdir(ckpt)
    tr2 = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=3, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False,
        resume_from_checkpoint=ckpt)
    tr2.run()
    assert len(tr2.fithist['loss']) == 1   # resumed at epoch 2 of 3
    assert np.isfinite(tr2.test_loss)


def test_cgan_with_static_vars(data, rng):
    statics = [rng.standard_normal((16, 16)).astype('float32')]
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, batch_size=2, epochs=1,
        steps_per_epoch=1, static_vars=statics, save=False, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_supervised_deterministic_seed(data):
    runs = []
    for _ in range(2):
        tr = dds.SupervisedTrainer(
            backbone='convnet', upsampling='pin', **_splits(data), scale=4,
            batch_size=2, epochs=2, steps_per_epoch=2, validation_steps=1,
            test_steps=1, n_filters=4, n_blocks=1, save=False,
            verbose=False, seed=123)
        tr.run()
        runs.append(tr.fithist['loss'])
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-6)


def test_supervised_dssim_loss(data):
    """SSIM-family loss trains inside the scanned step (patch > filter)."""
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, loss='dssim_mae', n_filters=4, n_blocks=1,
        save=False, verbose=False)
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_multi_channel_output(rng):
    data = rng.standard_normal((30, 16, 16, 2)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:20],
        data_val=data[20:25], data_test=data[25:], scale=4, batch_size=2,
        epochs=1, steps_per_epoch=2, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, n_channels_out=2, save=False,
        verbose=False)
    tr.run()
    y = dds.predict(tr, data[25:], scale=4, array_in_hr=True)
    assert y.shape == (5, 16, 16, 2)


def test_supervised_with_season_ids(data):
    season_ids = np.tile([0, 1, 2, 3], 10)
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False,
        season_ids=(season_ids[:24], season_ids[24:32], season_ids[32:40]))
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_season_train_and_predict_with_time_metadata(data):
    """Full season round-trip (ref inference.py:218 + dataloader.py:327-343):
    train a season-conditioned model from time metadata, then predict with
    time metadata — the one-hot channels must be rebuilt at inference."""
    import pandas as pd
    times = pd.date_range('2000-01-15', periods=40, freq='32D').values
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False,
        time_metadata=(times[:24], times[24:32], times[32:]))
    assert tr.season_ids is not None and len(tr.season_ids) == 3
    tr.run()
    # model input was widened by 4 season channels
    assert tr.model.input_shape[-1] == 5
    y = dds.predict(tr, data[32:], scale=4, array_in_hr=True,
                    time_metadata=times[32:])
    assert y.shape == (8, 16, 16, 1)
    # without time_metadata the channel count mismatches -> must raise
    with pytest.raises(Exception):
        dds.predict(tr, data[32:], scale=4, array_in_hr=True)


def test_spatiotemporal_season_channels(data):
    """Season one-hot rides the HR aux branch for spatio-temporal models
    (regression: `channel_counts` omitted the +4 in the spatio-temporal
    branch while BatchSynthesizer appended it to aux, so the first train
    step died with a flax param-shape mismatch)."""
    season_ids = np.tile([0, 1, 2, 3], 10)
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', **_splits(data), scale=4,
        time_window=3, batch_size=2, epochs=1, steps_per_epoch=2,
        validation_steps=1, test_steps=1, n_filters=4, n_blocks=1,
        save=False, verbose=False,
        season_ids=(season_ids[:24], season_ids[24:32], season_ids[32:40]))
    n_ch, n_aux = tr.channel_counts(None, None, tr.season_ids)
    assert (n_ch, n_aux) == (1, 4)
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_season_ids_and_time_metadata_conflict(data):
    """Passing both season sources is ambiguous -> explicit error (not a
    silent shadowing of time_metadata)."""
    import pandas as pd
    season_ids = np.tile([0, 1, 2, 3], 10)
    times = pd.date_range('2000-01-15', periods=40, freq='32D').values
    with pytest.raises(ValueError, match='not both'):
        dds.SupervisedTrainer(
            backbone='convnet', upsampling='pin', **_splits(data), scale=4,
            batch_size=2, n_filters=4, n_blocks=1, save=False, verbose=False,
            season_ids=(season_ids[:24], season_ids[24:32],
                        season_ids[32:40]),
            time_metadata=(times[:24], times[24:32], times[32:]))


def test_datagen_season_from_time_metadata(data):
    """Host-tier DataGenerator builds season channels from time metadata."""
    import pandas as pd
    times = pd.date_range('2000-01-15', periods=40, freq='91D').values
    gen = dds.DataGenerator(data, None, backbone='convnet', upsampling='pin',
                            scale=4, batch_size=2, seed=1,
                            time_metadata=times)
    assert gen.time_metadata is not None
    [lr, aux], [hr] = gen[0]
    assert lr.shape[-1] == 5 and aux.shape[-1] == 4  # data+season / season
    assert np.all(aux.sum(axis=-1) == 1.0)           # one-hot


def test_season_derived_from_xarray_time_coord(data):
    """time_metadata='auto' (explicit opt-in) derives seasons from xr time
    coords end-to-end; plain xr inputs without the flag stay season-free."""
    import pandas as pd
    xr = pytest.importorskip('xarray')
    times = pd.date_range('2000-01-15', periods=40, freq='91D')
    xda = xr.DataArray(data, dims=('time', 'y', 'x', 'c'),
                       coords={'time': times})
    plain = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', data_train=xda[:24],
        data_val=xda[24:32], data_test=xda[32:], scale=4,
        batch_size=2, epochs=1, steps_per_epoch=1, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False)
    assert plain.season_ids is None   # no silent +4 channels
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', data_train=xda[:24],
        data_val=xda[24:32], data_test=xda[32:], scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, n_filters=4, n_blocks=1, save=False, verbose=False,
        time_metadata='auto')
    assert tr.season_ids is not None
    tr.run()
    assert np.isfinite(tr.test_loss)
    y = dds.predict(tr, xda[32:], scale=4, array_in_hr=True,
                    time_metadata='auto')
    assert y.shape == (8, 16, 16, 1)


def test_season_ids_from_time_windows():
    import pandas as pd
    from dl4ds_tpu.dataloader import season_ids_from_time
    times = pd.date_range('2000-01-01', periods=12, freq='MS').values
    ids = season_ids_from_time(times)
    assert list(ids) == [0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 0]
    ids_w = season_ids_from_time(times, time_window=3)
    assert len(ids_w) == 10
    # window [Jan,Feb,Mar] -> modal month rule picks smallest most-common
    assert ids_w[0] == 0 and ids_w[2] == 1


def test_terminate_on_nan(data):
    """A diverged (NaN) loss must stop training with a warning instead of
    burning the remaining epochs."""
    import warnings
    bad = data.copy()
    bad[:, 0, 0, 0] = np.nan   # every sample poisoned -> first epoch NaNs
    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', data_train=bad[:24],
        data_val=bad[24:32], data_test=bad[32:], scale=4, batch_size=2,
        epochs=5, steps_per_epoch=2, validation_steps=1, test_steps=1,
        n_filters=4, n_blocks=1, save=False, verbose=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        tr.run()
    assert any('Non-finite loss' in str(w.message) for w in caught)
    assert len(tr.fithist['loss']) < 5


def test_cgan_pin_mode(data):
    tr = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, batch_size=2, epochs=1,
        steps_per_epoch=1, save=False, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert tr.generator.name == 'convnet_pin'
    assert np.isfinite(tr.test_loss)


def test_cgan_streaming_tier(rng):
    """CGAN with data_in_hbm=False (HostStreamer + per-batch jitted step)."""
    data = rng.standard_normal((40, 16, 16, 1)).astype('float32')
    statics = [rng.standard_normal((16, 16)).astype('float32')]
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:32],
        data_test=data[32:], static_vars=statics, scale=4, patch_size=8,
        batch_size=2, epochs=1, steps_per_epoch=2, save=False, verbose=False,
        data_in_hbm=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert np.isfinite(tr.test_loss)
    assert len(tr.gentotal) == 1


def test_cgan_explicit_pairs(rng):
    hr = rng.standard_normal((30, 16, 16, 1)).astype('float32')
    from dl4ds_tpu.interpolation import resize2d
    lr = np.asarray(resize2d(hr, (4, 4), 'inter_area'))
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=hr[:24],
        data_test=hr[24:], data_train_lr=lr[:24], data_test_lr=lr[24:],
        scale=4, batch_size=2, epochs=1, steps_per_epoch=1, save=False,
        verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_cgan_resume_from_checkpoint(data, tmp_path):
    save_path = str(tmp_path) + '/'
    common = dict(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=8, batch_size=2,
        steps_per_epoch=1, save=False, save_path=save_path, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr1 = dds.CGANTrainer(epochs=1, checkpoints_frequency=1, **common)
    tr1.run()
    tr2 = dds.CGANTrainer(
        epochs=1, resume_from_checkpoint=save_path + 'checkpoints/epoch-1',
        **common)
    tr2.run()
    assert np.isfinite(tr2.test_loss)
    assert int(tr2.gen_state.step) >= 2   # resumed optimizer step count


def test_cgan_batched_test_eval_matches_single_batch(data):
    """The chunked test-set evaluation (constant memory) must equal the
    reference-style single-giant-batch loss for full-grid eval, where batch
    synthesis is deterministic."""
    import jax.numpy as jnp
    from dl4ds_tpu.dataloader import BatchSynthesizer
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:28],
        data_test=data[28:], scale=4, patch_size=None, batch_size=4,
        epochs=1, steps_per_epoch=1, save=False, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()  # n_test=12 > batch_size=4 -> 3 eval chunks
    ds = BatchSynthesizer(tr.data_test, None, upsampling='spc', scale=4,
                          batch_size=1, patch_size=None)
    batch = ds(jnp.arange(ds.n, dtype=jnp.int32), jax.random.PRNGKey(0))
    y = tr.generator.module.apply({'params': tr.gen_state.params},
                                  batch['lr'], batch['aux'], training=False)
    single = float(tr.lossf(batch['hr'], y))
    assert np.isclose(tr.test_loss, single, rtol=1e-5, atol=1e-6)


def test_cgan_scale5_valid_conv_discriminator(data):
    """scale=5 (the reference trainers' default) uses the reference's
    valid-conv+crop discriminator branch (discriminator.py:54-57) when the
    chain is shape-consistent (LR 8 here); weight counts match the TF
    reference exactly (PARITY_TF.json discriminator section)."""
    hr = np.asarray(np.kron(data[:, :8, :8, :],
                            np.ones((1, 5, 5, 1))), 'float32')  # 40px HR
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=hr[:28],
        data_test=hr[28:], scale=5, patch_size=40, batch_size=2, epochs=1,
        steps_per_epoch=1, save=False, verbose=False,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert np.isfinite(tr.test_loss)
    # the valid-conv path has its own two conv layers in the param tree
    dparams = tr.disc_state.params
    leaves = jax.tree_util.tree_leaves_with_path(dparams)
    shapes = [tuple(x.shape) for _, x in leaves]
    assert (3, 3, 4, 4) in shapes


@pytest.mark.core
def test_gradient_accumulation_matches_large_batch(data):
    """k=2 accumulation over the SAME microbatch twice must produce exactly
    the k=1 single-step update (mean of two identical gradients)."""
    import jax.numpy as jnp
    from dl4ds_tpu.training.supervised import TrainState

    states = {}
    for k in (1, 2):
        tr = dds.SupervisedTrainer(
            backbone='convnet', upsampling='pin', **_splits(data), scale=4,
            batch_size=4, epochs=1, loss='mae', n_filters=4, n_blocks=1,
            save=False, verbose=False, seed=0,
            gradient_accumulation_steps=k)
        tr.setup_datagen()
        tr.setup_model()
        tx = tr._build_optimizer()
        state = TrainState.create(
            apply_fn=tr.model.module.apply, params=tr.variables['params'],
            tx=tx, batch_stats=tr.variables.get('batch_stats'))
        tr._make_steps()
        batch = jax.tree.map(
            lambda x: x, tr.ds_val._make_batch(
                jnp.arange(4, dtype=jnp.int32), jax.random.PRNGKey(1)))
        key = jax.random.PRNGKey(2)
        for _ in range(k):
            state, loss = tr._train_step_batch(state, batch, key)
        states[k] = state
    p1 = jax.tree.leaves(states[1].params)
    p2 = jax.tree.leaves(states[2].params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gradient_accumulation_no_update_mid_cycle(data):
    """Params must stay frozen until the k-th microbatch of a cycle."""
    import jax.numpy as jnp
    from dl4ds_tpu.training.supervised import TrainState

    tr = dds.SupervisedTrainer(
        backbone='convnet', upsampling='pin', **_splits(data), scale=4,
        batch_size=4, epochs=1, loss='mae', n_filters=4, n_blocks=1,
        save=False, verbose=False, seed=0, gradient_accumulation_steps=3)
    tr.setup_datagen()
    tr.setup_model()
    state = TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=tr._build_optimizer(), batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    batch = tr.ds_val._make_batch(jnp.arange(4, dtype=jnp.int32),
                                  jax.random.PRNGKey(1))
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = tr._train_step_batch(state, batch, jax.random.PRNGKey(2))
    state, _ = tr._train_step_batch(state, batch, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, _ = tr._train_step_batch(state, batch, jax.random.PRNGKey(4))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)))
    assert changed


def test_gradient_accumulation_end_to_end(data):
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', **_splits(data), scale=4,
        patch_size=8, batch_size=2, epochs=2, steps_per_epoch=4,
        validation_steps=1, test_steps=1, loss='mae', n_filters=4,
        n_blocks=1, save=False, verbose=False,
        gradient_accumulation_steps=2)
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_gradient_accumulation_validation():
    with pytest.raises(ValueError, match='gradient_accumulation_steps'):
        dds.SupervisedTrainer(
            backbone='convnet', upsampling='pin',
            data_train=np.zeros((8, 16, 16, 1), 'float32'),
            data_val=np.zeros((4, 16, 16, 1), 'float32'),
            data_test=np.zeros((4, 16, 16, 1), 'float32'),
            scale=4, gradient_accumulation_steps=0)


def test_cgan_gradient_accumulation(data):
    tr = dds.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data[:32],
        data_test=data[32:], scale=4, patch_size=8, batch_size=2, epochs=2,
        steps_per_epoch=4, save=False, verbose=False,
        gradient_accumulation_steps=2,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_gradient_accumulation_checkpoint_resume(data, tmp_path):
    """The optax.MultiSteps state (grad accumulator + inner Adam state)
    must round-trip through the orbax full-state checkpoint."""
    save_path = str(tmp_path) + '/'
    kw = dict(backbone='convnet', upsampling='pin', **_splits(data), scale=4,
              batch_size=2, steps_per_epoch=2, validation_steps=1,
              test_steps=1, n_filters=4, n_blocks=1, save=False,
              verbose=False, gradient_accumulation_steps=2)
    tr1 = dds.SupervisedTrainer(epochs=2, save_path=save_path,
                                checkpoints_frequency=1, **kw)
    tr1.run()
    tr2 = dds.SupervisedTrainer(
        epochs=3, resume_from_checkpoint=save_path + 'checkpoints/epoch-2',
        **kw)
    tr2.run()
    assert len(tr2.fithist['loss']) == 1
    assert np.isfinite(tr2.test_loss)


def test_time_window_one_is_spatial(data):
    """time_window=1 builds a spatial model; the synthesizers must emit
    matching 4-D batches (tw is normalized to None)."""
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', **_splits(data), scale=4,
        batch_size=2, epochs=1, steps_per_epoch=2, validation_steps=1,
        test_steps=1, time_window=1, loss='mae', n_filters=4, n_blocks=1,
        save=False, verbose=False)
    assert tr.time_window is None and not tr.model_is_spatiotemporal
    tr.run()
    assert np.isfinite(tr.test_loss)


def test_zero_eval_steps_rejected(data):
    with pytest.raises(ValueError, match='validation_steps'):
        dds.SupervisedTrainer(
            backbone='convnet', upsampling='pin', **_splits(data), scale=4,
            validation_steps=0)


@pytest.mark.core
def test_streaming_undersized_eval_split_rejected(data):
    """Streaming tier (data_in_hbm=False): an eval split smaller than one
    global batch would produce an EMPTY HostStreamer epoch and a silent
    NaN eval loss — it must be rejected up front like the train split."""
    import dl4ds_tpu as dds
    tr = dds.SupervisedTrainer(
        'convnet', 'pin', data_train=data[:16], data_val=data[16:18],
        data_test=data[18:], scale=4, batch_size=1, epochs=1, loss='mae',
        n_filters=4, n_blocks=1, save=False, verbose=False,
        data_in_hbm=False)
    with pytest.raises(ValueError, match='data_val.*streaming'):
        tr.run()
