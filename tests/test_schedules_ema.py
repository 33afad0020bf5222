"""LR schedules (cosine / warmup_cosine / callable) and parameter EMA in
the supervised trainer — beyond-reference training knobs (the reference
only has Adam + piecewise-constant decay, supervised.py:336-353)."""

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


def _trainer(data, **kw):
    kw.setdefault('backbone', 'convnet')
    kw.setdefault('upsampling', 'pin')
    kw.setdefault('epochs', 2)
    kw.setdefault('save', False)
    return dds.SupervisedTrainer(
        **_splits(data), scale=4, batch_size=2, steps_per_epoch=3,
        validation_steps=1, test_steps=1, loss='mae', n_filters=4,
        n_blocks=1, verbose=False, seed=0, **kw)


def test_cosine_schedule_endpoints(data):
    tr = _trainer(data, learning_rate=(1e-3, 1e-5), lr_schedule='cosine')
    tr.run()
    sched = tr._lr
    assert callable(sched)
    total = 3 * 2  # steps_per_epoch * epochs
    peak = 1e-3 * tr.n_devices
    assert float(sched(0)) == pytest.approx(peak, rel=1e-6)
    # cosine floor = alpha * init = (lr1/lr0) * lr0*scale = lr1*scale
    assert float(sched(total)) == pytest.approx(1e-5 * tr.n_devices,
                                                rel=1e-5)
    # strictly between at midpoint
    mid = float(sched(total // 2))
    assert float(sched(total)) < mid < peak
    assert np.isfinite(tr.test_loss)


def test_warmup_cosine_schedule(data):
    tr = _trainer(data, learning_rate=1e-3, lr_schedule='warmup_cosine',
                  warmup_steps=2)
    tr.run()
    sched = tr._lr
    peak = 1e-3 * tr.n_devices
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-12)
    assert float(sched(2)) == pytest.approx(peak, rel=1e-6)
    assert float(sched(6)) == pytest.approx(0.0, abs=1e-9)  # end_value 0
    assert np.isfinite(tr.test_loss)


def test_callable_schedule_used_verbatim(data):
    calls = []

    def sched(step):
        calls.append(1)
        return 1e-3

    tr = _trainer(data, lr_schedule=sched)
    tr.run()
    assert tr._lr is sched
    assert calls  # traced at least once inside the jitted step
    assert np.isfinite(tr.test_loss)


def test_lr_schedule_validation(data):
    with pytest.raises(ValueError, match='lr_schedule'):
        _trainer(data, lr_schedule='linear')
    with pytest.raises(ValueError, match='ema_decay'):
        _trainer(data, ema_decay=1.0)
    with pytest.raises(ValueError, match='warmup_steps'):
        _trainer(data, warmup_steps=-1)


def test_ema_tracks_params(data):
    tr = _trainer(data, ema_decay=0.5)
    tr.run()
    raw = tr.state.params
    ema = tr.state.ema_params
    assert ema is not None
    # public variables serve the EMA weights
    leaves_pub = jax.tree.leaves(tr.variables['params'])
    leaves_ema = jax.tree.leaves(ema)
    for a, b in zip(leaves_pub, leaves_ema):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA lags the raw trajectory: different from raw params but same
    # structure and finite
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(raw), leaves_ema)]
    assert any(d > 0 for d in diffs)
    assert all(np.isfinite(d) for d in diffs)


def test_ema_off_by_default(data):
    tr = _trainer(data)
    tr.run()
    assert tr.state.ema_params is None
    for a, b in zip(jax.tree.leaves(tr.variables['params']),
                    jax.tree.leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_one_step_identity(data):
    # decay=0 -> EMA equals the raw params exactly after every update
    tr = _trainer(data, ema_decay=1e-12)
    tr.run()
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr.state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ema_checkpoint_roundtrip(tmp_path, data):
    tr = _trainer(data, ema_decay=0.9, save=True,
                  save_path=str(tmp_path) + '/', checkpoints_frequency=1)
    tr.run()
    ckpt = tmp_path / 'checkpoints' / 'epoch-2'
    assert ckpt.exists()
    tr2 = _trainer(data, ema_decay=0.9, epochs=3,
                   resume_from_checkpoint=str(ckpt))
    tr2.run()
    assert tr2.trained_epochs == 2
    assert tr2.state.ema_params is not None
    assert np.isfinite(tr2.test_loss)


def test_cgan_generator_ema(tmp_path, data):
    tr = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:24],
        data_test=data[32:36], scale=4, batch_size=2, epochs=2,
        steps_per_epoch=2, loss='mae', ema_decay=0.5, save=False,
        verbose=False, seed=0, checkpoints_frequency=1,
        save_path=str(tmp_path) + '/',
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert tr.gen_state.ema_params is not None
    # served generator is the EMA one, and it lags the raw iterate
    for a, b in zip(jax.tree.leaves(tr.variables['params']),
                    jax.tree.leaves(tr.gen_state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(tr.gen_state.params),
                             jax.tree.leaves(tr.gen_state.ema_params))]
    assert any(d > 0 for d in diffs)
    assert np.isfinite(tr.test_loss)
    # ema round-trips through the periodic G/D checkpoint
    ckpt = tmp_path / 'checkpoints' / 'epoch-2'
    assert ckpt.exists()
    tr2 = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:24],
        data_test=data[32:36], scale=4, batch_size=2, epochs=1,
        steps_per_epoch=1, loss='mae', ema_decay=0.5, save=False,
        verbose=False, seed=0, resume_from_checkpoint=str(ckpt),
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr2.run()
    assert tr2.gen_state.ema_params is not None
    assert np.isfinite(tr2.test_loss)


def test_ema_predict_uses_averaged_weights(data):
    tr = _trainer(data, ema_decay=0.5)
    tr.run()
    y = dds.predict(tr, data[32:], scale=4, array_in_hr=True)
    # reference output computed straight from the EMA variables
    y_ema = dds.predict((tr.model, {'params': tr.state.ema_params}),
                        data[32:], scale=4, array_in_hr=True)
    np.testing.assert_allclose(y, y_ema, rtol=1e-6, atol=1e-6)
