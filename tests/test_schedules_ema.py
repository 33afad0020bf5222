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
    kw.setdefault('batch_size', 2)
    return dds.SupervisedTrainer(
        **_splits(data), scale=4, steps_per_epoch=3,
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


def test_ema_update_gated_on_multisteps_commit():
    """Unit: the EMA helper advances only when MultiSteps commits, so
    `ema_decay` keeps its averaging horizon under gradient accumulation
    (the ungated update would decay toward unchanged params k-1 extra
    times per real update, i.e. effective decay = decay**k)."""
    import jax.numpy as jnp
    import optax
    from dl4ds_tpu.training.base import ema_update

    tx = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    params = {'w': jnp.ones(3)}
    opt_state = tx.init(params)
    ema = {'w': jnp.ones(3)}
    grads = {'w': jnp.ones(3)}

    # microbatch 1: accumulate only (mini_step -> 1), params unchanged
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    ema1 = ema_update(ema, params, 0.5, opt_state)
    np.testing.assert_array_equal(np.asarray(ema1['w']),
                                  np.asarray(ema['w']))

    # microbatch 2: commit (mini_step wraps to 0), params move -> EMA ticks
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    ema2 = ema_update(ema1, params, 0.5, opt_state)
    np.testing.assert_allclose(
        np.asarray(ema2['w']),
        0.5 * np.asarray(ema1['w']) + 0.5 * np.asarray(params['w']),
        rtol=1e-6)
    assert float(np.max(np.abs(np.asarray(ema2['w'])
                               - np.asarray(ema1['w'])))) > 0

    # plain (non-MultiSteps) state: unconditional EMA
    tx1 = optax.sgd(0.1)
    st1 = tx1.init(params)
    ema3 = ema_update(ema2, params, 0.5, st1)
    np.testing.assert_allclose(
        np.asarray(ema3['w']),
        0.5 * np.asarray(ema2['w']) + 0.5 * np.asarray(params['w']),
        rtol=1e-6)


@pytest.mark.core
def test_ema_trajectory_matches_unaccumulated_equivalent(data, rng):
    """Regression (VERDICT r3 #6): with gradient_accumulation_steps=2 the
    EMA trajectory equals an unaccumulated run on the same effective
    batches — MAE over the concat batch averages the microbatch losses,
    MultiSteps averages the microbatch grads, and the EMA now ticks once
    per COMMIT, so params AND ema align at every commit."""
    import jax.numpy as jnp
    from dl4ds_tpu.training.supervised import TrainState

    def _prep(batch_size, accum):
        tr = _trainer(data, batch_size=batch_size,
                      gradient_accumulation_steps=accum, ema_decay=0.5)
        tr.setup_datagen()
        tr.setup_model()
        state = TrainState.create(
            apply_fn=tr.model.module.apply, params=tr.variables['params'],
            tx=tr._build_optimizer(),
            batch_stats=tr.variables.get('batch_stats'),
            ema_params=jax.tree.map(jnp.array, tr.variables['params']))
        tr._make_steps()
        return tr, state

    # same seed -> identical init params in both runs
    tr_a, st_a = _prep(batch_size=4, accum=1)
    tr_b, st_b = _prep(batch_size=2, accum=2)

    micro = [rng.standard_normal((2, 16, 16, 1)).astype('float32')
             for _ in range(4)]
    targ = [rng.standard_normal((2, 16, 16, 1)).astype('float32')
            for _ in range(4)]
    key = jax.random.PRNGKey(0)

    # B: four microbatches (two commits)
    for m, t in zip(micro, targ):
        st_b, _ = tr_b._train_step_batch(
            st_b, {'lr': jnp.asarray(m), 'hr': jnp.asarray(t), 'aux': None},
            key)
    # A: the same samples as two effective batches (two steps)
    for i in (0, 2):
        st_a, _ = tr_a._train_step_batch(
            st_a, {'lr': jnp.concatenate([jnp.asarray(micro[i]),
                                          jnp.asarray(micro[i + 1])]),
                   'hr': jnp.concatenate([jnp.asarray(targ[i]),
                                          jnp.asarray(targ[i + 1])]),
                   'aux': None}, key)

    for pa, pb in zip(jax.tree.leaves(st_a.params),
                      jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-5, atol=1e-7)
    for ea, eb in zip(jax.tree.leaves(st_a.ema_params),
                      jax.tree.leaves(st_b.ema_params)):
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb),
                                   rtol=2e-5, atol=1e-7)


def test_cgan_lr_schedules(data):
    """CGAN knob parity (VERDICT r3 #9): cosine/warmup schedules drive
    BOTH the G and D optimizer LRs."""
    tr = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:24],
        data_test=data[32:36], scale=4, batch_size=2, epochs=2,
        steps_per_epoch=2, loss='mae', lr_schedule='cosine',
        learning_rates=(2e-4, 1e-4), save=False, verbose=False, seed=0,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    total = 2 * 2
    for sched, peak in ((tr._gen_lr, 2e-4), (tr._disc_lr, 1e-4)):
        assert callable(sched)
        assert float(sched(0)) == pytest.approx(peak, rel=1e-6)
        assert float(sched(total)) == pytest.approx(0.0, abs=1e-9)
        assert 0.0 < float(sched(total // 2)) < peak
    assert np.isfinite(tr.test_loss)

    with pytest.raises(ValueError, match='lr_schedule'):
        dds.CGANTrainer(
            backbone='convnet', upsampling='pin', data_train=data[:24],
            data_test=data[32:36], scale=4, lr_schedule='linear')
    with pytest.raises(ValueError, match='warmup_steps'):
        dds.CGANTrainer(
            backbone='convnet', upsampling='pin', data_train=data[:24],
            data_test=data[32:36], scale=4, warmup_steps=-1)


def test_cgan_warmup_cosine_constant_default(data):
    tr = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:24],
        data_test=data[32:36], scale=4, batch_size=2, epochs=1,
        steps_per_epoch=2, loss='mae', lr_schedule='warmup_cosine',
        warmup_steps=1, learning_rates=2e-4, save=False, verbose=False,
        seed=0, generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr.run()
    assert float(tr._gen_lr(0)) == pytest.approx(0.0, abs=1e-12)
    assert float(tr._gen_lr(1)) == pytest.approx(2e-4, rel=1e-6)
    assert np.isfinite(tr.test_loss)
    # default (no schedule) keeps plain constant LRs
    tr2 = dds.CGANTrainer(
        backbone='convnet', upsampling='pin', data_train=data[:24],
        data_test=data[32:36], scale=4, batch_size=2, epochs=1,
        steps_per_epoch=1, loss='mae', learning_rates=(2e-4, 1e-4),
        save=False, verbose=False, seed=0,
        generator_params=dict(n_filters=4, n_blocks=1),
        discriminator_params=dict(n_filters=4, n_res_blocks=1))
    tr2.run()
    assert tr2._gen_lr == pytest.approx(2e-4)
    assert tr2._disc_lr == pytest.approx(1e-4)


def test_ema_predict_uses_averaged_weights(data):
    tr = _trainer(data, ema_decay=0.5)
    tr.run()
    y = dds.predict(tr, data[32:], scale=4, array_in_hr=True)
    # reference output computed straight from the EMA variables
    y_ema = dds.predict((tr.model, {'params': tr.state.ema_params}),
                        data[32:], scale=4, array_in_hr=True)
    np.testing.assert_allclose(y, y_ema, rtol=1e-6, atol=1e-6)
