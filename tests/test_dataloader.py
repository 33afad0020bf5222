"""Data-pipeline tests: host-tier pair factory semantics (crop alignment,
channel layout — reference contracts from dl4ds/dataloader.py:11-294) and
host/device tier agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl4ds_tpu import (create_pair_hr_lr, create_batch_hr_lr, DataGenerator,
                       BatchSynthesizer)
from dl4ds_tpu.interpolation import resize2d


@pytest.fixture
def hr_data(rng):
    return rng.standard_normal((24, 32, 32, 1)).astype('float32')


# ---------------------------------------------------------------- host tier

def test_pair_postups_implicit_shapes(hr_data):
    hr, lr = create_pair_hr_lr(hr_data[0], None, 'spc', scale=4,
                               patch_size=16)
    assert hr.shape == (16, 16, 1)
    assert lr.shape == (4, 4, 1)


def test_pair_postups_lr_is_coarsened_crop(hr_data):
    """LR must equal resize(HR crop) — the implicit-pair contract
    (reference: dl4ds/dataloader.py:203-204)."""
    hr, lr = create_pair_hr_lr(hr_data[0], None, 'spc', scale=4,
                               patch_size=16, interpolation='inter_area')
    expected = np.asarray(resize2d(hr, (4, 4), 'inter_area'))
    np.testing.assert_allclose(lr, expected, atol=1e-5)


def test_pair_pin_shapes_and_consistency(hr_data):
    hr, lr = create_pair_hr_lr(hr_data[0], None, 'pin', scale=4,
                               patch_size=16)
    assert hr.shape == (16, 16, 1)
    assert lr.shape == (16, 16, 1)    # pre-upsampled to HR patch size


def test_pair_static_vars_and_season(hr_data, rng):
    statics = [rng.standard_normal((32, 32)).astype('float32')]
    hr, lr, aux = create_pair_hr_lr(hr_data[0], None, 'spc', scale=4,
                                    patch_size=16, static_vars=statics,
                                    season='winter')
    assert hr.shape == (16, 16, 1)
    # lr channels: data(1) + static(1) + season(4)
    assert lr.shape == (4, 4, 6)
    # aux channels: static(1) + season(4)
    assert aux.shape == (16, 16, 5)
    # winter -> first season channel hot
    np.testing.assert_allclose(aux[..., 1], 1.0)
    np.testing.assert_allclose(aux[..., 2], 0.0)


def test_pair_explicit_lr_crop_alignment(rng):
    """With explicit LR pairs, HR crop origin must be scale * LR origin
    (reference: dl4ds/dataloader.py:193-199)."""
    scale = 4
    hr = np.arange(32 * 32, dtype='float32').reshape(32, 32, 1)
    lr = np.asarray(resize2d(hr, (8, 8), 'inter_area'))
    hr_c, lr_c = create_pair_hr_lr(hr, lr, 'spc', scale=scale, patch_size=16)
    # locate the LR crop origin in the full LR grid, then verify HR alignment
    val = lr_c[0, 0, 0]
    pos = np.argwhere(np.isclose(np.squeeze(lr), val))[0]
    y, x = int(pos[0]), int(pos[1])
    np.testing.assert_allclose(
        np.squeeze(hr_c),
        np.squeeze(hr)[y * scale: y * scale + 16, x * scale: x * scale + 16])


def test_pair_predictors_postups(hr_data, rng):
    preds = rng.standard_normal((32, 32, 2)).astype('float32')
    hr, lr = create_pair_hr_lr(hr_data[0], None, 'spc', scale=4,
                               patch_size=16, predictors=preds)
    assert lr.shape == (4, 4, 3)     # data(1) + predictors(2)


def test_batch_and_generator(hr_data):
    gen = DataGenerator(hr_data, None, backbone='resnet', upsampling='spc',
                        scale=4, batch_size=4, patch_size=16, seed=0)
    assert len(gen) == 6
    [lr], [hr] = gen[0]
    assert lr.shape == (4, 4, 4, 1)
    assert hr.shape == (4, 16, 16, 1)


def test_generator_repeat(hr_data):
    gen = DataGenerator(hr_data, None, backbone='resnet', upsampling='spc',
                        scale=4, batch_size=4, patch_size=16, repeat=2,
                        seed=0)
    assert len(gen) == 12


def test_spatiotemporal_batch(hr_data):
    [lr], [hr] = create_batch_hr_lr(
        np.arange(20), 0, hr_data, None, 'spc', scale=4, batch_size=3,
        patch_size=16, time_window=5)
    assert lr.shape == (3, 5, 4, 4, 1)
    assert hr.shape == (3, 5, 16, 16, 1)


# -------------------------------------------------------------- device tier

def test_synth_full_grid_matches_host_pin(hr_data):
    """Without patches the synthesis is deterministic: device tier must
    agree with the host tier exactly."""
    synth = BatchSynthesizer(hr_data, None, 'pin', scale=4, batch_size=4)
    batch = synth(jnp.arange(4), jax.random.PRNGKey(0))
    [lr_host], [hr_host] = create_batch_hr_lr(
        np.arange(24), 0, hr_data, None, 'pin', scale=4, batch_size=4,
        patch_size=None)
    np.testing.assert_allclose(np.asarray(batch['hr']), hr_host, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch['lr']), lr_host, atol=1e-5)


def test_synth_full_grid_matches_host_postups(hr_data):
    synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=4)
    batch = synth(jnp.arange(4), jax.random.PRNGKey(0))
    [lr_host], [hr_host] = create_batch_hr_lr(
        np.arange(24), 0, hr_data, None, 'spc', scale=4, batch_size=4,
        patch_size=None)
    np.testing.assert_allclose(np.asarray(batch['hr']), hr_host, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch['lr']), lr_host, atol=1e-5)


def test_synth_patch_postups_consistency(hr_data):
    """Random patches: every LR patch must equal resize(HR patch)."""
    synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=8,
                             patch_size=16)
    batch = synth(jnp.arange(8), jax.random.PRNGKey(1))
    hr = np.asarray(batch['hr'])
    lr = np.asarray(batch['lr'])
    assert hr.shape == (8, 16, 16, 1)
    assert lr.shape == (8, 4, 4, 1)
    expected = np.asarray(resize2d(jnp.asarray(hr), (4, 4), 'inter_area'))
    np.testing.assert_allclose(lr, expected, atol=1e-5)


def test_synth_channel_layout_with_aux(hr_data, rng):
    statics = [rng.standard_normal((32, 32)).astype('float32'),
               rng.integers(0, 2, (32, 32)).astype('float32')]
    preds = [rng.standard_normal((24, 32, 32, 1)).astype('float32')]
    synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=4,
                             patch_size=16, static_vars=statics,
                             predictors=preds)
    assert synth.n_channels_lr == 1 + 1 + 2
    assert synth.n_channels_aux == 2
    batch = synth(jnp.arange(4), jax.random.PRNGKey(2))
    assert batch['lr'].shape == (4, 4, 4, 4)
    assert batch['aux'].shape == (4, 16, 16, 2)


def test_synth_spatiotemporal(hr_data, rng):
    statics = [rng.standard_normal((32, 32)).astype('float32')]
    synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=3,
                             patch_size=16, time_window=5,
                             static_vars=statics)
    batch = synth(jnp.arange(3), jax.random.PRNGKey(3))
    assert batch['lr'].shape == (3, 5, 4, 4, 1)   # statics NOT in lr for spt
    assert batch['hr'].shape == (3, 5, 16, 16, 1)
    assert batch['aux'].shape == (3, 16, 16, 1)


def test_synth_explicit_lr_pairs(rng):
    hr = rng.standard_normal((20, 32, 32, 1)).astype('float32')
    lr = np.asarray(resize2d(jnp.asarray(hr), (8, 8), 'inter_area'))
    synth = BatchSynthesizer(hr, lr, 'spc', scale=4, batch_size=4,
                             patch_size=16)
    batch = synth(jnp.arange(4), jax.random.PRNGKey(4))
    assert batch['lr'].shape == (4, 4, 4, 1)
    assert batch['hr'].shape == (4, 16, 16, 1)


def test_synth_gather_crop_fallback_identical(hr_data, rng, monkeypatch):
    """The MXU one-hot einsum gather+crop and its big-dataset dynamic-slice
    fallback must produce IDENTICAL batches (both paths are exact: each
    output element receives exactly one input)."""
    statics = [rng.standard_normal((32, 32)).astype('float32')]
    for kwargs in (dict(patch_size=16, static_vars=statics),
                   dict(patch_size=16, time_window=3)):
        synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=4,
                                 **kwargs)
        idx, key = jnp.arange(4), jax.random.PRNGKey(7)
        fast = synth(idx, key)
        monkeypatch.setattr(BatchSynthesizer, '_CROP_MATMUL_MAX_BYTES', 0)
        slow = synth(idx, key)
        monkeypatch.undo()
        assert fast.keys() == slow.keys()
        for name in fast:
            np.testing.assert_array_equal(np.asarray(fast[name]),
                                          np.asarray(slow[name]),
                                          err_msg=name)


def test_synth_season_ids(hr_data):
    season_ids = np.tile([0, 1, 2, 3], 6)
    synth = BatchSynthesizer(hr_data, None, 'pin', scale=4, batch_size=4,
                             season_ids=season_ids)
    batch = synth(jnp.arange(4), jax.random.PRNGKey(5))
    # lr channels: data(1) + season(4)
    assert batch['lr'].shape == (4, 32, 32, 5)
    lr = np.asarray(batch['lr'])
    np.testing.assert_allclose(lr[0, :, :, 1], 1.0)  # sample 0 -> winter
    np.testing.assert_allclose(lr[1, :, :, 2], 1.0)  # sample 1 -> spring


def test_synth_inside_jit(hr_data):
    """The synthesizer must be fuseable into a larger jitted function."""
    synth = BatchSynthesizer(hr_data, None, 'spc', scale=4, batch_size=4,
                             patch_size=16)

    @jax.jit
    def step(indices, key):
        batch = synth._make_batch(indices, key)
        return batch['hr'].mean() + batch['lr'].mean()

    v = step(jnp.arange(4), jax.random.PRNGKey(0))
    assert np.isfinite(float(v))


def test_synth_full_channel_layout_matches_host(rng):
    """Exact host/device equality including predictor + static channels
    (full grid, deterministic)."""
    hr = rng.standard_normal((12, 32, 32, 1)).astype('float32')
    statics = [rng.standard_normal((32, 32)).astype('float32'),
               rng.standard_normal((32, 32)).astype('float32')]
    preds = [rng.standard_normal((12, 32, 32, 1)).astype('float32')]
    for ups in ['spc', 'pin']:
        synth = BatchSynthesizer(hr, None, ups, scale=4, batch_size=5,
                                 static_vars=statics, predictors=preds)
        batch = synth(jnp.arange(5), jax.random.PRNGKey(0))
        [lr_host, aux_host], [hr_host] = create_batch_hr_lr(
            np.arange(12), 0, hr, None, ups, scale=4, batch_size=5,
            patch_size=None, static_vars=statics,
            predictors=np.concatenate(preds, axis=-1))
        np.testing.assert_allclose(np.asarray(batch['hr']), hr_host,
                                   atol=1e-5, err_msg=ups)
        np.testing.assert_allclose(np.asarray(batch['lr']), lr_host,
                                   atol=1e-5, err_msg=ups)
        np.testing.assert_allclose(np.asarray(batch['aux']), aux_host,
                                   atol=1e-5, err_msg=ups)


def test_generator_with_statics_and_predictors(hr_data, rng):
    statics = [rng.standard_normal((32, 32)).astype('float32')]
    preds = [rng.standard_normal((24, 32, 32, 1)).astype('float32')]
    gen = DataGenerator(hr_data, None, backbone='resnet', upsampling='spc',
                        scale=4, batch_size=4, patch_size=16,
                        static_vars=statics, predictors=preds, seed=0)
    [lr, aux], [hr] = gen[0]
    assert lr.shape == (4, 4, 4, 3)      # data + pred + static
    assert aux.shape == (4, 16, 16, 1)
    assert hr.shape == (4, 16, 16, 1)


def test_generator_explicit_pairs(rng):
    hr = rng.standard_normal((20, 32, 32, 1)).astype('float32')
    lr = np.asarray(resize2d(jnp.asarray(hr), (8, 8), 'inter_area'))
    gen = DataGenerator(hr, lr, backbone='resnet', upsampling='spc',
                        scale=4, batch_size=4, patch_size=16, seed=0)
    [blr], [bhr] = gen[0]
    assert blr.shape == (4, 4, 4, 1)
    assert bhr.shape == (4, 16, 16, 1)


def test_host_tier_rejects_reference_broken_st_patch_configs(rng):
    """The reference crops the squeezed [t,y,x] window as [y,x,c] in the
    pin / explicit-LR / predictors patch branches (crash or silent
    time-axis cropping) — the host-compat tier refuses cleanly."""
    from dl4ds_tpu.dataloader import create_pair_hr_lr
    hr = rng.standard_normal((8, 16, 16, 1)).astype('float32')
    lr = rng.standard_normal((8, 4, 4, 1)).astype('float32')
    with pytest.raises(ValueError, match='reference-broken'):
        create_pair_hr_lr(hr, None, 'pin', 4, patch_size=8)
    with pytest.raises(ValueError, match='reference-broken'):
        create_pair_hr_lr(hr, lr, 'spc', 4, patch_size=8)
    # postups + implicit + no predictors IS supported (reference works too)
    out = create_pair_hr_lr(hr, None, 'spc', 4, patch_size=8)
    assert out[0].shape == (8, 8, 8, 1)


def test_host_tier_warns_on_reference_statics_misalignment(rng):
    from dl4ds_tpu.dataloader import create_pair_hr_lr
    hr = rng.standard_normal((16, 16, 1)).astype('float32')
    lr = rng.standard_normal((4, 4, 1)).astype('float32')
    topo = rng.standard_normal((16, 16)).astype('float32')
    with pytest.warns(RuntimeWarning, match='LR-coordinate origins'):
        create_pair_hr_lr(hr, lr, 'spc', 4, patch_size=8,
                          static_vars=[topo])


def test_batch_synthesizer_rejects_oversized_patch(rng):
    from dl4ds_tpu.dataloader import BatchSynthesizer
    data = rng.standard_normal((8, 16, 16, 1)).astype('float32')
    with pytest.raises(ValueError, match='exceeds the HR grid'):
        BatchSynthesizer(data, None, 'spc', 4, batch_size=2, patch_size=32)


def test_season_ids_length_validated(rng):
    from dl4ds_tpu.dataloader import BatchSynthesizer, HostStreamer
    data = rng.standard_normal((8, 16, 16, 1)).astype('float32')
    with pytest.raises(ValueError, match='season_ids has'):
        BatchSynthesizer(data, None, 'spc', 4, batch_size=2,
                         season_ids=np.zeros(3, np.int32))
    with pytest.raises(ValueError, match='season_ids has'):
        HostStreamer(data, 'spc', 4, batch_size=2,
                     season_ids=np.zeros(3, np.int32))


def test_datagen_repeat_must_be_int(rng):
    from dl4ds_tpu.dataloader import DataGenerator
    data = rng.standard_normal((8, 16, 16, 1)).astype('float32')
    with pytest.raises(TypeError, match='repeat'):
        DataGenerator(data, None, 'resnet', 'spc', 4, batch_size=2,
                      repeat=2.0)


def test_host_streamer_producer_error_propagates(rng):
    from dl4ds_tpu.dataloader import HostStreamer
    data = rng.standard_normal((16, 16, 16, 1)).astype('float32')
    hs = HostStreamer(data, 'spc', 4, batch_size=4, patch_size=8, seed=0)

    def boom(idx):
        raise RuntimeError('synthetic producer failure')
    hs._host_batch = boom
    with pytest.raises(RuntimeError, match='synthetic producer failure'):
        for _ in hs.epochs(n_epochs=1, steps=2):
            pass


def test_host_streamer_wraps_whole_permutation(rng):
    """steps > n_batches must wrap around the permutation (distinct
    samples), not tile the permutation's tail."""
    from dl4ds_tpu.dataloader import HostStreamer
    data = (np.arange(10, dtype='float32')[:, None, None, None]
            * np.ones((1, 16, 16, 1), 'float32'))
    hs = HostStreamer(data, 'spc', 4, batch_size=8, seed=0)
    batches = list(hs.epochs(n_epochs=1, steps=3))
    for b in batches:
        ids = np.unique(np.asarray(b['hr'][:, 0, 0, 0]).round(3))
        assert len(ids) == 8    # every batch draws 8 DISTINCT samples
