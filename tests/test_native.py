"""Native host data-path tests: C++/OpenMP kernels vs numpy, and the
HostStreamer pipeline."""

import numpy as np
import pytest

from dl4ds_tpu import native
from dl4ds_tpu.dataloader import HostStreamer


def test_native_builds():
    assert native.available(), 'native library failed to build with g++'


def test_gather_windows_matches_numpy(rng):
    src = rng.standard_normal((50, 8, 8, 2)).astype('float32')
    idx = rng.integers(0, 45, size=16).astype(np.int64)
    got = native.gather_windows(src, idx, time_window=4)
    win = idx[:, None] + np.arange(4)
    ref = src[win.reshape(-1)].reshape(16, 4, 8, 8, 2)
    np.testing.assert_array_equal(got, ref)
    got1 = native.gather_windows(src, idx)
    np.testing.assert_array_equal(got1, src[idx])


def test_crop_batch_matches_numpy(rng):
    src = rng.standard_normal((6, 16, 16, 3)).astype('float32')
    ys = rng.integers(0, 8, size=6).astype(np.int64)
    xs = rng.integers(0, 8, size=6).astype(np.int64)
    got = native.crop_batch(src, ys, xs, 8)
    for i in range(6):
        np.testing.assert_array_equal(
            got[i], src[i, ys[i]:ys[i] + 8, xs[i]:xs[i] + 8, :])


def test_gather_crop_fused(rng):
    src = rng.standard_normal((30, 16, 16, 1)).astype('float32')
    idx = rng.integers(0, 25, size=8).astype(np.int64)
    ys = rng.integers(0, 8, size=8).astype(np.int64)
    xs = rng.integers(0, 8, size=8).astype(np.int64)
    got = native.gather_crop(src, idx, ys, xs, 8, time_window=3)
    assert got.shape == (8, 3, 8, 8, 1)
    for i in range(8):
        for k in range(3):
            np.testing.assert_array_equal(
                got[i, k],
                src[idx[i] + k, ys[i]:ys[i] + 8, xs[i]:xs[i] + 8, :])


def test_host_streamer_postups(rng):
    data = rng.standard_normal((40, 32, 32, 1)).astype('float32')
    streamer = HostStreamer(data, 'spc', scale=4, batch_size=4,
                            patch_size=16, prefetch=2, seed=0)
    batches = list(streamer.epochs(n_epochs=1, steps=3))
    assert len(batches) == 3
    for b in batches:
        assert b['hr'].shape == (4, 16, 16, 1)
        assert b['lr'].shape == (4, 4, 4, 1)
    # lr must be the area-coarsened hr
    from dl4ds_tpu.interpolation import resize2d
    b0 = batches[0]
    np.testing.assert_allclose(
        np.asarray(b0['lr']),
        np.asarray(resize2d(b0['hr'], (4, 4), 'inter_area')), atol=1e-5)


def test_host_streamer_pin_full_grid(rng):
    data = rng.standard_normal((20, 16, 16, 1)).astype('float32')
    streamer = HostStreamer(data, 'pin', scale=4, batch_size=2, seed=0)
    b = next(iter(streamer.epochs(steps=1)))
    assert b['hr'].shape == (2, 16, 16, 1)
    assert b['lr'].shape == (2, 16, 16, 1)


def test_host_streamer_explicit_pairs(rng):
    from dl4ds_tpu.interpolation import resize2d
    import jax.numpy as jnp
    hr = rng.standard_normal((30, 32, 32, 1)).astype('float32')
    lr = np.asarray(resize2d(jnp.asarray(hr), (8, 8), 'inter_area'))
    streamer = HostStreamer(hr, 'spc', scale=4, batch_size=4, patch_size=16,
                            array_lr=lr, seed=0)
    b = next(iter(streamer.epochs(steps=1)))
    assert b['hr'].shape == (4, 16, 16, 1)
    assert b['lr'].shape == (4, 4, 4, 1)
