"""Golden tests: resize2d / resize_array vs OpenCV for all 5 modes.

Parity target: <=1e-5 absolute error on float32 inputs (BASELINE.md accuracy
gate; the reference resizes with cv2 at dl4ds/utils.py:341-401).
"""

import numpy as np
import cv2
import pytest

pytestmark = pytest.mark.smoke

from dl4ds_tpu.interpolation import resize2d, resize_array, resize_matrix

CV2_MODES = {
    'nearest': cv2.INTER_NEAREST,
    'bilinear': cv2.INTER_LINEAR,
    'bicubic': cv2.INTER_CUBIC,
    'lanczos': cv2.INTER_LANCZOS4,
    'inter_area': cv2.INTER_AREA,
}

CASES = [
    (32, 32, 8, 8),      # 4x integer decimation
    (32, 32, 16, 16),    # 2x
    (20, 20, 5, 5),      # 4x
    (31, 29, 8, 8),      # non-integer decimation, non-square
    (16, 16, 64, 64),    # 4x zoom
    (16, 16, 40, 40),    # 2.5x zoom
    (13, 17, 29, 23),    # odd mixed zoom
    (24, 24, 6, 6),      # 4x
    (32, 32, 32, 32),    # identity
    (10, 40, 40, 10),    # shrink one axis, zoom the other
]


@pytest.mark.parametrize('mode', list(CV2_MODES))
@pytest.mark.parametrize('hi,wi,ho,wo', CASES)
def test_resize2d_matches_opencv(mode, hi, wi, ho, wo, rng):
    x = rng.standard_normal((hi, wi)).astype(np.float32)
    ref = cv2.resize(x, (wo, ho), interpolation=CV2_MODES[mode])
    got = np.asarray(resize2d(x, (ho, wo), mode))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


@pytest.mark.parametrize('mode', ['inter_area', 'bicubic', 'bilinear'])
def test_resize2d_multichannel(mode, rng):
    x = rng.standard_normal((32, 32, 3)).astype(np.float32)
    got = np.asarray(resize2d(x, (8, 8), mode))
    for c in range(3):
        ref = cv2.resize(x[..., c], (8, 8), interpolation=CV2_MODES[mode])
        np.testing.assert_allclose(got[..., c], ref, atol=1e-5, rtol=0)


def test_resize2d_batched_4d(rng):
    x = rng.standard_normal((5, 32, 32, 2)).astype(np.float32)
    got = np.asarray(resize2d(x, (8, 8), 'inter_area'))
    assert got.shape == (5, 8, 8, 2)
    ref = cv2.resize(x[3, :, :, 1], (8, 8), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(got[3, :, :, 1], ref, atol=1e-5, rtol=0)


def test_resize_array_reference_api(rng):
    # resize_array takes newsize as (X, Y), squeezes by default, and coerces
    # int dtypes to nearest — same contract as the reference helper.
    x = rng.standard_normal((32, 28, 1)).astype(np.float32)
    out = resize_array(x, (14, 8), 'bilinear')        # (X=14, Y=8)
    assert out.shape == (8, 14)
    out = resize_array(x, (14, 8), 'bilinear', squeezed=False)
    assert out.shape == (8, 14, 1)
    xi = rng.integers(0, 2, size=(32, 28)).astype(np.int64)
    out = resize_array(xi, (14, 8))
    ref = cv2.resize(xi.astype('float32'), (14, 8),
                     interpolation=cv2.INTER_NEAREST)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_integer_area_is_mean_pooling(rng):
    x = rng.standard_normal((16, 16)).astype(np.float32)
    got = np.asarray(resize2d(x, (4, 4), 'inter_area'))
    ref = x.reshape(4, 4, 4, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_resize_matrix_rows_sum_to_one():
    for mode in ['bilinear', 'bicubic', 'lanczos', 'inter_area', 'nearest']:
        m = resize_matrix(mode, 37, 12)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_jit_and_vmap(rng):
    import jax
    import jax.numpy as jnp
    x = rng.standard_normal((4, 32, 32, 1)).astype(np.float32)
    f = jax.jit(lambda a: resize2d(a, (8, 8), 'inter_area'))
    y1 = f(jnp.asarray(x))
    y2 = jax.vmap(lambda a: resize2d(a, (8, 8), 'inter_area'))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_randomized_sweep_vs_opencv(rng):
    """Randomized shape sweep across all modes (property-test style)."""
    for _ in range(25):
        hi, wi = int(rng.integers(6, 70)), int(rng.integers(6, 70))
        ho, wo = int(rng.integers(4, 70)), int(rng.integers(4, 70))
        mode = list(CV2_MODES)[int(rng.integers(0, 5))]
        x = rng.standard_normal((hi, wi)).astype(np.float32)
        ref = cv2.resize(x, (wo, ho), interpolation=CV2_MODES[mode])
        got = np.asarray(resize2d(x, (ho, wo), mode))
        np.testing.assert_allclose(
            got, ref, atol=3e-5, rtol=0,
            err_msg=f'{mode} {hi}x{wi}->{ho}x{wo}')


def test_keep_dynamic_range(rng):
    x = rng.random((16, 16)).astype(np.float32)
    out = resize_array(x, (64, 64), 'bicubic', keep_dynamic_range=True)
    assert out.min() >= x.min() - 1e-6 and out.max() <= x.max() + 1e-6
