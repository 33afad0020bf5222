"""Analytic FLOPs counter (ops/flops.py): golden values on known shapes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dl4ds_tpu.ops.flops import count_flops


def test_matmul_flops():
    a = jnp.zeros((64, 32))
    b = jnp.zeros((32, 16))
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 64 * 32 * 16


def test_conv_flops():
    x = jnp.zeros((2, 8, 8, 3))
    w = jnp.zeros((3, 3, 3, 16))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # out [2,8,8,16]: 2 * |out| * k_spatial * c_in
    assert count_flops(conv, x, w) == 2 * (2 * 8 * 8 * 16) * 9 * 3


def test_depthwise_conv_flops():
    x = jnp.zeros((1, 8, 8, 4))
    w = jnp.zeros((3, 3, 1, 4))  # per-group input features = 1

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', feature_group_count=4,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    assert count_flops(conv, x, w) == 2 * (1 * 8 * 8 * 4) * 9 * 1


def test_scan_multiplies_by_trip_count():
    a = jnp.zeros((16, 16))

    def f(a):
        def body(c, _):
            return c @ a, None
        c, _ = jax.lax.scan(body, a, None, length=5)
        return c

    assert count_flops(f, a) == 5 * 2 * 16 ** 3


def test_grad_step_counts_backward_convs():
    """d(conv)/dx and d(conv)/dw are themselves convs: the jaxpr of a
    value_and_grad step must count roughly 3x the forward FLOPs."""
    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 4))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    fwd = count_flops(conv, x, w)
    step_w = count_flops(
        lambda x, w: jax.value_and_grad(
            lambda w: jnp.mean(conv(x, w) ** 2))(w), x, w)
    assert step_w == 2 * fwd  # fwd + dw-conv (x is not differentiated)
    step_xw = count_flops(
        lambda x, w: jax.value_and_grad(
            lambda x, w: jnp.mean(conv(x, w) ** 2), argnums=(0, 1))(x, w),
        x, w)
    assert step_xw == 3 * fwd  # fwd + dx-conv + dw-conv


def test_train_step_flops_are_sane():
    """The full fused train step's analytic FLOPs are within the expected
    band (and far below XLA's padded hardware cost for narrow channels)."""
    from dl4ds_tpu.training import supervised
    rng = np.random.default_rng(0)
    data = rng.standard_normal((16, 32, 32, 1)).astype('float32')
    tr = supervised.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:4], data_test=data[:4], scale=4, patch_size=16,
        batch_size=4, loss='mae', epochs=1, n_filters=8, n_blocks=2,
        save=False, verbose=False)
    tr.setup_datagen()
    tr.setup_model()
    import optax
    from flax.training import train_state
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=optax.adam(1e-3), batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    idx = jnp.arange(4, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    flops = count_flops(lambda s, i, k: tr._train_step(s, i, k),
                        state, idx, key)
    fwd = count_flops(
        lambda v, b: tr.model.module.apply(v, b, None, training=False),
        {'params': state.params}, jnp.zeros((4, 4, 4, 1), jnp.float32))
    assert flops > fwd  # includes backward
    assert flops < 10 * fwd  # not absurd
