"""Halo-tiled inference tests: tiled output must match untiled inference
(attention-free fully-convolutional models; halo >= receptive field)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dl4ds_tpu as dds
from dl4ds_tpu.parallel import predict_tiled, receptive_field_radius
from dl4ds_tpu.models import net_postupsampling, net_pin


def test_receptive_field_estimate():
    assert receptive_field_radius(2) >= 10


def test_tiled_matches_untiled_spc(rng):
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((2, 48, 48, 1)).astype('float32')
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    halo = receptive_field_radius(1)
    y_tiled = predict_tiled(model, variables, x, tile=16, halo=halo)
    assert y_tiled.shape == y_full.shape == (2, 96, 96, 1)
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


def test_tiled_matches_untiled_pin(rng):
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(32, 32), n_filters=4, n_blocks=1,
                    attention=False, output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 64, 1)).astype('float32')
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    y_tiled = predict_tiled(model, variables, x, tile=32,
                            halo=receptive_field_radius(1))
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


def test_tiled_sharded_over_mesh(rng):
    from dl4ds_tpu.training.base import make_mesh
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 64, 1)).astype('float32')
    mesh = make_mesh()
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    y_tiled = predict_tiled(model, variables, x, tile=16,
                            halo=receptive_field_radius(1), mesh=mesh)
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


def test_tiled_nondivisible_grid(rng):
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(32, 32), n_filters=4, n_blocks=1,
                    attention=False, output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 50, 38, 1)).astype('float32')
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    y_tiled = predict_tiled(model, variables, x, tile=16,
                            halo=receptive_field_radius(1))
    assert y_tiled.shape == y_full.shape
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


@pytest.mark.core
def test_spatial_sharded_matches_everywhere(rng):
    """H-axis sharded inference (shard_map + ppermute halo exchange, windows
    anchored flush at the true borders) matches unsharded inference
    EVERYWHERE — including the top and bottom edge rows."""
    from dl4ds_tpu.training.base import make_mesh
    from dl4ds_tpu.parallel import predict_spatial_sharded
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    halo = receptive_field_radius(1)                 # 10
    x = rng.standard_normal((1, 8 * 2 * halo, 32, 1)).astype('float32')
    mesh = make_mesh()                               # 8 devices, band = 2*halo
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    y_sh = predict_spatial_sharded(model, variables, x, mesh, halo=halo)
    assert y_sh.shape == y_full.shape
    np.testing.assert_allclose(y_sh, y_full, atol=1e-5)


def test_spatial_sharded_band_too_small_raises(rng):
    from dl4ds_tpu.training.base import make_mesh
    from dl4ds_tpu.parallel import predict_spatial_sharded
    model = net_pin('convnet', n_channels=1, n_aux_channels=0,
                    hr_size=(32, 32), n_filters=4, n_blocks=1,
                    attention=False, output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 32, 1)).astype('float32')
    with pytest.raises(ValueError, match='band height'):
        predict_spatial_sharded(model, variables, x, make_mesh(), halo=10)


def test_predict_tile_routing_matches_plain_predict(rng):
    """predict(tile=, halo=) routes through parallel.predict_tiled and is
    bit-comparable to plain predict() for attention-free models."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((2, 24, 24, 1)).astype('float32')
    y_plain = dds.predict((model, variables), x, scale=2, array_in_hr=False)
    y_tiled = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                          tile=8, halo=receptive_field_radius(1))
    assert y_tiled.shape == y_plain.shape
    np.testing.assert_allclose(y_tiled, y_plain, atol=1e-5)


def test_predict_spatial_mesh_routing(rng):
    from dl4ds_tpu.training.base import make_mesh
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    halo = receptive_field_radius(1)
    x = rng.standard_normal((1, 8 * 2 * halo, 32, 1)).astype('float32')
    y_plain = dds.predict((model, variables), x, scale=2, array_in_hr=False)
    y_sh = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                       spatial_mesh=make_mesh(), halo=halo)
    np.testing.assert_allclose(y_sh, y_plain, atol=1e-5)


def _mesh_2d(n_data=2, n_space=4):
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, ('data', 'space'))


@pytest.mark.core
def test_spatial_sharded_step_matches_unsharded(rng):
    """Spatially-sharded TRAINING: (loss, grads) from the DPxSP
    shard_map step (halo exchange in the input path, psum of per-band
    contributions) must equal the unsharded step's to float tolerance."""
    from dl4ds_tpu.parallel import make_spatial_sharded_step
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    halo = receptive_field_radius(1)
    mesh = _mesh_2d(2, 4)                       # bands of 16 rows = 2*halo
    x = rng.standard_normal((4, 8 * halo, 16, 1)).astype('float32')
    y = rng.standard_normal((4, 16 * halo, 32, 1)).astype('float32')
    key = jax.random.PRNGKey(3)

    sss = make_spatial_sharded_step(model, mesh, halo=halo, loss='mae')
    l_sh, g_sh = sss.loss_and_grads(variables['params'], x, y, key)

    def ref_loss(p):
        out = model.module.apply({'params': p}, jnp.asarray(x), None,
                                 training=True, rngs={'dropout': key})
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - jnp.asarray(y)))

    l_ref, g_ref = jax.value_and_grad(ref_loss)(variables['params'])
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-6)
    flat_sh = jax.tree_util.tree_leaves(g_sh)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_sh) == len(flat_ref)
    for a, b in zip(flat_sh, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_spatial_sharded_step_trains(rng):
    """The full step (loss+grads+optax update) reduces the loss on a
    learnable mapping (identity-ish downscaling target)."""
    import optax
    from dl4ds_tpu.parallel import make_spatial_sharded_step
    from dl4ds_tpu.interpolation import resize2d
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    halo = receptive_field_radius(1)
    mesh = _mesh_2d(2, 4)
    yy, xx = np.meshgrid(np.linspace(0, 4, 16 * halo),
                         np.linspace(0, 4, 32), indexing='ij')
    smooth = np.sin(2 * yy) * np.cos(3 * xx)          # learnable structure
    y = np.broadcast_to(smooth[None, :, :, None],
                        (4, 16 * halo, 32, 1)).astype('float32').copy()
    x = np.asarray(resize2d(jnp.asarray(y), (8 * halo, 16), 'inter_area'))

    tx = optax.adam(5e-3)
    sss = make_spatial_sharded_step(model, mesh, tx=tx, halo=halo,
                                    loss='mae')
    params = variables['params']
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        params, opt_state, l = sss.step(params, opt_state, x, y, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses


def test_spatial_sharded_step_validation(rng):
    from dl4ds_tpu.parallel import make_spatial_sharded_step
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    mesh = _mesh_2d(2, 4)
    sss = make_spatial_sharded_step(model, mesh, halo=8)
    key = jax.random.PRNGKey(0)
    p = variables['params']
    with pytest.raises(ValueError, match='divisible'):
        sss.loss_and_grads(p, np.zeros((4, 30, 16, 1), 'f'),
                           np.zeros((4, 60, 32, 1), 'f'), key)
    with pytest.raises(ValueError, match='band height'):
        sss.loss_and_grads(p, np.zeros((4, 32, 16, 1), 'f'),
                           np.zeros((4, 64, 32, 1), 'f'), key)
    with pytest.raises(ValueError, match='target rows'):
        sss.loss_and_grads(p, np.zeros((4, 64, 16, 1), 'f'),
                           np.zeros((4, 64, 32, 1), 'f'), key)
    with pytest.raises(ValueError, match="'mae' or 'mse'"):
        make_spatial_sharded_step(model, mesh, loss='dssim')


def test_tiled_with_aux_input(rng):
    """Halo-tiled inference slices the HR aux grid consistently."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=2, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 48, 48, 1)).astype('float32')
    aux = rng.standard_normal((1, 96, 96, 2)).astype('float32')
    y_full = np.asarray(model.apply(variables, jnp.asarray(x),
                                    jnp.asarray(aux)))
    y_tiled = predict_tiled(model, variables, x, aux=aux, tile=16,
                            halo=receptive_field_radius(1))
    assert y_tiled.shape == y_full.shape
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


def test_tiled_matches_untiled_spatiotemporal(rng):
    """5-D [B,T,h,w,C] tiling: the per-tile ConvLSTM sees the same halo
    context as the full grid — exact for attention-free models."""
    from dl4ds_tpu.models import recnet_postupsampling
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(16, 16),
                                  time_window=3, n_filters=4, n_blocks=1,
                                  attention=False, output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((2, 3, 48, 48, 1)).astype('float32')
    y_full = np.asarray(model.module.apply(variables, jnp.asarray(x), None,
                                           training=False))
    halo = receptive_field_radius(1, time_window=3)   # recurrence grows RF
    y_tiled = predict_tiled(model, variables, x, tile=16, halo=halo)
    assert y_tiled.shape == y_full.shape == (2, 3, 96, 96, 1)
    np.testing.assert_allclose(y_tiled, y_full, atol=1e-4)


def test_predict_tile_routing_spatiotemporal(rng):
    """predict(tile=) handles spatio-temporal inputs (5-D window batch)
    and matches plain predict for attention-free models."""
    from dl4ds_tpu.models import recnet_postupsampling
    model = recnet_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                  n_aux_channels=0, lr_size=(12, 12),
                                  time_window=3, n_filters=4, n_blocks=1,
                                  attention=False, output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((8, 24, 24, 1)).astype('float32')
    y_plain = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                          time_window=3)
    y_tiled = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                          time_window=3, tile=8,
                          halo=receptive_field_radius(1, time_window=3))
    assert y_tiled.shape == y_plain.shape
    np.testing.assert_allclose(y_tiled, y_plain, atol=1e-4)


def test_tiled_mesh_fewer_windows_than_devices(rng):
    """n_win < mesh.size: padding must wrap indices (a tail slice used to
    under-fill the padded batch and crash device_put)."""
    from dl4ds_tpu.training.base import make_mesh
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 32, 64, 1)).astype('float32')  # 1x2 tiles
    halo = receptive_field_radius(1)
    y_plain = predict_tiled(model, variables, x, tile=32, halo=halo)
    y_mesh = predict_tiled(model, variables, x, tile=32, halo=halo,
                           mesh=make_mesh())
    np.testing.assert_allclose(y_mesh, y_plain, atol=1e-5)


def test_spatial_sharded_step_rejects_aux_models():
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import make_spatial_sharded_step
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=1, lr_size=(16, 16),
                               n_filters=4, n_blocks=1)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ('data', 'space'))
    with pytest.raises(ValueError, match='aux'):
        make_spatial_sharded_step(model, mesh)


def test_predict_spatial_sharded_axis_selection(rng):
    """2-D meshes need an explicit axis; the bands shard over that axis's
    size (n=4 here), matching the unsharded output."""
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import predict_spatial_sharded
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 32, 1)).astype('float32')
    mesh2d = Mesh(np.array(jax.devices()).reshape(2, 4), ('data', 'space'))
    with pytest.raises(ValueError, match='pass axis='):
        predict_spatial_sharded(model, variables, x, mesh2d, halo=8)
    y = predict_spatial_sharded(model, variables, x, mesh2d, halo=8,
                                axis='space')
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_full, atol=1e-4)
    with pytest.raises(ValueError, match='4-D'):
        predict_spatial_sharded(
            model, variables, rng.standard_normal(
                (1, 4, 64, 32, 1)).astype('float32'), mesh2d, axis='space')


def test_init_ensemble_divisibility_error():
    from dl4ds_tpu.training.base import make_mesh
    from dl4ds_tpu.parallel import init_ensemble
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()), ('ensemble',))
    with pytest.raises(ValueError, match='not divisible'):
        init_ensemble(model, 6, mesh=mesh)


# --------------------------------------------------------------------------
# Tensor (channel) parallelism
# --------------------------------------------------------------------------

def _tp_model(scale=2, n_filters=8, n_blocks=3, aux=False):
    return net_postupsampling('resnet', 'spc', scale=scale, n_channels=1,
                              n_aux_channels=(1 if aux else 0),
                              lr_size=(8, 8), n_filters=n_filters,
                              n_blocks=n_blocks, attention=True)


def test_tensor_param_shardings_rules():
    """Sharding rules: wide kernels shard on the output-feature dim,
    narrow ([3,3,C,1] output conv) and bias leaves stay replicated."""
    from jax.sharding import Mesh, PartitionSpec as P
    from dl4ds_tpu.parallel import tensor_param_shardings
    mesh = Mesh(np.array(jax.devices()[:2]), ('model',))
    model = _tp_model()
    params = model.init(jax.random.PRNGKey(0))['params']
    specs = tensor_param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P))[0]
    leaves = dict(zip([jax.tree_util.keystr(k) for k, _ in flat],
                      [v for _, v in flat]))
    params_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    shapes = dict(zip([jax.tree_util.keystr(k) for k, _ in params_flat],
                      [v.shape for _, v in params_flat]))
    n_model = 0
    for name, spec in leaves.items():
        shape = shapes[name]
        if 'model' in tuple(spec):
            n_model += 1
            assert spec[-1] == 'model' and spec[:-1] == (None,) * (
                len(shape) - 1)
            assert shape[-1] % 2 == 0 and shape[-1] >= 4
        elif len(shape) >= 2:
            # replicated wide leaves must have a reason: odd or narrow
            assert shape[-1] % 2 != 0 or shape[-1] < 4
    assert n_model >= 10  # the zoo's conv kernels do shard


@pytest.mark.core
def test_tensor_sharded_step_matches_unsharded(rng):
    """Weights sharded over a 'model' axis (GSPMD-partitioned step):
    k steps of Adam must match the unsharded program to float
    tolerance, on a pure-TP mesh AND a 2-D TP x DP mesh."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import make_tensor_sharded_step
    model = _tp_model()
    params = model.init(jax.random.PRNGKey(0))['params']
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 16, 16, 1)), jnp.float32)
    key = jax.random.PRNGKey(1)

    tx = optax.adam(1e-3)

    def loss_fn(p):
        out = model.module.apply({'params': p}, x, None, training=True,
                                 rngs={'dropout': key})
        return jnp.mean(jnp.abs(y - out.astype(jnp.float32)))

    p_ref, st_ref = params, tx.init(params)
    for _ in range(3):
        l_ref, g = jax.value_and_grad(loss_fn)(p_ref)
        up, st_ref = tx.update(g, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, up)

    for axes, shape in ((('model',), (2,)), (('model', 'data'), (2, 4))):
        mesh = Mesh(np.array(jax.devices()[:int(np.prod(shape))])
                    .reshape(shape), axes)
        ts = make_tensor_sharded_step(model, mesh, tx=optax.adam(1e-3))
        p = jax.device_put(params, ts.param_shardings)
        st = ts.init_opt(p)
        for _ in range(3):
            p, st, l = ts.step(p, st, x, y, key)
        assert abs(float(l) - float(l_ref)) < 1e-5
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        # the weights really live sharded on device
        kern = model.init(jax.random.PRNGKey(0))['params']
        some = [s for s in jax.tree.leaves(
                    ts.param_shardings,
                    is_leaf=lambda s: hasattr(s, 'spec'))
                if 'model' in jax.tree_util.tree_leaves(tuple(s.spec))]
        assert len(some) >= 10
        del kern


def test_tensor_sharded_loss_and_grads_and_aux(rng):
    """loss_and_grads returns sharded grads; aux-input models route the
    HR-aux batch through the same step."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import make_tensor_sharded_step
    model = _tp_model(aux=True)
    params = model.init(jax.random.PRNGKey(0))['params']
    mesh = Mesh(np.array(jax.devices()[:2]), ('model',))
    ts = make_tensor_sharded_step(model, mesh, tx=optax.adam(1e-3))
    p = jax.device_put(params, ts.param_shardings)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 16, 16, 1)), jnp.float32)
    aux = jnp.asarray(rng.standard_normal(
        (4,) + tuple(model.aux_shape)), jnp.float32)
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match='aux'):
        ts.loss_and_grads(p, x, y, key)
    l, g = ts.loss_and_grads(p, x, y, key, aux=aux)
    assert np.isfinite(float(l))
    assert jax.tree.structure(g) == jax.tree.structure(p)
    st = ts.init_opt(p)
    p2, st, l2 = ts.step(p, st, x, y, key, aux=aux)
    assert np.isfinite(float(l2))


def test_tiled_quantized_int8(rng):
    """tile= + quantize='int8': the fixed-shape window dispatches run
    through the shape-pinned int8 replay (self-calibrated on the first
    window batch); output stays close to the float tiled result, and a
    non-divisible window count exercises the wrap-padded last dispatch."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 48, 48, 1)).astype('float32')   # 3x3 tiles
    halo = receptive_field_radius(1)
    y_float = predict_tiled(model, variables, x, tile=16, halo=halo)
    # 9 windows, batch_size=4 -> last dispatch wrap-padded to 4
    y_int8 = predict_tiled(model, variables, x, tile=16, halo=halo,
                           batch_size=4, quantize='int8')
    assert y_int8.shape == y_float.shape
    assert np.isfinite(y_int8).all()
    assert np.max(np.abs(y_int8 - y_float)) < 0.3 * np.ptp(y_float)
    # weight-only keeps float conv math: much tighter
    y_wo = predict_tiled(model, variables, x, tile=16, halo=halo,
                         batch_size=4, quantize='weight-only')
    assert np.max(np.abs(y_wo - y_float)) < 0.05 * np.ptp(y_float)


def test_tiled_quantized_over_mesh(rng):
    """tile= + mesh= + quantize: quantized window dispatches shard over
    the 8-device mesh (every dispatch is exactly gbs windows)."""
    from dl4ds_tpu.training.base import make_mesh
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 64, 1)).astype('float32')
    halo = receptive_field_radius(1)
    y_float = predict_tiled(model, variables, x, tile=16, halo=halo)
    y_int8 = predict_tiled(model, variables, x, tile=16, halo=halo,
                           mesh=make_mesh(), quantize='int8')
    assert y_int8.shape == y_float.shape
    assert np.max(np.abs(y_int8 - y_float)) < 0.3 * np.ptp(y_float)


def test_predict_tile_quantize_routing(rng):
    """predict(tile=, quantize=) routes to the quantized tiled path;
    explicit calibration with tile= is rejected."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((2, 32, 32, 1)).astype('float32')
    halo = receptive_field_radius(1)
    y_float = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                          tile=16, halo=halo)
    y_int8 = dds.predict((model, variables), x, scale=2, array_in_hr=False,
                         tile=16, halo=halo, quantize='int8')
    assert y_int8.shape == y_float.shape
    assert np.max(np.abs(y_int8 - y_float)) < 0.3 * np.ptp(y_float)
    with pytest.raises(ValueError, match='first dispatch batch'):
        dds.predict((model, variables), x, scale=2, array_in_hr=False,
                    tile=16, halo=halo, quantize='int8',
                    calibration=x)
    with pytest.raises(ValueError, match='spatial_mesh'):
        from dl4ds_tpu.training.base import make_mesh
        dds.predict((model, variables), x, scale=2, array_in_hr=False,
                    spatial_mesh=make_mesh(('space',)), quantize='int8')


# ---------------------------------------------------------------------------
# pipeline parallelism (GPipe-style trunk rotation over a 'pipe' axis)

def _pp_model(**kw):
    from dl4ds_tpu.models import recnet_postupsampling
    cfg = dict(backbone_block='resnet', upsampling='spc', scale=2,
               n_channels=1, n_aux_channels=0, lr_size=(8, 8),
               time_window=3, n_filters=4, n_blocks=4)
    cfg.update(kw)
    return recnet_postupsampling(**cfg)


@pytest.mark.core
def test_pipeline_step_matches_unsharded(rng):
    """Trunk blocks rotated over a 4-stage 'pipe' axis: loss + grads and a
    3-step Adam trajectory must match the unsharded full-model program
    (the pipeline is exact — bubbles never touch valid microbatches)."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import make_pipeline_step

    model = _pp_model()
    full = model.init(jax.random.PRNGKey(0), batch_size=2)['params']
    x = jnp.asarray(rng.standard_normal((8, 3, 8, 8, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 3, 16, 16, 1)), jnp.float32)
    key = jax.random.PRNGKey(7)
    tx = optax.adam(1e-3)

    def loss_fn(p):
        out = model.module.apply({'params': p}, x, None, training=True,
                                 rngs={'dropout': key})
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - y))

    mesh = Mesh(np.array(jax.devices()[:4]), ('pipe',))
    ps = make_pipeline_step(model, mesh, tx=optax.adam(1e-3), loss='mae')
    assert ps.n_stages == 4 and ps.n_micro == 4
    parts = jax.device_put(ps.split_params(full), ps.param_shardings)

    # split/merge round-trips the tree exactly
    for a, b in zip(jax.tree.leaves(ps.merge_params(*ps.split_params(full))),
                    jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    l1, g1 = ps.loss_and_grads(parts, x, y, key)
    l2, g2 = jax.value_and_grad(loss_fn)(full)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves(ps.merge_params(*g1)),
                    jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # trunk params + Adam moments really live sharded over 'pipe'
    stk_specs = {tuple(s.spec) for s in jax.tree.leaves(
        ps.param_shardings[1], is_leaf=lambda s: hasattr(s, 'spec'))}
    assert stk_specs == {('pipe',)}

    # 3-step Adam trajectory matches the unsharded program
    p_ref, st_ref = full, tx.init(full)
    for _ in range(3):
        _, g = jax.value_and_grad(loss_fn)(p_ref)
        up, st_ref = tx.update(g, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, up)
    st = ps.init_opt(parts)
    for _ in range(3):
        parts, st, l = ps.step(parts, st, x, y, key)
    for a, b in zip(jax.tree.leaves(ps.merge_params(*parts)),
                    jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pipeline_step_2d_mesh_pin(rng):
    """PP x DP mesh on a recnet_pin densenet with layer norm and mse: the
    2-D program (batch sharded over 'data', trunk over 'pipe') matches the
    unsharded step; n_micro != n_stages is allowed."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.models import recnet_pin
    from dl4ds_tpu.parallel import make_pipeline_step

    model = recnet_pin('densenet', n_channels=1, n_aux_channels=0,
                       hr_size=(8, 8), time_window=2, n_filters=4,
                       n_blocks=4, normalization='ln')
    full = model.init(jax.random.PRNGKey(0), batch_size=2)['params']
    x = jnp.asarray(rng.standard_normal((8, 2, 8, 8, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 2, 8, 8, 1)), jnp.float32)
    key = jax.random.PRNGKey(3)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ('pipe', 'data'))
    ps = make_pipeline_step(model, mesh, tx=optax.adam(1e-3), loss='mse',
                            n_micro=2)
    parts = jax.device_put(ps.split_params(full), ps.param_shardings)
    l1, g1 = ps.loss_and_grads(parts, x, y, key)

    def loss_fn(p):
        out = model.module.apply({'params': p}, x, None, training=True,
                                 rngs={'dropout': key})
        return jnp.mean((out.astype(jnp.float32) - y) ** 2)

    l2, g2 = jax.value_and_grad(loss_fn)(full)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves(ps.merge_params(*g1)),
                    jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_step_validation(rng):
    """Unsupported configs fail loudly: spatial backbones (heterogeneous
    widths), aux inputs, bn state, indivisible n_blocks/batch."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.parallel import make_pipeline_step

    mesh = Mesh(np.array(jax.devices()[:4]), ('pipe',))

    spatial = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                                 n_aux_channels=0, lr_size=(8, 8),
                                 n_filters=4, n_blocks=4)
    with pytest.raises(ValueError, match='homogeneous'):
        make_pipeline_step(spatial, mesh)

    with pytest.raises(ValueError, match='aux'):
        make_pipeline_step(_pp_model(n_aux_channels=2), mesh)

    with pytest.raises(ValueError, match='divisible'):
        make_pipeline_step(_pp_model(n_blocks=6), mesh)

    with pytest.raises(ValueError, match='batch norm|batch-norm'):
        make_pipeline_step(_pp_model(normalization='bn'), mesh)

    with pytest.raises(ValueError, match='>= 2'):
        make_pipeline_step(
            _pp_model(), Mesh(np.array(jax.devices()[:1]), ('pipe',)))

    ps = make_pipeline_step(_pp_model(), mesh, tx=optax.adam(1e-3))
    full = _pp_model().init(jax.random.PRNGKey(0))['params']
    parts = jax.device_put(ps.split_params(full), ps.param_shardings)
    x5 = jnp.zeros((6, 3, 8, 8, 1))   # 6 % n_micro=4 != 0
    with pytest.raises(ValueError, match='n_micro'):
        ps.loss_and_grads(parts, x5, jnp.zeros((6, 3, 16, 16, 1)),
                          jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='5-D'):
        ps.loss_and_grads(parts, jnp.zeros((4, 8, 8, 1)),
                          jnp.zeros((4, 16, 16, 1)), jax.random.PRNGKey(0))
