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
