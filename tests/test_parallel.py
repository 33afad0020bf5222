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


def test_spatial_sharded_interior_matches(rng):
    """H-axis sharded inference (shard_map + ppermute halo exchange) matches
    unsharded inference away from the grid's top/bottom edges."""
    from dl4ds_tpu.training.base import make_mesh
    from dl4ds_tpu.parallel import predict_spatial_sharded
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(16, 16),
                               n_filters=4, n_blocks=1, attention=False,
                               output_attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    x = rng.standard_normal((1, 64, 32, 1)).astype('float32')
    mesh = make_mesh()
    halo = receptive_field_radius(1)  # 10 > band interior needs
    y_full = np.asarray(model.apply(variables, jnp.asarray(x)))
    y_sh = predict_spatial_sharded(model, variables, x, mesh, halo=halo)
    assert y_sh.shape == y_full.shape == (1, 128, 64, 1)
    # interior: everything but `halo` rows near the true top/bottom edges
    m = halo * 2
    np.testing.assert_allclose(y_sh[:, m:-m], y_full[:, m:-m], atol=1e-4)


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
