"""Ensemble parallelism ('ep' axis): deep-ensemble training as one vmapped
program sharded over a mesh axis, and ensemble inference with uncertainty.

Counterpart of the reference's MC-dropout uncertainty loop
(reference: dl4ds/inference.py:63-71); here N independently-initialized
members train simultaneously (bagging optional), members sharded over the
mesh — no collectives between members.
"""

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dl4ds_tpu.models import net_postupsampling
from dl4ds_tpu.parallel import (init_ensemble, make_ensemble_step,
                                predict_ensemble)


def _model(**kw):
    kw.setdefault('attention', False)
    return net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                              n_aux_channels=0, lr_size=(8, 8),
                              n_filters=4, n_blocks=1, **kw)


def _data(rng, b=8):
    x = rng.standard_normal((b, 8, 8, 1)).astype('float32')
    y = rng.standard_normal((b, 16, 16, 1)).astype('float32')
    return x, y


def test_init_ensemble_members_are_independent():
    model = _model()
    stacked = init_ensemble(model, 4, seed=0)
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(l.shape[0] == 4 for l in leaves)
    # different seeds -> different member inits (kernel leaves differ)
    kernels = [l for l in leaves if l.ndim > 2]
    assert any(
        float(jnp.abs(k[0] - k[1]).max()) > 1e-4 for k in kernels)


@pytest.mark.core
def test_ensemble_step_matches_independent_training(rng):
    """Member i of the vmapped/sharded step must evolve exactly like the
    same member trained alone (bootstrap off, no dropout)."""
    model = _model()
    n = 4
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    tx = optax.adam(1e-3)
    stacked = init_ensemble(model, n, seed=0, mesh=mesh)
    es = make_ensemble_step(model, mesh, tx=tx, loss='mae', bootstrap=False)
    opt = es.init_opt(stacked)
    x, y = _data(rng)

    key = jax.random.PRNGKey(7)
    v, o = stacked, opt
    for _ in range(3):
        key, k = jax.random.split(key)
        v, o, losses = es.step(v, o, x, y, k)
    assert losses.shape == (n,)
    assert np.all(np.isfinite(np.asarray(losses)))

    # reference: member 2 trained alone with plain optax
    member = jax.tree.map(lambda l: l[2], stacked)

    def loss_fn(mv):
        out = model.module.apply(mv, jnp.asarray(x), None, training=True,
                                 rngs={'dropout': jax.random.PRNGKey(0)})
        from dl4ds_tpu.losses import mae
        return mae(jnp.asarray(y), out.astype(jnp.float32))

    mo = tx.init(member)
    for _ in range(3):
        g = jax.grad(loss_fn)(member)
        up, mo = tx.update(g, mo, member)
        member = optax.apply_updates(member, up)

    got = jax.tree.map(lambda l: np.asarray(l[2]), v)
    want = jax.tree.map(np.asarray, member)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_ensemble_step_ep_times_dp_mesh(rng):
    """EP x DP: members over 'ensemble', shared batch over 'data'."""
    model = _model()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ('ensemble', 'data'))
    stacked = init_ensemble(model, 4, seed=1, mesh=mesh)
    es = make_ensemble_step(model, mesh, loss='mae')
    opt = es.init_opt(stacked)
    x, y = _data(rng, b=8)
    v, o, losses = es.step(stacked, opt, x, y, jax.random.PRNGKey(0))
    assert losses.shape == (4,)
    assert np.all(np.isfinite(np.asarray(losses)))
    # members stayed distinct
    k0 = jax.tree_util.tree_leaves(v)[0]
    assert float(jnp.abs(k0[0] - k0[1]).max()) > 0


def test_bootstrap_decorrelates_members(rng):
    """With bagging on, members starting from the SAME init diverge."""
    model = _model()
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    one = model.init(jax.random.PRNGKey(0))
    same = jax.tree.map(lambda l: jnp.stack([l] * 4), one)
    es = make_ensemble_step(model, mesh, loss='mae', bootstrap=True)
    opt = es.init_opt(same)
    x, y = _data(rng)
    v, o, _ = es.step(same, opt, x, y, jax.random.PRNGKey(3))
    leaves = jax.tree_util.tree_leaves(v)
    assert any(float(jnp.abs(l[0] - l[1]).max()) > 0 for l in leaves)


def test_predict_ensemble_mean_std(rng):
    model = _model()
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    stacked = init_ensemble(model, 4, seed=0, mesh=mesh)
    x = rng.standard_normal((3, 8, 8, 1)).astype('float32')
    mean, std = predict_ensemble(model, stacked, x, mesh=mesh)
    assert mean.shape == (3, 16, 16, 1) and std.shape == (3, 16, 16, 1)
    # independent inits -> nonzero epistemic spread
    assert std.max() > 1e-6
    # mean equals the explicit per-member average
    outs = [np.asarray(model.module.apply(
        jax.tree.map(lambda l, i=i: l[i], stacked), jnp.asarray(x), None,
        training=False)) for i in range(4)]
    np.testing.assert_allclose(mean, np.mean(outs, axis=0), atol=1e-5)


def test_init_ensemble_rejects_batchnorm():
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1,
                               normalization='bn', attention=False)
    with pytest.raises(ValueError, match='batch-norm'):
        init_ensemble(model, 2)


def test_ensemble_step_trains_aux_branch(rng):
    """Models with an aux branch must train it (grads flow) and step()
    must demand the aux input."""
    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=2, lr_size=(8, 8),
                               n_filters=4, n_blocks=1, attention=False)
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    stacked = init_ensemble(model, 4, seed=0, mesh=mesh)
    es = make_ensemble_step(model, mesh, loss='mae', bootstrap=False)
    opt = es.init_opt(stacked)
    x, y = _data(rng)
    aux = rng.standard_normal((8, 16, 16, 2)).astype('float32')

    with pytest.raises(ValueError, match='aux branch'):
        es.step(stacked, opt, x, y, jax.random.PRNGKey(0))

    v, _, losses = es.step(stacked, opt, x, y, jax.random.PRNGKey(0),
                           aux=aux)
    assert np.all(np.isfinite(np.asarray(losses)))
    # the aux-branch params moved away from init
    flat0 = jax.tree_util.tree_leaves_with_path(stacked)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(v))
    moved = [float(jnp.abs(flat1[p] - l).max())
             for p, l in flat0 if 'aux' in str(p).lower()]
    assert moved and max(moved) > 0


def test_ensemble_axis_size_field():
    model = _model()
    mesh = Mesh(np.array(jax.devices()[:4]), ('ensemble',))
    es = make_ensemble_step(model, mesh)
    assert es.axis_size == 4
    # 8 members on a 4-way axis: 2 per device, allowed
    stacked = init_ensemble(model, 8, seed=0, mesh=mesh)
    rng = np.random.default_rng(0)
    x, y = _data(rng)
    _, _, losses = es.step(stacked, es.init_opt(stacked), x, y,
                           jax.random.PRNGKey(0))
    assert losses.shape == (8,)


def test_ensemble_save_load_roundtrip(tmp_path, rng):
    """A stacked ensemble variable tree persists through save_model /
    load_model (orbax handles any pytree) and still serves uncertainty."""
    from dl4ds_tpu.models import net_postupsampling, save_model, load_model
    from dl4ds_tpu.parallel import init_ensemble, predict_ensemble

    model = net_postupsampling('resnet', 'spc', scale=2, n_channels=1,
                               n_aux_channels=0, lr_size=(8, 8),
                               n_filters=4, n_blocks=1)
    stacked = init_ensemble(model, 4, seed=0)
    save_model(model, stacked, str(tmp_path / 'ens'))
    model2, stacked2 = load_model(str(tmp_path / 'ens'))
    for a, b in zip(jax.tree.leaves(stacked), jax.tree.leaves(stacked2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    mean, std = predict_ensemble(model2, stacked2, x)
    assert mean.shape == (2, 16, 16, 1) and std.shape == mean.shape
    assert np.all(np.asarray(std) >= 0)
