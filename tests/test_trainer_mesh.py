"""2-D meshes routed through SupervisedTrainer: a 'model' axis makes the
SAME jitted train step tensor-parallel (weights + Adam moments + EMA
channel-sharded via parallel.tensor_param_shardings), a 'space' axis makes
it spatial (activation heights sharded, GSPMD halo exchange) — so
schedules/EMA/early-stopping/checkpointing compose with TP/SP, matching
the reference's property that its one distribution strategy is usable
through the Trainer (reference: dl4ds/training/base.py:97-107)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

import dl4ds_tpu as dds


def _data():
    return np.random.default_rng(0).standard_normal(
        (48, 16, 16, 1)).astype('float32')


def _kw(data, **over):
    kw = dict(data_train=data[:32], data_val=data[32:40],
              data_test=data[40:], scale=2, batch_size=2, epochs=2,
              loss='mae', n_filters=16, n_blocks=1, save=False,
              verbose=False, seed=3)
    kw.update(over)
    return kw


def _mesh(*names_sizes):
    devs = np.array(jax.devices())
    sizes = [s for _, s in names_sizes]
    n = int(np.prod(sizes))
    return Mesh(devs[:n].reshape(sizes), tuple(n for n, _ in names_sizes))


@pytest.mark.smoke
def test_tensor_parallel_mesh_matches_dp_trainer():
    """TP x DP through the trainer = the 1-D trainer's exact trajectory
    (same program, different partitioning; per-leaf vs flattened Adam is
    element-for-element the same update), with params/EMA channel-sharded."""
    data = _data()
    kw = _kw(data, ema_decay=0.9, gradient_accumulation_steps=2,
             lr_schedule='warmup_cosine')
    tr_dp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 4)), **kw)
    tr_dp.run()
    tr_tp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 4), ('model', 2)),
                                  **kw)
    tr_tp.run()
    np.testing.assert_allclose(tr_dp.fithist['loss'],
                               tr_tp.fithist['loss'], rtol=2e-4)
    np.testing.assert_allclose(tr_dp.fithist['val_loss'],
                               tr_tp.fithist['val_loss'], rtol=2e-4)
    # genuinely sharded: conv kernels AND the EMA copy carry 'model' specs
    for tree in (tr_tp.state.params, tr_tp.state.ema_params):
        specs = {str(l.sharding.spec) for l in jax.tree.leaves(tree)}
        assert any('model' in s for s in specs), specs
    # the batch/LR scaling followed the data axis (4), not mesh.size (8)
    assert tr_tp.global_batch_size == tr_dp.global_batch_size == 8


@pytest.mark.core
def test_spatial_mesh_matches_dp_trainer():
    """SP x DP through the trainer: one sharding constraint on the
    synthesized batch height seeds GSPMD's spatial partitioning (its own
    halo exchanges) — same program, float-tolerance trajectory."""
    data = _data()
    tr_dp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 4)), **_kw(data))
    tr_dp.run()
    tr_sp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 4), ('space', 2)),
                                  **_kw(data))
    tr_sp.run()
    np.testing.assert_allclose(tr_dp.fithist['loss'],
                               tr_sp.fithist['loss'], rtol=2e-4)
    np.testing.assert_allclose(tr_dp.fithist['val_loss'],
                               tr_sp.fithist['val_loss'], rtol=2e-4)
    np.testing.assert_allclose(float(tr_dp.test_loss),
                               float(tr_sp.test_loss), rtol=2e-4)


@pytest.mark.core
def test_tp_mesh_streaming_tier():
    """TP composes with the host-streaming tier (data_in_hbm=False): the
    per-batch jitted step carries the same channel shardings."""
    data = _data()
    kw = _kw(data, data_in_hbm=False, epochs=1)
    tr_dp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 2)), **kw)
    tr_dp.run()
    tr_tp = dds.SupervisedTrainer('resnet', 'spc',
                                  mesh=_mesh(('data', 2), ('model', 2)),
                                  **kw)
    tr_tp.run()
    np.testing.assert_allclose(tr_dp.fithist['loss'],
                               tr_tp.fithist['loss'], rtol=2e-4)
    specs = {str(l.sharding.spec)
             for l in jax.tree.leaves(tr_tp.state.params)}
    assert any('model' in s for s in specs), specs


@pytest.mark.smoke
def test_mesh_validation_errors():
    data = _data()
    with pytest.raises(ValueError, match='ensemble'):
        dds.SupervisedTrainer('resnet', 'spc',
                              mesh=_mesh(('data', 4), ('ensemble', 2)),
                              **_kw(data))
    with pytest.raises(ValueError, match='ONE of'):
        dds.SupervisedTrainer(
            'resnet', 'spc',
            mesh=_mesh(('data', 2), ('model', 2), ('space', 2)),
            **_kw(data))
    with pytest.raises(NotImplementedError, match='SupervisedTrainer'):
        dds.CGANTrainer('resnet', 'spc', data_train=data[:32],
                        data_test=data[40:], scale=2, batch_size=2,
                        epochs=1, mesh=_mesh(('data', 4), ('model', 2)),
                        save=False, verbose=False)
    # bn models cannot tensor-shard (mutable per-shard statistics)
    tr = dds.SupervisedTrainer('resnet', 'spc',
                               mesh=_mesh(('data', 4), ('model', 2)),
                               normalization='bn', **_kw(data))
    with pytest.raises(ValueError, match='batch-norm'):
        tr.run()


@pytest.mark.smoke
def test_cli_mesh_shape_parsing():
    from dl4ds_tpu.app import _parse_mesh_shape
    assert _parse_mesh_shape(None) is None
    assert _parse_mesh_shape('') is None
    m = _parse_mesh_shape('data=4,model=2')
    assert m.axis_names == ('data', 'model')
    assert dict(m.shape) == {'data': 4, 'model': 2}
    with pytest.raises(ValueError, match='mesh_shape'):
        _parse_mesh_shape('nonsense')
    with pytest.raises(ValueError, match='devices'):
        _parse_mesh_shape('data=64')
