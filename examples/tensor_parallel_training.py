#!/usr/bin/env python
"""Runnable example: tensor-parallel training on a 2-D data x model
device mesh — THROUGH the trainer.

Use case: production-width models (n_filters=64+) whose parameters +
Adam moments + activation working set exceed one chip's HBM. Pass a
mesh with a 'model' axis to `SupervisedTrainer` (or
`--mesh_shape data=4,model=2` on the CLI) and the trainer's own fused
train step runs tensor-parallel: every wide conv kernel, its Adam
moments and the EMA copy are sharded channel-wise over the 'model'
axis, the batch over 'data', and XLA's SPMD partitioner places the
all-gathers/reduce-scatters on ICI. Schedules, EMA, early stopping and
checkpointing all compose — it is the SAME program the 1-D mesh runs,
just partitioned differently (trajectory equality is pinned by
tests/test_trainer_mesh.py).

For a standalone step without the trainer scaffolding, see
`parallel.make_tensor_sharded_step`.

    python examples/tensor_parallel_training.py --cpu   # 8 virtual CPU devices
    python examples/tensor_parallel_training.py                     # TPU mesh
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if '--cpu' in sys.argv or os.environ.get('JAX_PLATFORMS') == 'cpu':
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8')
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
else:
    import jax

import numpy as np
from jax.sharding import Mesh

from dl4ds_tpu import SupervisedTrainer


def main():
    devs = jax.devices()
    n_tp = 2 if len(devs) >= 2 else 1         # weight shards
    n_dt = max(1, len(devs) // n_tp)          # batch shards
    mesh = Mesh(np.array(devs[:n_tp * n_dt]).reshape(n_dt, n_tp),
                ('data', 'model'))
    print(f'mesh: {n_dt} data x {n_tp} model on {devs[0].platform}')

    # synthetic HR field; the trainer synthesizes LR pairs on device
    rng = np.random.default_rng(0)
    data = rng.standard_normal((64, 64, 64, 1)).astype('float32')

    trainer = SupervisedTrainer(
        backbone='resnet', upsampling='spc',
        data_train=data[:48], data_val=data[48:56], data_test=data[56:],
        scale=2, batch_size=2, epochs=2, loss='mae',
        # production width: the weights are what TP distributes
        n_filters=64, n_blocks=4, attention=True,
        lr_schedule='warmup_cosine', ema_decay=0.99,
        mesh=mesh, save=False, verbose=True)
    trainer.run()

    params = trainer.state.params
    n_leaves = len(jax.tree.leaves(params))
    n_sharded = sum(1 for p in jax.tree.leaves(params)
                    if 'model' in str(p.sharding.spec))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f'{n_params:,} params; {n_sharded}/{n_leaves} leaves '
          f'channel-sharded over {n_tp} devices')
    print('example leaf sharding:',
          jax.tree.leaves(params)[0].sharding)


if __name__ == '__main__':
    main()
