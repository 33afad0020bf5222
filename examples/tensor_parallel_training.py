#!/usr/bin/env python
"""Runnable example: tensor-parallel training on a 2-D model x data
device mesh (`parallel.make_tensor_sharded_step`).

Use case: production-width models (n_filters=64+) whose parameters +
Adam moments + activation working set exceed one chip's HBM — every
wide conv kernel is sharded channel-wise over the mesh's 'model' axis,
the batch over 'data'. No hand-written collectives: the step is jitted
with sharding annotations and XLA's SPMD partitioner places the
all-gathers/reduce-scatters on ICI. The sharded program computes the
SAME numbers as the unsharded one (verified in tests/test_parallel.py).

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
import jax.numpy as jnp
import optax

from dl4ds_tpu.models import net_postupsampling
from dl4ds_tpu.parallel import make_tensor_sharded_step
from dl4ds_tpu.interpolation import resize2d
from jax.sharding import Mesh


def main():
    devs = jax.devices()
    n_tp = 2 if len(devs) >= 2 else 1         # weight shards
    n_dt = max(1, len(devs) // n_tp)          # batch shards
    mesh = Mesh(np.array(devs[:n_tp * n_dt]).reshape(n_tp, n_dt),
                ('model', 'data'))
    print(f'mesh: {n_tp} model x {n_dt} data on {devs[0].platform}')

    # production-width model: the weights are what TP distributes
    scale, size, batch = 2, 32, 2 * n_dt
    model = net_postupsampling('resnet', 'spc', scale=scale, n_channels=1,
                               n_aux_channels=0, lr_size=(size, size),
                               n_filters=64, n_blocks=6, attention=True)
    ts = make_tensor_sharded_step(model, mesh, tx=optax.adam(1e-3),
                                  loss='mae')
    params = jax.device_put(model.init(jax.random.PRNGKey(0))['params'],
                            ts.param_shardings)
    opt_state = ts.init_opt(params)

    n_leaves = len(jax.tree.leaves(params))
    n_sharded = sum(
        1 for s in jax.tree.leaves(ts.param_shardings,
                                   is_leaf=lambda s: hasattr(s, 'spec'))
        if 'model' in jax.tree_util.tree_leaves(tuple(s.spec)))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f'{n_params:,} params; {n_sharded}/{n_leaves} leaves '
          f'channel-sharded over {n_tp} devices')

    # synthetic field; LR inputs by inter_area coarsening (the dl4ds way)
    rng = np.random.default_rng(0)
    hr = rng.standard_normal(
        (8 * batch, size * scale, size * scale, 1)).astype('float32')
    lr = np.asarray(resize2d(hr, (size, size), 'inter_area'))

    key = jax.random.PRNGKey(1)
    for step_i in range(5):
        i = (step_i * batch) % (7 * batch)
        x = jnp.asarray(lr[i:i + batch])
        y = jnp.asarray(hr[i:i + batch])
        key, k = jax.random.split(key)
        params, opt_state, loss = ts.step(params, opt_state, x, y, k)
        print(f'step {step_i}: loss={float(loss):.5f}')

    # any leaf's device view confirms the placement
    kern = params['_Backbone_0']['stem']['kernel'] if '_Backbone_0' in \
        params else jax.tree.leaves(params)[0]
    print('example leaf sharding:', kern.sharding)


if __name__ == '__main__':
    main()
