#!/usr/bin/env python
"""Runnable example: spatially-sharded FULL-GRID training on a 2-D
data x space device mesh (`parallel.make_spatial_sharded_step`).

Use case: training on grids whose activations exceed one chip's HBM —
the grid HEIGHT is sharded across the mesh's 'space' axis (halo rows
exchanged over ICI with `lax.ppermute`), the batch across 'data'.
Gradients are exactly those of the unsharded global mean pixel loss
(see the builder's docstring; verified in tests/test_parallel.py).

For the trainer-integrated route (schedules/EMA/checkpointing composed),
pass a ('data', 'space') mesh straight to `SupervisedTrainer(mesh=)` —
GSPMD then spatially partitions the same fused train step (see
examples/tensor_parallel_training.py and docs/MULTICHIP.md); this
example shows the standalone explicit-halo step.

    python examples/spatial_sharded_training.py --cpu   # 8 virtual CPU devices
    python examples/spatial_sharded_training.py                      # TPU mesh
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
from dl4ds_tpu.parallel import (make_spatial_sharded_step,
                                receptive_field_radius)
from dl4ds_tpu.interpolation import resize2d
from jax.sharding import Mesh


def main():
    devs = jax.devices()
    n_sp = 2                                  # height shards
    n_dt = max(1, len(devs) // n_sp)          # batch shards
    mesh = Mesh(np.array(devs[:n_dt * n_sp]).reshape(n_dt, n_sp),
                ('data', 'space'))
    print(f'mesh: {n_dt} data x {n_sp} space on {devs[0].platform}')

    # synthetic HR field with structure above the LR Nyquist
    rng = np.random.default_rng(0)
    h_lr, w_lr, scale, batch = 128, 64, 2, 2 * n_dt
    yy, xx = np.meshgrid(np.linspace(0, 12, h_lr * scale),
                         np.linspace(0, 8, w_lr * scale), indexing='ij')
    base = np.sin(2 * yy) * np.cos(3 * xx)
    y = np.stack([base + 0.05 * rng.standard_normal(base.shape)
                  for _ in range(batch)])[..., None].astype('float32')
    x = np.asarray(resize2d(jnp.asarray(y), (h_lr, w_lr), 'inter_area'))

    n_blocks = 2
    model = net_postupsampling(
        'resnet', 'spc', scale=scale, n_channels=1, n_aux_channels=0,
        lr_size=(h_lr, w_lr), n_filters=8, n_blocks=n_blocks,
        attention=False, output_attention=False)  # attention-free => exact
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)

    halo = receptive_field_radius(n_blocks)
    tx = optax.adam(2e-3)
    sss = make_spatial_sharded_step(model, mesh, tx=tx, halo=halo,
                                    loss='mae')
    params, opt_state = variables['params'], tx.init(variables['params'])
    key = jax.random.PRNGKey(0)
    for step in range(30):
        key, k = jax.random.split(key)
        params, opt_state, loss = sss.step(params, opt_state, x, y, k)
        if step % 5 == 0:
            print(f'step {step:3d}  loss {float(loss):.4f}')
    print(f'final loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
