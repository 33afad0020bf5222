#!/usr/bin/env python
"""Runnable example: deep-ensemble downscaling on an ensemble (x data)
device mesh (`parallel.make_ensemble_step` / `predict_ensemble`).

Use case: epistemic uncertainty for the downscaled field. N members with
independent inits (+ bagging) train SIMULTANEOUSLY — one shard_map'd
program, members sharded over the mesh's 'ensemble' axis, no collectives
between members — then `predict_ensemble` returns the ensemble mean and
the per-pixel spread (uncertainty map). The stronger counterpart of the
reference's MC-dropout loop (dl4ds/inference.py:63-71).

    python examples/ensemble_training.py --cpu    # 8 virtual CPU devices
    python examples/ensemble_training.py                      # TPU mesh
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
from dl4ds_tpu.parallel import (init_ensemble, make_ensemble_step,
                                predict_ensemble)
from dl4ds_tpu.interpolation import resize2d
from jax.sharding import Mesh


def main():
    devs = jax.devices()
    n_ep = min(4, len(devs))                  # member shards
    n_dt = max(1, len(devs) // n_ep)          # batch shards
    mesh = Mesh(np.array(devs[:n_ep * n_dt]).reshape(n_ep, n_dt),
                ('ensemble', 'data'))
    print(f'mesh: {n_ep} ensemble x {n_dt} data on {devs[0].platform}')

    # synthetic HR field with structure above the LR Nyquist
    rng = np.random.default_rng(0)
    h_lr, w_lr, scale, batch = 32, 32, 2, 8 * n_dt
    yy, xx = np.meshgrid(np.linspace(0, 12, h_lr * scale),
                         np.linspace(0, 8, w_lr * scale), indexing='ij')
    base = np.sin(2 * yy) * np.cos(3 * xx)
    y = np.stack([base + 0.05 * rng.standard_normal(base.shape)
                  for _ in range(batch)])[..., None].astype('float32')
    x = np.asarray(resize2d(jnp.asarray(y), (h_lr, w_lr), 'inter_area'))

    model = net_postupsampling(
        'resnet', 'spc', scale=scale, n_channels=1, n_aux_channels=0,
        lr_size=(h_lr, w_lr), n_filters=8, n_blocks=2, attention=False)

    n_members = n_ep
    stacked = init_ensemble(model, n_members, seed=0, mesh=mesh)
    es = make_ensemble_step(model, mesh, tx=optax.adam(2e-3), loss='mae',
                            bootstrap=True)
    opt = es.init_opt(stacked)

    key = jax.random.PRNGKey(0)
    for step_i in range(200):
        key, k = jax.random.split(key)
        stacked, opt, losses = es.step(stacked, opt, x, y, k)
        if step_i % 50 == 0 or step_i == 199:
            arr = np.asarray(losses)
            print(f'step {step_i:4d}  member losses '
                  f'{np.round(arr, 4)}  (mean {arr.mean():.4f})')

    mean, std, members = predict_ensemble(model, stacked, x, mesh=mesh,
                                          return_members=True)
    rmse = float(np.sqrt(np.mean((mean - y) ** 2)))
    print(f'ensemble-mean RMSE vs truth: {rmse:.4f}')
    print(f'uncertainty map: mean sigma {std.mean():.4f}, '
          f'max sigma {std.max():.4f}')

    # probabilistic verification: fair CRPS, spread-skill calibration,
    # rank histogram (metrics.compute_prob_metrics writes the full
    # plot/npy/txt artifact set when given save_path=...)
    from dl4ds_tpu.metrics import crps_ensemble, spread_skill
    crps = float(crps_ensemble(y, members).mean())
    spread, skill, ratio = spread_skill(y, members)
    print(f'fair CRPS {crps:.4f}; spread-skill ratio {ratio:.3f} '
          f'(1 = calibrated, <1 under-dispersive)')


if __name__ == '__main__':
    main()
