#!/usr/bin/env python
"""Runnable example: pipeline-parallel training of a deep ConvLSTM model
on a 2-D pipe x data device mesh.

Use case: DEEP spatio-temporal models — the recurrent nets' trunk
(blocks 2..n_blocks+1, reference dl4ds/models/spt_postups.py:105-123)
is a stack of identical-width RecurrentConvBlocks, so its weights and
Adam moments grow linearly with depth while staying shape-uniform.
`parallel.make_pipeline_step` stacks the per-block param trees on a
leading [n_blocks, ...] axis sharded over a 'pipe' mesh axis and
rotates microbatch activations stage-to-stage with `lax.ppermute`
inside a `lax.scan` (GPipe schedule; the backward pipeline falls out of
AD — the transpose of a ppermute is the reverse ppermute). Stem and the
per-timestep head stay replicated, so the math is EXACT: loss, grads
and Adam trajectories match the unsharded program to float tolerance
(tests/test_parallel.py::test_pipeline_step_matches_unsharded).

    python examples/pipeline_parallel_training.py --cpu  # 8 virtual devices
    python examples/pipeline_parallel_training.py        # TPU mesh
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
import optax
from jax.sharding import Mesh

from dl4ds_tpu.models import recnet_postupsampling
from dl4ds_tpu.parallel import make_pipeline_step


def main():
    devs = jax.devices()
    n_pp = 4 if len(devs) >= 4 else max(1, len(devs))  # pipeline stages
    n_dt = max(1, len(devs) // n_pp)                   # batch shards
    mesh = Mesh(np.array(devs[:n_pp * n_dt]).reshape(n_pp, n_dt),
                ('pipe', 'data'))
    print(f'mesh: {n_pp} pipe x {n_dt} data on {devs[0].platform}')

    # a DEEP trunk is what the pipeline distributes: n_blocks=8 means
    # each of 4 stages holds 2 RecurrentConvBlocks (+ their Adam moments)
    model = recnet_postupsampling(
        'resnet', 'spc', scale=2, n_channels=1, n_aux_channels=0,
        lr_size=(16, 16), time_window=4, n_filters=16, n_blocks=8)
    full = model.init(jax.random.PRNGKey(0), batch_size=1)['params']

    pp = make_pipeline_step(model, mesh, tx=optax.adam(1e-3), loss='mae',
                            n_micro=4)
    # split the trunk out of the tree and place it sharded over 'pipe'
    parts = jax.device_put(pp.split_params(full), pp.param_shardings)
    opt_state = pp.init_opt(parts)

    rng = np.random.default_rng(0)
    batch = 4 * n_dt * pp.n_micro
    x = rng.standard_normal((batch, 4, 16, 16, 1)).astype('float32')
    y = rng.standard_normal((batch, 4, 32, 32, 1)).astype('float32')

    for step in range(5):
        parts, opt_state, loss = pp.step(parts, opt_state, x, y,
                                         jax.random.PRNGKey(step))
        print(f'step {step}: loss={float(loss):.5f}')

    rest, stacked = parts
    trunk_bytes = sum(a.size * a.dtype.itemsize
                      for a in jax.tree.leaves(stacked))
    print(f'trunk: {trunk_bytes / 1e6:.2f} MB stacked params, sharded '
          f"{next(iter({str(s.spec) for s in jax.tree.leaves(pp.param_shardings[1], is_leaf=lambda s: hasattr(s, 'spec'))}))} "
          f'-> {trunk_bytes / n_pp / 1e6:.2f} MB per stage')
    # merge back to a plain full tree for checkpointing / predict
    merged = pp.merge_params(rest, stacked)
    print('merged tree leaves:', len(jax.tree.leaves(merged)))


if __name__ == '__main__':
    main()
