#!/usr/bin/env python
"""Weak-scaling shape check on the virtual CPU mesh -> SCALING.json.

Runs the full fused supervised train step (on-device batch synthesis +
forward + backward + update) over 1/2/4/8-device meshes with a FIXED
per-device batch (weak scaling: global batch grows with the mesh) and
records per-step wall time. On virtual CPU devices the absolute numbers
only show that the sharded program compiles, executes, and keeps per-step
time roughly flat as devices are added (all "devices" share the host's
cores, so per-step time grows with total work where a real ICI-connected
TPU slice would stay flat); real ICI scaling cannot be measured in this
environment (single physical chip — see MULTICHIP artifacts for the
8-device dryrun). Usage: python tools/scaling.py
"""

import json
import os
import sys
import time

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402


def measure(n_devices, per_device_batch=8, steps=8):
    import dl4ds_tpu as dds
    from dl4ds_tpu.training import supervised
    from dl4ds_tpu.training.base import make_mesh

    mesh = make_mesh(jax.devices()[:n_devices])
    rng = np.random.default_rng(0)
    data = rng.standard_normal((128, 64, 64, 1)).astype('float32')
    tr = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:32], data_test=data[:32], scale=4, patch_size=32,
        batch_size=per_device_batch, loss='mae', epochs=1, n_filters=8,
        n_blocks=2, attention=True, save=False, verbose=False, mesh=mesh)
    tr.setup_datagen()
    tr.setup_model()
    tx = tr._build_optimizer()
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=tx, batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    key = jax.random.PRNGKey(0)
    idx = np.asarray(tr.ds_train.epoch_indices(key, steps=steps + 2))
    # warm/compile
    for i in range(2):
        key, k = jax.random.split(key)
        state, loss = tr._train_step(state, jnp.asarray(idx[i], jnp.int32), k)
    float(jnp.sum(loss))
    t0 = time.perf_counter()
    for i in range(2, 2 + steps):
        key, k = jax.random.split(key)
        state, loss = tr._train_step(state, jnp.asarray(idx[i], jnp.int32), k)
    float(jnp.sum(loss))
    dt = (time.perf_counter() - t0) / steps
    return {'n_devices': n_devices,
            'global_batch': tr.global_batch_size,
            'step_ms': round(dt * 1000, 2),
            'patches_per_sec': round(tr.global_batch_size / dt, 1),
            'loss_finite': bool(np.isfinite(float(loss)))}


def measure_pipeline(n_stages, steps=4):
    """Same check for the pipeline-parallel step: n_stages 'pipe' devices,
    trunk blocks rotated via ppermute, finite loss at every size."""
    import optax
    from jax.sharding import Mesh
    from dl4ds_tpu.models import recnet_postupsampling
    from dl4ds_tpu.parallel import make_pipeline_step

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ('pipe',))
    model = recnet_postupsampling(
        'resnet', 'spc', scale=2, n_channels=1, n_aux_channels=0,
        lr_size=(8, 8), time_window=2, n_filters=8, n_blocks=8)
    pp = make_pipeline_step(model, mesh, tx=optax.adam(1e-3),
                            n_micro=n_stages)
    parts = jax.device_put(
        pp.split_params(model.init(jax.random.PRNGKey(0))['params']),
        pp.param_shardings)
    opt = pp.init_opt(parts)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2 * n_stages, 2, 8, 8, 1)).astype('float32')
    y = rng.standard_normal((2 * n_stages, 2, 16, 16, 1)).astype('float32')
    key = jax.random.PRNGKey(0)
    parts, opt, loss = pp.step(parts, opt, x, y, key)   # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        parts, opt, loss = pp.step(parts, opt, x, y, key)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return {'n_stages': n_stages, 'n_micro': n_stages,
            'global_batch': 2 * n_stages,
            'step_ms': round(dt * 1000, 2),
            'loss_finite': bool(np.isfinite(float(loss)))}


def main():
    rows = [measure(n) for n in (1, 2, 4, 8)]
    pp_rows = [measure_pipeline(n) for n in (2, 4, 8)]
    out = {
        'note': 'sharded-train-step check over VIRTUAL CPU devices (fixed '
                'per-device batch 8, resnet_spc 4x patch32): the ONLY claim '
                'is that the SPMD step compiles and executes with a finite '
                'loss at every mesh size 1/2/4/8. step_ms / patches_per_sec '
                'are informational and say nothing about scaling: all '
                '"devices" share one host\'s cores, so the rows are '
                'non-monotonic by construction; real ICI scaling needs a '
                'multi-chip slice (see MULTICHIP artifacts for the 8-device '
                'sharding dryrun).',
        'rows': rows,
        'pipeline_note': 'pipeline-parallel step (recnet 8-block ConvLSTM '
                         'trunk over a pipe axis, n_micro = n_stages): '
                         'compiles and executes with a finite loss at '
                         'stage counts 2/4/8; same virtual-device caveat.',
        'pipeline_rows': pp_rows,
    }
    path = os.path.join(REPO, 'SCALING.json')
    with open(path, 'w') as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
