#!/usr/bin/env python
"""Decompose the recresnet_spc (time_window=4) train step on the chip.

Slope-times, as separate chained fori-loop programs: batch synthesis
alone, forward alone, forward+backward, and the full fused step — to
locate where the 4 ms/step goes after round 2's [B*T] flattening + fused
Pallas ConvLSTM work (docs/ROOFLINE.md). Run ON THE TPU.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from bench import force, slope_time, _enable_compile_cache

_enable_compile_cache()

STEPS = 50


def build():
    from dl4ds_tpu.training import supervised
    rng = np.random.default_rng(0)
    data = rng.standard_normal((256, 128, 128, 1)).astype('float32')
    tr = supervised.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:64], data_test=data[:64], scale=4, patch_size=64,
        batch_size=128, loss='mae', epochs=1, n_filters=8, n_blocks=2,
        time_window=4, save=False, verbose=False, dtype=jnp.bfloat16)
    tr.setup_datagen()
    tr.setup_model()
    tx = tr._build_optimizer()
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=tx, batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    return tr, state


def timeit(name, chunk_fn, carry):
    carry, out = chunk_fn(carry)
    force(out)
    dts = []
    for _ in range(3):
        dt, carry = slope_time(chunk_fn, carry, repeats=1)
        dts.append(dt / STEPS)
    ms = float(np.median(dts)) * 1e3
    print(json.dumps({name: round(ms, 3)}), flush=True)
    return ms


def main():
    tr, state = build()
    synth = tr.ds_train
    key = jax.random.PRNGKey(0)
    idx = jnp.asarray(np.asarray(
        synth.epoch_indices(key, steps=STEPS)), jnp.int32)
    params = state.params

    # 1) synthesis only (chained via sum of batch -> index perturbation)
    @jax.jit
    def synth_chunk(carry):
        def body(i, acc):
            b = synth._make_batch(idx[i % STEPS], jax.random.fold_in(key, i))
            return acc + jnp.mean(b['lr']).astype(jnp.float32)
        acc = jax.lax.fori_loop(0, STEPS, body, carry)
        return acc, acc

    # 2) forward only
    @jax.jit
    def fwd_chunk(carry):
        def body(i, acc):
            b = synth._make_batch(idx[i % STEPS], jax.random.fold_in(key, i))
            out = tr.model.module.apply({'params': params}, b['lr'],
                                        b['aux'], training=False)
            return acc + jnp.mean(out).astype(jnp.float32)
        acc = jax.lax.fori_loop(0, STEPS, body, carry)
        return acc, acc

    # 3) forward + backward (no optimizer)
    @jax.jit
    def fwdbwd_chunk(carry):
        def body(i, acc):
            b = synth._make_batch(idx[i % STEPS], jax.random.fold_in(key, i))

            def loss_fn(p):
                out = tr.model.module.apply({'params': p}, b['lr'], b['aux'],
                                            training=True,
                                            rngs={'dropout': key})
                return jnp.mean(jnp.abs(b['hr'] - out.astype(jnp.float32)))
            l, g = jax.value_and_grad(loss_fn)(params)
            leaves = jax.tree_util.tree_leaves(g)
            return acc + l + sum(jnp.sum(x).astype(jnp.float32) * 0.0
                                 for x in leaves)
        acc = jax.lax.fori_loop(0, STEPS, body, carry)
        return acc, acc

    # 4) full fused step (scan program, the production path)
    def full_chunk(st):
        st, losses = tr._train_many(st, idx, key)
        return st, losses

    timeit('synthesis_ms', synth_chunk, jnp.float32(0))
    timeit('forward_ms', fwd_chunk, jnp.float32(0))
    timeit('fwd_bwd_ms', fwdbwd_chunk, jnp.float32(0))
    carry, out = full_chunk(state)
    force(out)
    dts = []
    for _ in range(3):
        dt, carry = slope_time(full_chunk, carry, repeats=1)
        dts.append(dt / STEPS)
    print(json.dumps({'full_step_ms': round(float(np.median(dts)) * 1e3, 3)}),
          flush=True)


if __name__ == '__main__':
    main()
