#!/usr/bin/env python
"""Measure deep-ensemble training efficiency on one chip.

Question: what does training M ensemble members cost relative to M solo
runs? `parallel.make_ensemble_step` advances all members in ONE program
(vmap over members), so XLA batches the members' narrow-channel GEMMs
into wider contractions — exactly the dimension the zoo's width-8 convs
starve on (docs/ROOFLINE.md: the 8-channel conv ceiling). Expectation:
M members cost significantly less than M x solo; this tool measures it.

Writes tools' stdout only; run on the real TPU (no env overrides):

    python tools/ensemble_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import optax

from bench import slope_time, _maybe_force_cpu
from dl4ds_tpu.models import net_postupsampling
from dl4ds_tpu.parallel import init_ensemble, make_ensemble_step

BATCH = 128
LR, SCALE = 16, 4


def measure(n_members, steps_per_chunk=10):
    from jax.sharding import Mesh

    model = net_postupsampling(
        'resnet', 'spc', scale=SCALE, n_channels=1, n_aux_channels=0,
        lr_size=(LR, LR), n_filters=8, n_blocks=6, attention=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ('ensemble',))
    stacked = init_ensemble(model, n_members, seed=0, mesh=mesh)
    es = make_ensemble_step(model, mesh, tx=optax.adam(1e-4), loss='mae',
                            bootstrap=True)
    opt = es.init_opt(stacked)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    # device-resident operands + pre-split keys: host numpy args would
    # re-transfer ~2 MB per step INSIDE the timed region (scales with the
    # region size, so slope_time cannot cancel it — it would bias the
    # cost_vs_solo ratio toward fake savings)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, LR, LR, 1)).astype('float32'))
    y = jnp.asarray(rng.standard_normal(
        (BATCH, LR * SCALE, LR * SCALE, 1)).astype('float32'))
    keys = list(jax.random.split(jax.random.PRNGKey(0), steps_per_chunk))

    def chunk(carry):
        v, o = carry
        for k in keys:
            v, o, losses = es.step(v, o, x, y, k)
        return (v, o), losses

    carry = (stacked, opt)
    carry, _ = chunk(carry)  # compile
    sec_per_chunk, _ = slope_time(chunk, carry)
    ms = 1e3 * sec_per_chunk / steps_per_chunk
    return ms


def main():
    _maybe_force_cpu()
    print(f'platform: {jax.devices()[0].device_kind}', flush=True)
    results = {}
    t1 = measure(1)
    results['m1_ms_per_step'] = round(t1, 3)
    print(f'M=1: {t1:.3f} ms/step', flush=True)
    for m in (2, 4, 8):
        t = measure(m)
        results[f'm{m}_ms_per_step'] = round(t, 3)
        results[f'm{m}_cost_vs_solo'] = round(t / (m * t1), 3)
        print(f'M={m}: {t:.3f} ms/step  '
              f'({t / t1:.2f}x the M=1 step = {t / (m * t1):.2f}x the cost '
              f'of {m} solo steps)', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
