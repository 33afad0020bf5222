#!/usr/bin/env python
"""Decompose the headline resnet_spc 4x train step BY NETWORK SEGMENT.

The step-level decomposition (docs/ROOFLINE.md) showed fwd 0.36 ms /
fwd+bwd 1.43 ms at batch 128 — but not WHERE inside the model. This
probe slope-times cumulative model prefixes as separate chained
programs on the chip:

    backbone            (12 convs + stem at LR 16x16, 8 ch)
    backbone+spc        (+ subpixel head -> HR 64x64)
    full model          (+ output module: 5 convs + attention at HR)

each forward-only and forward+backward, so differences localize the
cost between the LR backbone, the upsampling head, and the
HR-resolution output module. Run ON THE TPU.
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
import flax.linen as nn

from bench import force, slope_time, _enable_compile_cache
from dl4ds_tpu.models.nets import _Backbone, _OutputModule
from dl4ds_tpu.models.blocks import SubpixelConvolutionBlock

_enable_compile_cache()

STEPS = 50
B, HW, SCALE, F, NB = 128, 16, 4, 8, 6
DTYPE = jnp.bfloat16


class Prefix(nn.Module):
    """Cumulative prefix of NetPostupsampling (resnet_spc, no aux/LCB).

    upto: backbone | spc1_conv (stage-1 conv, no shuffle) | spc1 (one
    conv+shuffle stage) | spc_untied (both stages, independent weights) |
    spc (tied, the production block) | full (+ output module)."""
    upto: str

    @nn.compact
    def __call__(self, x, training=False):
        from dl4ds_tpu.ops.array import depth_to_space
        x, nf = _Backbone('resnet', F, NB, 'relu', None, False, 0.0, None,
                          dtype=DTYPE)(x, training)
        if self.upto == 'backbone':
            return x
        if self.upto == 'spc1_conv':
            return nn.Conv(nf * 4, (3, 3), padding='SAME', dtype=DTYPE)(x)
        if self.upto == 'spc1':
            return depth_to_space(
                nn.Conv(nf * 4, (3, 3), padding='SAME', dtype=DTYPE)(x), 2)
        if self.upto == 'spc_untied':
            for _ in range(2):
                x = depth_to_space(
                    nn.Conv(nf * 4, (3, 3), padding='SAME',
                            dtype=DTYPE)(x), 2)
            return x
        x = SubpixelConvolutionBlock(SCALE, nf, dtype=DTYPE)(x)
        if self.upto == 'spc':
            return x
        return _OutputModule(F, 1, (3, 3), 'relu', None, None, 0.0,
                             attention=True, dtype=DTYPE)(x, training)


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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 1)), DTYPE)
    key = jax.random.PRNGKey(0)
    out = {}
    for upto in ('backbone', 'spc1_conv', 'spc1', 'spc_untied', 'spc', 'full'):
        model = Prefix(upto)
        params = model.init(key, x)['params']

        @jax.jit
        def fwd_chunk(carry, model=model, params=params):
            def body(i, acc):
                xi = x + i.astype(DTYPE) * DTYPE(1e-6)
                y = model.apply({'params': params}, xi)
                return acc + jnp.mean(y).astype(jnp.float32)
            acc = jax.lax.fori_loop(0, STEPS, body, carry)
            return acc, acc

        @jax.jit
        def fb_chunk(carry, model=model, params=params):
            def body(i, acc):
                xi = x + i.astype(DTYPE) * DTYPE(1e-6)

                def loss_fn(p):
                    y = model.apply({'params': p}, xi, training=True)
                    return jnp.mean(jnp.abs(y.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss_fn)(params)
                gs = sum(jnp.sum(v).astype(jnp.float32)
                         for v in jax.tree_util.tree_leaves(g))
                return acc + l + gs * 1e-12
            acc = jax.lax.fori_loop(0, STEPS, body, carry)
            return acc, acc

        out[f'{upto}_fwd_ms'] = timeit(f'{upto}_fwd_ms', fwd_chunk,
                                       jnp.float32(0))
        out[f'{upto}_fwdbwd_ms'] = timeit(f'{upto}_fwdbwd_ms', fb_chunk,
                                          jnp.float32(0))
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
