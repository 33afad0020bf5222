"""Per-layer timing of the fused ConvLSTM Pallas kernel on the real chip.

Measures forward-only, forward+backward (value_and_grad), for the fused
Pallas path vs the XLA recurrence, at the BENCH_SUITE recresnet shape
([128, 4, 16, 16, 8] -> F=8, 3x3). Uses bench.slope_time (two-region slope
with forced scalar readback) because block_until_ready does not wait on the
tunneled chip (CLAUDE.md).

Usage:  python tools/convlstm_kernel_bench.py [--b 128] [--t 4] [--hw 16]
        [--cin 8] [--f 8] [--steps-per-chunk 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from bench import slope_time
from dl4ds_tpu.ops.pallas_convlstm import fused_convlstm, convlstm_reference


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=128)
    ap.add_argument('--t', type=int, default=4)
    ap.add_argument('--hw', type=int, default=16)
    ap.add_argument('--cin', type=int, default=8)
    ap.add_argument('--f', type=int, default=8)
    ap.add_argument('--steps-per-chunk', type=int, default=20)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    b, t, h, w, cin, f = args.b, args.t, args.hw, args.hw, args.cin, args.f
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, h, w, cin)), dt)
    wx = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, 4 * f)),
                     jnp.float32)
    bx = jnp.asarray(0.1 * rng.standard_normal((4 * f,)), jnp.float32)
    wh = jnp.asarray(0.1 * rng.standard_normal((3, 3, f, 4 * f)),
                     jnp.float32)

    n = args.steps_per_chunk

    def fused_fwd(xc):
        return fused_convlstm(xc, wx, bx, wh)

    def xla_fwd(xc):
        return convlstm_reference(xc, wx, bx, wh)[0]

    def make_chunk(fn, grad):
        if grad:
            def lossfn(xc, wxc, bxc, whc):
                if fn is fused_fwd:
                    y = fused_convlstm(xc, wxc, bxc, whc)
                else:
                    y = convlstm_reference(xc, wxc, bxc, whc)[0]
                return jnp.sum(y.astype(jnp.float32) ** 2)
            g = jax.grad(lossfn, argnums=(0, 1, 2, 3))

            # chain with a TINY NON-ZERO scale: `* 0` lets XLA fold the
            # product to zero and dead-code-eliminate the entire chunk
            # (measured: "xla_fwd 7.2 us/layer" — i.e. nothing ran)
            eps = jnp.asarray(1e-20, jnp.float32)

            @jax.jit
            def chunk(carry):
                xc = carry
                for _ in range(n):
                    dx, dwx, dbx, dwh = g(xc, wx, bx, wh)
                    s = (jnp.sum(dwx) + jnp.sum(dbx) + jnp.sum(dwh)) * eps
                    xc = (xc + dx.astype(jnp.float32) * eps + s).astype(dt)
                return xc, jnp.sum(xc.astype(jnp.float32))
        else:
            eps = jnp.asarray(1e-20, jnp.float32)

            @jax.jit
            def chunk(carry):
                xc = carry
                for _ in range(n):
                    y = fn(xc)
                    xc = xc + (jnp.sum(y.astype(jnp.float32)) * eps).astype(dt)
                return xc, jnp.sum(xc.astype(jnp.float32))
        return chunk

    results = {}
    for name, fn in (('fused', fused_fwd), ('xla', xla_fwd)):
        for grad in (False, True):
            chunk = make_chunk(fn, grad)
            t0 = time.perf_counter()
            carry, out = chunk(x)   # compile
            float(jnp.sum(carry.astype(jnp.float32)))
            compile_s = time.perf_counter() - t0
            sec, _ = slope_time(chunk, x, repeats=3)
            per_layer_us = sec / n * 1e6
            key = f'{name}_{"fwdbwd" if grad else "fwd"}'
            results[key] = {'us_per_layer': round(per_layer_us, 1),
                            'compile_s': round(compile_s, 1)}
            print(key, results[key], flush=True)

    results['shape'] = dict(b=b, t=t, h=h, w=w, cin=cin, f=f,
                            dtype=str(dt), steps_per_chunk=n)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
