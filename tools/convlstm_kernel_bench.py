"""Per-layer timing of the ConvLSTM paths on the real chip.

Measures forward-only and forward+backward (value_and_grad) for the
DISPATCHED path (`fused_convlstm` — the fused Pallas kernel where it fits,
the XLA recurrence where it doesn't; see `dispatch_info`) and for the raw
XLA recurrence, plus MFU against the layer's logical conv FLOPs.

Timing is PROFILER device time (tools/trace_ops.trace_op_times over an
n-layer chained chunk, total device us / n): per-HLO-op ground truth.
Wall-clock slope timing (bench.slope_time) was measured to under-report
by up to 7x here — a 20-layer F=8 chunk is ~1.5 ms, far below the
tunneled chip's RPC noise floor, and the min-over-repeats then collects
noise minima (fused fwd "10.0 us/layer" vs 73.8 us of actual device
time). slope_time remains valid for second-plus regions (the bench.py
epoch chains; its 4096^3 matmul anchor).

Usage:
  python tools/convlstm_kernel_bench.py                # one shape (flags)
  python tools/convlstm_kernel_bench.py --sweep        # width sweep:
      F in {8, 16, 32, 64} with cin=F (the production recresnet regime:
      every ConvLSTM layer beyond the first has cin == n_filters), plus
      the BENCH_SUITE toy shape (cin=8, F=8). Emits one JSON with a row
      per shape: us/layer, MFU, and which path the dispatcher picked.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_ops import trace_op_times
from dl4ds_tpu.ops.pallas_convlstm import (fused_convlstm,
                                           convlstm_reference,
                                           dispatch_info)

PEAK_TFLOPS = 197.0   # v5e bf16 peak (measured anchor: 191 TF/s chained)


def layer_flops(b, t, h, w, cin, f, kh=3, kw=3, bwd=False):
    """Logical SAME-conv FLOPs of the layer over the window: input conv
    (cin -> 4F) + recurrent conv (F -> 4F); backward = 2x more (weight-
    grad + input-grad per conv), so fwd+bwd = 3x forward."""
    fwd = 2 * b * t * h * w * kh * kw * (cin + f) * 4 * f
    return fwd * 3 if bwd else fwd


def measure_shape(b, t, h, w, cin, f, dt, n, repeats=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, h, w, cin)), dt)
    wx = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, 4 * f)),
                     jnp.float32)
    bx = jnp.asarray(0.1 * rng.standard_normal((4 * f,)), jnp.float32)
    wh = jnp.asarray(0.1 * rng.standard_normal((3, 3, f, 4 * f)),
                     jnp.float32)

    info = dispatch_info(x.shape, wx.shape, wh.shape,
                         itemsize=x.dtype.itemsize, interpret=False)
    info_train = dispatch_info(x.shape, wx.shape, wh.shape,
                               itemsize=x.dtype.itemsize, interpret=False,
                               training=True)

    def dispatched(xc, training=False):
        return fused_convlstm(xc, wx, bx, wh, training=training)

    def xla_fwd(xc):
        return convlstm_reference(xc, wx, bx, wh)[0]

    def make_chunk(fn, grad):
        # chain with a TINY NON-ZERO scale: `* 0` lets XLA fold the
        # product to zero and dead-code-eliminate the entire chunk
        # (measured: "xla_fwd 7.2 us/layer" — i.e. nothing ran)
        eps = jnp.asarray(1e-20, jnp.float32)
        if grad:
            def lossfn(xc, wxc, bxc, whc):
                if fn is dispatched:
                    # training=True: the mode the real train step runs
                    # (RecurrentConvBlock threads it; the F=16 valley
                    # then routes to XLA's joint program — measured
                    # faster than fused-fwd + split-bwd)
                    y = fused_convlstm(xc, wxc, bxc, whc, training=True)
                else:
                    y = convlstm_reference(xc, wxc, bxc, whc)[0]
                return jnp.sum(y.astype(jnp.float32) ** 2)
            g = jax.grad(lossfn, argnums=(0, 1, 2, 3))

            @jax.jit
            def chunk(carry):
                xc = carry
                for _ in range(n):
                    dx, dwx, dbx, dwh = g(xc, wx, bx, wh)
                    s = (jnp.sum(dwx) + jnp.sum(dbx) + jnp.sum(dwh)) * eps
                    xc = (xc + dx.astype(jnp.float32) * eps + s).astype(dt)
                return xc, jnp.sum(xc.astype(jnp.float32))
        else:
            @jax.jit
            def chunk(carry):
                xc = carry
                for _ in range(n):
                    y = fn(xc)
                    xc = xc + (jnp.sum(y.astype(jnp.float32))
                               * eps).astype(dt)
                return xc, jnp.sum(xc.astype(jnp.float32))
        return chunk

    row = {'shape': dict(b=b, t=t, h=h, w=w, cin=cin, f=f,
                         dtype=str(dt), steps_per_chunk=n),
           'dispatch': info['path'], 'dispatch_reason': info['reason'],
           'dispatch_train': info_train['path'],
           'dispatch_train_reason': info_train['reason']}
    paths = [('dispatched', dispatched)]
    # the raw-XLA column is only a distinct program when the dispatcher
    # picked a fused path for at least one mode; otherwise it IS the
    # dispatched path
    if info['path'].startswith('fused'):
        paths.append(('xla', xla_fwd))
    for name, fn in paths:
        for grad in (False, True):
            chunk = make_chunk(fn, grad)
            t0 = time.perf_counter()
            carry, out = chunk(x)   # compile
            float(jnp.sum(carry.astype(jnp.float32)))
            compile_s = time.perf_counter() - t0
            # profiler device time over the whole n-layer chunk (see
            # module docstring: wall-clock slope is unreliable for
            # millisecond chunks on the tunneled chip)
            ops = trace_op_times(lambda: chunk(x), n=repeats)
            sec = sum(r['us_per_step'] for r in ops) / n * 1e-6
            per_layer_us = sec * 1e6
            fl = layer_flops(b, t, h, w, cin, f, bwd=grad)
            mfu = fl / sec / (PEAK_TFLOPS * 1e12)
            key = f'{name}_{"fwdbwd" if grad else "fwd"}'
            row[key] = {'us_per_layer': round(per_layer_us, 1),
                        'mfu_pct': round(100 * mfu, 2),
                        'compile_s': round(compile_s, 1)}
            print(f'  {key}', row[key], flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--b', type=int, default=128)
    ap.add_argument('--t', type=int, default=4)
    ap.add_argument('--hw', type=int, default=16)
    ap.add_argument('--cin', type=int, default=8)
    ap.add_argument('--f', type=int, default=8)
    ap.add_argument('--steps-per-chunk', type=int, default=20)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--sweep', action='store_true',
                    help='width sweep: F in {8,16,32,64} with cin=F, '
                         'plus the toy cin=8/F=8 BENCH_SUITE shape')
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    if not args.sweep:
        row = measure_shape(args.b, args.t, args.hw, args.hw,
                            args.cin, args.f, dt, args.steps_per_chunk)
        print(json.dumps(row))
        return

    shapes = [
        # (b, t, h, w, cin, f) — cin=f is the production regime; batch
        # shrinks as F grows to keep per-chunk HBM residency comparable
        (128, 4, 16, 16, 8, 8),     # BENCH_SUITE toy shape (fused path)
        (128, 4, 16, 16, 16, 16),
        (128, 4, 16, 16, 32, 32),
        (64, 4, 16, 16, 64, 64),
        (64, 4, 32, 32, 64, 64),    # wide F AND wide spatial
    ]
    rows = []
    for (b, t, h, w, cin, f) in shapes:
        print(f'shape b={b} t={t} hw={h} cin={cin} f={f}', flush=True)
        rows.append(measure_shape(b, t, h, w, cin, f, dt,
                                  args.steps_per_chunk))
    print(json.dumps({'sweep': rows, 'peak_tflops': PEAK_TFLOPS}))


if __name__ == '__main__':
    main()
