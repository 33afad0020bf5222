#!/usr/bin/env python
"""Probe int8 throughput on the real chip: is an int8 serving path worth it?

The v5e MXU peak is ~394 TOPS int8 vs ~197 TFLOPS bf16. This measures,
with the repo's forced-readback slope timing (bench.slope_time):

  1. bf16 4096^3 matmul   (sanity anchor, expect ~190 TF/s)
  2. int8  4096^3 matmul  (s8 x s8 -> s32 via preferred_element_type)
  3. bf16 vs int8 conv    (the zoo's 3x3 conv at production width 64)

Run on the real TPU (no env overrides): python tools/int8_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench import slope_time, median_slope, _maybe_force_cpu

N = 4096
# 32 matmuls/chunk ~= 23 ms on-chip: the region delta must dwarf the
# tunnel's RPC jitter or the slope estimate is noise (REPS=8 produced
# physically impossible >peak samples)
REPS = 32


def _chain_matmul(dtype, acc):
    a = jnp.asarray(np.random.default_rng(0).integers(-4, 4, (N, N)), dtype)

    @jax.jit
    def chunk(b):
        # chain the FULL matrix operand through every matmul: a scalar
        # carry (a + x) @ b is strength-reducible to a@b + x*colsum(b),
        # so XLA runs ONE matmul per chunk and the probe reads >10x the
        # hardware peak (observed 2.5 PF/s on a 197 TF/s chip)
        y = None
        for _ in range(REPS):
            y = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc)
            if 'int' in str(dtype):
                b = (y % 5).astype(dtype)
            else:
                b = jnp.clip(y * 1e-3, -4, 4).astype(dtype)
        return b, y

    return chunk


def _chain_conv(dtype, acc, width=64, hw=64, batch=32):
    x0 = jnp.asarray(np.random.default_rng(0).integers(
        -4, 4, (batch, hw, hw, width)), dtype)
    k = jnp.asarray(np.random.default_rng(1).integers(
        -4, 4, (3, 3, width, width)), dtype)

    @jax.jit
    def chunk(t):
        x = x0 + t.astype(dtype)
        for _ in range(REPS):
            y = lax.conv_general_dilated(
                x, k, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=acc)
            x = y.astype(dtype) % 5 if 'int' in str(dtype) else \
                (y * 1e-3).astype(dtype)
        # data-dependent carry; see the matmul chain note on *0 folding
        t = (y[0, 0, 0, 0] % 7).astype(jnp.int32)
        return t, y

    flops = 2 * batch * hw * hw * 9 * width * width
    return chunk, flops


def measure(name, chunk, flops_per_rep, carry0=None):
    t = jnp.int32(0) if carry0 is None else carry0
    t, y = chunk(t)   # compile + warm
    float(jnp.sum(y.astype(jnp.float32)))
    sec, _ = median_slope(lambda c: chunk(c), t, n=5)
    tps = REPS * flops_per_rep / sec / 1e12
    print(f'{name}: {1e3 * sec / REPS:.3f} ms/op  {tps:.1f} T(FL)OP/s',
          flush=True)
    return tps


def model_level(batch=16, lr=64, width=64, blocks=6):
    """End-to-end serving comparison on the production-width model:
    bf16 forward vs the int8 quantize_forward replay, same grids."""
    import jax.numpy as jnp
    from dl4ds_tpu.models import net_postupsampling
    from dl4ds_tpu.quantization import quantize_forward

    results = {}
    x = np.random.default_rng(0).standard_normal(
        (batch, lr, lr, 1)).astype('float32')
    for mode, dtype in (('bf16', jnp.bfloat16), ('int8', jnp.bfloat16)):
        model = net_postupsampling(
            'resnet', 'spc', scale=4, n_channels=1, n_aux_channels=0,
            lr_size=(lr, lr), n_filters=width, n_blocks=blocks,
            attention=True, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), batch_size=batch)
        if mode == 'int8':
            qf = quantize_forward(model, variables, x)
            fwd = jax.jit(lambda xb: qf(xb))
        else:
            fwd = jax.jit(lambda xb: model.module.apply(
                variables, xb, None, training=False))

        xd = jnp.asarray(x)   # ONE transfer, outside the timed region
        def chunk(t):
            y = None
            for _ in range(4):
                y = fwd(xd + t)
                # float chain scalar (XLA does not fold float *0.0)
                t = jnp.mean(y).astype(jnp.float32) * 0.0
            return t, y

        t0 = jnp.float32(0.0)
        t0, y = chunk(t0)
        float(jnp.sum(y.astype(jnp.float32)))
        sec, _ = slope_time(chunk, t0)
        gps = 4 * batch / sec
        results[f'{mode}_w{width}_grids_per_sec'] = round(gps, 2)
        print(f'model {mode} w{width}: {gps:.1f} grids/sec', flush=True)
    results['int8_speedup'] = round(
        results[f'int8_w{width}_grids_per_sec']
        / results[f'bf16_w{width}_grids_per_sec'], 3)

    # the FROZEN int8 artifact (save_serving_artifact(quantize='int8') ->
    # StableHLO -> load) must retain the live replay's speedup — this is
    # the path dl4ds_tpu.serve actually runs in production
    import tempfile
    from dl4ds_tpu.export import (save_serving_artifact,
                                  load_serving_artifact)
    model = net_postupsampling(
        'resnet', 'spc', scale=4, n_channels=1, n_aux_channels=0,
        lr_size=(lr, lr), n_filters=width, n_blocks=blocks,
        attention=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), batch_size=batch)
    with tempfile.TemporaryDirectory() as tmp:
        save_serving_artifact(model, variables, tmp, batch=batch,
                              quantize='int8', calibration=x)
        call, _ = load_serving_artifact(tmp)
        xd = jnp.asarray(x)

        def chunk(t):
            y = None
            for _ in range(4):
                y = call(xd + t)
                t = jnp.mean(y).astype(jnp.float32) * 0.0
            return t, y

        t0 = jnp.float32(0.0)
        t0, y = chunk(t0)
        float(jnp.sum(y.astype(jnp.float32)))
        sec, _ = slope_time(chunk, t0)
        gps = 4 * batch / sec
    results[f'frozen_int8_w{width}_grids_per_sec'] = round(gps, 2)
    results['frozen_int8_vs_live'] = round(
        gps / results[f'int8_w{width}_grids_per_sec'], 3)
    print(f'model frozen-int8 w{width}: {gps:.1f} grids/sec', flush=True)
    return results


def main():
    _maybe_force_cpu()
    print(f'platform: {jax.devices()[0].device_kind}', flush=True)
    out = {}
    mm_flops = 2 * N ** 3
    b0 = np.random.default_rng(1).integers(-4, 4, (N, N))
    out['bf16_matmul_tflops'] = measure(
        'bf16 matmul', _chain_matmul(jnp.bfloat16, jnp.float32), mm_flops,
        carry0=jnp.asarray(b0, jnp.bfloat16))
    try:
        out['int8_matmul_tops'] = measure(
            'int8 matmul', _chain_matmul(jnp.int8, jnp.int32), mm_flops,
            carry0=jnp.asarray(b0, jnp.int8))
    except Exception as e:  # lowering may be unsupported
        out['int8_matmul_error'] = repr(e)[:200]
        print('int8 matmul FAILED:', repr(e)[:200], flush=True)
    c, cf = _chain_conv(jnp.bfloat16, jnp.float32)
    out['bf16_conv_tflops'] = measure('bf16 conv w64', c, cf)
    try:
        c, cf = _chain_conv(jnp.int8, jnp.int32)
        out['int8_conv_tops'] = measure('int8 conv w64', c, cf)
    except Exception as e:
        out['int8_conv_error'] = repr(e)[:200]
        print('int8 conv FAILED:', repr(e)[:200], flush=True)
    try:
        out.update(model_level())
    except Exception as e:
        out['model_level_error'] = repr(e)[:300]
        print('model-level FAILED:', repr(e)[:300], flush=True)
    artifact = {k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in out.items()}
    print(json.dumps(artifact))
    if jax.default_backend() == 'tpu':
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'INT8.json')
        with open(path, 'w') as fh:
            json.dump(artifact, fh, indent=2)
        print(f'# wrote {path}', flush=True)


if __name__ == '__main__':
    main()
