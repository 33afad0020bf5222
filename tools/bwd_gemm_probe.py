#!/usr/bin/env python
"""Probe: can banded matmuls beat XLA's narrow-channel conv backward?

The reference-width configs are bound by backward weight-grad GEMMs that
contract K = B*H*W positions into tiny (3,3,C,F) outputs (docs/ROOFLINE.md
"Headline train-step decomposition") — M*N = 72*8 fills 3.5% of the MXU's
128x128 array. The banded formulation (interpolation.py / the fused
ConvLSTM kernel) rewrites a 3x3 SAME conv as kh=3 matmuls with band
matrices BW_kh [W*C, W*F]: forward FLOPs grow by W/3, but every GEMM in
fwd/dgrad/wgrad has M,N >= 128 — full MXU occupancy. This probe
slope-times, per channel width:

  xla_fwd / xla_fwdbwd : nn-style lax conv fwd and fwd+grad (weights+input)
  band_fwd / band_fwdbwd: banded formulation, autodiffed

Run ON THE TPU (no env overrides). Prints one JSON line per width.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from bench import force, slope_time, _enable_compile_cache

_enable_compile_cache()

B, H, W = 128, 16, 16
KH = KW = 3


def band_matrices(w33, width):
    """w33: [3, 3, C, F] conv kernel -> [kh=3, W*C, W*F] band matrices.
    BW[kh, w'*C+c, w*F+f] = w33[kh, w-w'+1, c, f] for |w-w'| <= 1."""
    wi = jnp.arange(width)
    out = []
    for kw in range(KW):
        # output col w draws from input col w' = w + kw - 1
        mask = (wi[:, None] + KW // 2 - kw == wi[None, :]).astype(w33.dtype)
        out.append(jnp.einsum('uw,kcf->kucwf', mask, w33[:, kw]))
    bw = sum(out)                                   # [kh, W', C, W, F]
    c, f = w33.shape[2], w33.shape[3]
    return bw.reshape(KH, width * c, width * f)


def banded_conv(x, w33):
    """x: [B, H, W, C] -> [B, H, W, F] — 3x3 SAME conv as kh banded
    matmuls over lane-packed rows [W*C]."""
    b, h, width, c = x.shape
    f = w33.shape[-1]
    bw = band_matrices(w33, width)
    xr = x.reshape(b, h, width * c)
    ypad = jnp.pad(xr, ((0, 0), (1, 1), (0, 0)))
    y = sum(jnp.einsum('bhi,io->bho', ypad[:, kh:kh + h], bw[kh],
                       precision=jax.lax.Precision.DEFAULT)
            for kh in range(KH))
    return y.reshape(b, h, width, f)


def xla_conv(x, w33):
    return jax.lax.conv_general_dilated(
        x, w33, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def probe(conv_fn, c, f, do_bwd, steps=512):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, W, c)), jnp.bfloat16)
    w0 = jnp.asarray(0.1 * rng.standard_normal((KH, KW, c, f)), jnp.bfloat16)

    if do_bwd:
        def loss(w, x):
            return jnp.sum(conv_fn(x, w).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        def body(_, carry):
            w, x = carry
            dw, dx = g(w, x)
            # chain so iterations cannot collapse
            return (w + 1e-6 * dw.astype(w.dtype),
                    x + 1e-6 * dx.astype(x.dtype))
    else:
        def body(_, carry):
            w, x = carry
            y = conv_fn(x, w)
            return (w, (x + 1e-6 * y[..., :c]).astype(jnp.bfloat16))

    @jax.jit
    def chunk(carry):
        carry = jax.lax.fori_loop(0, steps, body, carry)
        return carry, carry[1]

    carry = (w0, x0)
    carry, out = chunk(carry)   # compile + warm
    force(out)
    dt, _ = slope_time(lambda cr: chunk(cr), carry)
    return dt / steps


def main():
    results = []
    for width_ch in (8, 32):
        c = f = width_ch
        useful = 2 * B * H * W * KH * KW * c * f            # fwd FLOPs
        row = {'channels': width_ch, 'useful_fwd_gflop': useful / 1e9}
        for name, fn, bwd in (('xla_fwd', xla_conv, False),
                              ('band_fwd', banded_conv, False),
                              ('xla_fwdbwd', xla_conv, True),
                              ('band_fwdbwd', banded_conv, True)):
            t0 = time.time()
            dt = probe(fn, c, f, bwd)
            row[name + '_us'] = round(dt * 1e6, 2)
            print(f'# {width_ch}ch {name}: {dt*1e6:.1f} us '
                  f'(wall {time.time()-t0:.0f}s)', flush=True)
        row['fwd_speedup'] = round(row['xla_fwd_us'] / row['band_fwd_us'], 2)
        row['fwdbwd_speedup'] = round(
            row['xla_fwdbwd_us'] / row['band_fwdbwd_us'], 2)
        print(json.dumps(row), flush=True)
        results.append(row)
    # numerical check in f32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, H, W, 8)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    err = float(jnp.max(jnp.abs(banded_conv(x, w) - xla_conv(x, w))))
    print(json.dumps({'banded_vs_xla_max_err_f32': err}), flush=True)


if __name__ == '__main__':
    main()
