#!/usr/bin/env python
"""Micro-probe: subpixel-folded HR convs vs XLA's HR convs.

The headline step's HR 64x64 output-module convs sit at a narrow-shape
floor (docs/ROOFLINE.md: [M<=72, N<=8] reduction GEMMs at 0.2-13 TF/s,
~24% of the step). The roofline argument fixed M*N "by the model's
channel widths" — but that held the convs in HR space. This probe tests
the one mapping that CHANGES the GEMM shapes: fold each 3x3 HR conv
through the final depth_to_space (r=2) into subpixel/LR space:

    conv3x3_HR(d2s(z), K)  ==  d2s(conv3x3_LR(z, fold(K)))

where fold(K) scatters the 3x3xCinxCout HR kernel into a
3x3x(4Cin)x(4Cout) folded kernel that is 25% dense (4x padded FLOPs).
The trade: 4x more MAC slots, but N grows 8->32 and K 9Cin->36Cin —
much closer to the MXU's 128-lane tiling. The fold is EXACT (same sums,
fp reorder only), and because fold() is a linear scatter of the HR
parameters, training through it routes wgrads back to the HR kernel
for free (autodiff of a scatter is a gather).

Times (bf16, B=128, the trace's exact output-module chain
48->8->8->8->1->1 at 64x64 vs its folded twin at 32x32):
  chain fwd, chain fwd+bwd (wgrads are the measured wall), and the
  single worst op ([3,3,8,8] at 64x64 vs [3,3,32,32] at 32x32).
Run ON THE TPU. Writes FOLD.json next to the repo root when --write.
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
from dl4ds_tpu.ops.array import depth_to_space

_enable_compile_cache()

STEPS = 100
B = 128
H = W = 32          # LR (packed) grid; HR grid is 64x64
R = 2
DTYPE = jnp.bfloat16
CHAIN = [(48, 8), (8, 8), (8, 8), (8, 1), (1, 1)]  # the traced HR module


def fold_kernel(k_hr, r):
    """Scatter a [kh,kw,cin,cout] HR kernel into the [kh',kw',r*r*cin,
    r*r*cout] folded kernel such that
    conv_HR(d2s(z), k_hr) == d2s(conv_LR(z, fold)). SAME padding, odd
    kernels. Density 1/r^2 (structural zeros)."""
    kh, kw, cin, cout = k_hr.shape
    pad_h, pad_w = kh // 2, kw // 2
    # folded spatial span: LR offsets floor((a + d - pad)/r) over
    # a in [0,r), d in [0,kh)
    d_min_h, d_max_h = (-pad_h) // r, (r - 1 + kh - 1 - pad_h) // r
    d_min_w, d_max_w = (-pad_w) // r, (r - 1 + kw - 1 - pad_w) // r
    span_h = d_max_h - d_min_h + 1
    span_w = d_max_w - d_min_w + 1
    kf = np.zeros((span_h, span_w, r * r * cin, r * r * cout),
                  np.asarray(k_hr).dtype)
    base_h, base_w = -d_min_h, -d_min_w  # index of LR offset D=0
    k_np = np.asarray(k_hr)
    for a in range(r):
        for b in range(r):
            for di in range(kh):
                u = a + di - pad_h
                d_off, s = u // r, u % r
                for dj in range(kw):
                    v = b + dj - pad_w
                    e_off, t = v // r, v % r
                    kf[d_off + base_h, e_off + base_w,
                       (s * r + t) * cin:(s * r + t + 1) * cin,
                       (a * r + b) * cout:(a * r + b + 1) * cout] \
                        = k_np[di, dj]
    return kf


def conv(x, k, prec=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype, precision=prec)


def timeit(name, chunk_fn, carry):
    carry, out = chunk_fn(carry)
    force(out)
    dts = []
    for _ in range(3):
        dt, carry = slope_time(chunk_fn, carry, repeats=1)
        dts.append(dt / STEPS)
    us = float(np.median(dts)) * 1e6
    print(json.dumps({name: round(us, 1)}), flush=True)
    return us


def main():
    rng = np.random.default_rng(0)
    write = '--write' in sys.argv
    results = {}

    # ---------------- parity (f32, HIGHEST) ----------------
    z32 = jnp.asarray(rng.standard_normal((2, 8, 8, 4 * 48)), jnp.float32)
    k32 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 48, 8)), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    a = conv(depth_to_space(z32, R), k32, hi)
    bb = depth_to_space(conv(z32, jnp.asarray(fold_kernel(k32, R)), hi), R)
    err = float(jnp.max(jnp.abs(a - bb)))
    print(json.dumps({'fold_parity_maxdiff_f32': err}), flush=True)
    results['fold_parity_maxdiff_f32'] = err
    assert err < 1e-4, 'fold is not exact'

    # ---------------- inputs ----------------
    z = jnp.asarray(rng.standard_normal((B, H, W, 4 * 48)), DTYPE)
    ks_hr = [jnp.asarray(0.1 * rng.standard_normal((3, 3, ci, co)), DTYPE)
             for ci, co in CHAIN]

    def hr_chain(z, ks):
        y = depth_to_space(z, R)
        for k in ks:
            y = conv(y, k)
        return y

    def folded_chain(z, ks):
        y = z
        for k in ks:
            y = conv(y, fold_jax(k))
        return depth_to_space(y, R)

    # jax-traceable fold: build the 0/1 scatter once per shape and apply
    # as a (slots x taps) matmul so autodiff routes wgrads to the HR
    # kernel. Here we just precompute indices and use .at[].set inside
    # jit (XLA constant-folds the scatter for fixed kernels; for the
    # timing below the fold cost is inside the step, as it would be in
    # training).
    _fold_cache = {}

    def fold_jax(k):
        key = tuple(k.shape)
        if key not in _fold_cache:
            kh, kw, cin, cout = k.shape
            mask = fold_kernel(np.ones((kh, kw, 1, 1), np.float32), R)
            span_h, span_w = mask.shape[:2]
            base_h = -((-(kh // 2)) // R)
            base_w = -((-(kw // 2)) // R)
            idx = []
            for a in range(R):
                for b in range(R):
                    for di in range(kh):
                        u = a + di - kh // 2
                        for dj in range(kw):
                            v = b + dj - kw // 2
                            idx.append((u // R + base_h, v // R + base_w,
                                        u % R, v % R, a, b, di, dj))
            _fold_cache[key] = (span_h, span_w, idx)
        span_h, span_w, idx = _fold_cache[key]
        kh, kw, cin, cout = k.shape
        kf = jnp.zeros((span_h, span_w, R * R * cin, R * R * cout), k.dtype)
        for (dd, ee, s, t, a, b, di, dj) in idx:
            kf = kf.at[dd, ee,
                       (s * R + t) * cin:(s * R + t + 1) * cin,
                       (a * R + b) * cout:(a * R + b + 1) * cout].set(
                k[di, dj])
        return kf

    # chain parity in bf16
    y_hr = hr_chain(z, ks_hr)
    y_fd = folded_chain(z, ks_hr)
    cerr = float(jnp.max(jnp.abs(y_hr.astype(jnp.float32)
                                 - y_fd.astype(jnp.float32))))
    print(json.dumps({'chain_parity_maxdiff_bf16': cerr}), flush=True)
    results['chain_parity_maxdiff_bf16'] = cerr

    # ---------------- timing ----------------
    variants = {'hr_chain': hr_chain, 'folded_chain': folded_chain}

    for name, fn in variants.items():
        @jax.jit
        def fwd_chunk(carry, fn=fn):
            def body(i, acc):
                y = fn(z + i.astype(DTYPE) * DTYPE(1e-6), ks_hr)
                return acc + jnp.mean(y).astype(jnp.float32)
            return jax.lax.fori_loop(0, STEPS, body, carry), carry

        @jax.jit
        def fb_chunk(carry, fn=fn):
            def body(i, acc):
                def loss(ks):
                    y = fn(z + i.astype(DTYPE) * DTYPE(1e-6), ks)
                    return jnp.mean(jnp.abs(y.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss)(ks_hr)
                gs = sum(jnp.sum(gk).astype(jnp.float32) for gk in g)
                return acc + l + gs * 1e-12
            return jax.lax.fori_loop(0, STEPS, body, carry), carry

        results[f'{name}_fwd_us'] = timeit(f'{name}_fwd_us', fwd_chunk,
                                           jnp.float32(0))
        results[f'{name}_fwdbwd_us'] = timeit(f'{name}_fwdbwd_us', fb_chunk,
                                              jnp.float32(0))

    # single worst-op comparison: [3,3,8,8] @ 64x64 vs folded @ 32x32
    x8 = jnp.asarray(rng.standard_normal((B, H * R, W * R, 8)), DTYPE)
    z8 = jnp.asarray(rng.standard_normal((B, H, W, 32)), DTYPE)
    k8 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 8)), DTYPE)

    for name, (xx, fn) in {
        'single_hr_8x8': (x8, lambda x, k: conv(x, k)),
        'single_folded_8x8': (z8, lambda x, k: conv(x, fold_jax(k))),
    }.items():
        @jax.jit
        def fb_chunk(carry, fn=fn, xx=xx):
            def body(i, acc):
                def loss(k):
                    y = fn(xx + i.astype(DTYPE) * DTYPE(1e-6), k)
                    return jnp.mean(jnp.abs(y.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss)(k8)
                return acc + l + jnp.sum(g).astype(jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, STEPS, body, carry), carry

        results[f'{name}_fwdbwd_us'] = timeit(f'{name}_fwdbwd_us', fb_chunk,
                                              jnp.float32(0))

    ratio = results['hr_chain_fwdbwd_us'] / results['folded_chain_fwdbwd_us']
    results['chain_fwdbwd_speedup'] = round(ratio, 3)
    print(json.dumps({'chain_fwdbwd_speedup': results['chain_fwdbwd_speedup']}),
          flush=True)
    if write:
        with open(os.path.join(REPO, 'FOLD.json'), 'w') as fh:
            json.dump({'note': 'subpixel-folded HR conv probe '
                               '(tools/fold_probe.py), B=128 bf16, '
                               'traced output-module chain', **results},
                      fh, indent=2)


if __name__ == '__main__':
    main()
