#!/usr/bin/env python
"""Micro-probe: is depth_to_space the spc-head wall, and does a
permutation-matmul formulation beat the reshape/transpose one?

Times, per stage (B=128, 16x16 -> 32x32, c=8, r=2, bf16):
  conv only              nn.Conv 8 -> 32 @ 16x16
  conv + d2s (transpose) current ops.array.depth_to_space
  conv + d2s (matmul)    one-hot permutation einsum on row lanes
fwd and fwd+bwd. Run ON THE TPU.
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

STEPS = 200
B, H, W, C, R = 128, 16, 16, 8, 2
DTYPE = jnp.bfloat16


def perm_matrix(w, r, c, dtype):
    """[w*r*r*c, r, w*r*c] one-hot: (w_i, di, dj, c) -> (di, w_i*r+dj, c)."""
    k = w * r * r * c
    m = np.zeros((k, r, w * r * c), np.float32)
    for wi in range(w):
        for di in range(r):
            for dj in range(r):
                for cc in range(c):
                    src = ((wi * r + di) * r + dj) * c + cc
                    m[src, di, (wi * r + dj) * c + cc] = 1.0
    return jnp.asarray(m, dtype)


def d2s_matmul(x, r, pmat):
    *lead, h, w, c4 = x.shape
    c = c4 // (r * r)
    xf = x.reshape(*lead, h, w * c4)
    y = jnp.einsum('...hk,kdm->...hdm', xf, pmat)
    return y.reshape(*lead, h * r, w * r, c)


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
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), DTYPE)
    wk = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, C * R * R)), DTYPE)
    pmat = perm_matrix(W, R, C, DTYPE)

    def conv(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=DTYPE)

    pmat2 = perm_matrix(W * R, R, C, DTYPE)

    def two_stage_transpose(x, wk):
        y = depth_to_space(conv(x, wk), R)
        return depth_to_space(conv(y, wk), R)

    def two_stage_matmul(x, wk):
        y = d2s_matmul(conv(x, wk), R, pmat)
        return d2s_matmul(conv(y, wk), R, pmat2)

    def two_stage_mixed(x, wk):
        # matmul d2s only between the stages (where the next conv's input
        # layout matters); plain transpose d2s at the end
        y = d2s_matmul(conv(x, wk), R, pmat)
        return depth_to_space(conv(y, wk), R)

    variants = {
        'conv_only': lambda x, wk: conv(x, wk),
        'conv_d2s_transpose': lambda x, wk: depth_to_space(conv(x, wk), R),
        'conv_d2s_matmul': lambda x, wk: d2s_matmul(conv(x, wk), R, pmat),
        'two_stage_transpose': two_stage_transpose,
        'two_stage_matmul': two_stage_matmul,
        'two_stage_mixed': two_stage_mixed,
    }
    for name, fn in variants.items():
        # check parity first
        if name == 'conv_d2s_matmul':
            a = depth_to_space(conv(x, wk), R)
            b = fn(x, wk)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
            print(json.dumps({'matmul_vs_transpose_maxdiff': err}),
                  flush=True)

        @jax.jit
        def fwd_chunk(carry, fn=fn):
            def body(i, acc):
                y = fn(x + i.astype(DTYPE) * DTYPE(1e-6), wk)
                return acc + jnp.mean(y).astype(jnp.float32)
            acc = jax.lax.fori_loop(0, STEPS, body, carry)
            return acc, acc

        @jax.jit
        def fb_chunk(carry, fn=fn):
            def body(i, acc):
                def loss(wk):
                    y = fn(x + i.astype(DTYPE) * DTYPE(1e-6), wk)
                    return jnp.mean(jnp.abs(y.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss)(wk)
                return acc + l + jnp.sum(g).astype(jnp.float32) * 1e-12
            acc = jax.lax.fori_loop(0, STEPS, body, carry)
            return acc, acc

        timeit(f'{name}_fwd_us', fwd_chunk, jnp.float32(0))
        timeit(f'{name}_fwdbwd_us', fb_chunk, jnp.float32(0))


if __name__ == '__main__':
    main()
