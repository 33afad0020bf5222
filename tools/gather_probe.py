#!/usr/bin/env python
"""Probe: batched random-crop gather strategies on TPU.

The production BatchSynthesizer._gather_crop (vmap of lax.dynamic_slice)
lowers to a serial XLA while loop measured at ~400 us/step in the
headline train step (tools/trace_ops.py) — ~170x the HBM roofline for
the 2 MB of patches it moves. Candidates:

  dynslice   current: vmap(lax.dynamic_slice)           (while loop)
  fullmm     take images + two one-hot selection einsums (MXU)
  rowtake    flat row gather (take) + column one-hot einsum
  allgather  single advanced-indexing gather (element granularity)

All are bit-exact vs dynslice (one-hot matmuls at HIGHEST precision
select, not interpolate). Run ON THE TPU.
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

STEPS = 100
N, H, W, C = 256, 128, 128, 1
B, P = 128, 64
HI = jax.lax.Precision.HIGHEST


def sel(starts, size, full, dtype):
    ar = jnp.arange(size)
    hh = jnp.arange(full)
    return (starts[:, None, None] + ar[None, :, None]
            == hh[None, None, :]).astype(dtype)


def dynslice(data, idx, ys, xs):
    def one(i, y, x):
        return jax.lax.dynamic_slice(data, (i, y, x, 0), (1, P, P, C))
    return jax.vmap(one)(idx, ys, xs)[:, 0]


def fullmm(data, idx, ys, xs):
    imgs = jnp.take(data, idx, axis=0)                       # [B,H,W,C]
    ysel = sel(ys, P, H, data.dtype)                         # [B,P,H]
    xsel = sel(xs, P, W, data.dtype)                         # [B,P,W]
    rows = jnp.einsum('bph,bhwc->bpwc', ysel, imgs, precision=HI)
    return jnp.einsum('bqw,bpwc->bpqc', xsel, rows, precision=HI)


def rowtake(data, idx, ys, xs):
    flat = data.reshape(N * H, W, C)
    ridx = (idx[:, None] * H + ys[:, None] + jnp.arange(P)[None, :])
    rows = jnp.take(flat, ridx.reshape(-1), axis=0).reshape(B, P, W, C)
    xsel = sel(xs, P, W, data.dtype)
    return jnp.einsum('bqw,bpwc->bpqc', xsel, rows, precision=HI)


def allgather(data, idx, ys, xs):
    ii = idx[:, None, None]
    yy = ys[:, None, None] + jnp.arange(P)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(P)[None, None, :]
    return data[ii, yy, xx]                                   # [B,P,P,C]


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
    data = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
    key = jax.random.PRNGKey(0)

    # parity check once
    idx = jax.random.randint(key, (B,), 0, N)
    ys = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, H - P)
    xs = jax.random.randint(jax.random.fold_in(key, 2), (B,), 0, W - P)
    ref = dynslice(data, idx, ys, xs)
    for f in (fullmm, rowtake, allgather):
        d = float(jnp.max(jnp.abs(ref - f(data, idx, ys, xs))))
        print(json.dumps({f.__name__ + '_maxdiff': d}), flush=True)

    for f in (dynslice, fullmm, rowtake, allgather):
        @jax.jit
        def chunk(carry, f=f):
            def body(i, acc):
                k = jax.random.fold_in(key, i + carry.astype(jnp.int32))
                k1, k2, k3 = jax.random.split(k, 3)
                idx = jax.random.randint(k1, (B,), 0, N)
                ys = jax.random.randint(k2, (B,), 0, H - P)
                xs = jax.random.randint(k3, (B,), 0, W - P)
                out = f(data, idx, ys, xs)
                return acc + jnp.mean(out)
            acc = jax.lax.fori_loop(0, STEPS, body, carry)
            return acc, acc
        timeit(f.__name__ + '_us', chunk, jnp.float32(0))


if __name__ == '__main__':
    main()
