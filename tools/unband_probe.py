"""Isolated A/B of the band-gradient fold (`_unband`) lowerings on TPU.

The split-backward trace (F=16) shows the BPTT kernels + tail GEMMs are
fast (~430 us/layer) but the surrounding plumbing — folding the band
gradients [kh, W*C, 4WF] back to conv-kernel form and the packed<->NHWC
relayouts — costs ~2x that. `_unband`'s einsum ('xio,dicgoe->dxcge')
lowers through rank-6 small-minor-dim intermediates, the exact transpose
cliff docs/ROOFLINE.md documents for rank-5 convs. This probe times the
candidate reformulations in isolation (pure XLA, no Mosaic compiles):

  einsum   current: selector einsum (rank-6 contraction)
  diag     jnp.diagonal over the two W axes per tap offset, then sum
  mask     broadcast eye-mask multiply + sum (pure elementwise+reduce)
  shift    per-x row-shifted 2-D slices + adjacent-axis diagonal

All must agree with the einsum to ~1e-6 (asserted) — they are the same
contraction. Timing: jax.profiler device time over a 20-fold chain
(tools/trace_ops), the methodology every kernel number in this repo uses.
"""

import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_ops import trace_op_times
from dl4ds_tpu.ops.pallas_convlstm import _unband, _x_selector


def unband_production(dbw, kh, kw, cin, f, w):
    """Whatever dl4ds_tpu currently ships (kept first so regressions in
    the production fold show up against the alternatives below)."""
    return _unband(dbw, kh, kw, cin, f, w)


def unband_einsum(dbw, kh, kw, cin, f, w):
    """Selector einsum at DEFAULT precision — the original formulation;
    on TPU it bf16-demotes (see module docstring)."""
    dbig = dbw.reshape(kh, w, cin, 4, w, f)
    s = _x_selector(kw, w)
    return jnp.einsum('xio,dicgoe->dxcge', s, dbig).reshape(
        kh, kw, cin, 4 * f)


def unband_diag(dbw, kh, kw, cin, f, w):
    pw = (kw - 1) // 2
    v6 = dbw.reshape(kh, w, cin, 4, w, f)
    outs = []
    for x in range(kw):
        # entries (i_row = o + x - pw, o_col = o): diagonal(a)[.., j] =
        # a[j, j + offset], so offset = o - i = pw - x; edge truncation
        # IS the SAME-conv boundary (selector zeros those rows)
        d = jnp.diagonal(v6, offset=pw - x, axis1=1, axis2=4)
        outs.append(d.sum(-1))                       # [kh, cin, 4, f]
    return jnp.stack(outs, 1).reshape(kh, kw, cin, 4 * f)


def unband_mask(dbw, kh, kw, cin, f, w):
    v6 = dbw.reshape(kh, w, cin, 4, w, f)
    s = _x_selector(kw, w)                           # [kw, i, o]
    out = (v6[:, None] * s[None, :, :, None, None, :, None]).sum((2, 5))
    return out.reshape(kh, kw, cin, 4 * f)


def unband_shift(dbw, kh, kw, cin, f, w):
    """Shift rows per tap so the wanted diagonal becomes the MAIN one,
    then extract it with an adjacent-axis reshape trick: flatten the two
    W axes and slice with stride W+1 (pure 2-D ops + one small gather)."""
    pw = (kw - 1) // 2
    wc = w * cin
    outs = []
    for x in range(kw):
        k = x - pw
        r = jnp.roll(dbw, -k * cin, axis=1)
        if k > 0:
            r = r.at[:, wc - k * cin:, :].set(0.0)
        elif k < 0:
            r = r.at[:, :(-k) * cin, :].set(0.0)
        v6 = r.reshape(kh, w, cin, 4, w, f)
        d = jnp.diagonal(v6, axis1=1, axis2=4).sum(-1)
        outs.append(d)
    return jnp.stack(outs, 1).reshape(kh, kw, cin, 4 * f)


def unband_einsum_hi(dbw, kh, kw, cin, f, w):
    """Selector einsum pinned to f32 (precision=HIGHEST blocks the TPU
    conv lowering's bf16 demotion)."""
    dbig = dbw.reshape(kh, w, cin, 4, w, f)
    s = _x_selector(kw, w)
    dwk6 = jnp.einsum('xio,dicgoe->dxcge', s, dbig,
                      precision=jax.lax.Precision.HIGHEST)
    return dwk6.reshape(kh, kw, cin, 4 * f)


VARIANTS = [('production', unband_production),
            ('einsum', unband_einsum), ('einsum_hi', unband_einsum_hi),
            ('diag', unband_diag),
            ('mask', unband_mask), ('shift', unband_shift)]


def main():
    kh = kw = 3
    rows = {}
    for cin, f, w in [(16, 16, 16), (8, 8, 16)]:
        rng = np.random.default_rng(0)
        dbw_np = rng.standard_normal((kh, w * cin, 4 * w * f))
        dbw = jnp.asarray(dbw_np, jnp.float32)
        # ground truth on HOST in f64: on TPU the einsum variant itself
        # is bf16-demoted (XLA lowers the selector contraction as a conv,
        # and TPU convs default to bf16) — maxdiff vs f64 is REPORTED per
        # variant so precision is part of the probe's verdict
        s64 = np.asarray(_x_selector(kw, w), np.float64)
        ref = np.einsum(
            'xio,dicgoe->dxcge', s64,
            dbw_np.reshape(kh, w, cin, 4, w, f)).reshape(
                kh, kw, cin, 4 * f)
        shape_key = f'cin{cin}_f{f}_w{w}'
        rows[shape_key] = {}
        for name, fn in VARIANTS:
            got = np.asarray(fn(dbw, kh, kw, cin, f, w))
            maxdiff = float(np.max(np.abs(got - ref)))
            assert maxdiff < 0.05, (name, maxdiff)   # bf16-demotion scale
            n = 20
            eps = jnp.asarray(1e-20, jnp.float32)

            @jax.jit
            def chunk(a, fn=fn):
                for _ in range(n):
                    out = fn(a, kh, kw, cin, f, w)
                    a = a + jnp.sum(out) * eps
                return a, jnp.sum(a)

            t0 = time.perf_counter()
            r = chunk(dbw)
            float(r[1])
            compile_s = time.perf_counter() - t0
            ops = trace_op_times(lambda c=chunk: c(dbw), n=5)
            us = sum(o['us_per_step'] for o in ops) / n
            rows[shape_key][name] = {'us_per_fold': round(us, 1),
                                     'maxdiff_vs_f64': maxdiff,
                                     'compile_s': round(compile_s, 1)}
            print(f'{shape_key} {name:7s} {us:8.1f} us/fold '
                  f'maxdiff {maxdiff:.2e} (compile {compile_s:.1f}s)',
                  flush=True)
    import json
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
