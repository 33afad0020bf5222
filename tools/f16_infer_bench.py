"""Model-level A/B of the F=16 ConvLSTM inference dispatch on the chip.

The per-layer sweep (CONVLSTM_SWEEP.json) shows the split-backward fused
tier wins the cin=F=16 valley FORWARD 2.6x over the XLA recurrence. This
probe checks what that buys a WHOLE spatio-temporal model at serving
time: a recresnet_spc (n_filters=16, tw=4) inference apply, dispatched
(fused forward at every cin=F=16 ConvLSTM) vs DL4DS_NO_PALLAS_CONVLSTM=1
(XLA recurrence), same params, bf16.

Timing is jax.profiler device time over an n-apply chained chunk
(tools/trace_ops) — the repo's standard for sub-second regions on the
tunneled chip (wall-clock slope under-reports there; docs/ROOFLINE.md
"Timing-methodology note").

    python tools/f16_infer_bench.py        # writes F16_INFER.json
"""

import json
import os
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_ops import trace_op_times


def build(n_filters=16, tw=4, hw=16, scale=4, n_blocks=2):
    from dl4ds_tpu.models import recnet_postupsampling
    return recnet_postupsampling(
        'resnet', 'spc', scale, 1, 0, (hw, hw), tw,
        n_filters=n_filters, n_blocks=n_blocks, attention=False,
        dtype=jnp.bfloat16)


def measure(model, variables, x, n=20, repeats=3):
    eps = jnp.asarray(1e-20, jnp.float32)

    @jax.jit
    def chunk(xc):
        for _ in range(n):
            y = model.module.apply(variables, xc, training=False)
            xc = (xc + jnp.sum(y.astype(jnp.float32)) * eps).astype(xc.dtype)
        return xc, jnp.sum(xc.astype(jnp.float32))

    t0 = time.perf_counter()
    r = chunk(x)
    float(r[1])
    compile_s = time.perf_counter() - t0
    ops = trace_op_times(lambda: chunk(x), n=repeats)
    us = sum(o['us_per_step'] for o in ops) / n
    return us, compile_s


def main():
    b, tw, hw, f = 64, 4, 16, 16
    model = build(n_filters=f, tw=tw, hw=hw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, tw, hw, hw, 1)), jnp.bfloat16)
    variables = model.module.init(jax.random.PRNGKey(0), x)

    # numerics guard: both paths must agree before either is timed
    y_fused = model.module.apply(variables, x, training=False)
    os.environ['DL4DS_NO_PALLAS_CONVLSTM'] = '1'
    try:
        y_xla = model.module.apply(variables, x, training=False)
    finally:
        del os.environ['DL4DS_NO_PALLAS_CONVLSTM']
    maxdiff = float(jnp.max(jnp.abs(
        y_fused.astype(jnp.float32) - y_xla.astype(jnp.float32))))
    scale_ref = float(jnp.max(jnp.abs(y_xla.astype(jnp.float32))))
    assert maxdiff < 0.15 * max(scale_ref, 1.0), (maxdiff, scale_ref)

    us_fused, c1 = measure(model, variables, x)
    os.environ['DL4DS_NO_PALLAS_CONVLSTM'] = '1'
    try:
        us_xla, c2 = measure(model, variables, x)
    finally:
        del os.environ['DL4DS_NO_PALLAS_CONVLSTM']

    out = {
        'model': 'recresnet_spc_4x', 'n_filters': f, 'time_window': tw,
        'batch': b, 'lr_size': hw, 'dtype': 'bfloat16',
        'us_per_apply_fused': round(us_fused, 1),
        'us_per_apply_xla': round(us_xla, 1),
        'speedup': round(us_xla / us_fused, 2),
        'samples_per_sec_fused': round(b / us_fused * 1e6, 1),
        'samples_per_sec_xla': round(b / us_xla * 1e6, 1),
        'maxdiff_fused_vs_xla': maxdiff,
        'compile_s': [round(c1, 1), round(c2, 1)],
    }
    print(json.dumps(out))
    with open('F16_INFER.json', 'w') as fh:
        json.dump(out, fh, indent=1)
        fh.write('\n')


if __name__ == '__main__':
    main()
