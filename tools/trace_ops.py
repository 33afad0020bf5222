#!/usr/bin/env python
"""Per-op device-time attribution for a jitted function, on the real TPU.

jax.profiler works through the axon tunnel; the written trace contains a
/device:TPU:0 process whose 'XLA Ops' thread has one complete event per
HLO op execution, with the HLO text (shapes + layouts) in args. This tool
runs a function N times under jax.profiler.trace and prints the top ops
by accumulated device time — the ground truth that analytic
decompositions (tools/spatial_decompose.py) can only bracket.

Library use:
    from tools.trace_ops import trace_op_times
    rows = trace_op_times(fn, n=20)     # fn: () -> jax value(s)

CLI: times the headline resnet_spc fwd+bwd prefix (tools/
spatial_decompose.Prefix('full')) and prints the top-25 table that
docs/ROOFLINE.md's "per-op attribution" section quotes.
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def trace_op_times(fn, n=20, trace_dir=None):
    """Run fn() n times under the profiler; return per-op rows
    [{'name', 'us_per_step', 'count_per_step', 'hlo'}] sorted by time,
    aggregated over the /device:TPU:0 'XLA Ops' thread."""
    import jax

    own = trace_dir is None
    trace_dir = trace_dir or tempfile.mkdtemp(prefix='jxtrace_')
    fn()  # warm/compile outside the trace
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            out = fn()
    jax.block_until_ready(out)
    traces = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.trace.json.gz'), recursive=True))
    if not traces:
        raise RuntimeError(f'no trace json written under {trace_dir}')
    with gzip.open(traces[-1]) as fh:
        events = json.load(fh)['traceEvents']
    pids = {e['pid']: e['args'].get('name') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    tids = {(e['pid'], e['tid']): e['args'].get('name') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'thread_name'}
    agg, cnt, hlo = collections.Counter(), collections.Counter(), {}
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if pids.get(e['pid']) != '/device:TPU:0':
            continue
        if tids.get((e['pid'], e['tid'])) != 'XLA Ops':
            continue
        agg[e['name']] += e['dur']
        cnt[e['name']] += 1
        if e['name'] not in hlo:
            hlo[e['name']] = (e.get('args') or {}).get('long_name', '')
    rows = [{'name': k, 'us_per_step': us / n,
             'count_per_step': cnt[k] / n, 'hlo': hlo[k]}
            for k, us in agg.most_common()]
    if own:
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)
    return rows


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    import spatial_decompose as S

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S.B, S.HW, S.HW, 1)), S.DTYPE)
    model = S.Prefix('full')
    params = model.init(jax.random.PRNGKey(0), x)['params']

    @jax.jit
    def fb(x):
        def loss_fn(p):
            y = model.apply({'params': p}, x, training=True)
            return jnp.mean(jnp.abs(y.astype(jnp.float32)))
        l, g = jax.value_and_grad(loss_fn)(params)
        return l + sum(jnp.sum(v).astype(jnp.float32)
                       for v in jax.tree_util.tree_leaves(g)) * 1e-12

    rows = trace_op_times(lambda: fb(x), n=20)
    total = sum(r['us_per_step'] for r in rows)
    print(f'total device {total:.0f} us/step over {len(rows)} distinct ops')
    for r in rows[:25]:
        print(f"{r['us_per_step']:8.2f} us/step  {r['name'][:40]:40s} "
              f"{r['hlo'][:120]}")


if __name__ == '__main__':
    main()
