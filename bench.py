#!/usr/bin/env python
"""Benchmark: supervised training throughput (patches/sec/chip).

Workload: BASELINE.md config #2 — resnet_spc 4x post-upsampling with channel
attention, patch training — full fused step (on-device batch synthesis +
forward + backward + update) on one chip.

vs_baseline: ratio against the ACTUAL TensorFlow reference
(/root/reference/dl4ds SupervisedTrainer: DataGenerator + model.fit) run
on this host's CPU on the same workload — measured by
`tools/tf_parity.py --sections throughput` and read from PARITY_TF.json
(the BASELINE.json north star ">=10x patches/sec/chip over CPU TF
reference", as a real measurement). Fallback when that artifact is
absent: a JAX re-implementation proxy on CPU (subprocess, cached in
.bench_cpu_baseline.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: on the tunneled TPU platform `block_until_ready` can
return before the computation finishes, so all timed regions end in a forced
scalar readback and per-chunk time comes from the two-point slope method
(see `slope_time`) — the constant readback/RPC overhead cancels between the
two regions. Verified against the MXU roofline: a chained 4096^3 bf16 matmul
measures 191 TF/s (97% of the v5e's 197 TF/s peak) under this scheme.
"""

import json
import os

import numpy as np
import subprocess
import sys
import time

BATCH = int(os.environ.get('BENCH_BATCH', 128))
PATCH = 64          # HR patch size; LR input is 16x16
SCALE = 4
N_FILTERS = 8
N_BLOCKS = 6
N_SAMPLES = 256
GRID = 128          # HR grid size of the synthetic dataset
WARMUP = 3
STEPS = 50
CPU_STEPS = 4
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.bench_cpu_baseline.json')


def force(x):
    """Force execution to completion. On the tunneled TPU platform
    `jax.block_until_ready` can return before the computation finishes
    (remote buffers are 'ready' as handles), so the only reliable sync
    point is a scalar device->host readback."""
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def slope_time(run_chunk, carry, k_lo=1, k_hi=3, repeats=2):
    """Per-chunk wall time by the two-point slope method: time a region of
    `k_lo` and a region of `k_hi` back-to-back chunks (each region ends in a
    forced scalar readback) and take (t_hi - t_lo)/(k_hi - k_lo). The
    readback/RPC overhead is identical in both regions so it cancels — a
    single timed region would attribute it to compute. `run_chunk(carry) ->
    (carry, out)` must CHAIN carry so chunks cannot be reordered/elided.
    Returns (best seconds_per_chunk over `repeats`, carry)."""
    def region(k, carry):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            carry, out = run_chunk(carry)
        force(out)
        return time.perf_counter() - t0, carry

    _, carry = region(1, carry)  # warm the fetch path (compile already done)
    best = float('inf')
    attempts = 0
    done = 0
    while done < repeats and attempts < repeats + 4:
        attempts += 1
        t_lo, carry = region(k_lo, carry)
        t_hi, carry = region(k_hi, carry)
        dt = (t_hi - t_lo) / (k_hi - k_lo)
        if dt <= 0:
            # a transient RPC backlog landed on the small region: the
            # slope is meaningless — retry instead of clamping (a clamp
            # would fabricate astronomic throughput samples)
            continue
        best = min(best, dt)
        done += 1
    if not np.isfinite(best) or best == float('inf'):
        raise RuntimeError('slope_time: no positive slope in '
                           f'{attempts} attempts (RPC backlog?)')
    return best, carry


def median_slope(chunk, carry, n=5, repeats=1):
    """Median of n independent slope measurements (the tunneled chip's
    run-to-run variance is ~±20%; see docs/ROOFLINE.md)."""
    dts = []
    for _ in range(n):
        dt, carry = slope_time(chunk, carry, repeats=repeats)
        dts.append(dt)
    return float(np.median(dts)), carry


def chained_forward(apply_fn):
    """Wrap a forward so its output feeds a float chain scalar back into
    the next call's input — slope_time regions can then never overlap or
    be elided (float * 0.0 is NOT constant-folded by XLA; integer is)."""
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda v, xb, t: (
        lambda y: (y, jnp.mean(y).astype(jnp.float32) * 0.0))(
            apply_fn(v, xb + t)))


def build(trainer_mod, mesh=None):
    import numpy as np
    import jax.numpy as jnp
    dtype = (jnp.float32 if os.environ.get('BENCH_DTYPE') == 'f32'
             else jnp.bfloat16)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((N_SAMPLES, GRID, GRID, 1)).astype('float32')
    tr = trainer_mod.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:64], data_test=data[:64], scale=SCALE,
        patch_size=PATCH, batch_size=BATCH, loss='mae', epochs=1,
        n_filters=N_FILTERS, n_blocks=N_BLOCKS, attention=True, save=False,
        verbose=False, mesh=mesh, dtype=dtype)
    tr.setup_datagen()
    tr.setup_model()
    return tr


def measure(steps, warmup, use_scan=True):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dl4ds_tpu.training import supervised

    tr = build(supervised)
    tx = tr._build_optimizer()
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=tx, batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    key = jax.random.PRNGKey(0)
    idx = np.asarray(tr.ds_train.epoch_indices(key, steps=warmup + 2 * steps))
    if use_scan:
        # multi-step dispatch (lax.scan over the fused step) — the
        # production TPU path of SupervisedTrainer.run. Slope-timed with
        # forced readbacks (see slope_time); state threads through chunks so
        # every chunk really runs.
        key, k1, k2 = jax.random.split(key, 3)
        chunk_idx = jnp.asarray(idx[steps:2 * steps], jnp.int32)
        state, losses = tr._train_many(
            state, jnp.asarray(idx[:steps], jnp.int32), k1)  # compile+warm
        force(losses)
        # run-to-run variance on the tunneled chip is ~±20%: the headline
        # is the MEDIAN of 5 independent slope measurements
        dts = []
        for _ in range(5):
            dt, state = slope_time(
                lambda s: tr._train_many(s, chunk_idx, k2), state, repeats=1)
            dts.append(dt)
        import numpy as _np
        dt = float(_np.median(dts))
    else:
        # per-step dispatch — faster for XLA:CPU, used for the CPU baseline
        loss = None
        for i in range(warmup):
            key, k = jax.random.split(key)
            state, loss = tr._train_step(
                state, jnp.asarray(idx[i], jnp.int32), k)
        if loss is not None:
            force(loss)
        t0 = time.perf_counter()
        for i in range(warmup, warmup + steps):
            key, k = jax.random.split(key)
            state, loss = tr._train_step(
                state, jnp.asarray(idx[i], jnp.int32), k)
        force(loss)
        dt = time.perf_counter() - t0
    # per-CHIP throughput: divide the aggregate by the device count so
    # multi-device runs don't overstate the 'patches/sec/chip' metric
    return steps * tr.global_batch_size / dt / tr.n_devices


def cpu_probe():
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    print(json.dumps({'pps': measure(CPU_STEPS, 2, use_scan=False)}))


def cpu_baseline():
    # prefer the REAL reference number: tools/tf_parity.py --sections
    # throughput runs /root/reference/dl4ds's SupervisedTrainer
    # (DataGenerator + model.fit, TF on CPU) on this exact workload and
    # records it in PARITY_TF.json; the JAX CPU probe below is only the
    # fallback proxy when that artifact is absent
    parity = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'PARITY_TF.json')
    try:
        with open(parity) as fh:
            pps = json.load(fh)['throughput']['tf_cpu_patches_per_sec']
        if pps:
            return float(pps)
    except (OSError, ValueError, KeyError):
        pass
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            return json.load(fh)['pps']
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--cpu-probe'],
            capture_output=True, text=True, timeout=900, check=True,
            env=dict(os.environ, BENCH_DTYPE='f32'))
        pps = json.loads(out.stdout.strip().splitlines()[-1])['pps']
        with open(CACHE, 'w') as fh:
            json.dump({'pps': pps}, fh)
        return pps
    except Exception:
        return None


def _infer_model():
    import jax
    import jax.numpy as jnp
    from dl4ds_tpu.models import net_postupsampling
    # DDS_BENCH_SMOKE=1 shrinks the grid so the CPU CI smoke finishes;
    # real numbers always come from the full 128->512 config on the chip
    lr = 16 if os.environ.get('DDS_BENCH_SMOKE') else 128
    model = net_postupsampling('resnet', 'spc', scale=SCALE, n_channels=1,
                               n_aux_channels=0, lr_size=(lr, lr),
                               n_filters=N_FILTERS, n_blocks=N_BLOCKS,
                               attention=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    return model, variables, lr


def _grids_per_sec(apply_fn, variables, batch, lr=128, reps=4):
    """Median-of-5 slope-timed grids/sec for one batch size. `apply_fn`
    takes (variables, x, t) and returns (y, t_next); the chained scalar
    keeps slope_time's regions from overlapping or being elided."""
    import numpy as np
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, lr, lr, 1)), jnp.float32)

    def run_one(t):
        y, t_next = apply_fn(variables, x, t)
        return t_next, y

    t0c = jnp.float32(0.0)
    t0c, y = run_one(t0c)  # compile + warm
    force(y)

    def chunk(t):
        for _ in range(reps):
            t, y = run_one(t)
        return t, y

    dts = []
    for _ in range(5):   # median of 5 against chip run-to-run variance
        dt, t0c = slope_time(chunk, t0c, repeats=1)
        dts.append(dt)
    gps = sorted(reps * batch / d for d in dts)
    spread = {'n_runs': len(gps), 'gps_min': round(gps[0], 2),
              'gps_p25': round(gps[1], 2), 'gps_median': round(gps[2], 2),
              'gps_p75': round(gps[3], 2), 'gps_max': round(gps[4], 2)}
    return reps * batch / float(np.median(dts)), spread


def infer_bench():
    """Secondary metric: full-grid inference throughput (grids/sec) —
    BASELINE.md north-star 'grids/sec (infer)'. 128x128 LR -> 512x512 HR.
    Sweeps the serving batch size (the narrow-channel model is dispatch/
    bandwidth-bound at small batches; larger batches amortize the launch
    floor) and reports the best."""
    import jax
    import jax.numpy as jnp
    model, variables, lr = _infer_model()
    apply = jax.jit(lambda v, xb, t: (
        lambda y: (y, jnp.mean(y).astype(jnp.float32) * 0.0))(
            model.module.apply(v, xb + t, None, training=False)))
    per_batch, spreads = {}, {}
    smoke = bool(os.environ.get('DDS_BENCH_SMOKE'))
    # batch 1 is the online-serving latency point (reported as ms/grid,
    # device-side: the slope method cancels the tunnel's RPC constant)
    batches = (1, 2) if smoke else (1, 8, 32, 64)
    for batch in batches:
        gps, spread = _grids_per_sec(apply, variables, batch, lr)
        per_batch[batch] = round(gps, 2)
        spreads[batch] = spread
        print(f'# batch {batch}: {per_batch[batch]} grids/sec', flush=True)
    best = max(per_batch, key=per_batch.get)

    # int8 PTQ at the same width/grid: the model-level serving speedup the
    # README quotes, measured here so the artifact carries it with spread
    int8 = None
    if not smoke:
        import numpy as np
        from dl4ds_tpu.quantization import quantize_forward
        # calibration must be the serving batch shape (the quantized
        # replay is pinned to the traced shapes); the eager walk frees
        # dead intermediates, so batch-64 512px calibration fits HBM
        calib = jnp.asarray(np.random.default_rng(1).standard_normal(
            (best, lr, lr, 1)), jnp.float32)
        qf = quantize_forward(model, variables, calib)
        qapply = jax.jit(lambda v, xb, t: (
            lambda y: (y, jnp.mean(y).astype(jnp.float32) * 0.0))(
                qf(xb + t)))
        q_gps, q_spread = _grids_per_sec(qapply, variables, best, lr)
        int8 = {'gps': round(q_gps, 2), 'spread': q_spread,
                'speedup_vs_bf16': round(q_gps / per_batch[best], 3)}
        print(f'# int8 batch {best}: {int8["gps"]} grids/sec '
              f'({int8["speedup_vs_bf16"]}x)', flush=True)

    artifact = {
        'metric': 'infer_throughput_resnet_spc_4x_grid512',
        'value': per_batch[best],
        'unit': 'grids/sec/chip', 'vs_baseline': None,
        'batch': best,
        'definition': ('best over the serving-batch sweep'
                       + (' (earlier rounds recorded fixed batch 8 — '
                          'compare per_batch["8"])'
                          if 8 in per_batch else ' (smoke sweep)')),
        'per_batch': {str(k): v for k, v in per_batch.items()},
        'spread_per_batch': {str(k): v for k, v in spreads.items()},
        'batch1_latency_ms_device': (round(1000.0 / per_batch[1], 3)
                                     if 1 in per_batch else None),
        'int8_at_best_batch': int8,
        'backend': jax.default_backend(),
    }
    if not smoke:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'INFER.json'), 'w') as fh:
            json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact))


def serve_bench():
    """Frozen-artifact serving throughput: the jax.export StableHLO blob
    (save_serving_artifact -> load_serving_artifact round-trip through
    disk) vs the live jitted apply, same grids. Validates the serving
    path adds no overhead beyond the f32 input contract."""
    import tempfile
    import jax
    import jax.numpy as jnp
    from dl4ds_tpu.export import save_serving_artifact, load_serving_artifact
    model, variables, lr = _infer_model()
    batch = 2 if os.environ.get('DDS_BENCH_SMOKE') else 32
    with tempfile.TemporaryDirectory() as td:
        nbytes = save_serving_artifact(model, variables, td, batch=batch)
        call, _meta = load_serving_artifact(td)
    live = jax.jit(lambda v, xb, t: (
        lambda y: (y, jnp.mean(y).astype(jnp.float32) * 0.0))(
            model.module.apply(v, xb + t, None, training=False)))
    frozen = jax.jit(lambda v, xb, t: (
        lambda y: (y, jnp.mean(y).astype(jnp.float32) * 0.0))(call(xb + t)))
    live_gps, live_spread = _grids_per_sec(live, variables, batch, lr)
    frozen_gps, frozen_spread = _grids_per_sec(frozen, variables, batch, lr)
    artifact = {
        'metric': 'serve_throughput_frozen_stablehlo_grid512',
        'value': round(frozen_gps, 2), 'unit': 'grids/sec/chip',
        'vs_baseline': None, 'live_apply_gps': round(live_gps, 2),
        'frozen_spread': frozen_spread, 'live_spread': live_spread,
        'artifact_bytes': nbytes, 'batch': batch,
        'backend': jax.default_backend(),
    }
    if not os.environ.get('DDS_BENCH_SMOKE'):
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'SERVE.json'), 'w') as fh:
            json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact))


def accuracy_bench(quick=False):
    """Accuracy-parity artifact (BASELINE.json north star 'RMSE/SSIM
    parity'): train the README accuracy workload (synthetic field with
    topography-correlated fine structure, 4x downscaling, resnet_spc +
    HR static topography), run predict + metrics, and write model-vs-bicubic
    RMSE/SSIM to ACCURACY.json. `--quick` shrinks the run for CI/CPU."""
    import numpy as np
    import jax
    import dl4ds_tpu as dds
    from dl4ds_tpu.interpolation import resize2d
    from dl4ds_tpu.ops.ssim import ssim as jssim

    n, size, epochs = (128, 32, 6) if quick else (512, 96, 100)
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    # Topography with structure ABOVE the LR Nyquist (pi/scale ~ 0.785
    # rad/px at 4x): interpolation cannot reconstruct the high-frequency
    # band from the coarsened field, but the network sees the HR topography
    # as a static input and can.
    topo = (np.sin(0.21 * yy) * np.cos(0.17 * xx)
            + 0.5 * np.sin(0.53 * yy + 1.3) * np.cos(0.47 * xx)
            + 0.8 * np.sin(1.3 * yy) * np.cos(1.1 * xx)
            + 0.6 * np.sin(0.9 * xx + 0.5 * yy))
    frames = [(np.sin(0.07 * yy + 0.05 * k) * np.cos(0.09 * xx - 0.04 * k)
               + 0.4 * (1.0 + 0.5 * np.sin(0.1 * k)) * topo
               + 0.02 * rng.standard_normal((size, size)))
              for k in range(n)]
    data = np.stack(frames)[..., None].astype('float32')
    topo = topo.astype('float32')
    scaler = dds.StandardScaler(axis=None)
    data = scaler.fit_transform(data)[..., None].astype('float32')
    i1, i2 = int(n * 0.75), int(n * 0.875)

    trainer = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc',
        data_train=data[:i1], data_val=data[i1:i2], data_test=data[i2:],
        static_vars=[topo], scale=SCALE,
        patch_size=16 if quick else 32, batch_size=4 if quick else 16,
        loss='mae', epochs=epochs, n_filters=8,
        n_blocks=2 if quick else 6, attention=True,
        learning_rate=(1e-3, 1e-4), save=False, verbose=False, seed=0)
    trainer.run()

    test = data[i2:]
    y_hat = dds.predict(trainer, test, scale=SCALE, array_in_hr=True,
                        static_vars=[topo])
    # bicubic baseline: coarsen the HR truth (inter_area, the dl4ds default)
    # then re-upsample with bicubic — what a user gets without the network
    lr = np.asarray(resize2d(test, (size // SCALE, size // SCALE),
                             'inter_area'))
    y_bicubic = np.asarray(resize2d(lr, (size, size), 'bicubic'))

    import jax.numpy as jnp

    def _metrics(y):
        rmse = float(np.sqrt(np.mean((test - y) ** 2)))
        drange = float(test.max() - test.min())
        s = float(np.mean(np.asarray(jssim(
            jnp.asarray(test), jnp.asarray(y), max_val=drange))))
        return rmse, s

    model_rmse, model_ssim = _metrics(y_hat.astype('float32'))
    bic_rmse, bic_ssim = _metrics(y_bicubic.astype('float32'))
    # int8 PTQ serving of the SAME trained model (predict(quantize=)):
    # how much accuracy does the 2x-MXU-rate path give up on a real task?
    y_int8 = dds.predict(trainer, test, scale=SCALE, array_in_hr=True,
                         static_vars=[topo], quantize='int8',
                         calibration_quantile=0.999)
    int8_rmse, int8_ssim = _metrics(np.asarray(y_int8, 'float32'))
    artifact = {
        'workload': 'resnet_spc 4x + HR static topography '
                    f'({n} frames, {size}px, {epochs} epochs)',
        'platform': jax.devices()[0].platform,
        'test_loss_mae': round(float(trainer.test_loss), 6),
        'model': {'rmse': round(model_rmse, 6), 'ssim': round(model_ssim, 6)},
        'model_int8': {'rmse': round(int8_rmse, 6),
                       'ssim': round(int8_ssim, 6)},
        'bicubic': {'rmse': round(bic_rmse, 6), 'ssim': round(bic_ssim, 6)},
        'rmse_improvement': round(bic_rmse / model_rmse, 3),
    }
    out = 'ACCURACY.json' if not quick else 'ACCURACY_quick.json'
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out),
              'w') as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact))


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs skip the (slow)
    first-compile entirely."""
    try:
        import jax
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 '.jax_cache')
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def _maybe_force_cpu():
    """DDS_FORCE_CPU=1 -> run on XLA:CPU (the sandbox
    sitecustomize pins the axon TPU; env vars alone cannot
    override it)."""
    if os.environ.get('DDS_FORCE_CPU'):
        import jax
        jax.config.update('jax_platforms', 'cpu')


_TUNNEL_NOTE = None


def _tunnel_guard(probe_timeout=180):
    """The tunneled axon TPU backend can be DOWN for hours; first backend
    use then blocks ~25 min before raising UNAVAILABLE. Probe device init
    in a SUBPROCESS with a hard timeout BEFORE this process touches the
    backend; on failure fall back to XLA:CPU and record an honest note in
    the output JSON instead of hanging the driver and dying with a
    traceback. No-op when the pinned platform is not axon."""
    global _TUNNEL_NOTE
    if os.environ.get('DDS_FORCE_CPU'):
        return
    if 'axon' not in os.environ.get('JAX_PLATFORMS', 'axon'):
        return
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            capture_output=True, timeout=probe_timeout)
        ok = proc.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        import jax
        jax.config.update('jax_platforms', 'cpu')
        _TUNNEL_NOTE = ('axon TPU tunnel unavailable at bench time; '
                        'measured on XLA:CPU fallback — NOT a TPU number '
                        '(see BENCH_SUITE.json for the recorded TPU runs)')
        print(f'WARNING: {_TUNNEL_NOTE}', file=sys.stderr)


def main():
    _maybe_force_cpu()
    _tunnel_guard()
    _enable_compile_cache()
    if '--cpu-probe' in sys.argv:
        cpu_probe()
        return
    if '--infer' in sys.argv:
        infer_bench()
        return
    if '--serve' in sys.argv:
        serve_bench()
        return
    if '--accuracy' in sys.argv:
        accuracy_bench(quick='--quick' in sys.argv)
        return
    import jax
    # scan-of-steps is the TPU path; XLA:CPU pays a ~25-60x per-wrapper
    # scan cliff (CLAUDE.md) — use per-step dispatch there
    on_cpu = jax.default_backend() == 'cpu'
    pps = measure(STEPS if not on_cpu else CPU_STEPS, WARMUP,
                  use_scan=not on_cpu)
    cpu_pps = cpu_baseline()
    vs = round(pps / cpu_pps, 3) if cpu_pps else None
    out = {
        'metric': 'train_throughput_resnet_spc_4x_patch64',
        'value': round(pps, 2),
        'unit': 'patches/sec/chip',
        'vs_baseline': vs,
    }
    if _TUNNEL_NOTE:
        out['note'] = _TUNNEL_NOTE
    print(json.dumps(out))


if __name__ == '__main__':
    main()
