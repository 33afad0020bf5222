#!/usr/bin/env python
"""Breadth benchmark: train throughput for all five BASELINE.md configs.

    python bench_suite.py          # writes BENCH_SUITE.json, prints a table

Unlike bench.py (the driver's single headline line), this measures every
benchmark config the baseline defines:
  1. convnet_pin supervised spatial 4x (tutorial workload)
  2. resnet_spc + channel attention, multi-predictor + static vars
  3. unet_pin (densenet-free encoder/decoder), PerfectProg
  4. recresnet_spc spatio-temporal (ConvLSTM backbone)
  5. CGAN (resnet_spc generator + two-branch discriminator)
"""

import json
import os

import numpy as np

import bench
from bench import force, slope_time

# run-to-run variance on the tunneled chip is ~±20% (docs/ROOFLINE.md);
# a single sample is weak evidence, so every config is slope-timed
# N_REPEATS times and the JSON stores median + IQR + min/max
N_REPEATS = 5


def _timed_spread(run_chunk, carry, steps, gbs):
    """Repeat the slope measurement N_REPEATS times; return
    (median dt_per_chunk, carry, spread dict in patches/sec space).

    The first repeat is discarded: even after the compile+warm chunk, the
    first timed slope occasionally lands 3-4x slow on the tunneled chip
    (transient RPC backlog — e.g. a 15k-patches/s pps_min against a 65k
    median recorded for unet_pin), which poisons min/IQR fields that exist
    precisely to show dispersion of the steady state."""
    _, carry = slope_time(run_chunk, carry, repeats=1)
    dts = []
    for _ in range(N_REPEATS):
        dt, carry = slope_time(run_chunk, carry, repeats=1)
        dts.append(dt)
    pps = sorted(steps * gbs / d for d in dts)
    spread = {
        'n_runs': N_REPEATS,
        'pps_min': round(pps[0], 2),
        'pps_p25': round(float(np.percentile(pps, 25)), 2),
        'pps_median': round(float(np.median(pps)), 2),
        'pps_p75': round(float(np.percentile(pps, 75)), 2),
        'pps_max': round(pps[-1], 2),
    }
    return float(np.median(dts)), carry, spread

# Peak bf16 matmul throughput per chip (the MXU roofline), by device kind.
_PEAK_BF16_FLOPS = {
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12, 'TPU v5e': 197e12,
    'TPU v5': 459e12, 'TPU v5p': 459e12,
    'TPU v6 lite': 918e12, 'TPU v6e': 918e12,
}


def _roofline(jitted_step, step_args, dt_per_step):
    """ms/step + two utilization views of the SINGLE-step program:

    - model_flops / mfu_pct: MATHEMATICAL matmul+conv FLOPs counted from the
      jaxpr (dl4ds_tpu.ops.flops) over the chip's bf16 peak — the scaling-
      literature MFU definition.
    - hw_flops / hw_util_pct: XLA's post-compile cost model, which on TPU
      includes MXU lanes wasted padding narrow channel counts to the native
      tiling — i.e. how busy the hardware is, padding included. For narrow
      CNNs hw_flops >> model_flops; the gap IS the padding waste.

    IMPORTANT: cost the SINGLE-step program, never the lax.scan-of-steps
    program — whether cost_analysis multiplies a loop body by its trip
    count is backend-dependent."""
    import jax
    from dl4ds_tpu.ops.flops import count_flops
    try:
        model_flops = count_flops(jitted_step, *step_args) or None
    except Exception:  # noqa: BLE001 — counting is best-effort
        model_flops = None
    try:
        cost = jitted_step.lower(*step_args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        hw_flops = cost.get('flops')
        # None (key absent) means "unknown", same as the exception path —
        # never record a fake 0.0 measurement
        hw_flops = float(hw_flops) if hw_flops else None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        hw_flops = None
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAK_BF16_FLOPS.items() if kind.startswith(k)),
                None)

    def _util(flops):
        return (round(100 * flops / dt_per_step / peak, 2)
                if flops and peak else None)

    return {
        'ms_per_step': round(dt_per_step * 1e3, 3),
        'model_flops_per_step': model_flops,
        'mfu_pct': _util(model_flops),
        'hw_flops_per_step': hw_flops,
        'hw_util_pct': _util(hw_flops),
        'device_kind': kind,
    }


def measure_supervised(name, steps=20, **kwargs):
    import jax
    import jax.numpy as jnp
    from dl4ds_tpu.training import supervised
    rng = np.random.default_rng(0)
    data = rng.standard_normal((256, 128, 128, 1)).astype('float32')
    defaults = dict(
        data_train=data, data_val=data[:64], data_test=data[:64],
        scale=4, patch_size=64, batch_size=128, loss='mae', epochs=1,
        n_filters=8, save=False, verbose=False, dtype=jnp.bfloat16)
    defaults.update(kwargs)
    tr = supervised.SupervisedTrainer(**defaults)
    tr.setup_datagen()
    tr.setup_model()
    tx = tr._build_optimizer()
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply, params=tr.variables['params'],
        tx=tx, batch_stats=tr.variables.get('batch_stats'))
    tr._make_steps()
    key = jax.random.PRNGKey(0)
    idx = jnp.asarray(np.asarray(
        tr.ds_train.epoch_indices(key, steps=2 * steps)), jnp.int32)
    state, losses = tr._train_many(state, idx[:steps], key)  # compile+warm
    force(losses)
    dt, state, spread = _timed_spread(
        lambda s: tr._train_many(s, idx[steps:], key), state, steps,
        tr.global_batch_size)
    pps = spread['pps_median']
    stats = _roofline(tr._train_step, (state, idx[0], key), dt / steps)
    mfu, hw = stats['mfu_pct'], stats['hw_util_pct']
    extras = ''.join([f', {mfu:.1f}% MFU' if mfu is not None else '',
                      f', {hw:.1f}% hw' if hw is not None else ''])
    print(f'{name}: {pps:,.0f} patches/s '
          f'[{spread["pps_p25"]:,.0f}..{spread["pps_p75"]:,.0f} IQR] '
          f'({stats["ms_per_step"]:.2f} ms/step{extras})')
    return {'patches_per_sec': pps, 'spread': spread, **stats}


def measure_cgan(name, steps=20):
    import jax
    import jax.numpy as jnp
    from flax.training import train_state
    import optax
    from dl4ds_tpu.training import cgan as cg
    from dl4ds_tpu.dataloader import BatchSynthesizer
    rng = np.random.default_rng(0)
    data = rng.standard_normal((256, 128, 128, 1)).astype('float32')
    tr = cg.CGANTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_test=data[:32], scale=4, patch_size=64, batch_size=128,
        epochs=1, save=False, verbose=False,
        generator_params=dict(n_filters=8, n_blocks=6, attention=True,
                              dtype=jnp.bfloat16),
        discriminator_params=dict(n_filters=32, n_res_blocks=4,
                                  dtype=jnp.bfloat16))
    tr.ds_train = BatchSynthesizer(
        tr.data_train, None, upsampling='spc', scale=4,
        batch_size=tr.global_batch_size, patch_size=64)
    tr.setup_model()
    # optax.flatten mirrors the trainer's production optimizer (cgan.py)
    gen_state = train_state.TrainState.create(
        apply_fn=tr.generator.module.apply, params=tr.gen_vars['params'],
        tx=optax.flatten(optax.adam(2e-4, b1=0.5)))
    disc_state = train_state.TrainState.create(
        apply_fn=tr.discriminator.module.apply, params=tr.disc_vars['params'],
        tx=optax.flatten(optax.adam(2e-4, b1=0.5)))
    tr._make_step()
    key = jax.random.PRNGKey(0)
    idx = jnp.asarray(np.asarray(
        tr.ds_train.epoch_indices(key, steps=2 * steps)), jnp.int32)
    gen_state, disc_state, losses = tr._train_many(
        gen_state, disc_state, idx[:steps], key)  # compile + warm
    force(losses)

    def chunk(states):
        g, d = states
        g, d, losses = tr._train_many(g, d, idx[steps:], key)
        return (g, d), losses

    dt, (gen_state, disc_state), spread = _timed_spread(
        chunk, (gen_state, disc_state), steps, tr.global_batch_size)
    pps = spread['pps_median']
    stats = _roofline(tr._train_step, (gen_state, disc_state, idx[0], key),
                      dt / steps)
    mfu, hw = stats['mfu_pct'], stats['hw_util_pct']
    extras = ''.join([f', {mfu:.1f}% MFU' if mfu is not None else '',
                      f', {hw:.1f}% hw' if hw is not None else ''])
    print(f'{name}: {pps:,.0f} patches/s '
          f'[{spread["pps_p25"]:,.0f}..{spread["pps_p75"]:,.0f} IQR] '
          f'({stats["ms_per_step"]:.2f} ms/step{extras})')
    return {'patches_per_sec': pps, 'spread': spread, **stats}


def main(only=None):
    """Measure all configs, or with `--only key1,key2` just those, merging
    the re-measured entries into the existing BENCH_SUITE.json."""
    bench._enable_compile_cache()
    rng = np.random.default_rng(1)
    statics = [rng.standard_normal((128, 128)).astype('float32')]
    preds = [rng.standard_normal((256, 128, 128, 1)).astype('float32')]

    configs = {
        'convnet_pin_4x': lambda: measure_supervised(
            'convnet_pin 4x (tutorial)      ', backbone='convnet',
            upsampling='pin', n_blocks=6),
        'resnet_spc_attn_aux_4x': lambda: measure_supervised(
            'resnet_spc +attn +pred +static ', backbone='resnet',
            upsampling='spc', n_blocks=6, attention=True, static_vars=statics,
            predictors_train=preds, predictors_val=[preds[0][:64]],
            predictors_test=[preds[0][:64]]),
        'unet_pin_4x': lambda: measure_supervised(
            'unet_pin (encoder/decoder)     ', backbone='unet',
            upsampling='pin', n_blocks=4),
        'recresnet_spc_4x_tw4': lambda: measure_supervised(
            'recresnet_spc time_window=4    ', backbone='resnet',
            upsampling='spc', time_window=4, n_blocks=2),
        'cgan_resnet_spc_4x': lambda: measure_cgan(
            'CGAN resnet_spc G+D            '),
        # not a BASELINE config: the same flagship workload at production
        # width (18.5M params) — the MFU column here is the meaningful
        # roofline check
        'resnet_spc_width64': lambda: measure_supervised(
            'resnet_spc production width 64 ', backbone='resnet',
            upsampling='spc', n_blocks=6, n_filters=64, attention=True),
        # spatio-temporal family at production width: the ConvLSTM
        # recurrence runs the XLA path here (the banded Pallas kernel is a
        # narrow-width design — its [W*C, 4*W*F] bands exceed VMEM above
        # F=8; dispatch_info reason 'vmem'), measured healthy at F=64
        # (CONVLSTM_SWEEP.json: 47-54% layer MFU; docs/ROOFLINE.md
        # "wide-F crossover")
        'recresnet_spc_width64': lambda: measure_supervised(
            'recresnet_spc production w64   ', backbone='resnet',
            upsampling='spc', time_window=4, n_blocks=2, n_filters=64,
            attention=True),
    }
    if only:
        unknown = set(only) - set(configs)
        if unknown:
            raise SystemExit(f'unknown configs: {sorted(unknown)}; '
                             f'choose from {sorted(configs)}')
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BENCH_SUITE.json')) as fh:
                results = json.load(fh)
        except (OSError, ValueError):
            results = {}
        for key in only:
            results[key] = configs[key]()
    else:
        results = {key: run() for key, run in configs.items()}

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BENCH_SUITE.json'), 'w') as fh:
        json.dump(results, fh, indent=2)
    print('\nwrote BENCH_SUITE.json (patches/sec/chip + ms/step + MFU, bf16, '
          'batch 128, 64px HR patches)')


if __name__ == '__main__':
    import sys
    _only = None
    if len(sys.argv) > 1 and sys.argv[1] == '--only':
        _only = ([k for k in sys.argv[2].split(',') if k]
                 if len(sys.argv) > 2 else [])
        if not _only:
            raise SystemExit('usage: bench_suite.py --only key1[,key2,...] '
                             '(a bare --only would silently run the FULL '
                             'suite and overwrite BENCH_SUITE.json)')
    main(_only)
