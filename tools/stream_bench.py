"""Data-tier throughput A/B on the headline workload (STREAM.json).

The README claims three data tiers; only the in-HBM tier has a measured
number (bench.py). This probe measures all three end-to-end through
SupervisedTrainer's OWN step programs on the headline config
(resnet_spc 4x + attention, 64px HR patches, batch 128, bf16):

  hbm_scan     BatchSynthesizer, whole epoch as ONE lax.scan program
               (the production TPU path; what bench.py times).
  hbm_step     Same fused synthesis, one jitted dispatch per step —
               isolates the scan's dispatch amortization from the data
               source, so the stream tiers compare against the same
               per-batch dispatch discipline.
  host_stream  HostStreamer over host RAM: native C++/OpenMP gather +
               crop, background prefetch thread, one device transfer and
               one jitted step per batch (data_in_hbm=False tier).
  disk_stream  HostStreamer over a read-only np.memmap: identical path,
               but the gather reads through mmap'ed disk pages — the
               dataset never loads into host RAM.

Caveat recorded in the artifact: on the tunneled chip every per-batch
host->device transfer pays the remote-RPC floor, so the streaming tiers'
numbers are LOWER bounds for a co-located TPU host (which pays PCIe/DMA,
not an SSH tunnel, per batch). The hbm_step row shows how much of the
gap is that dispatch floor rather than host synthesis cost.

    python tools/stream_bench.py            # chip run, writes STREAM.json
    DDS_BENCH_SMOKE=1 DDS_FORCE_CPU=1 python tools/stream_bench.py

Reference analogue: the TF DataGenerator (host, per-sample OpenCV) is the
ONLY tier the reference has (/root/reference/dl4ds/dataloader.py:363) —
its measured rate on this host is PARITY_TF.json's 45 patches/sec.
"""

import contextlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: force/slope helpers + tunnel guard

SMOKE = bool(os.environ.get('DDS_BENCH_SMOKE'))
BATCH = 16 if SMOKE else 128
PATCH = 32 if SMOKE else 64
SCALE = 4
N_FRAMES = 64 if SMOKE else 1024
GRID = 64 if SMOKE else 128
STEPS_LO, STEPS_HI = (2, 6) if SMOKE else (8, 24)
N_RUNS = 2 if SMOKE else 5


def _build_trainer(data, data_in_hbm):
    import jax.numpy as jnp
    from dl4ds_tpu.training import supervised
    tr = supervised.SupervisedTrainer(
        backbone='resnet', upsampling='spc', data_train=data,
        data_val=data[:2 * BATCH], data_test=data[:2 * BATCH], scale=SCALE,
        patch_size=PATCH, batch_size=BATCH, loss='mae', epochs=1,
        n_filters=8, n_blocks=2 if SMOKE else 6, attention=True,
        save=False, verbose=False, data_in_hbm=data_in_hbm,
        dtype=jnp.float32 if SMOKE else jnp.bfloat16)
    tr.setup_datagen()
    tr.setup_model()
    return tr


def _make_state(tr):
    import jax
    import jax.numpy as jnp
    from dl4ds_tpu.training import supervised
    tx = tr._build_optimizer()
    # COPY the params into the state: the step programs donate the state,
    # so seeding two tiers' states from the same tr.variables leaves the
    # second one holding deleted buffers
    bs = tr.variables.get('batch_stats')
    state = supervised.TrainState.create(
        apply_fn=tr.model.module.apply,
        params=jax.tree.map(jnp.array, tr.variables['params']),
        tx=tx, batch_stats=(jax.tree.map(jnp.array, bs)
                            if bs is not None else None))
    tr._make_steps()
    return state, jax.random.PRNGKey(0)


def _median_pps(region, state, key):
    """Median patches/sec over N_RUNS two-point slopes. `region(k, state,
    key) -> (seconds, state, key)` runs k train steps ending in a forced
    readback; the slope cancels the constant readback/RPC tail the same
    way bench.slope_time does."""
    import numpy as np
    # warm the fetch path (compile already done); MUST rethread state —
    # the step programs donate it, so the old reference is deleted
    _, state, key = region(1, state, key)
    dts = []
    attempts = 0
    while len(dts) < N_RUNS and attempts < N_RUNS + 4:
        attempts += 1
        t_lo, state, key = region(STEPS_LO, state, key)
        t_hi, state, key = region(STEPS_HI, state, key)
        dt = (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
        if dt > 0:
            dts.append(dt)
    if not dts:
        raise RuntimeError('no positive slope (RPC backlog?)')
    return float(BATCH / np.median(dts)), len(dts)


def measure_hbm(tr, scan):
    import jax
    import jax.numpy as jnp
    import numpy as np
    state, key = _make_state(tr)
    idx_pool = np.asarray(tr.ds_train.epoch_indices(
        jax.random.PRNGKey(1), steps=4 * STEPS_HI))

    if scan:
        chunk = jnp.asarray(idx_pool[:STEPS_HI], jnp.int32)
        state, losses = tr._train_many(state, chunk, key)  # compile
        bench.force(losses)
        dts = []
        for _ in range(N_RUNS):
            dt, state = bench.slope_time(
                lambda s: tr._train_many(s, chunk, key), state, repeats=1)
            dts.append(dt)
        return STEPS_HI * BATCH / float(np.median(dts)), N_RUNS

    state, loss = tr._train_step(
        state, jnp.asarray(idx_pool[0], jnp.int32), key)  # compile
    bench.force(loss)

    def region(k, state, key):
        t0 = time.perf_counter()
        loss = None
        for i in range(k):
            key, skey = jax.random.split(key)
            row = jnp.asarray(idx_pool[i % len(idx_pool)], jnp.int32)
            state, loss = tr._train_step(state, row, skey)
        bench.force(loss)
        return time.perf_counter() - t0, state, key

    return _median_pps(region, state, key)


def measure_stream(tr, streamer):
    """One jitted step per host batch — the data_in_hbm=False train loop
    (training/supervised.py:674-681) driven directly."""
    import jax
    state, key = _make_state(tr)
    streamer.sharding = tr.batch_sharding
    it = streamer.epochs(n_epochs=100_000)
    with contextlib.closing(it):
        batch = next(it)
        state, loss = tr._train_step_batch(state, batch, key)  # compile
        bench.force(loss)

        def region(k, state, key):
            t0 = time.perf_counter()
            loss = None
            for _ in range(k):
                key, skey = jax.random.split(key)
                b = {kk: (jax.device_put(v, tr.batch_sharding)
                          if v is not None else None)
                     for kk, v in next(it).items()}
                state, loss = tr._train_step_batch(state, b, skey)
            bench.force(loss)
            return time.perf_counter() - t0, state, key

        return _median_pps(region, state, key)


def main():
    bench._maybe_force_cpu()
    bench._tunnel_guard()
    bench._enable_compile_cache()
    import jax
    import numpy as np
    from dl4ds_tpu.dataloader import HostStreamer

    rng = np.random.default_rng(0)
    data = rng.standard_normal((N_FRAMES, GRID, GRID, 1)).astype('float32')

    tr_hbm = _build_trainer(data, data_in_hbm=True)
    if jax.default_backend() == 'cpu':
        hbm_scan = None  # XLA:CPU pays a ~25-60x scan-of-steps cliff
    else:
        hbm_scan, _ = measure_hbm(tr_hbm, scan=True)
        print(f'# hbm_scan: {hbm_scan:.0f} patches/s', flush=True)
    hbm_step, _ = measure_hbm(tr_hbm, scan=False)
    print(f'# hbm_step: {hbm_step:.0f} patches/s', flush=True)

    tr_st = _build_trainer(data, data_in_hbm=False)
    host_pps, _ = measure_stream(tr_st, tr_st.ds_train)
    print(f'# host_stream: {host_pps:.0f} patches/s', flush=True)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, 'data.npy')
        np.save(path, data)
        mm = np.load(path, mmap_mode='r')
        hs = HostStreamer(mm, upsampling='spc', scale=SCALE,
                          batch_size=BATCH, patch_size=PATCH,
                          interpolation='inter_area', seed=0)
        # np.ascontiguousarray returns a base-class VIEW of a contiguous
        # memmap (shares the mapping's pages); a copy would own its data
        import mmap as _mmap
        base = hs.array
        while (isinstance(base, np.ndarray)
               and not isinstance(base, np.memmap)
               and base.base is not None):
            base = base.base
        assert (not hs.array.flags['OWNDATA']
                and isinstance(base, (np.memmap, _mmap.mmap))), \
            'disk tier copied the dataset into RAM'
        disk_pps, _ = measure_stream(tr_st, hs)
    print(f'# disk_stream: {disk_pps:.0f} patches/s', flush=True)

    out = {
        'metric': 'data_tier_throughput_resnet_spc_4x_patch64',
        'unit': 'patches/sec/chip',
        'batch': BATCH, 'patch': PATCH,
        'dataset': f'{N_FRAMES}x{GRID}x{GRID}x1 float32 '
                   f'({data.nbytes / 1e6:.0f} MB)',
        'hbm_scan_pps': round(hbm_scan, 1) if hbm_scan else None,
        'hbm_step_pps': round(hbm_step, 1),
        'host_stream_pps': round(host_pps, 1),
        'disk_stream_pps': round(disk_pps, 1),
        'stream_vs_hbm_step': round(host_pps / hbm_step, 3),
        'scan_vs_step': (round(hbm_scan / hbm_step, 2) if hbm_scan
                         else None),
        'backend': jax.default_backend(),
        'note': ('per-batch host->device transfers on the tunneled chip '
                 'pay a remote-RPC floor a co-located TPU host does not; '
                 'hbm_step isolates that dispatch floor from host '
                 'synthesis cost. Reference TF DataGenerator on this '
                 'host: 45 patches/s (PARITY_TF.json).'),
    }
    if bench._TUNNEL_NOTE:
        out['note'] += ' ' + bench._TUNNEL_NOTE
    print(json.dumps(out))
    if not SMOKE:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, 'STREAM.json'), 'w') as fh:
            json.dump(out, fh, indent=1)
            fh.write('\n')


if __name__ == '__main__':
    main()
