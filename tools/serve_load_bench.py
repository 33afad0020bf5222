"""Serving latency under concurrent load (SERVE_LOAD.json).

SERVE.json proves the frozen StableHLO artifact matches live-jit
throughput on big offline batches. This probe measures what a CLIENT of
`dl4ds_tpu.serve` sees in production: per-request latency percentiles
and aggregate throughput over real loopback HTTP, for three scenarios on
the same artifact (resnet_spc 4x, symbolic batch):

  sequential   1 client, batch-1 requests back-to-back — the online
               latency floor.
  concurrent   16 clients, batch-1 requests, micro-batching OFF — the
               device lock serializes every request; tail latency is
               queueing.
  microbatch   16 clients, batch-1 requests, micro-batching ON
               (--batch-window-ms 8, max_batch 64) — concurrent requests
               merge into one device call; `device_batches` in the
               server's own counters shows the merge factor.
  eager        same, with --eager-batch: the batcher never waits out
               the window when the queue is empty — merges form only
               from requests that queued while the previous device call
               ran, so light load pays no window latency and stragglers
               never wait idle.

Caveat recorded in the artifact: every device call on the tunneled chip
pays a remote-RPC floor that a co-located TPU host does not, so absolute
latencies are upper bounds; the RELATIVE microbatch-vs-concurrent story
is the measurement.

    python tools/serve_load_bench.py              # chip, SERVE_LOAD.json
    DDS_BENCH_SMOKE=1 DDS_FORCE_CPU=1 python tools/serve_load_bench.py
"""

import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # tunnel guard + compile cache

SMOKE = bool(os.environ.get('DDS_BENCH_SMOKE'))
LR = 16 if SMOKE else 64           # LR grid; HR = 4x
N_SEQ = 8 if SMOKE else 100        # sequential requests
N_CLIENTS = 4 if SMOKE else 16
N_PER_CLIENT = 4 if SMOKE else 25
WINDOW_MS = 8.0
MAX_BATCH = 64


def _export_artifact(td):
    import jax
    import jax.numpy as jnp
    from dl4ds_tpu.export import save_serving_artifact
    from dl4ds_tpu.models import net_postupsampling
    model = net_postupsampling(
        'resnet', 'spc', scale=4, n_channels=1, n_aux_channels=0,
        lr_size=(LR, LR), n_filters=8, n_blocks=2 if SMOKE else 6,
        attention=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    save_serving_artifact(model, variables, td)   # symbolic batch
    return td


def _post_npy(url, arr):
    body = io.BytesIO()
    np.save(body, arr, allow_pickle=False)
    req = urllib.request.Request(
        url + '/predict', data=body.getvalue(),
        headers={'Content-Type': 'application/x-npy'})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as resp:
        payload = resp.read()
    dt = time.perf_counter() - t0
    y = np.load(io.BytesIO(payload), allow_pickle=False)
    return dt, y


def _percentiles(lat_s):
    ms = np.sort(np.asarray(lat_s)) * 1000.0
    return {'p50_ms': round(float(np.percentile(ms, 50)), 2),
            'p95_ms': round(float(np.percentile(ms, 95)), 2),
            'p99_ms': round(float(np.percentile(ms, 99)), 2),
            'max_ms': round(float(ms[-1]), 2)}


def _run_scenario(artifact, batch_window_ms, n_clients, n_per_client,
                  eager=False, max_batch=None):
    from dl4ds_tpu.serve import make_http_server
    httpd, model = make_http_server(
        artifact, port=0, warmup=True,
        batch_window_ms=batch_window_ms,
        max_batch=MAX_BATCH if max_batch is None else max_batch,
        eager=eager)
    url = f'http://127.0.0.1:{httpd.server_address[1]}'
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, LR, LR, 1)).astype('float32')
    try:
        _post_npy(url, x)  # warm the HTTP + fetch path
        lats = []
        errors = []
        lock = threading.Lock()

        def client(seed):
            xs = (x + np.float32(seed)).astype('float32')
            mine = []
            try:
                for _ in range(n_per_client):
                    dt, y = _post_npy(url, xs)
                    assert y.shape == (1, LR * 4, LR * 4, 1), y.shape
                    mine.append(dt)
            except Exception as exc:  # noqa: BLE001 — reported below
                with lock:
                    errors.append(repr(exc))
            with lock:
                lats.extend(mine)

        t0 = time.perf_counter()
        if n_clients == 1:
            client(0)
        else:
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(n_clients)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
        wall = time.perf_counter() - t0
        if errors:
            raise RuntimeError(f'{len(errors)} client errors: {errors[:3]}')
        stats = _percentiles(lats)
        stats['requests'] = len(lats)
        stats['throughput_req_s'] = round(len(lats) / wall, 2)
        health = model.health()
        stats['device_batches'] = health['device_batches'] - 1  # - warmup
        stats['merge_factor'] = round(
            len(lats) / max(stats['device_batches'], 1), 2)
        return stats
    finally:
        httpd.shutdown()
        httpd.server_close()


def main():
    bench._maybe_force_cpu()
    bench._tunnel_guard()
    bench._enable_compile_cache()
    import jax

    with tempfile.TemporaryDirectory() as td:
        artifact = _export_artifact(td)
        seq = _run_scenario(artifact, 0, 1, N_SEQ)
        print(f'# sequential: {seq}', flush=True)
        conc = _run_scenario(artifact, 0, N_CLIENTS, N_PER_CLIENT)
        print(f'# concurrent x{N_CLIENTS}: {conc}', flush=True)
        micro = _run_scenario(artifact, WINDOW_MS, N_CLIENTS, N_PER_CLIENT)
        print(f'# microbatch x{N_CLIENTS}: {micro}', flush=True)
        eager = _run_scenario(artifact, WINDOW_MS, N_CLIENTS, N_PER_CLIENT,
                              eager=True)
        print(f'# eager x{N_CLIENTS}: {eager}', flush=True)
        # the p99 tail of both merge modes is head-of-line blocking behind
        # a full max_batch device call; this row measures the knob
        eager16 = _run_scenario(artifact, WINDOW_MS, N_CLIENTS,
                                N_PER_CLIENT, eager=True,
                                max_batch=MAX_BATCH // 4)
        print(f'# eager max_batch={MAX_BATCH // 4}: {eager16}', flush=True)

    out = {
        'metric': 'serve_latency_under_load_resnet_spc_4x',
        'unit': 'ms per batch-1 request (loopback HTTP, end to end)',
        'lr_size': LR, 'hr_size': LR * 4,
        'clients': N_CLIENTS, 'batch_window_ms': WINDOW_MS,
        'sequential': seq,
        'concurrent': conc,
        'microbatch': micro,
        'eager_microbatch': eager,
        'eager_max_batch_16': eager16,
        'microbatch_p99_speedup': round(
            conc['p99_ms'] / micro['p99_ms'], 2),
        'microbatch_throughput_gain': round(
            micro['throughput_req_s'] / conc['throughput_req_s'], 2),
        'eager_p99_speedup': round(conc['p99_ms'] / eager['p99_ms'], 2),
        'eager_throughput_gain': round(
            eager['throughput_req_s'] / conc['throughput_req_s'], 2),
        'backend': jax.default_backend(),
        'note': ('tunneled chip: every device call pays a remote-RPC '
                 'floor a co-located host does not — absolute latencies '
                 'are upper bounds; the microbatch-vs-concurrent ratio '
                 'is the measurement. merge_factor = requests per device '
                 'dispatch (1.0 means no merging happened).'),
    }
    if bench._TUNNEL_NOTE:
        out['note'] += ' ' + bench._TUNNEL_NOTE
    print(json.dumps(out))
    if not SMOKE:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, 'SERVE_LOAD.json'), 'w') as fh:
            json.dump(out, fh, indent=1)
            fh.write('\n')


if __name__ == '__main__':
    main()
