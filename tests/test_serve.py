"""HTTP serving tests: `dl4ds_tpu.serve` drives a frozen StableHLO
artifact end-to-end over a real (loopback, ephemeral-port) HTTP server —
the deployment front the reference leaves to TF-Serving
(reference: dl4ds/training/base.py:162-187 saves a Keras model only)."""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from dl4ds_tpu import save_serving_artifact
from dl4ds_tpu.models import net_postupsampling
from dl4ds_tpu.serve import ModelServer, make_http_server, _npy_bytes


def _artifact(tmp_path, batch='poly', aux=False):
    model = net_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                               n_aux_channels=(1 if aux else 0),
                               lr_size=(8, 8), n_filters=4, n_blocks=1,
                               attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    path = str(tmp_path / 'artifact')
    save_serving_artifact(model, variables, path, batch=batch)
    return model, variables, path


@pytest.fixture()
def served(tmp_path):
    _, _, path = _artifact(tmp_path)
    httpd, model = make_http_server(path, port=0)   # ephemeral port
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    base = f'http://127.0.0.1:{httpd.server_address[1]}'
    try:
        yield base, model
    finally:
        httpd.shutdown()
        th.join(timeout=5)


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method='POST',
                                 headers={'Content-Type': ctype})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.headers.get('Content-Type'), resp.read()


@pytest.mark.smoke
def test_http_predict_npy_roundtrip(served, rng):
    base, model = served
    x = rng.standard_normal((3, 8, 8, 1)).astype('float32')
    ctype, raw = _post(base + '/predict', _npy_bytes(x),
                       'application/x-npy')
    assert ctype == 'application/x-npy'
    import io
    y = np.load(io.BytesIO(raw))
    assert y.shape == (3, 32, 32, 1)
    # byte-identical with the in-process ModelServer path
    np.testing.assert_array_equal(y, model.predict(x))


def test_http_predict_json(served, rng):
    base, _ = served
    x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
    body = json.dumps({'data': x.tolist()}).encode()
    ctype, raw = _post(base + '/predict', body, 'application/json')
    assert ctype == 'application/json'
    out = json.loads(raw)
    assert out['shape'] == [2, 32, 32, 1]
    assert np.isfinite(np.asarray(out['prediction'])).all()


def test_http_healthz_and_meta(served):
    base, _ = served
    with urllib.request.urlopen(base + '/healthz', timeout=30) as resp:
        h = json.loads(resp.read())
    assert h['status'] == 'ok' and h['requests'] >= 0
    with urllib.request.urlopen(base + '/meta', timeout=30) as resp:
        meta = json.loads(resp.read())
    assert meta['batch'] == 'poly'


def test_http_bad_body_is_400_not_crash(served):
    base, _ = served
    req = urllib.request.Request(
        base + '/predict', data=b'not an npy', method='POST',
        headers={'Content-Type': 'application/x-npy'})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, 'expected HTTP 400'
    except urllib.error.HTTPError as err:
        assert err.code == 400
        assert 'error' in json.loads(err.read())


def test_pinned_batch_pads_and_chunks(tmp_path, rng):
    """A batch-pinned artifact serves ANY request size: 5 samples through
    a batch-2 artifact = 3 chunks, last one padded, results exact."""
    model, variables, path = _artifact(tmp_path, batch=2)
    srv = ModelServer(path)
    x = rng.standard_normal((5, 8, 8, 1)).astype('float32')
    y = srv.predict(x)
    assert y.shape == (5, 32, 32, 1)
    import jax.numpy as jnp
    y_direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    np.testing.assert_allclose(y, y_direct, atol=1e-6)


def test_npz_with_aux(tmp_path, rng):
    """Models with an HR-aux branch serve through the npz encoding."""
    model, variables, path = _artifact(tmp_path, aux=True)
    httpd, srv = make_http_server(path, port=0)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        x = rng.standard_normal((2, 8, 8, 1)).astype('float32')
        aux = rng.standard_normal(
            (2,) + tuple(srv.meta['aux_shape'])).astype('float32')
        import io
        buf = io.BytesIO()
        np.savez(buf, data=x, aux=aux)
        ctype, raw = _post(
            f'http://127.0.0.1:{httpd.server_address[1]}/predict',
            buf.getvalue(), 'application/x-npz')
        y = np.load(io.BytesIO(raw))
        assert y.shape == (2, 32, 32, 1)
        import jax.numpy as jnp
        y_direct = np.asarray(model.module.apply(
            variables, jnp.asarray(x), jnp.asarray(aux), training=False))
        np.testing.assert_allclose(y, y_direct, atol=1e-6)
    finally:
        httpd.shutdown()
        th.join(timeout=5)


def test_spatiotemporal_artifact_warmup_and_predict(tmp_path, rng):
    """Spatio-temporal (recnet) artifacts serve end-to-end: warmup must
    use the FULL per-sample shape (T, H, W, C) — a rank-3 warmup input
    crashed ModelServer at startup before the fix — and batch-pinned
    recnet artifacts pad/chunk like spatial ones."""
    from dl4ds_tpu.models import recnet_postupsampling
    model = recnet_postupsampling('resnet', 'spc', scale=4, n_channels=1,
                                  n_aux_channels=0, lr_size=(8, 8),
                                  time_window=3, n_filters=4, n_blocks=1,
                                  attention=False)
    variables = model.init(jax.random.PRNGKey(0), batch_size=1)
    path = str(tmp_path / 'artifact_st')
    save_serving_artifact(model, variables, path, batch=2)
    srv = ModelServer(path)          # warmup=True: compiles at startup
    assert tuple(srv.meta['input_shape']) == (3, 8, 8, 1)
    x = rng.standard_normal((3, 3, 8, 8, 1)).astype('float32')
    y = srv.predict(x)               # 3 samples via a batch-2 artifact
    assert y.shape == (3, 3, 32, 32, 1)
    import jax.numpy as jnp
    y_direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    np.testing.assert_allclose(y, y_direct, atol=1e-6)


def test_dynamic_microbatching_merges_concurrent_requests(tmp_path, rng):
    """With batch_window_ms > 0, concurrent same-shape requests merge
    into fewer device calls, and every caller gets exactly its own
    slice (bitwise equal to an unbatched run)."""
    model, variables, path = _artifact(tmp_path)
    srv = ModelServer(path, batch_window_ms=100, max_batch=16)
    xs = [rng.standard_normal((1, 8, 8, 1)).astype('float32')
          for _ in range(6)]
    results = [None] * 6
    start = threading.Barrier(6)

    def worker(i):
        start.wait()
        results[i] = srv.predict(xs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None for r in results)
    base = srv.n_device_batches
    import jax.numpy as jnp
    for i in range(6):
        direct = np.asarray(model.module.apply(
            variables, jnp.asarray(xs[i]), None, training=False))
        np.testing.assert_allclose(results[i], direct, atol=1e-6)
    # 6 concurrent singletons must NOT cost 6 device calls
    assert base < 6, f'no batching happened ({base} device calls)'
    assert srv.health()['requests'] == 6
    assert srv.health()['samples'] == 6


def test_pow2_padding_bounds_symbolic_batch_compiles(tmp_path, rng):
    """Micro-batched symbolic-batch serving pads each merged device call
    up to the next power of two (<=2x padded compute) so at most
    log2(max_batch) programs ever compile — unpadded, every distinct
    merged size would XLA-compile a fresh program (seconds each) at
    request time. Padding must be invisible to callers and counters."""
    model, variables, path = _artifact(tmp_path)
    srv = ModelServer(path, batch_window_ms=50, max_batch=16)
    assert srv.health()['pad_pow2'] is True
    device_sizes = []
    orig_call = srv.call
    srv.call = lambda *a: (device_sizes.append(a[0].shape[0]),
                           orig_call(*a))[1]
    x = rng.standard_normal((3, 8, 8, 1)).astype('float32')
    y = srv.predict(x)
    assert device_sizes == [4], device_sizes   # 3 -> padded to 4
    assert y.shape == (3, 32, 32, 1)
    import jax.numpy as jnp
    direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x), None, training=False))
    np.testing.assert_allclose(y, direct, atol=1e-6)
    assert srv.health()['samples'] == 3       # request samples, not padded
    # singleton fast path: batch 1 is already a power of two — no pad
    y1 = srv.predict(x[:1])
    assert device_sizes[-1] == 1 and y1.shape == (1, 32, 32, 1)
    # pad_pow2=False opts out (a client that always sends one size)
    srv2 = ModelServer(path, batch_window_ms=50, max_batch=16,
                       pad_pow2=False)
    assert srv2.health()['pad_pow2'] is False
    assert srv2.predict(x).shape == (3, 32, 32, 1)


def test_dynamic_microbatching_isolates_bad_shapes(tmp_path, rng):
    """Shape-mismatched requests are grouped separately, so a bad
    request fails ALONE (its own error) without poisoning the merged
    group of valid concurrent requests. (Frozen artifacts are spatially
    shape-pinned — only the batch dim is symbolic.)"""
    _, _, path = _artifact(tmp_path)
    srv = ModelServer(path, batch_window_ms=40, max_batch=16)
    good = rng.standard_normal((1, 8, 8, 1)).astype('float32')
    bad = rng.standard_normal((2, 16, 16, 1)).astype('float32')
    out, errs = {}, {}

    def worker(name, x):
        try:
            out[name] = srv.predict(x)
        except Exception as exc:
            errs[name] = exc

    ts = [threading.Thread(target=worker, args=('good', good)),
          threading.Thread(target=worker, args=('bad', bad)),
          threading.Thread(target=worker, args=('good2', good))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert out['good'].shape == (1, 32, 32, 1)
    assert out['good2'].shape == (1, 32, 32, 1)
    assert 'bad' in errs and 'bad' not in out


def test_eager_microbatching_merges_without_window_waits(tmp_path, rng):
    """eager=True (adaptive batching): a lone request dispatches
    immediately instead of waiting out the window, and requests that
    arrive while the device is busy still merge — every caller gets
    its exact slice."""
    model, variables, path = _artifact(tmp_path)
    # a punitive 2 s window: if eager ever waited it out, this test
    # would take >2 s per dispatch and the lone-request timing fails
    srv = ModelServer(path, batch_window_ms=2000, max_batch=16,
                      eager=True)
    assert srv.health()['eager'] is True

    import time as _time
    x0 = rng.standard_normal((1, 8, 8, 1)).astype('float32')
    t0 = _time.perf_counter()
    y0 = srv.predict(x0)
    assert _time.perf_counter() - t0 < 1.5, \
        'eager batcher waited out the window on an idle queue'
    import jax.numpy as jnp
    direct = np.asarray(model.module.apply(
        variables, jnp.asarray(x0), None, training=False))
    np.testing.assert_allclose(y0, direct, atol=1e-6)

    # concurrent burst: merging must still happen (requests queue while
    # the first dispatch holds the device)
    xs = [rng.standard_normal((1, 8, 8, 1)).astype('float32')
          for _ in range(8)]
    results = [None] * 8
    start = threading.Barrier(8)

    def worker(i):
        start.wait()
        results[i] = srv.predict(xs[i])

    base = srv.n_device_batches
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None for r in results)
    for i in range(8):
        direct = np.asarray(model.module.apply(
            variables, jnp.asarray(xs[i]), None, training=False))
        np.testing.assert_allclose(results[i], direct, atol=1e-6)
    assert srv.n_device_batches - base < 8, \
        f'no merging happened ({srv.n_device_batches - base} device calls)'
