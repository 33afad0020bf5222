"""Minimal production HTTP server for frozen serving artifacts.

The reference's deployment story ends at a Keras SavedModel on disk
(reference: dl4ds/training/base.py:162-187 `save_results`), leaving the
serving process to TF-Serving. The TPU-native equivalent ships in the
package: `export.save_serving_artifact` freezes the forward as a
StableHLO blob, and this module serves that blob over HTTP with nothing
beyond the Python standard library — suitable as a sidecar container
entrypoint or a smoke-test harness for a real deployment.

    python -m dl4ds_tpu.serve --artifact /path/to/artifact --port 8000

Endpoints
---------
- ``GET /healthz`` — liveness + request counters (JSON).
- ``GET /meta`` — the artifact's ``serving_meta.json``.
- ``POST /predict`` — run the frozen forward. Three body encodings:
    * ``application/x-npy``: one ``.npy`` array (the model input batch);
      response is ``.npy`` bytes of the prediction.
    * ``application/x-npz``: ``np.savez`` archive with array ``data``
      and, for models with an HR-aux branch, ``aux``; response is npy.
    * ``application/json``: ``{"data": nested-list[, "aux": ...]}``;
      response is JSON ``{"prediction": nested-list, "shape": [...]}``.

Batching: artifacts exported with a symbolic batch (``batch='poly'``,
the default) accept any request batch; under dynamic micro-batching the
merged device calls are padded up to the next power of two so at most
``log2(max_batch)`` distinct programs ever compile (symbolic-batch
exports still XLA-compile once per concrete size — unpadded merges
would stutter through seconds-long compiles across the whole merge
range). Batch-pinned artifacts
(e.g. spatio-temporal models serving the fused ConvLSTM kernel, or
int8 exports — ``save_serving_artifact(quantize='int8')`` pins the
batch to the calibration shape) are padded/chunked server-side to the
pinned batch, so clients never see the constraint. Device work is serialized under a lock (one chip, one
program at a time); IO threads overlap via ThreadingHTTPServer.
"""

import argparse
import collections
import io
import json
import threading
import time

import numpy as np

__all__ = ['ModelServer', 'serve_forever', 'main']


class ModelServer:
    """Loads a serving artifact and answers prediction requests.

    Framework-independent of the HTTP layer: `predict(data, aux=None)`
    takes/returns numpy arrays and can back any transport.
    """

    def __init__(self, artifact_dir, warmup=True, batch_window_ms=0,
                 max_batch=64, pad_pow2=None, eager=False):
        from .export import load_serving_artifact
        self.call, self.meta = load_serving_artifact(artifact_dir)
        self.artifact_dir = artifact_dir
        self.batch = self.meta.get('batch')
        # symbolic-batch artifacts still XLA-compile once per CONCRETE
        # batch size; under micro-batching merged sizes vary request to
        # request, so unpadded serving would compile (seconds each) all
        # over the merge range. Padding device calls up to the next power
        # of two bounds the compile cache to log2(max_batch) programs for
        # <=2x padded compute — the same trick as TF-Serving's
        # allowed_batch_sizes. Default: on exactly when micro-batching is.
        self.pad_pow2 = (batch_window_ms > 0 if pad_pow2 is None
                         else bool(pad_pow2))
        self.lock = threading.Lock()
        self.started = time.time()
        self.n_requests = 0
        self.n_samples = 0
        self.n_device_batches = 0
        # dynamic micro-batching: when batch_window_ms > 0, concurrent
        # requests are merged into one device call (collected for up to
        # the window after the first arrival, capped at max_batch samples).
        # eager=True makes the batcher ADAPTIVE: it never waits out the
        # window when the queue is momentarily empty — merges form from
        # requests that queued up WHILE the previous device call ran
        # (the single dispatcher thread is the only device user, so the
        # device is busy exactly while _run executes). Light load then
        # pays no window latency; heavy load still merges.
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        self.eager = eager
        self._queue = collections.deque()
        self._queue_cv = threading.Condition()
        self._batcher = None
        if batch_window_ms > 0:
            self._batcher = threading.Thread(target=self._batch_loop,
                                             daemon=True)
            self._batcher.start()
        if warmup:
            self._warmup()

    # -- core ------------------------------------------------------------
    def _warmup(self):
        """Compile the frozen program before the first request lands.

        With pow2 padding on, ALSO pre-compile every padded batch size
        (1, 2, 4, ..., max_batch) so no request — however requests merge —
        ever waits on an XLA compile: the padding bounds the program set,
        and warmup exhausts it."""
        if isinstance(self.batch, int):
            sizes = [self.batch]
        elif self.pad_pow2:
            # up to the next pow2 >= max_batch: a merged batch of
            # max_batch samples pads there when max_batch isn't a pow2
            sizes = [1 << i
                     for i in range((self.max_batch - 1).bit_length() + 1)]
        else:
            sizes = [1]
        for b in sizes:
            # input_shape is the full per-sample shape: (H, W, C) for
            # spatial models, (T, H, W, C) for spatio-temporal ones.
            x = np.zeros([b] + list(self.meta['input_shape']), 'float32')
            aux = None
            if self.meta.get('aux_shape') is not None:
                aux = np.zeros([b] + list(self.meta['aux_shape']),
                               'float32')
            np.asarray(self._call(x, aux))

    def _call(self, x, aux):
        if aux is not None:
            return self.call(x, aux)
        return self.call(x)

    def predict(self, data, aux=None):
        """Run the frozen forward on a [N, H, W, C] (or model-rank) batch.

        Pads/chunks to the artifact's pinned batch when it has one; a
        symbolic-batch artifact runs the request in one call. With
        `batch_window_ms > 0`, concurrent requests of the same sample
        shape are merged into one device call (results are identical —
        the batch dim is independent).
        """
        data = np.asarray(data, 'float32')
        if len(data) == 0:
            raise ValueError('empty batch')
        if aux is not None:
            aux = np.asarray(aux, 'float32')
            if aux.ndim == len(self.meta['aux_shape']):
                aux = np.broadcast_to(aux[None], (len(data),) + aux.shape)
        if self._batcher is not None:
            return self._predict_batched(data, aux)
        with self.lock:
            self.n_requests += 1
            self.n_samples += len(data)
            return self._run(data, aux)

    def _run(self, data, aux):
        """One merged batch through the device (caller holds the lock)."""
        self.n_device_batches += 1
        if not isinstance(self.batch, int):
            n = len(data)
            pad = ((1 << (n - 1).bit_length()) - n if self.pad_pow2 else 0)
            if pad:
                data = np.concatenate([data, np.repeat(data[-1:], pad, 0)])
                if aux is not None:
                    aux = np.concatenate([aux, np.repeat(aux[-1:], pad, 0)])
            y = np.asarray(self._call(data, aux))
            return y[:n] if pad else y
        bs = self.batch
        outs = []
        for i in range(0, len(data), bs):
            xb = data[i:i + bs]
            ab = aux[i:i + bs] if aux is not None else None
            pad = bs - len(xb)
            if pad:
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
                if ab is not None:
                    ab = np.concatenate([ab, np.repeat(ab[-1:], pad, 0)])
            yb = np.asarray(self._call(xb, ab))
            outs.append(yb[:bs - pad] if pad else yb)
        return np.concatenate(outs)

    # -- dynamic micro-batching -------------------------------------------
    def _predict_batched(self, data, aux):
        item = {'data': data, 'aux': aux, 'done': threading.Event(),
                'result': None, 'error': None}
        with self._queue_cv:
            self._queue.append(item)
            self._queue_cv.notify()
        item['done'].wait()
        if item['error'] is not None:
            raise item['error']
        return item['result']

    def _batch_loop(self):
        while True:
            with self._queue_cv:
                while not self._queue:
                    self._queue_cv.wait()
                first = self._queue.popleft()
            # collect more requests for up to the window
            deadline = time.time() + self.batch_window_ms / 1000.0
            group = [first]
            n = len(first['data'])
            key = (first['data'].shape[1:], first['aux'] is None,
                   None if first['aux'] is None else first['aux'].shape[1:])
            while n < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                with self._queue_cv:
                    if not self._queue:
                        if self.eager:
                            break   # adaptive: device is idle, go now
                        self._queue_cv.wait(timeout=remaining)
                    if not self._queue:
                        break
                    nxt = self._queue[0]
                    k = (nxt['data'].shape[1:], nxt['aux'] is None,
                         None if nxt['aux'] is None
                         else nxt['aux'].shape[1:])
                    if k != key:
                        break      # different shape: leave for next group
                    self._queue.popleft()
                group.append(nxt)
                n += len(nxt['data'])
            try:
                data = (group[0]['data'] if len(group) == 1 else
                        np.concatenate([g['data'] for g in group]))
                aux = (group[0]['aux'] if group[0]['aux'] is None
                       or len(group) == 1 else
                       np.concatenate([g['aux'] for g in group]))
                with self.lock:
                    self.n_requests += len(group)
                    self.n_samples += len(data)
                    y = self._run(data, aux)
                off = 0
                for g in group:
                    g['result'] = y[off:off + len(g['data'])]
                    off += len(g['data'])
            except Exception as exc:
                for g in group:
                    g['error'] = exc
            finally:
                for g in group:
                    g['done'].set()

    def health(self):
        return {
            'status': 'ok',
            'artifact': self.artifact_dir,
            'model': self.meta.get('name'),
            'batch': self.batch,
            'quantize': self.meta.get('quantize'),
            'uptime_s': round(time.time() - self.started, 1),
            'requests': self.n_requests,
            'samples': self.n_samples,
            'device_batches': self.n_device_batches,
            'batch_window_ms': self.batch_window_ms,
            'pad_pow2': self.pad_pow2,
            'eager': self.eager,
        }


def _parse_body(body, ctype):
    """Request body -> (data, aux, json_mode)."""
    if ctype.startswith('application/json'):
        payload = json.loads(body.decode())
        data = np.asarray(payload['data'], 'float32')
        aux = payload.get('aux')
        return data, (np.asarray(aux, 'float32')
                      if aux is not None else None), True
    if ctype.startswith('application/x-npz'):
        with np.load(io.BytesIO(body)) as z:
            if 'data' not in z:
                raise ValueError("npz body must contain array 'data'")
            return z['data'], (z['aux'] if 'aux' in z else None), False
    # default: a single .npy array
    return np.load(io.BytesIO(body), allow_pickle=False), None, False


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr, 'float32'), allow_pickle=False)
    return buf.getvalue()


def _make_handler(server):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload, ctype):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), 'application/json')

        def do_GET(self):
            if self.path == '/healthz':
                return self._send_json(200, server.health())
            if self.path == '/meta':
                return self._send_json(200, server.meta)
            return self._send_json(404, {'error': f'no route {self.path}'})

        def do_POST(self):
            if self.path != '/predict':
                return self._send_json(404,
                                       {'error': f'no route {self.path}'})
            try:
                n = int(self.headers.get('Content-Length', 0))
                body = self.rfile.read(n)
                ctype = self.headers.get('Content-Type',
                                         'application/x-npy')
                data, aux, json_mode = _parse_body(body, ctype)
                y = server.predict(data, aux=aux)
            except Exception as exc:  # surface the cause to the client
                return self._send_json(400,
                                       {'error': f'{type(exc).__name__}: '
                                                 f'{exc}'})
            if json_mode:
                return self._send_json(200, {
                    'prediction': y.tolist(), 'shape': list(y.shape)})
            return self._send(200, _npy_bytes(y), 'application/x-npy')

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def make_http_server(artifact_dir, host='127.0.0.1', port=8000,
                     warmup=True, batch_window_ms=0, max_batch=64,
                     pad_pow2=None, eager=False):
    """Build (ThreadingHTTPServer, ModelServer) without starting it —
    the test harness drives the returned server on an ephemeral port."""
    from http.server import ThreadingHTTPServer
    model = ModelServer(artifact_dir, warmup=warmup,
                        batch_window_ms=batch_window_ms,
                        max_batch=max_batch, pad_pow2=pad_pow2,
                        eager=eager)
    httpd = ThreadingHTTPServer((host, port), _make_handler(model))
    return httpd, model


def serve_forever(artifact_dir, host='0.0.0.0', port=8000,
                  batch_window_ms=0, max_batch=64, pad_pow2=None,
                  eager=False):
    httpd, model = make_http_server(artifact_dir, host=host, port=port,
                                    batch_window_ms=batch_window_ms,
                                    max_batch=max_batch, pad_pow2=pad_pow2,
                                    eager=eager)
    print(f'dl4ds_tpu.serve: {model.meta.get("name")} on '
          f'http://{host}:{port} (batch={model.batch})', flush=True)
    httpd.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser(
        description='Serve a dl4ds_tpu frozen artifact over HTTP')
    ap.add_argument('--artifact', required=True,
                    help='directory written by save_serving_artifact')
    ap.add_argument('--host', default='0.0.0.0')
    ap.add_argument('--port', type=int, default=8000)
    ap.add_argument('--batch-window-ms', type=float, default=0,
                    help='dynamic micro-batching: merge concurrent '
                         'requests arriving within this window into one '
                         'device call (0 = off)')
    ap.add_argument('--max-batch', type=int, default=64,
                    help='sample cap per merged device call')
    ap.add_argument('--eager-batch', action='store_true',
                    help='adaptive micro-batching: never wait out the '
                         'window when the queue is empty — merge only the '
                         'requests that queued while the previous device '
                         'call ran (light load pays no window latency)')
    ap.add_argument('--no-pad-pow2', action='store_true',
                    help='disable padding merged symbolic-batch device '
                         'calls to the next power of two (padding bounds '
                         'request-time XLA compiles to log2(max_batch) '
                         'programs; on by default with micro-batching)')
    ap.add_argument('--platform', default=None,
                    help="force the JAX backend (e.g. 'cpu', 'tpu') — "
                         'must match a platform the artifact was '
                         'exported for')
    args = ap.parse_args(argv)
    if args.platform:
        import os as _os
        _os.environ['JAX_PLATFORMS'] = args.platform
        import jax
        jax.config.update('jax_platforms', args.platform)
    serve_forever(args.artifact, host=args.host, port=args.port,
                  batch_window_ms=args.batch_window_ms,
                  max_batch=args.max_batch,
                  pad_pow2=False if args.no_pad_pow2 else None,
                  eager=args.eager_batch)


if __name__ == '__main__':
    main()
