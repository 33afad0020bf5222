"""
ctypes bindings for the native host data path (dl4ds_host.cpp).

The shared library is built on first use with g++ (-O3 -fopenmp) and cached
next to the source; all entry points fall back to numpy when no compiler is
available, so the native path is an accelerator, never a requirement.
Build failures warn (with the compiler's stderr) instead of silently
degrading; the cache key includes a host fingerprint because the binary is
compiled with -march=native.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'dl4ds_host.cpp')
_SO = os.path.join(_HERE, 'libdl4ds_host.so')
_STAMP = _SO + '.host'
_lock = threading.Lock()
_lib = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
_F32P = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')


def _host_fingerprint():
    """Identify the CPU the cached .so was built for: -march=native code
    run on a different microarchitecture dies with SIGILL, which no
    try/except can catch — rebuild instead."""
    try:
        with open('/proc/cpuinfo') as fh:
            for line in fh:
                if line.startswith('flags'):
                    return hashlib.sha256(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:16]


def _build(fingerprint):
    # compile to a temp name and rename: publication is atomic, so a
    # concurrent process can never dlopen a partially written .so
    tmp = f'{_SO}.{os.getpid()}.tmp'
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           _SRC, '-o', tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        with open(_STAMP, 'w') as fh:
            fh.write(fingerprint)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _cache_fresh(fingerprint):
    if not os.path.exists(_SO):
        return False
    if os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        return False
    try:
        with open(_STAMP) as fh:
            return fh.read().strip() == fingerprint
    except OSError:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            fp = _host_fingerprint()
            if not _cache_fresh(fp):
                _build(fp)
            lib = ctypes.CDLL(_SO)
            lib.gather_windows_f32.argtypes = [
                _F32P, _I64P, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, _F32P]
            lib.crop_batch_f32.argtypes = [
                _F32P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, _I64P, _I64P,
                ctypes.c_int64, _F32P]
            lib.gather_crop_f32.argtypes = [
                _F32P, _I64P, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _I64P,
                _I64P, ctypes.c_int64, _F32P]
            _lib = lib
        except Exception as exc:  # noqa: BLE001 — soft fallback, but LOUD
            detail = ''
            stderr = getattr(exc, 'stderr', None)
            if stderr:
                detail = ': ' + stderr.decode(errors='replace')[-500:]
            warnings.warn(
                f'native host kernels unavailable ({exc!r}{detail}); '
                f'falling back to the slower numpy path', RuntimeWarning)
            _lib = None
        return _lib


def available():
    """True when the native library built (or was cached) successfully."""
    return _load() is not None


def _check_bounds(n, h, w, idx, ys, xs, patch, time_window):
    """The C kernels have no bounds checks (raw memcpy loops): validate
    here so bad inputs raise like the numpy path instead of reading out
    of bounds / segfaulting."""
    if idx is not None and idx.size:
        lo, hi = int(idx.min()), int(idx.max())
        if lo < 0 or hi + time_window > n:
            raise IndexError(
                f'window indices [{lo}, {hi}] + time_window={time_window} '
                f'out of bounds for {n} samples')
    for name, v, limit in (('ys', ys, h), ('xs', xs, w)):
        if v is not None and v.size:
            lo, hi = int(v.min()), int(v.max())
            if lo < 0 or hi + patch > limit:
                raise IndexError(
                    f'{name} crop origins [{lo}, {hi}] + patch={patch} out '
                    f'of bounds for size {limit}')


def gather_windows(src, idx, time_window=1):
    """out[i] = src[idx[i] : idx[i]+tw] for src [N, ...]; returns
    [B, tw, ...] (tw axis squeezed when time_window == 1)."""
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    b = idx.shape[0]
    sample_elems = int(np.prod(src.shape[1:]))
    lib = _load()
    if lib is None:
        if time_window == 1:
            return src[idx]
        win = idx[:, None] + np.arange(time_window)
        return src[win.reshape(-1)].reshape((b, time_window)
                                            + src.shape[1:])
    _check_bounds(src.shape[0], None, None, idx, None, None, 0, time_window)
    out = np.empty((b, time_window) + src.shape[1:], np.float32)
    lib.gather_windows_f32(src, idx, b, time_window, sample_elems,
                           out.reshape(-1))
    return out[:, 0] if time_window == 1 else out


def crop_batch(src, ys, xs, patch):
    """Batched square crops of src [B, (T,) H, W, C] at per-sample origins."""
    src = np.ascontiguousarray(src, np.float32)
    ys = np.ascontiguousarray(ys, np.int64)
    xs = np.ascontiguousarray(xs, np.int64)
    squeeze_t = src.ndim == 4
    if squeeze_t:
        src = src[:, None]
    b, t, h, w, c = src.shape
    lib = _load()
    if lib is None:
        out = np.empty((b, t, patch, patch, c), np.float32)
        for i in range(b):
            out[i] = src[i, :, ys[i]:ys[i] + patch, xs[i]:xs[i] + patch, :]
    else:
        _check_bounds(b, h, w, None, ys, xs, patch, 1)
        out = np.empty((b, t, patch, patch, c), np.float32)
        lib.crop_batch_f32(src.reshape(-1), b, t, h, w, c, ys, xs, patch,
                           out.reshape(-1))
    return out[:, 0] if squeeze_t else out


def gather_crop(src, idx, ys, xs, patch, time_window=1):
    """Fused window gather + crop from src [N, H, W, C]; returns
    [B, (tw,) patch, patch, C]."""
    # NOTE: does NOT force a contiguous copy of `src` when it already is
    # one (np.memmap datasets stream through untouched — the disk tier)
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    ys = np.ascontiguousarray(ys, np.int64)
    xs = np.ascontiguousarray(xs, np.int64)
    b = idx.shape[0]
    n, h, w, c = src.shape
    lib = _load()
    if lib is None:
        # per-sample strided crops: touch only the patch pages (a full
        # gather-then-crop would materialize whole frames — GB-scale on
        # the memmap disk tier this path exists to serve)
        out = np.empty((b, time_window, patch, patch, c), np.float32)
        for i in range(b):
            out[i] = src[idx[i]:idx[i] + time_window,
                         ys[i]:ys[i] + patch, xs[i]:xs[i] + patch, :]
        return out[:, 0] if time_window == 1 else out
    _check_bounds(n, h, w, idx, ys, xs, patch, time_window)
    out = np.empty((b, time_window, patch, patch, c), np.float32)
    lib.gather_crop_f32(src.reshape(-1), idx, b, time_window, h, w, c, ys,
                        xs, patch, out.reshape(-1))
    return out[:, 0] if time_window == 1 else out
