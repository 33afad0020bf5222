"""
ctypes bindings for the native host data path (dl4ds_host.cpp).

The shared library is built on first use with g++ (-O3 -fopenmp) and cached
next to the source; all entry points fall back to numpy when no compiler is
available, so the native path is an accelerator, never a requirement.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'dl4ds_host.cpp')
_SO = os.path.join(_HERE, 'libdl4ds_host.so')
_lock = threading.Lock()
_lib = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
_F32P = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')


def _build():
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                           < os.path.getmtime(_SRC)):
                _build()
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
        except Exception:  # noqa: BLE001 — no compiler / build failure
            _lib = None
        return _lib


def available():
    """True when the native library built (or was cached) successfully."""
    return _load() is not None


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
        out = np.empty((b, t, patch, patch, c), np.float32)
        lib.crop_batch_f32(src.reshape(-1), b, t, h, w, c, ys, xs, patch,
                           out.reshape(-1))
    return out[:, 0] if squeeze_t else out


def gather_crop(src, idx, ys, xs, patch, time_window=1):
    """Fused window gather + crop from src [N, H, W, C]; returns
    [B, (tw,) patch, patch, C]."""
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    ys = np.ascontiguousarray(ys, np.int64)
    xs = np.ascontiguousarray(xs, np.int64)
    b = idx.shape[0]
    n, h, w, c = src.shape
    lib = _load()
    if lib is None:
        win = gather_windows(src, idx, time_window)
        if time_window == 1:
            win = win[:, None]
        out = crop_batch(win, ys, xs, patch)
        return out[:, 0] if time_window == 1 else out
    out = np.empty((b, time_window, patch, patch, c), np.float32)
    lib.gather_crop_f32(src.reshape(-1), idx, b, time_window, h, w, c, ys,
                        xs, patch, out.reshape(-1))
    return out[:, 0] if time_window == 1 else out
