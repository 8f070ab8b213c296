"""ctypes binding to the native multithreaded TIFF batch decoder.

Loads ``native/build/libdctiff.so`` (auto-building with ``make`` on first use
when the toolchain is present) and exposes :func:`decode_batch`. Falls back
cleanly: callers check :func:`available` and use the PIL path otherwise.

This is the framework's native data-loader tier — the reference's ingest was
single-threaded scipy ``imread`` at ~205 frames/s (``nf.py:126-130``); this
decoder saturates host cores so the device-side summary reduction, not
decode, sets ingest throughput.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libdctiff.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
                _build_failed = True
                return None
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:
                logger.warning("native TIFF loader build failed (%s); "
                               "falling back to PIL", e)
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            logger.warning("could not load %s (%s); falling back to PIL",
                           _SO_PATH, e)
            _build_failed = True
            return None
        lib.dc_tiff_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.dc_tiff_size.restype = ctypes.c_int
        lib.dc_decode_tiff_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.dc_decode_tiff_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def tiff_size(path: str):
    """(h, w) of a TIFF, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(0), ctypes.c_int(0)
    if lib.dc_tiff_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_batch(paths, height: int, width: int, nthreads: int | None = None):
    """Decode TIFF files into an (N, H, W) int16 array with a thread pool.

    # Returns
        (frames, status): status[i] == 1 marks a failed (zero-filled) frame.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native TIFF loader unavailable")
    n = len(paths)
    out = np.zeros((n, height, width), np.int16)
    status = np.zeros((n,), np.uint8)
    nthreads = nthreads or min(16, max(1, (os.cpu_count() or 2) - 1))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dc_decode_tiff_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        height, width, nthreads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, status
