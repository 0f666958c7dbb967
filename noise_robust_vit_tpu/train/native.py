"""ctypes bindings for the native ingest engine (``native/ingest.cc``).

The C++ library is the FFCV-native counterpart of the reference's data path
(ref examples/randomlabel.py:72-78): a persistent thread pool that decodes a
whole batch of JPEGs (libjpeg with DCT scaling) and writes crops straight
into one NHWC uint8 buffer — no per-image Python objects, no GIL handoffs,
no stack copy. Built on demand with ``g++ -O3 -shared`` (cached next to the
source); every entry point degrades gracefully to the OpenCV path when the
toolchain or libjpeg is unavailable, so the library is an accelerator, never
a dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["NativeDecodePool", "native_available", "ensure_built"]

_SRC = Path(__file__).resolve().parent.parent / "native" / "ingest.cc"
_LIB = _SRC.parent / "_libingest.so"
_lock = threading.Lock()
_lib_handle = None
_build_failed = False


def ensure_built(verbose: bool = False) -> Path | None:
    """Compile ``ingest.cc`` → ``_libingest.so`` if needed; None on failure."""
    global _build_failed
    with _lock:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
        if _build_failed:
            return None
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            str(_SRC), "-ljpeg", "-o", str(_LIB),
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:
            if verbose:
                print(f"native ingest build failed: {e}")
            _build_failed = True
            return None
        if proc.returncode != 0:
            if verbose:
                print(f"native ingest build failed:\n{proc.stderr[-2000:]}")
            _build_failed = True
            return None
        return _LIB


def _load():
    global _lib_handle
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
    path = ensure_built()
    if path is None:
        return None
    with _lock:
        if _lib_handle is None:
            lib = ctypes.CDLL(str(path))
            lib.ingest_create.restype = ctypes.c_void_p
            lib.ingest_create.argtypes = [ctypes.c_int]
            lib.ingest_destroy.argtypes = [ctypes.c_void_p]
            lib.ingest_decode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib_handle = lib
        return _lib_handle


def native_available() -> bool:
    return _load() is not None


class NativeDecodePool:
    """Batched JPEG decode through the C++ thread pool.

    ``decode_batch(paths, size, train, keys)`` returns ``(images, status)``
    with ``images`` a ``[N, size, size, 3]`` uint8 array; ``status[i] != 0``
    marks files the native path could not handle (non-JPEG, corrupt) — the
    caller decodes those through the Python path.
    """

    def __init__(self, num_threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._lib = lib
        self._pool = lib.ingest_create(int(num_threads))

    def close(self):
        if self._pool is not None:
            self._lib.ingest_destroy(self._pool)
            self._pool = None

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass

    def decode_batch(self, paths, size: int, train: bool,
                     keys=None) -> tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        out = np.empty((n, size, size, 3), np.uint8)
        status = np.empty(n, np.int32)
        arr = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in paths]
        )
        if keys is None:
            keys_np = np.zeros(n, np.uint64)
        else:
            keys_np = np.ascontiguousarray(keys, np.uint64)
        self._lib.ingest_decode_batch(
            self._pool, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(size), int(bool(train)),
            keys_np.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, status
