"""ctypes binding for the native C++ host data-plane (native/dataplane.cc).

Builds the shared library on first use (g++ is in the image; no
pybind11 needed). Falls back cleanly: callers should check
``native_available()`` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dataplane.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libl2i_dataplane.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return None
    # Build to a per-process temp path and rename atomically: concurrent
    # builders (e.g. pytest-xdist workers hitting a stale .so) must not
    # write the same output file, and a reader must never dlopen a
    # half-written library.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-ffast-math",
        "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC, "-ljpeg", "-lpthread",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return proc.stderr
    os.replace(tmp, _LIB)
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        err = _build()
        if err is not None:
            _build_error = err
            return
        lib = ctypes.CDLL(_LIB)
        lib.l2i_load_image.restype = ctypes.c_int
        lib.l2i_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.l2i_load_batch.restype = ctypes.c_int
        lib.l2i_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.l2i_shuffle.restype = None
        lib.l2i_shuffle.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
        ]
        _lib = lib


def native_available() -> bool:
    _load()
    return _lib is not None


def load_image(path: str, out_size: int, flip: bool = False) -> np.ndarray:
    """Decode+resize+normalize one JPEG -> (s, s, 3) float32 in [-1, 1]."""
    _load()
    assert _lib is not None, _build_error
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = _lib.l2i_load_image(
        path.encode(), out_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out


def load_batch(
    paths: list[str], out_size: int, flips: list[bool], threads: int = 8
) -> np.ndarray:
    """Parallel decode of a whole batch -> (n, s, s, 3) float32 in [-1, 1]."""
    _load()
    assert _lib is not None, _build_error
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flips = (ctypes.c_int * n)(*[int(f) for f in flips])
    failures = _lib.l2i_load_batch(
        c_paths, n, out_size, c_flips,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} failures")
    return out


def shuffle_indices(seed: int, n: int) -> np.ndarray:
    _load()
    assert _lib is not None, _build_error
    out = np.empty(n, np.int64)
    _lib.l2i_shuffle(seed, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
