"""ctypes bindings for the native wav IO library (native/wavio.cpp).

Auto-builds ``libwavio.so`` with make/g++ on first use if missing, and
degrades gracefully to the pure-python readers when no toolchain exists.
The batch call releases the GIL for the entire C++ threaded fan-out.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwavio.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wavio_read_window.restype = ctypes.c_int64
    lib.wavio_read_window.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.wavio_num_frames.restype = ctypes.c_int64
    lib.wavio_num_frames.argtypes = [ctypes.c_char_p]
    lib.wavio_read_batch.restype = ctypes.c_int64
    lib.wavio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def read_window(path: str, start: int = 0, count: int = -1) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    if count < 0:
        count = lib.wavio_num_frames(path.encode()) - start
    out = np.empty(count, np.float32)
    got = lib.wavio_read_window(
        path.encode(), start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if got < 0:
        raise IOError(f"wavio failed to read {path} (code {got})")
    return out[:got]


def num_frames(path: str) -> int:
    lib = get_lib()
    assert lib is not None
    n = lib.wavio_num_frames(path.encode())
    if n < 0:
        raise IOError(f"wavio failed to parse {path} (code {n})")
    return int(n)


def read_batch(
    paths: Sequence[str],
    starts: Sequence[int],
    count: int,
    n_threads: int = 8,
) -> np.ndarray:
    """Read len(paths) equal-length windows in parallel → [n, count]."""
    lib = get_lib()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, count), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_int64 * n)(*[int(s) for s in starts])
    c_counts = (ctypes.c_int64 * n)(*([count] * n))
    failures = lib.wavio_read_batch(
        c_paths,
        c_starts,
        c_counts,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count,
        n_threads,
    )
    if failures:
        raise IOError(f"wavio batch read: {failures}/{n} files failed")
    return out
