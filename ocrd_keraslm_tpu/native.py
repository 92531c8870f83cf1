"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; this module covers the host-side
runtime around it: the training batch builder (native/stream_loader.cpp)
and a background-thread prefetcher that overlaps host batch production
with device steps.  Everything degrades gracefully to the pure-NumPy
path when no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

LOG = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native', 'stream_loader.cpp')
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get('KERASLM_NATIVE_DIR',
                       os.path.expanduser('~/.cache/keraslm_tpu_native'))
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native loader; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get('KERASLM_NATIVE') == '0':
        return None
    if not os.path.exists(_SRC):
        return None
    so_path = os.path.join(_build_dir(), 'stream_loader.so')
    try:
        if (not os.path.exists(so_path) or
                os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                 _SRC, '-o', so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.build_stream_batches.restype = ctypes.c_int64
        lib.build_stream_batches.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except (OSError, subprocess.CalledProcessError) as err:
        LOG.debug('native loader unavailable: %s', err)
        _LIB = None
    return _LIB


def build_stream_batches(ids: np.ndarray, batch: int, length: int):
    """All (x, y, mask) stream windows for one file in one native call.

    Returns (x (n_w, B, L) int32, y, mask float32) or None if the
    native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int32)
    n = len(ids)
    if n < 2:
        return None
    B = max(1, min(batch, (n - 1) // (length + 1)))
    stream_len = (n - 1) // B
    max_windows = max(stream_len // length, 1)
    x = np.zeros((max_windows, batch, length), np.int32)
    y = np.zeros((max_windows, batch, length), np.int32)
    mask = np.zeros((max_windows, batch, length), np.float32)
    b_used = ctypes.c_int64(0)
    n_w = lib.build_stream_batches(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_int64(batch),
        ctypes.c_int64(length),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(max_windows), ctypes.byref(b_used))
    if n_w <= 0:
        return None
    return x[:n_w], y[:n_w], mask[:n_w]


class Prefetcher:
    """Background-thread batch prefetch (double buffering): the host
    builds batch t+1..t+depth while the device runs step t."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._queue: 'queue.Queue' = queue.Queue(maxsize=depth)
        self._error = None

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
            except BaseException as err:  # propagate to consumer
                self._error = err
            finally:
                self._queue.put(self._SENTINEL)
        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item
