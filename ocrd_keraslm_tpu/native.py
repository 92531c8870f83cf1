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

# C++ sources ship INSIDE the package (native_src/) so pip-installed
# deployments keep the native fast paths, not just repo checkouts
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'native_src', 'stream_loader.cpp')
_LIB = None
_TRIED = False


def _sanitized() -> bool:
    """KERASLM_NATIVE_SANITIZE=1 builds the native lane with
    ASAN+UBSAN (make test-asan): the C++ parses untrusted PAGE bytes,
    so crash-fuzzing alone would miss silent out-of-bounds reads."""
    return os.environ.get('KERASLM_NATIVE_SANITIZE') == '1'


def _build_dir() -> str:
    d = os.environ.get('KERASLM_NATIVE_DIR',
                       os.path.expanduser('~/.cache/keraslm_tpu_native'))
    if _sanitized():  # keep instrumented .so out of the normal cache
        d = os.path.join(d, 'asan')
    os.makedirs(d, exist_ok=True)
    return d


def _compile(src_path: str, so_path: str, extra=()):
    """g++ to a per-pid temp file, then atomic rename: concurrent
    processes (page-parallel workers with a cold cache) must never
    CDLL a partially-written library."""
    if os.path.exists(so_path) and \
            os.path.getmtime(so_path) >= os.path.getmtime(src_path):
        return
    tmp = '%s.%d.tmp' % (so_path, os.getpid())
    flags = ['-O3']
    if _sanitized():
        # -O1 (overrides the -O3 before it) + frame pointers for
        # usable reports; recover=all would hide findings
        flags += ['-fsanitize=address,undefined',
                  '-fno-sanitize-recover=all',
                  '-fno-omit-frame-pointer', '-g', '-O1']
    subprocess.run(
        ['g++', *flags, '-shared', '-fPIC', '-std=c++17', *extra,
         src_path, '-o', tmp],
        check=True, capture_output=True)
    os.replace(tmp, so_path)


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
        _compile(_SRC, so_path)
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


_PREP_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'native_src', 'decode_prep.cpp')
_PREP_LIB = None
_PREP_TRIED = False


def load_decode_prep():
    """Compile (once) and load the native lattice-prep library; None if
    unavailable.  Loaded with PyDLL: the functions run CPython C API
    code, so the GIL must stay held."""
    global _PREP_LIB, _PREP_TRIED
    if _PREP_LIB is not None or _PREP_TRIED:
        return _PREP_LIB
    _PREP_TRIED = True
    if os.environ.get('KERASLM_NATIVE') == '0':
        return None
    if not os.path.exists(_PREP_SRC):
        return None
    so_path = os.path.join(_build_dir(), 'decode_prep.so')
    try:
        import sysconfig
        inc = sysconfig.get_paths()['include']
        _compile(_PREP_SRC, so_path, extra=('-I' + inc,))
        lib = ctypes.PyDLL(so_path)
        lib.decode_scan.restype = ctypes.py_object
        lib.decode_scan.argtypes = [ctypes.py_object, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_long]
        lib.decode_fill.restype = ctypes.py_object
        lib.decode_fill.argtypes = [
            ctypes.py_object, ctypes.c_int, ctypes.c_int,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.decode_emit.restype = ctypes.py_object
        lib.decode_emit.argtypes = [
            ctypes.py_object, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.c_double]
        _PREP_LIB = lib
    except (OSError, subprocess.CalledProcessError) as err:
        LOG.debug('native decode prep unavailable: %s', err)
        _PREP_LIB = None
    return _PREP_LIB


def decode_scan(edges: list, merge: bool, merge_max: int,
                n_alts: int = 4):
    """(n_prepared, maxlen) after run merging; None if unavailable.
    ``n_alts`` caps the alternatives considered for maxlen — the SAME
    cap decode_fill writes, so the caller's L bucket can never
    under-size a kept alternative."""
    lib = load_decode_prep()
    if lib is None:
        return None
    return lib.decode_scan(edges, int(merge), merge_max, n_alts)


def decode_fill(edges: list, merge: bool, merge_max: int, E: int,
                A: int, L: int, table: np.ndarray):
    """Fill the (E, A, L) decode arrays natively; returns
    (meta_edges, alt_chars, alt_mask, alt_conf, alt_valid) or None."""
    lib = load_decode_prep()
    if lib is None:
        return None
    table = np.ascontiguousarray(table, np.int32)
    alt_chars = np.zeros((E, A, L), np.int32)
    alt_mask = np.zeros((E, A, L), np.float32)
    alt_conf = np.zeros((E, A, L), np.float32)
    alt_valid = np.zeros((E, A), np.float32)
    meta = lib.decode_fill(
        edges, int(merge), merge_max, E, A, L,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(table)),
        alt_chars.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        alt_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alt_conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alt_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return meta, alt_chars, alt_mask, alt_conf, alt_valid


def decode_emit(meta: list, choices, path_costs, start_cost: float):
    """Native path emission ((element, te, score) tuples + entropy);
    None if the native library is unavailable."""
    lib = load_decode_prep()
    if lib is None:
        return None
    n = len(meta)
    chs = np.ascontiguousarray(choices[:n], np.int64)
    costs = np.ascontiguousarray(path_costs[:n], np.float64)
    return lib.decode_emit(
        meta, chs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(n), ctypes.c_double(start_cost))


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
    # the last stream absorbs the (n-1) % B remainder, so size the
    # window axis to ITS (longest) length; CEIL includes the masked
    # final partial window
    last_len = (n - 1) - (B - 1) * stream_len
    max_windows = max(-(-last_len // length), 1)
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
        self._closed = False

        def worker():
            try:
                for item in iterator:
                    while not self._closed:
                        try:
                            self._queue.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._closed:
                        return
            except BaseException as err:  # propagate to consumer
                self._error = err
            finally:
                # the sentinel MUST land (a dropped sentinel deadlocks
                # the consumer in get()); keep trying until the
                # consumer drains a slot or closes
                while not self._closed:
                    try:
                        self._queue.put(self._SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Release the worker thread (and the underlying generator)
        when the consumer stops iterating early — without this, a
        break out of the loop left the worker blocked in put()
        forever, pinning the generator for the rest of the process."""
        self._closed = True

    def __iter__(self):
        try:
            while True:
                item = self._queue.get()
                if item is self._SENTINEL:
                    if self._error is not None:
                        raise self._error
                    return
                yield item
        finally:
            self.close()


# ---------------------------------------------------------------------
# native PAGE-XML document pipeline (page_scan.cpp)
# ---------------------------------------------------------------------

_PAGE_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'native_src', 'page_scan.cpp')
_PAGE_LIB = None
_PAGE_TRIED = False

_I8 = ctypes.POINTER(ctypes.c_int8)
_I32 = ctypes.POINTER(ctypes.c_int32)
_I64 = ctypes.POINTER(ctypes.c_int64)
_F32 = ctypes.POINTER(ctypes.c_float)
_F64 = ctypes.POINTER(ctypes.c_double)


def load_page_scan():
    """Compile (once) and load the native PAGE scanner; None if
    unavailable.  PyDLL: returns Python objects, GIL held."""
    global _PAGE_LIB, _PAGE_TRIED
    if _PAGE_LIB is not None or _PAGE_TRIED:
        return _PAGE_LIB
    _PAGE_TRIED = True
    if os.environ.get('KERASLM_NATIVE') == '0':
        return None
    if not os.path.exists(_PAGE_SRC):
        return None
    so_path = os.path.join(_build_dir(), 'page_scan.so')
    try:
        import sysconfig
        inc = sysconfig.get_paths()['include']
        _compile(_PAGE_SRC, so_path, extra=('-I' + inc,))
        lib = ctypes.PyDLL(so_path)
        lib.page_open.restype = ctypes.py_object
        lib.page_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.page_bail.restype = ctypes.py_object
        lib.page_bail.argtypes = [ctypes.py_object]
        lib.page_counts.restype = ctypes.py_object
        lib.page_counts.argtypes = [ctypes.py_object]
        lib.page_joins.restype = ctypes.py_object
        lib.page_joins.argtypes = [ctypes.py_object]
        lib.page_arrays.restype = ctypes.c_int64
        lib.page_arrays.argtypes = [
            ctypes.py_object,
            _I8, _I32, _I8, _I8, _I64, _I64, _I8, _I64, _I32,
            _I32, _F64, _I32, _I64, _I64, _I64, _I64]
        lib.page_lattice.restype = ctypes.py_object
        lib.page_lattice.argtypes = [ctypes.py_object, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int]
        lib.page_fill.restype = ctypes.c_int64
        lib.page_fill.argtypes = [
            ctypes.py_object, _I32, ctypes.c_int64,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            _I32, _F32, _F32, _F32,
            _I8, _I32, _I32, _I32, _I32, _I32, _I32, _I32]
        try:
            # newer symbols: a stale cached .so (mtime-only rebuild
            # check) may predate them — the scan lane stays usable,
            # apply falls back to Python (hasattr check there)
            lib.page_apply.restype = ctypes.py_object
            lib.page_apply.argtypes = [
                ctypes.py_object, ctypes.c_int, _I64, _F64,
                ctypes.c_int64, ctypes.c_double]
            lib.page_emit.restype = ctypes.py_object
            lib.page_emit.argtypes = [ctypes.py_object,
                                      ctypes.py_object]
        except AttributeError:
            LOG.debug('cached page_scan.so predates page_apply; '
                      'python apply path')
        _PAGE_LIB = lib
    except (OSError, AttributeError,
            subprocess.CalledProcessError) as err:
        LOG.debug('native page scanner unavailable: %s', err)
        _PAGE_LIB = None
    return _PAGE_LIB
