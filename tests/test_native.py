"""Tests for the native C++ stream batch builder and the prefetcher."""
import numpy as np
import pytest

from ocrd_keraslm_tpu import native
from ocrd_keraslm_tpu.data import _stream_windows_numpy


def test_native_matches_numpy():
    lib = native.load_library()
    if lib is None:
        pytest.skip('no C++ toolchain available')
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 50, 5000).astype(np.int32)
    batch, length = 8, 16
    out = native.build_stream_batches(ids, batch, length)
    assert out is not None
    xs, ys, masks = out
    ref = list(_stream_windows_numpy(ids, len(ids), batch, length))
    assert len(xs) == len(ref)
    for w, (rx, ry, rm) in enumerate(ref):
        np.testing.assert_array_equal(xs[w], rx)
        np.testing.assert_array_equal(ys[w], ry)
        np.testing.assert_array_equal(masks[w], rm)


def test_native_short_input():
    lib = native.load_library()
    if lib is None:
        pytest.skip('no C++ toolchain available')
    ids = np.array([1], np.int32)
    assert native.build_stream_batches(ids, 8, 16) is None


def test_prefetcher_order_and_errors():
    items = list(range(100))
    assert list(native.Prefetcher(iter(items))) == items

    def boom():
        yield 1
        raise RuntimeError('boom')
    it = iter(native.Prefetcher(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
