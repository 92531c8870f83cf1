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


def test_native_decode_prep_matches_python():
    """The C++ lattice prep (scan + fill) must reproduce the Python
    _prepare_decode_edges + _fill_decode_arrays results exactly:
    run merging, truncation, conf bits, unmapped chars, metadata."""
    import numpy as np
    import pytest
    from ocrd_keraslm_tpu import native
    from ocrd_keraslm_tpu.rater import DECODE_MERGE_MAX, Rater, _bucket
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType

    if native.load_decode_prep() is None:
        pytest.skip('native decode prep unavailable')

    r = Rater()
    r.vocab.grow(list('abcdefgh '))

    def te(u, conf):
        return TextEquivType(Unicode=u, conf=conf)

    edges = [
        # run of single-alternative edges (merges up to 8 chars)
        {'element': 'e0', 'alternatives': [te('ab', 0.9)]},
        {'element': 'e1', 'alternatives': [te('cde', 0.5)]},
        {'element': 'e2', 'alternatives': [te('fgh', None)]},
        {'element': 'e3', 'alternatives': [te('a', 0.7)]},  # overflows
        # multi-alternative edge with unmapped char + empty string
        {'element': 'e4', 'alternatives': [
            te('ab', 0.8), te('xq', 0.3), te('', 0.2)]},
        # long alternative (truncation at L) + >4 alternatives
        {'element': 'e5', 'alternatives': [
            te('abcdefgh' * 3, 0.9), te('b', 0.6), te('c', 0.5),
            te('d', 0.4), te('e', 0.3)]},
        # another run after the multi-alt edges
        {'element': 'e6', 'alternatives': [te(' ', 1.0)]},
        {'element': 'e7', 'alternatives': [te('gh', 0.95)]},
    ]

    # python reference
    prepared = r._prepare_decode_edges([dict(e) for e in edges])
    maxlen_py = max(max((len(ids) for ids in pe['alt_ids']),
                        default=1) for pe in prepared)
    A, L = 4, _bucket(max(maxlen_py, 1), (1, 2, 4, 8, 16, 32, 64))
    E = _bucket(len(prepared), (64, 256, 1024))
    ref = r._fill_decode_arrays(prepared, E, A, L)

    # native
    n_prep, maxlen = native.decode_scan(edges, True, DECODE_MERGE_MAX)
    assert n_prep == len(prepared)
    assert maxlen == maxlen_py
    meta, ac, am, acf, av = native.decode_fill(
        edges, True, DECODE_MERGE_MAX, E, A, L, r.vocab._table())
    np.testing.assert_array_equal(ac, ref[0])
    np.testing.assert_array_equal(am, ref[1])
    np.testing.assert_allclose(acf, ref[2], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(av, ref[3])
    assert len(meta) == len(prepared)
    for m, pe in zip(meta, prepared):
        assert (m['parts'] is None) == (pe['parts'] is None)
        assert m['alts'] is pe['alts'] or \
            [t.Unicode for t in m['alts']] == \
            [t.Unicode for t in pe['alts']]
        if m['parts'] is not None:
            assert [(p[0], p[1].Unicode, p[2]) for p in m['parts']] == \
                [(p[0], p[1].Unicode, p[2]) for p in pe['parts']]
        else:
            assert m['element'] == pe['element']


def test_native_decode_prep_end_to_end_parity():
    """Whole-document device decode must give identical paths with the
    native prep and the Python prep."""
    import numpy as np
    import pytest
    import jax
    import networkx as nx
    from ocrd_keraslm_tpu import native
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.rater import Rater
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType

    if native.load_decode_prep() is None:
        pytest.skip('native decode prep unavailable')

    r = Rater()
    chars = list('abcdefgh ')
    r.vocab.grow(chars)
    r.width, r.depth, r.length = 16, 2, 32
    r.voc_size = len(r.vocab)
    r.cfg = LMConfig(width=16, depth=2, length=32,
                     voc_size=len(r.vocab), stateful=True,
                     variable_length=False)
    r.params = init_params(r.cfg, jax.random.PRNGKey(1))
    r.status = 2
    r.fused_decode = True

    rng = np.random.default_rng(5)
    g = nx.DiGraph()
    g.add_node(0)
    for e in range(40):
        if e % 3 == 0:  # single-alternative (merging) edges
            tes = [TextEquivType(Unicode=chars[rng.integers(8)],
                                 conf=0.9)]
        else:
            tes = [TextEquivType(Unicode=chars[rng.integers(8)],
                                 conf=float(c), index=i)
                   for i, c in enumerate(rng.uniform(0.2, 1, 3))]
        g.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)

    def run(disable_native):
        import ocrd_keraslm_tpu.native as nat
        saved = nat._PREP_LIB, nat._PREP_TRIED
        if disable_native:
            nat._PREP_LIB, nat._PREP_TRIED = None, True
        try:
            pending, tb = r.rate_best_device_begin(g, 0, 40,
                                                   beam_width=8)
            pending = r.fetch_pendings([pending])[0]
            return r.rate_best_device_finish(pending)
        finally:
            nat._PREP_LIB, nat._PREP_TRIED = saved

    path_n, ent_n = run(False)
    path_p, ent_p = run(True)
    assert abs(ent_n - ent_p) < 1e-4
    assert [(e, t.Unicode, round(s, 5)) for e, t, s in path_n] == \
        [(e, t.Unicode, round(s, 5)) for e, t, s in path_p]


def test_native_multiblock_walk_strides_match_python():
    """Regression: chained single-document blocks have DIVERGENT row
    strides between the two fill producers — the native whole-doc fill
    emits E_MAX rows per block, the Python fill buckets the last
    block's real length — and _walk_traceback must account rows from
    the fetched blocks themselves (rater.py).  Forces E_MAX=16 via the
    _E_BUCKETS override so 40 edges chain 3 blocks (native strides
    16/16/16 vs Python 16/16/8)."""
    import numpy as np
    import pytest
    import jax
    import networkx as nx
    from ocrd_keraslm_tpu import native
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.rater import Rater
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType

    if native.load_decode_prep() is None:
        pytest.skip('native decode prep unavailable')

    r = Rater()
    chars = list('abcdefgh ')
    r.vocab.grow(chars)
    r.width, r.depth, r.length = 16, 2, 32
    r.voc_size = len(r.vocab)
    r.cfg = LMConfig(width=16, depth=2, length=32,
                     voc_size=len(r.vocab), stateful=True,
                     variable_length=False)
    r.params = init_params(r.cfg, jax.random.PRNGKey(2))
    r.status = 2
    r.fused_decode = True
    r._E_BUCKETS = (8, 16)  # instance override: tiny chained blocks

    rng = np.random.default_rng(11)
    g = nx.DiGraph()
    g.add_node(0)
    for e in range(40):
        # 3-alternative edges everywhere defeat run merging, so the
        # prepared edge count stays 40 (> 2 blocks of 16)
        tes = [TextEquivType(Unicode=chars[rng.integers(8)],
                             conf=float(c), index=i)
               for i, c in enumerate(rng.uniform(0.2, 1, 3))]
        g.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)

    def run(disable_native):
        import ocrd_keraslm_tpu.native as nat
        saved = nat._PREP_LIB, nat._PREP_TRIED
        if disable_native:
            nat._PREP_LIB, nat._PREP_TRIED = None, True
        try:
            pending, tb = r.rate_best_device_begin(g, 0, 40,
                                                   beam_width=8)
            assert pending[0] == 'blocks', pending[0]
            pending = r.fetch_pendings([pending])[0]
            return r.rate_best_device_finish(pending)
        finally:
            nat._PREP_LIB, nat._PREP_TRIED = saved

    path_n, ent_n = run(False)
    path_p, ent_p = run(True)
    assert abs(ent_n - ent_p) < 1e-4
    assert [(e, t.Unicode, round(s, 5)) for e, t, s in path_n] == \
        [(e, t.Unicode, round(s, 5)) for e, t, s in path_p]
    assert len(path_n) == 40


def test_prefetcher_sentinel_lands_with_slow_consumer():
    """A fast producer must not drop the end-of-stream sentinel when
    the queue is full (that deadlocked the consumer in get())."""
    import threading
    import time

    from ocrd_keraslm_tpu.native import Prefetcher

    got = []

    def consume():
        for x in Prefetcher(iter(range(10))):
            time.sleep(0.02)   # consumer slower than producer
            got.append(x)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=20)
    assert not t.is_alive(), 'Prefetcher consumer deadlocked'
    assert got == list(range(10))


def test_prefetcher_close_releases_worker():
    """Breaking out of iteration must release the worker thread."""
    from ocrd_keraslm_tpu.native import Prefetcher

    def gen():
        for i in range(1000):
            yield i

    p = Prefetcher(gen())
    for x in p:
        if x == 3:
            break
    p.close()
    p._thread.join(timeout=10)
    assert not p._thread.is_alive()


def test_native_decode_emit_matches_python():
    """The C++ path emission must reproduce _emit_path exactly: merged
    runs expand with a uniform score, unmerged edges score the chosen
    alternative, scores clamp at 1.0, entropy = last cost - start."""
    import ocrd_keraslm_tpu.native as nat
    from ocrd_keraslm_tpu.rater import Rater
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType

    if nat.load_decode_prep() is None:
        pytest.skip('native decode prep unavailable')

    def te(u, conf):
        return TextEquivType(Unicode=u, conf=conf)

    a1, a2, a3 = te('ab', 0.9), te('cde', 0.5), te('x', 0.7)
    meta = [
        {'alts': [a1], 'element': None,
         'parts': [('e0', a1, 2), ('e1', te('q', 0.1), 1)]},
        {'alts': [a2, a3], 'parts': None, 'element': 'el2'},
        # out-of-range choice falls back to the last alternative
        {'alts': [a3], 'parts': None, 'element': 'el3'},
        # negative diff (cost decreased): score clamps at 1.0
        {'alts': [a1], 'parts': None, 'element': 'el4'},
    ]
    choices = [0, 1, 5, 0]
    costs = [3.0, 7.5, 9.0, 8.5]
    r = Rater()
    native_out = nat.decode_emit(meta, choices, costs, 1.0)
    real = nat.decode_emit
    nat.decode_emit = lambda *a, **k: None  # force the Python fallback
    try:
        py_out = r._emit_path(meta, choices, costs, 1.0)
    finally:
        nat.decode_emit = real
    assert native_out[1] == py_out[1]
    assert len(native_out[0]) == len(py_out[0])
    for (el_n, te_n, sc_n), (el_p, te_p, sc_p) in zip(native_out[0],
                                                      py_out[0]):
        assert el_n == el_p
        assert te_n is te_p
        assert sc_n == sc_p
    assert native_out[0][-1][2] == 1.0  # clamped
