"""Concurrent-serving stress tests (VERDICT r3 #3).

The serving contract this build claims (vs the reference's
``max_workers = 1`` single-thread pin,
/root/reference/ocrd_keraslm/wrapper/rate.py:65): multiple ``Rater``
instances may decode and score CONCURRENTLY from multiple threads of
one process.  The shared mutable state exercised here:

* the process-wide device-weight cache ``rater._DECODE_WCACHE``
  (lock-guarded OrderedDict keyed by model-file fingerprint,
  rater.py:70-77) — including forced evictions (more distinct model
  files than the size-4 cap) and a mid-flight re-save + re-load that
  invalidates one fingerprint while other threads decode;
* the cyclic-GC pause/restore nesting of ``@_gc_paused`` decode entry
  points (gc.disable/enable is process-global: one thread's exit
  re-enables the collector while another is still inside — safe by
  design, asserted restored at the end);
* jit dispatch and the per-Rater compiled-shape caches under
  concurrent first-use.

Every concurrent result must equal the serial reference bit-for-bit:
beam decode and scoring are deterministic functions of (weights,
input), so ANY divergence is a race.
"""
import gc
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import networkx as nx

from ocrd_keraslm_tpu import rater as rater_mod
from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper.page import TextEquivType

from helpers import train_tiny_model

N_MODELS = 5  # one more than the _DECODE_WCACHE cap -> evictions
N_THREADS = 8
N_ROUNDS = 3


def _make_graph(seed, n_words=12):
    """Deterministic linear lattice with ambiguous glyphs."""
    rng = np.random.default_rng(seed)
    chars = 'abcd '
    g = nx.DiGraph()
    g.add_node(0)
    node = 0
    for w in range(n_words):
        wlen = int(rng.integers(2, 6))
        for j in range(wlen):
            if j == 0:
                tes = [TextEquivType(Unicode=chars[int(rng.integers(4))],
                                     conf=float(rng.uniform(0.6, 0.95)),
                                     index=i) for i in range(3)]
            else:
                tes = [TextEquivType(Unicode=chars[int(rng.integers(4))],
                                     conf=0.95, index=0)]
            g.add_edge(node, node + 1, element='w%d_c%d' % (w, j),
                       alternatives=tes)
            node += 1
        g.add_edge(node, node + 1, element='s%d' % w,
                   alternatives=[TextEquivType(Unicode=' ', conf=1.0,
                                               index=0)])
        node += 1
    return g


@pytest.fixture(scope='module')
def serving_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp('serving')
    paths = []
    for i in range(N_MODELS):
        p = str(d / ('model_%d.h5' % i))
        # distinct corpora -> distinct weights -> distinguishable
        # outputs (a cache mix-up would visibly cross-contaminate)
        train_tiny_model(p, ('abcd ' if i % 2 else 'dcba ') * 300,
                         steps=120 + 20 * i)
        paths.append(p)
    raters = []
    for p in paths:
        r = Rater()
        r.load_config(p)
        r.stateful, r.incremental = False, True
        r.configure()
        r.load_weights(p)
        raters.append(r)
    docs = [[_make_graph(100 * i + j) for j in range(3)]
            for i in range(N_MODELS)]
    return paths, raters, docs


def _decode_result(r, graphs):
    out = r.rate_best_batch(graphs, beam_width=4)
    return [(tuple((te.Unicode, float(score))
                   for _, te, score in path), float(ent))
            for path, ent in out]


def _score_result(r):
    return tuple(r.rate('abcd abca', None))


def test_concurrent_raters_match_serial(serving_setup):
    paths, raters, docs = serving_setup
    # serial reference pass (also warms the compiled-shape caches so
    # the threaded pass stresses dispatch, not one-time compiles; a
    # SECOND serial pass pins that the results are stable at all)
    serial_decode = [_decode_result(r, docs[i])
                     for i, r in enumerate(raters)]
    serial_score = [_score_result(r) for r in raters]
    assert serial_decode == [_decode_result(r, docs[i])
                             for i, r in enumerate(raters)]

    # eviction pressure really happens: 5 fingerprints, cap 4
    assert len(rater_mod._DECODE_WCACHE) <= 4

    errors = []
    results = {}

    def decode_task(i, rep):
        try:
            results[('d', i, rep)] = _decode_result(raters[i], docs[i])
        except Exception as e:  # pragma: no cover
            errors.append(('decode', i, rep, e))

    def score_task(i, rep):
        try:
            results[('s', i, rep)] = _score_result(raters[i])
        except Exception as e:  # pragma: no cover
            errors.append(('score', i, rep, e))

    stop_reload = threading.Event()

    def reload_task():
        # mid-flight fingerprint invalidation: re-save model 0 (new
        # mtime -> new fingerprint) and re-load its weights while the
        # other threads decode through the shared cache
        r0, p0 = raters[0], paths[0]
        while not stop_reload.is_set():
            r0.save(p0 + '.tmp')
            os.replace(p0 + '.tmp', p0)
            r0.load_weights(p0)
            time.sleep(0.01)

    with ThreadPoolExecutor(N_THREADS) as ex:
        reloader = threading.Thread(target=reload_task, daemon=True)
        reloader.start()
        try:
            futs = []
            for rep in range(N_ROUNDS):
                for i in range(N_MODELS):
                    futs.append(ex.submit(decode_task, i, rep))
                    futs.append(ex.submit(score_task, i, rep))
            for f in futs:
                f.result(timeout=300)
        finally:
            stop_reload.set()
            reloader.join(timeout=30)

    assert not errors, errors
    for (kind, i, rep), got in results.items():
        want = serial_decode[i] if kind == 'd' else serial_score[i]
        assert got == want, (kind, i, rep)
    # the GC pause/restore nesting left the collector enabled
    assert gc.isenabled()


def test_wcache_eviction_and_refill_serial_identity(serving_setup):
    """Forced evictions + re-fill cycles leave results identical:
    cycling all 5 models (cap 4) repeatedly must re-stage weights
    without cross-contaminating cache entries."""
    paths, raters, docs = serving_setup
    first = [_decode_result(r, docs[i]) for i, r in enumerate(raters)]
    for _ in range(3):
        again = [_decode_result(r, docs[i])
                 for i, r in enumerate(raters)]
        assert again == first
    with rater_mod._DECODE_WCACHE_LOCK:
        assert len(rater_mod._DECODE_WCACHE) <= 4
