"""Tests of the on-device beam engines against the host/parity paths."""
import numpy as np
import pytest

from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper.page import TextEquivType

import networkx as nx

from helpers import train_tiny_model


@pytest.fixture(scope='module')
def overfit_rater(tmp_path_factory):
    path = tmp_path_factory.mktemp('m') / 'lm.h5'
    model, nll = train_tiny_model(str(path), 'abcd ' * 400, steps=400)
    r = Rater()
    r.load_config(model)
    r.stateful = False
    r.incremental = True
    r.configure()
    r.load_weights(model)
    return r


def _toy_graph(words, alternatives=None):
    """Linear graph of words with spaces; ``alternatives``:
    {(word_i, char_i): [(char, conf), ...]}."""
    graph = nx.DiGraph()
    graph.add_node(0)
    node = 0
    for wi, word in enumerate(words):
        if wi > 0:
            graph.add_edge(node, node + 1, element=None,
                           alternatives=[TextEquivType(Unicode=' ',
                                                       conf=1.0)])
            node += 1
        for ci, char in enumerate(word):
            alts = (alternatives or {}).get((wi, ci))
            tes = ([TextEquivType(Unicode=c, conf=cf, index=i)
                    for i, (c, cf) in enumerate(alts)] if alts
                   else [TextEquivType(Unicode=char, conf=0.95,
                                       index=0)])
            graph.add_edge(node, node + 1,
                           element='w%d_c%d' % (wi, ci),
                           alternatives=tes)
            node += 1
    return graph, 0, node


def test_device_generate_matches_host(overfit_rater):
    r = overfit_rater
    host = r._generate_host('abcd ab', 6, variants=1)
    from ocrd_keraslm_tpu.ops.beam_device import generate_beam
    dev = generate_beam(r, 'abcd ab', 6, None, 1)
    assert dev and host
    # an overfit model must continue the pattern identically
    assert dev[0] == host[0]
    assert dev[0] == 'bcd abc'[:len(dev[0])]


def test_generate_batch_matches_single(overfit_rater):
    """Multi-stream generation (one vmapped dispatch) must return the
    same string per prompt as the single-prompt path."""
    r = overfit_rater
    prompts = ['abcd ab', 'ab', 'abcd abcd a']
    singles = [r.generate(p, 6)[0] for p in prompts]
    batch = r.generate_batch(prompts, 6)
    assert batch == singles


def test_device_decode_picks_lm_path(overfit_rater):
    r = overfit_rater
    graph, start, end = _toy_graph(
        ['abcd', 'abcd'],
        alternatives={(0, 2): [('x', 0.92), ('c', 0.90)],
                      (1, 1): [('y', 0.92), ('b', 0.90)]})
    path, entropy, tb = r.rate_best_device(
        graph, start, end, lm_weight=0.8, beam_width=4)
    decoded = ''.join(te.Unicode for _, te, _ in path)
    assert decoded == 'abcd abcd'
    assert entropy > 0
    for _, te, score in path:
        assert 0 < score <= 1


def test_device_decode_matches_host_choice(overfit_rater):
    """Device and host decoders must choose the same path."""
    r = overfit_rater
    alternatives = {(0, 1): [('b', 0.6), ('d', 0.9)],
                    (1, 3): [('d', 0.5), ('a', 0.95)]}
    g1, s1, e1 = _toy_graph(['abcd', 'abcd'],
                            alternatives=alternatives)
    g2, s2, e2 = _toy_graph(['abcd', 'abcd'],
                            alternatives=alternatives)
    path_dev, _, _ = r.rate_best_device(g1, s1, e1, lm_weight=0.7,
                                        beam_width=4)
    result_host, _, tb = r.rate_best(g2, s2, e2, lm_weight=0.7,
                                     beam_width=4)
    # host path covers the previous graph only after next_path against
    # empty traceback: flush to get full path
    result_host2, _, _ = r.next_path(tb[0], ([], tb[1]))
    host_all = result_host + result_host2
    dev_str = ''.join(te.Unicode for _, te, _ in path_dev)
    host_str = ''.join(te.Unicode for _, te, _ in host_all)
    assert dev_str == host_str


def test_device_decode_block_chaining(overfit_rater):
    """Pages longer than one edge block (1024) chain blocks through the
    device-resident carry; the host traceback stays exact across the
    block boundary."""
    r = overfit_rater
    words = ['abcd'] * 225  # 225*4 + 224 spaces = 1124 edges > 1024
    alternatives = {(3, 2): [('x', 0.92), ('c', 0.90)],
                    (220, 1): [('q', 0.92), ('b', 0.90)]}
    g, s, e = _toy_graph(words, alternatives=alternatives)
    path, entropy, _ = r.rate_best_device(g, s, e, lm_weight=0.8,
                                          beam_width=4)
    decoded = ''.join(te.Unicode for _, te, _ in path)
    assert decoded == ' '.join(words)
    assert len(path) == 225 * 4 + 224
    assert np.isfinite(entropy) and entropy > 0


def test_device_decode_cross_page_carry(overfit_rater):
    """The final beam of page 1 conditions page 2 (state carry)."""
    r = overfit_rater
    g1, s1, e1 = _toy_graph(['abcd'])
    path1, ent1, tb = r.rate_best_device(g1, s1, e1, beam_width=4)
    # page 2 starts mid-pattern: with carry, ' abcd' continues 'abcd'
    g2, s2, e2 = _toy_graph(['abcd'])
    path2, ent2, tb2 = r.rate_best_device(g2, s2, e2,
                                          device_traceback=tb,
                                          beam_width=4)
    assert ''.join(te.Unicode for _, te, _ in path2) == 'abcd'
    # entropy of page 2 should reflect conditioning (finite, positive)
    assert np.isfinite(ent2) and ent2 > 0


def test_device_generate_context_matches_host(overfit_rater):
    """Non-zero context variables are folded into the layer-0 bias on
    the device path; the host path feeds them per step — both must
    condition identically."""
    r = overfit_rater
    from ocrd_keraslm_tpu.ops.beam_device import generate_beam
    host = r._generate_host('abcd ab', 6, context=[3], variants=1)
    dev = generate_beam(r, 'abcd ab', 6, [3], 1)
    assert dev and host
    assert dev[0] == host[0]


def _path_cost(rater, path, lm_weight=0.5):
    """Exact cost of a decoded path under the SHARED objective both
    engines optimize: lm_weight * -log2 p_LM(char | full prefix from
    the newline context) + (1-lm_weight) * -log2 conf, summed over
    chars.  Used to compare decoders without trusting either's own
    entropy bookkeeping."""
    text = ''.join(te.Unicode for _, te, _ in path)
    probs = rater.rate('\n' + text)
    lm_bits = -np.sum(np.log2(np.maximum(probs[1:], 1e-30)))
    conf_bits = 0.0
    for _, te, _ in path:
        conf = te.conf if te.conf is not None else 1.0
        conf_bits += -np.log2(max(conf, 1e-30)) * len(te.Unicode)
    return lm_weight * float(lm_bits) + (1 - lm_weight) * conf_bits


def test_wide_beam_near_tie_diversity(overfit_rater):
    """Adversarial near-tie lattices (the regime the reference's
    history clustering exists for, rating.py:887-916): the device
    decoder's exact per-edge top-k must find paths at least as good as
    the host engine WITH clustering, at wide beams.  This is the
    quality assertion that exact top-k subsumes clustering — not an
    argument."""
    r = overfit_rater
    rng = np.random.default_rng(42)
    trained = 'abcd '
    for trial in range(5):
        # every edge offers the LM-correct char among equal-confidence
        # confusions: OCR evidence is a pure tie, only LM state
        # history separates hypotheses -> near-duplicate hypotheses
        # crowd a beam without diversity
        graph = nx.DiGraph()
        graph.add_node(0)
        n_edges = 18
        for e in range(n_edges):
            correct = trained[e % len(trained)]
            pool = [c for c in 'abcd ' if c != correct]
            wrong = rng.choice(pool, size=3, replace=False)
            tes = [TextEquivType(Unicode=c, conf=0.5, index=i)
                   for i, c in enumerate([correct] + list(wrong))]
            rng.shuffle(tes)
            for i, te in enumerate(tes):
                te.index = i
            graph.add_edge(e, e + 1, element='g%d' % e,
                           alternatives=tes)

        for beam in (16, 32):
            _, _, tb = r.rate_best(
                graph, 0, n_edges, beam_width=beam,
                beam_clustering_dist=5)
            # flush the lock-in (reference: last page's own best path)
            host_path, _, _ = r.next_path(tb[0], ([], tb[1]))
            dev_path, _, _ = r.rate_best_device(
                graph, 0, n_edges, beam_width=beam)
            host_cost = _path_cost(r, host_path)
            dev_cost = _path_cost(r, dev_path)
            assert dev_cost <= host_cost + 1e-3, (
                'trial %d beam %d: device %.4f bits vs host+clustering '
                '%.4f bits' % (trial, beam, dev_cost, host_cost))


def test_device_generate_variants_match_host(overfit_rater):
    """variants>1 exercises the device multi-variant traceback
    (ops/beam_device.generate_beam fetches the full backpointer
    matrices and reconstructs the k cheapest paths): strings AND
    order must match the host beam."""
    from ocrd_keraslm_tpu.ops.beam_device import generate_beam
    r = overfit_rater
    host = r._generate_host('abcd ab', 6, variants=3)
    dev = generate_beam(r, 'abcd ab', 6, None, 3)
    assert len(host) >= 2 and len(dev) == len(host)
    assert dev == host


def test_host_hypothesis_states_are_owned(overfit_rater):
    """Review regression: host-beam hypothesis states must be OWNED
    copies, not views — a view pins its whole (D, Np, W) expansion
    array for as long as the hypothesis survives (O(edges x 100s of
    KB) dead memory on long documents)."""
    g, s, e = _toy_graph(['abc', 'de'])
    _, _, tb = overfit_rater.rate_best(g, s, e, beam_width=4)
    hyps, _anchor = tb
    assert hyps
    for hyp in hyps:
        if hyp.state is None:
            continue
        for arr in hyp.state:
            assert arr.base is None, 'state pins an expansion array'


def test_generate_begin_finish_matches_sync(overfit_rater):
    """The split generate_begin/finish API (pipelined short-prompt
    serving) must return exactly what the synchronous generate does,
    including out-of-order finishes of in-flight dispatches and the
    host-fallback chain for empty results."""
    r = overfit_rater
    sync1 = r.generate('abcd a', 12)
    sync2 = r.generate('bcd ab', 12, variants=2)
    p1 = r.generate_begin('abcd a', 12)
    p2 = r.generate_begin('bcd ab', 12, variants=2)
    # out-of-order finish: p2 first
    assert r.generate_finish(p2) == sync2
    assert r.generate_finish(p1) == sync1


def test_generate_batch_begin_finish_matches_sync(overfit_rater):
    """The split generate_batch_begin/finish API must reproduce the
    synchronous generate_batch, including out-of-order finishes and
    the per-stream host-fallback chain."""
    r = overfit_rater
    prefixes1 = ['abcd a', 'bcd ab', 'cd abc']
    prefixes2 = ['d abcd', ' abcd ']
    sync1 = r.generate_batch(prefixes1, 10)
    sync2 = r.generate_batch(prefixes2, 10)
    p1 = r.generate_batch_begin(prefixes1, 10)
    p2 = r.generate_batch_begin(prefixes2, 10)
    assert r.generate_batch_finish(p2) == sync2
    assert r.generate_batch_finish(p1) == sync1
    assert r.generate_batch_finish(r.generate_batch_begin([], 10)) == []
