"""Regression tests for decode/score size limits: long alternatives
(beyond the fused kernel's 64-char unroll), wide beams (beyond the
128-lane fused layout), book-length scoring, split-batch carry
threading, and long generation prefixes."""
import numpy as np
import pytest

import networkx as nx

import ocrd_keraslm_tpu.rater as rater_mod
from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper.page import TextEquivType

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


def _one_edge_graph(alternatives):
    """Single-edge lattice with the given [(text, conf), ...]."""
    graph = nx.DiGraph()
    graph.add_edge(0, 1, element='e0', alternatives=[
        TextEquivType(Unicode=text, conf=conf, index=i)
        for i, (text, conf) in enumerate(alternatives)])
    return graph, 0, 1


def test_long_alternative_not_truncated(overfit_rater):
    """Alternatives longer than 64 chars must be scored FULLY: the two
    candidates here are identical for the first 65 chars and only
    differ beyond — a decoder that truncates at 64 sees equal LM costs
    and picks the higher-confidence garbage alternative."""
    r = overfit_rater
    good = 'abcd ' * 20          # 100 chars of the trained pattern
    bad = good[:65] + 'qqqd ' * 7  # same prefix, garbage tail
    assert len(good) > 64 and len(bad) > 64
    g, s, e = _one_edge_graph([(bad, 0.97), (good, 0.90)])
    path, entropy, _ = r.rate_best_device(g, s, e, lm_weight=0.9,
                                          beam_width=4)
    assert len(path) == 1
    assert path[0][1].Unicode == good
    assert np.isfinite(entropy) and entropy > 0


def test_long_alternative_matches_host_entropy(overfit_rater):
    """Device decode of a >64-char alternative must match the host
    (exact, per-char) path's entropy."""
    r = overfit_rater
    text = 'abcd ' * 16  # 80 chars, single alternative
    g1, s1, e1 = _one_edge_graph([(text, 0.9)])
    _, ent_dev, _ = r.rate_best_device(g1, s1, e1, lm_weight=0.5,
                                       beam_width=4)
    g2, s2, e2 = _one_edge_graph([(text, 0.9)])
    _, _, tb = r.rate_best(g2, s2, e2, lm_weight=0.5, beam_width=4)
    _, ent_host, _ = r.next_path(tb[0], ([], tb[1]))
    assert ent_dev == pytest.approx(ent_host, rel=1e-3)


def test_fused_wide_beam_falls_back(overfit_rater):
    """beam_width > 32 exceeds the fused kernel's lane layout; the
    decoder must route to the XLA path (same result), not crash."""
    r = overfit_rater
    alts = {(0, 2): [('x', 0.92), ('c', 0.90)]}
    results = []
    for fused in (False, True):
        graph = nx.DiGraph()
        node = 0
        for ci, char in enumerate('abcd'):
            a = alts.get((0, ci))
            tes = ([TextEquivType(Unicode=ch, conf=cf, index=i)
                    for i, (ch, cf) in enumerate(a)] if a else
                   [TextEquivType(Unicode=char, conf=0.95, index=0)])
            graph.add_edge(node, node + 1, element='c%d' % ci,
                           alternatives=tes)
            node += 1
        r.fused_decode = fused
        try:
            path, ent, _ = r.rate_best_device(graph, 0, node,
                                              lm_weight=0.8,
                                              beam_width=40)
        finally:
            r.fused_decode = False
        results.append((''.join(te.Unicode for _, te, _ in path), ent))
    assert results[0][0] == results[1][0] == 'abcd'
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-4)


def test_mixed_engine_traceback(overfit_rater):
    """A document can mix decode engines page-to-page (fused page, then
    a long-alternative page on the XLA path): the cross-page beam carry
    must convert between the two state formats."""
    r = overfit_rater

    def page_graphs():
        g1, s1, e1 = _one_edge_graph([('abcd ab', 0.9)])
        g2, s2, e2 = _one_edge_graph([('cd ' + 'abcd ' * 14, 0.9)])
        return (g1, s1, e1), (g2, s2, e2)

    # all-XLA reference run
    (g1, s1, e1), (g2, s2, e2) = page_graphs()
    r.fused_decode = False
    _, ent1_ref, tb = r.rate_best_device(g1, s1, e1, beam_width=4)
    _, ent2_ref, _ = r.rate_best_device(g2, s2, e2,
                                        device_traceback=tb,
                                        beam_width=4)
    # mixed run: page 1 fused (interpret mode on CPU), page 2 has a
    # 73-char alternative -> falls back to XLA with a fused traceback
    (g1, s1, e1), (g2, s2, e2) = page_graphs()
    r.fused_decode = True
    try:
        _, ent1, tb = r.rate_best_device(g1, s1, e1, beam_width=4)
        _, ent2, _ = r.rate_best_device(g2, s2, e2,
                                        device_traceback=tb,
                                        beam_width=4)
    finally:
        r.fused_decode = False
    assert ent1 == pytest.approx(ent1_ref, rel=1e-3)
    assert ent2 == pytest.approx(ent2_ref, rel=1e-3)
    # and the reverse hand-off: XLA page, then a fused page
    g1, s1, e1 = _one_edge_graph([('abcd ab', 0.9)])
    g2, s2, e2 = _one_edge_graph([('cd a', 0.9)])
    _, _, tb = r.rate_best_device(g1, s1, e1, beam_width=4)
    r.fused_decode = True
    try:
        _, ent2b, _ = r.rate_best_device(g2, s2, e2,
                                         device_traceback=tb,
                                         beam_width=4)
    finally:
        r.fused_decode = False
    assert np.isfinite(ent2b) and ent2b > 0


def test_score_superblock_chaining(overfit_rater, monkeypatch):
    """Texts longer than SCORE_CHUNK * max chunk bucket must score by
    chaining super-blocks through the carry (previously a shape-
    mismatch crash)."""
    r = overfit_rater
    text = 'abcd ' * 150  # 750 chars
    ref = r.rate2(text)  # small buckets path untouched
    monkeypatch.setattr(rater_mod, 'SCORE_CHUNK', 64)
    monkeypatch.setattr(rater_mod, 'CHUNK_COUNT_BUCKETS', (1, 2))
    # BLOCK = 128 -> 6 chained super-blocks
    out = r.rate2(text)
    assert out[1] == pytest.approx(ref[1], rel=1e-3)
    ref_probs = np.array([p for _, p in ref[0]])
    out_probs = np.array([p for _, p in out[0]])
    assert np.allclose(ref_probs, out_probs, atol=2e-3)


def test_split_batch_carry_threading(overfit_rater, monkeypatch):
    """When an oversized batch splits in half, each half must receive
    its rows of the caller's carry and the final carry must come back
    merged (previously dropped silently)."""
    r = overfit_rater
    texts = ['abcd ' * 8] * 4
    ids = [r.vocab.encode(t) for t in texts]
    # warm-up carry: score a first batch, keep its carry
    _, _, carry0 = r._score_batch(ids, [None] * 4)
    probs_ref, nll_ref, carry_ref = r._score_batch(ids, [None] * 4,
                                                   carry=carry0)
    monkeypatch.setattr(rater_mod, 'SCORE_SPLIT_LIMIT', 256)
    probs_sp, nll_sp, carry_sp = r._score_batch(ids, [None] * 4,
                                                carry=carry0)
    for a, b in zip(nll_ref, nll_sp):
        assert a == pytest.approx(b, rel=1e-4)
    for a, b in zip(probs_ref, probs_sp):
        assert np.allclose(a, b, atol=2e-3)
    h_ref = np.asarray(carry_ref[0])[:, :4]
    h_sp = np.asarray(carry_sp[0])[:, :4]
    assert np.allclose(h_ref, h_sp, atol=1e-5)


def test_generate_long_prefix(overfit_rater):
    """Generation must condition on the FULL prefix (the device path
    formerly clipped to the last 64 chars)."""
    r = overfit_rater
    prefix = 'abcd ' * 30 + 'ab'  # 152 chars
    out = r.generate(prefix, 6, variants=1)
    assert out and out[0].startswith('bcd a')


def test_mapping_setter_invalidates_encode_cache(overfit_rater):
    from ocrd_keraslm_tpu.utils.vocab import Vocab
    v = Vocab(['a', 'b'])
    r = Rater()
    r.vocab = v
    before = r.vocab.encode_cached('ab').copy()
    c2i, i2c = r.mapping
    c2i = dict(c2i)
    i2c = dict(i2c)
    c2i['a'], c2i['b'] = c2i['b'], c2i['a']
    i2c = {i: c for c, i in c2i.items()}
    r.mapping = (c2i, i2c)
    after = r.vocab.encode_cached('ab')
    assert not np.array_equal(before, after)


def test_fused_wide_model_falls_back():
    """A width-512 model exceeds the fused kernel's VMEM budget; the
    decode must route through the XLA path instead of crashing."""
    import string

    import networkx as nx

    import jax
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.rater import Rater
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType

    r = Rater()
    r.width, r.depth, r.length = 512, 2, 32
    r.stateful = False
    r.incremental = True
    r.voc_size = 64
    r.vocab.assign(string.printable[:63])
    r.configure()
    r.params = init_params(r.cfg, jax.random.PRNGKey(0))
    r.status = 2
    assert not r._fused_decode_fits(128, 4, 8, 1024)
    g = nx.DiGraph()
    g.add_node(0)
    for i, ch in enumerate('abcab'):
        g.add_edge(i, i + 1, element='c%d' % i,
                   alternatives=[TextEquivType(Unicode=ch, conf=0.9),
                                 TextEquivType(Unicode='x', conf=0.8)])
    r.fused_decode = True   # forced on: the budget gate must reroute
    try:
        path, ent, _ = r.rate_best_device(g, 0, 5, beam_width=4)
        batch = r.rate_best_batch([g, g], beam_width=4)
    finally:
        r.fused_decode = False
    assert len(path) == 5 and ent > 0
    assert all(len(p) == 5 for p, _ in batch)
