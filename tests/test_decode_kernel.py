"""Parity test: fused Pallas decode kernel vs the XLA scan decoder
(interpret mode on CPU)."""
import numpy as np
import pytest

from ocrd_keraslm_tpu.wrapper.page import TextEquivType

import networkx as nx

from helpers import train_tiny_model
from ocrd_keraslm_tpu.rater import Rater


def _toy_graph(words, alternatives=None):
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


@pytest.fixture(scope='module')
def rater(tmp_path_factory):
    path = tmp_path_factory.mktemp('m') / 'lm.h5'
    model, _ = train_tiny_model(str(path), 'abcd ' * 400, steps=400)
    r = Rater()
    r.load_config(model)
    r.configure()
    r.load_weights(model)
    return r


def test_pallas_decode_matches_xla(rater):
    alternatives = {(0, 2): [('x', 0.92), ('c', 0.90)],
                    (1, 1): [('y', 0.92), ('b', 0.90)]}
    g1, s1, e1 = _toy_graph(['abcd'], alternatives=alternatives)
    rater.fused_decode = False
    path_xla, ent_xla, _ = rater.rate_best_device(
        g1, s1, e1, lm_weight=0.8, beam_width=4)
    g2, s2, e2 = _toy_graph(['abcd'], alternatives=alternatives)
    rater.fused_decode = True
    try:
        path_pl, ent_pl, tb = rater.rate_best_device(
            g2, s2, e2, lm_weight=0.8, beam_width=4)
    finally:
        rater.fused_decode = False
    xla_str = ''.join(te.Unicode for _, te, _ in path_xla)
    pl_str = ''.join(te.Unicode for _, te, _ in path_pl)
    assert pl_str == xla_str == 'abcd'
    assert abs(ent_pl - ent_xla) < 1e-2, (ent_pl, ent_xla)
    # per-edge scores comparable
    for (_, _, s1_), (_, _, s2_) in zip(path_xla, path_pl):
        assert abs(s1_ - s2_) < 1e-3


def test_pallas_decode_cross_page(rater):
    rater.fused_decode = True
    try:
        g1, s1, e1 = _toy_graph(['abcd'])
        path1, ent1, tb = rater.rate_best_device(g1, s1, e1,
                                                 beam_width=4)
        g2, s2, e2 = _toy_graph(['abcd'])
        path2, ent2, _ = rater.rate_best_device(g2, s2, e2,
                                                device_traceback=tb,
                                                beam_width=4)
    finally:
        rater.fused_decode = False
    assert ''.join(te.Unicode for _, te, _ in path2) == 'abcd'
    assert np.isfinite(ent2) and ent2 > 0


def test_pallas_batch_decode_matches_sequential(rater):
    """Document-batched fused decode (decode_lattice_pallas_batch) must
    reproduce the sequential per-document fused results: identical
    strings and total entropies vs the DEFAULT sequential path, and
    identical per-element scores vs an UNMERGED sequential decode (the
    batch path prefers unmerged L=1 prep on single-char lattices,
    whose per-char score attribution is exact; run-merging smears
    scores uniformly within a run — documented in
    _prepare_decode_edges)."""
    specs = [
        (['abcd'], {(0, 2): [('x', 0.92), ('c', 0.90)]}),
        (['abcd', 'abcd'], {(1, 1): [('y', 0.92), ('b', 0.90)]}),
        (['ab'], None),
    ]
    graphs = [_toy_graph(w, alternatives=a)[0] for w, a in specs]
    rater.fused_decode = True
    try:
        seq = []
        for w, a in specs:
            g, s, e = _toy_graph(w, alternatives=a)
            path, ent, _ = rater.rate_best_device(
                g, s, e, lm_weight=0.7, beam_width=4)
            seq.append((path, ent))
        seq_unmerged = []
        rater.merge_runs = False
        try:
            for w, a in specs:
                g, s, e = _toy_graph(w, alternatives=a)
                path, ent, _ = rater.rate_best_device(
                    g, s, e, lm_weight=0.7, beam_width=4)
                seq_unmerged.append((path, ent))
        finally:
            rater.merge_runs = True
        batch = rater.rate_best_batch(graphs, lm_weight=0.7,
                                      beam_width=4)
    finally:
        rater.fused_decode = False
    assert len(batch) == len(seq)
    for (p_b, e_b), (p_s, e_s), (p_u, e_u) in zip(batch, seq,
                                                  seq_unmerged):
        assert ''.join(te.Unicode for _, te, _ in p_b) == \
            ''.join(te.Unicode for _, te, _ in p_s)
        assert abs(e_b - e_s) < 1e-3, (e_b, e_s)
        assert abs(e_b - e_u) < 1e-3, (e_b, e_u)
        assert len(p_b) == len(p_u)
        for (_, _, sb), (_, _, su) in zip(p_b, p_u):
            assert abs(sb - su) < 1e-3


def test_pallas_batch_decode_blocks_and_groups(rater):
    """Batch-fused decode with documents spanning multiple kernel
    groups (> 128/K docs) and multiple chained edge blocks per group
    (fused_batch_E_blk override) must match sequential decodes."""
    # beam 4 -> K=8 -> 16 docs/group: 18 docs = 2 groups; alternatives
    # at every char defeat run merging, so the 5-word docs (~24 edges)
    # chain across the forced 16-edge blocks
    specs = []
    for k in range(18):
        n_words = 1 + k % 5
        words = ['abcd'] * n_words
        alts = {(wi, ci): [('abcd '[(ci + 1 + k) % 5], 0.85),
                           ('abcd'[ci], 0.90)]
                for wi in range(n_words) for ci in range(4)}
        specs.append((words, alts))
    graphs = [_toy_graph(w, alternatives=a)[0] for w, a in specs]
    rater.fused_decode = True
    rater.fused_batch_E_blk = 16   # force block chaining
    try:
        seq = []
        for w, a in specs:
            g, s, e = _toy_graph(w, alternatives=a)
            path, ent, _ = rater.rate_best_device(
                g, s, e, lm_weight=0.6, beam_width=4)
            seq.append((path, ent))
        batch = rater.rate_best_batch(graphs, lm_weight=0.6,
                                      beam_width=4)
    finally:
        rater.fused_decode = False
        rater.fused_batch_E_blk = None
    for (p_b, e_b), (p_s, e_s) in zip(batch, seq):
        assert ''.join(te.Unicode for _, te, _ in p_b) == \
            ''.join(te.Unicode for _, te, _ in p_s)
        assert abs(e_b - e_s) < 1e-3, (e_b, e_s)


def test_batch_decode_xla_and_wide_beam_fallbacks(rater):
    """rate_best_batch without the fused engine (CPU default) and with
    beam_width beyond the fused lane layout must both produce the
    sequential results through the vmapped XLA engine."""
    specs = [(['abcd'], {(0, 2): [('x', 0.92), ('c', 0.90)]}),
             (['abcd', 'ab'], None)]
    graphs = [_toy_graph(w, alternatives=a)[0] for w, a in specs]
    rater.fused_decode = False
    seq = []
    for w, a in specs:
        g, s, e = _toy_graph(w, alternatives=a)
        path, ent, _ = rater.rate_best_device(g, s, e, beam_width=4)
        seq.append((path, ent))
    # plain XLA batch (fused off)
    batch = rater.rate_best_batch(graphs, beam_width=4)
    for (p_b, e_b), (p_s, e_s) in zip(batch, seq):
        assert ''.join(te.Unicode for _, te, _ in p_b) == \
            ''.join(te.Unicode for _, te, _ in p_s)
        assert abs(e_b - e_s) < 1e-4
    # fused on but beam_width > 32: falls back to the XLA batch path
    rater.fused_decode = True
    try:
        batch_wide = rater.rate_best_batch(graphs, beam_width=40)
    finally:
        rater.fused_decode = False
    for (p_b, _), (p_s, _) in zip(batch_wide, seq):
        assert ''.join(te.Unicode for _, te, _ in p_b) == \
            ''.join(te.Unicode for _, te, _ in p_s)


def test_batch_decode_multipage_concat(rater):
    """Multi-page documents decode in a batch by concatenating page
    lattices (Rater.concat_graphs): equivalent to the per-page
    device_traceback chain of rate_best_device."""
    rater.fused_decode = True
    try:
        # sequential: two pages with cross-page carry
        g1, s1, e1 = _toy_graph(['abcd'])
        path1, ent1, tb = rater.rate_best_device(g1, s1, e1,
                                                 beam_width=4)
        g2, s2, e2 = _toy_graph(['abcd'])
        path2, ent2, _ = rater.rate_best_device(g2, s2, e2,
                                                device_traceback=tb,
                                                beam_width=4)
        # batched: same two pages concatenated, plus a second doc
        doc1 = Rater.concat_graphs([_toy_graph(['abcd'])[0],
                                    _toy_graph(['abcd'])[0]])
        doc2 = _toy_graph(['ab'])[0]
        batch = rater.rate_best_batch([doc1, doc2], beam_width=4)
    finally:
        rater.fused_decode = False
    merged_str = ''.join(te.Unicode for _, te, _ in path1) + \
        ''.join(te.Unicode for _, te, _ in path2)
    b_str = ''.join(te.Unicode for _, te, _ in batch[0][0])
    assert b_str == merged_str == 'abcdabcd'
    # entropies: the batched doc accumulates both pages' costs
    assert abs(batch[0][1] - (ent1 + ent2)) < 0.1, \
        (batch[0][1], ent1, ent2)
    # element identity preserved for page re-splitting
    elements = [el for el, _, _ in batch[0][0]]
    assert elements.count('w0_c0') == 2  # one per page


def test_bf16_decode_mode(rater):
    """The opt-in/TPU-default bf16 decode mode: weights plumb through
    as bfloat16, the kernels compile and decode, and quality stays
    within tolerance of the f32 mode (interpret-mode bf16 CHANGES
    arithmetic — on the compiled TPU path it is bit-identical, pinned
    by tpu_spotcheck.py — so this pins plumbing + closeness, not
    equality).  Default must stay OFF on non-TPU backends."""
    import jax
    import jax.numpy as jnp
    assert rater._decode_bf16() is (jax.default_backend() == 'tpu')
    w16 = rater._decode_weights(None, 0.5, bf16=True)
    w32 = rater._decode_weights(None, 0.5, bf16=False)
    assert w16['wcat'].dtype == jnp.bfloat16
    assert w16['emb'].dtype == jnp.bfloat16
    assert w32['wcat'].dtype == jnp.float32
    g, s, e = _toy_graph(['abcd', 'abcd'])
    rater.fused_decode = True
    try:
        rater.decode_bf16 = False
        p32, ent32, _ = rater.rate_best_device(g, s, e, beam_width=4)
        rater.decode_bf16 = True
        p16, ent16, _ = rater.rate_best_device(g, s, e, beam_width=4)
    finally:
        rater.fused_decode = False
        rater.decode_bf16 = None
    t32 = ''.join(te.Unicode for _, te, _ in p32)
    t16 = ''.join(te.Unicode for _, te, _ in p16)
    assert t16 == t32 == 'abcd abcd'  # overfit model: clear optimum
    assert ent16 == pytest.approx(ent32, rel=2e-2)


def test_pad_edge_skip_bit_exact(rater):
    """Bucket-pad edges are skipped in closed form (n_real guard):
    packed records, final state, and cost must be bit-identical to a
    run where the pads execute the full beam step as native free
    edges (n_real=E)."""
    from ocrd_keraslm_tpu.ops.decode_kernel import \
        decode_lattice_pallas
    from ocrd_keraslm_tpu.rater import _alt_steps

    rater.fused_decode = True
    try:
        edges = [{'element': 'e%d' % i,
                  'alternatives': [TextEquivType(Unicode=c, conf=0.9,
                                                 index=0),
                                   TextEquivType(Unicode='d', conf=0.85,
                                                 index=1)]}
                 for i, c in enumerate('abcab')]
        n = len(edges)
        E, A, L, K = 8, 4, 2, 8
        prepped = rater._prepare_decode_edges(edges)
        chars, mask, conf, valid = rater._fill_decode_arrays(
            prepped, E, A, L)
        wts = rater._decode_weights(None, 0.7)
        state, cost = rater._fused_traceback(None, K, wts['emb'])
        kw = dict(n_edges=E, n_alts=A, alt_len=L, beam=K,
                  depth=rater.depth, width=rater.width,
                  v_pad=wts['v_pad'], v_real=wts['v_real'],
                  lm_weight=0.7, device_walk=True,
                  alt_steps=_alt_steps(mask))
        n_prep = len(prepped)
        guarded = decode_lattice_pallas(
            wts['emb'], wts['embT'], wts['wcat'], wts['bias'],
            chars, mask, conf, valid[:, :, None], state, cost,
            n_real=np.int32(n_prep), **kw)
        full = decode_lattice_pallas(
            wts['emb'], wts['embT'], wts['wcat'], wts['bias'],
            chars, mask, conf, valid[:, :, None], state, cost, **kw)
        for g, f, name in zip(guarded, full,
                              ('packed', 'stateF', 'costF')):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(f),
                                          err_msg=name)
    finally:
        rater.fused_decode = False


@pytest.fixture(scope='module')
def rater_ambig(tmp_path_factory):
    """Model trained on BOTH 'abcd' and 'abxe': after 'ab' the chars
    'c' and 'x' are near-equally likely; only the NEXT page's text
    resolves which was right."""
    path = tmp_path_factory.mktemp('ma') / 'lm.h5'
    model, _ = train_tiny_model(str(path), 'abcd abxe ' * 300,
                                width=24, length=64, steps=1500)
    r = Rater()
    r.load_config(model)
    r.configure()
    r.load_weights(model)
    return r


@pytest.mark.parametrize('fused', [True, False])
def test_cross_page_entry_slot_anchor(rater_ambig, fused):
    """When page 2's best path continues from a NON-best slot of page
    1's final beam, the emission anchor must be that entry slot's
    initial cost (exact, like the host engine's prev_anchor), not
    min(cost0): page 2's entropy equals final cost minus the ENTRY
    slot's carried cost."""
    r = rater_ambig
    r.fused_decode = fused
    try:
        # page 1 ends ambiguously: OCR prefers 'x', the LM is split
        alternatives = {(1, 2): [('x', 0.95), ('c', 0.5)]}
        g1, s1, e1 = _toy_graph(['abcd', 'abc'],
                                alternatives=alternatives)
        path1, _, tb = r.rate_best_device(g1, s1, e1, beam_width=4)
        assert path1[-1][1].Unicode == 'x', \
            'scenario: OCR confidence must win page 1 locally'
        # page 2 starts with 'd' — only follows 'abc' in training
        g2, s2, e2 = _toy_graph(['d', 'ab'])
        pending, _ = r.rate_best_device_begin(
            g2, s2, e2, device_traceback=tb, beam_width=4,
            defer_walk=True)
        (path2, ent2), entry = r.rate_best_device_finish(
            pending, return_entry=True)
        assert entry != 0, \
            'scenario: page 2 must continue from a non-best slot'
        # exact anchoring: entropy == final cost - entry slot's cost
        cost0 = np.asarray(tb[-1], np.float64).reshape(-1)
        rows = np.concatenate(
            [np.asarray(b)[1:] for b in pending[2]], axis=0)
        K = pending[3]
        nE = len(pending[1])
        final_cost = float(rows[nE - 1, 2 * K])  # rank-0 final slot
        assert ent2 == pytest.approx(final_cost - cost0[entry],
                                     abs=1e-4)
        # the min() anchor would have inflated the entropy
        assert cost0[entry] > cost0.min() + 1e-6
    finally:
        r.fused_decode = False


def test_batch_begin_finish_double_buffered_matches_sync(rater):
    """The split begin/finish batch API (serving double buffering,
    round 4): dispatching batch B before finishing batch A must
    return results identical to two synchronous rate_best_batch
    calls, on both the XLA engine and the fused path's pending
    protocol (fused exercised separately on TPU by tpu_spotcheck)."""
    specs_a = [(['abcd'], {(0, 2): [('x', 0.92), ('c', 0.90)]}),
               (['abcd', 'ab'], None),
               (['dcba'], None)]
    specs_b = [(['ab', 'cd'], None),
               (['abcd'], {(0, 0): [('d', 0.95), ('a', 0.94)]})]
    graphs_a = [_toy_graph(w, alternatives=al)[0] for w, al in specs_a]
    graphs_b = [_toy_graph(w, alternatives=al)[0] for w, al in specs_b]
    rater.fused_decode = False
    sync_a = rater.rate_best_batch(graphs_a, beam_width=4)
    sync_b = rater.rate_best_batch(graphs_b, beam_width=4,
                                   lm_weight=0.7)
    # interleaved: both batches in flight before either finishes
    pa = rater.rate_best_batch_begin(graphs_a, beam_width=4)
    pb = rater.rate_best_batch_begin(graphs_b, beam_width=4,
                                     lm_weight=0.7)
    got_a = rater.rate_best_batch_finish(pa)
    got_b = rater.rate_best_batch_finish(pb)
    for got, sync in ((got_a, sync_a), (got_b, sync_b)):
        for (p_g, e_g), (p_s, e_s) in zip(got, sync):
            assert [(te.Unicode, s) for _, te, s in p_g] == \
                [(te.Unicode, s) for _, te, s in p_s]
            assert e_g == e_s
    # finish order independence: B first, then A
    pa = rater.rate_best_batch_begin(graphs_a, beam_width=4)
    pb = rater.rate_best_batch_begin(graphs_b, beam_width=4,
                                     lm_weight=0.7)
    assert rater.rate_best_batch_finish(pb) == sync_b
    assert rater.rate_best_batch_finish(pa) == sync_a
    # special shapes resolve synchronously inside begin
    empty = rater.rate_best_batch_finish(
        rater.rate_best_batch_begin([], beam_width=4))
    assert empty == []
    single = rater.rate_best_batch_finish(
        rater.rate_best_batch_begin([graphs_a[0]], beam_width=4))
    assert single[0][0] and np.isfinite(single[0][1])
