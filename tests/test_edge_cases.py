"""Edge-case robustness tests (empty pages, beam-width changes,
unmapped characters, empty graphs)."""
import numpy as np
import pytest

import networkx as nx

from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper import KerasRate
from ocrd_keraslm_tpu.wrapper.page import PcGts, TextEquivType, to_xml
from ocrd_keraslm_tpu.wrapper.mets import Mets, MetsFile, Workspace, \
    mets_to_xml

from helpers import make_tiny_model, train_tiny_model


def _toy_graph(words):
    graph = nx.DiGraph()
    graph.add_node(0)
    node = 0
    for wi, word in enumerate(words):
        if wi > 0:
            graph.add_edge(node, node + 1, element=None,
                           alternatives=[TextEquivType(Unicode=' ',
                                                       conf=1.0)])
            node += 1
        for char in word:
            graph.add_edge(node, node + 1, element='e%d' % node,
                           alternatives=[TextEquivType(Unicode=char,
                                                       conf=0.9)])
            node += 1
    return graph, 0, node


@pytest.fixture(scope='module')
def rater(tmp_path_factory):
    path = tmp_path_factory.mktemp('m') / 'lm.h5'
    model, _ = train_tiny_model(str(path), 'abcd ' * 200, steps=100)
    r = Rater()
    r.load_config(model)
    r.configure()
    r.load_weights(model)
    return r


def test_empty_graph_decode(rater):
    graph = nx.DiGraph()
    graph.add_node(0)
    path, entropy, tb = rater.rate_best_device(graph, 0, 0)
    assert path == [] and entropy == 0.0


def test_beam_width_change_between_pages(rater):
    g1, s1, e1 = _toy_graph(['abcd'])
    _, _, tb = rater.rate_best_device(g1, s1, e1, beam_width=4)
    g2, s2, e2 = _toy_graph(['abcd'])
    # wider beam on page 2: carry must pad
    path, ent, tb2 = rater.rate_best_device(g2, s2, e2,
                                            device_traceback=tb,
                                            beam_width=16)
    assert ''.join(te.Unicode for _, te, _ in path) == 'abcd'
    g3, s3, e3 = _toy_graph(['abcd'])
    # narrower beam on page 3: carry must truncate
    path, ent, _ = rater.rate_best_device(g3, s3, e3,
                                          device_traceback=tb2,
                                          beam_width=4)
    assert ''.join(te.Unicode for _, te, _ in path) == 'abcd'


def test_unmapped_chars_decode(rater):
    g, s, e = _toy_graph(['aXcd'])  # X is not in the tiny vocab
    path, ent, _ = rater.rate_best_device(g, s, e)
    assert len(path) == 4
    assert np.isfinite(ent)


def test_empty_page_scoring(tmp_path):
    """A page without text must not crash the scoring processor."""
    import os
    os.makedirs(tmp_path / 'OCR-D-OCR', exist_ok=True)
    pcgts = PcGts()
    pcgts.pcGtsId = 'empty'
    mets = Mets(unique_identifier='urn:x/e_1800')
    fname = 'OCR-D-OCR/p.xml'
    with open(tmp_path / fname, 'w') as fh:
        fh.write(to_xml(pcgts))
    mets.file_groups['OCR-D-OCR'] = [MetsFile(
        ID='p', fileGrp='OCR-D-OCR', local_filename=fname,
        pageId='phys1')]
    mets.page_ids.append('phys1')
    with open(tmp_path / 'mets.xml', 'w') as fh:
        fh.write(mets_to_xml(mets))
    ws = Workspace(str(tmp_path))
    model = make_tiny_model(tmp_path / 'model.h5', chars='ab')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': False})
    proc.setup()
    proc.process_workspace(ws)  # must not raise
    # decoding mode on the same empty page must also survive
    import os as _os
    _os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'
    try:
        proc2 = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                          output_file_grp='OCR-D-LM2',
                          parameter={'model_file': model,
                                     'textequiv_level': 'glyph',
                                     'alternative_decoding': True})
        proc2.setup()
        proc2.process_workspace(ws)
    finally:
        _os.environ.pop('OCRD_EXISTING_OUTPUT')


def test_decode_weight_cache_invalidated_on_prune(tmp_path):
    """Pruning a vocab char mutates params in place; the fused decode
    weight cache must not serve the stale embedding."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import train_tiny_model

    from ocrd_keraslm_tpu.rater import Rater
    model, _ = train_tiny_model(str(tmp_path / 'm.h5'),
                                'abcd ' * 300, steps=200)
    r = Rater()
    r.load_config(model)
    r.configure()
    r.load_weights(model)
    w1 = r._decode_weights(None, 0.5)
    v1 = w1['v_real']
    assert r.remove_from_mapping(char='d')
    w2 = r._decode_weights(None, 0.5)
    assert w2['v_real'] == v1 - 1
    assert w2['emb'].shape != w1['emb'].shape or \
        not (w2['emb'] == w1['emb']).all()


def test_gc_paused_restores_collector_state(rater):
    """The hot decode entry points pause the cyclic GC (gen-0
    collections rescan the whole lattice graph, rater.py _gc_paused);
    the collector's prior state must survive both success and error
    paths, and an outer disable must be respected."""
    import gc
    graph, _, _ = _toy_graph(['ab'])
    assert gc.isenabled()
    rater.rate_best_batch([graph], beam_width=4)
    assert gc.isenabled()
    # error path restores too
    with pytest.raises(Exception):
        rater.rate_best_device_finish(object())
    assert gc.isenabled()
    # an outer disable stays disabled (no-op nesting)
    gc.disable()
    try:
        rater.rate_best_batch([graph], beam_width=4)
        assert not gc.isenabled()
    finally:
        gc.enable()


def test_empty_alternative_consistent_across_engines(rater):
    """An empty-string alternative (deleted-character hypothesis) is
    FREE under the reference's per-char cost model (no chars -> no LM
    or conf cost, reference rating.py:797-851 extends char-by-char);
    all three engines must agree on path and entropy, and the host
    path must survive the lock-in flush."""
    def make():
        g = nx.DiGraph()
        g.add_node(0)
        for e in range(4):
            if e == 1:
                tes = [TextEquivType(Unicode='', conf=0.6, index=0),
                       TextEquivType(Unicode='ab', conf=0.99,
                                     index=1)]
            else:
                tes = [TextEquivType(Unicode='abc'[e % 3], conf=0.9,
                                     index=0),
                       TextEquivType(Unicode='d', conf=0.8, index=1)]
            g.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)
        return g

    results = {}
    p, ent, tb = rater.rate_best(make(), 0, 4, beam_width=8)
    pf, entf, _ = rater.next_path(tb[0], ([], tb[1]))
    results['host'] = ([te.Unicode for _, te, _ in p + pf],
                       ent + entf)
    for fused in (False, True):
        rater.fused_decode = fused
        try:
            p, ent, _ = rater.rate_best_device(make(), 0, 4,
                                               beam_width=8)
        finally:
            rater.fused_decode = False
        results['fused' if fused else 'xla'] = (
            [te.Unicode for _, te, _ in p], ent)
    texts = {k: v[0] for k, v in results.items()}
    assert texts['host'] == texts['xla'] == texts['fused'], texts
    ents = [v[1] for v in results.values()]
    assert max(ents) - min(ents) < 1e-2, results


def test_branching_dag_host_decodes_device_rejects(rater):
    """rate_best is a general-DAG search (reference rating.py:763-773
    walks out_edges in topological order); the device engines run a
    sequential edge chain, so they must REJECT a branching lattice
    instead of silently decoding its edges as consecutive."""
    g = nx.DiGraph()
    g.add_node(0)
    # diamond: 0 -> 1 -> 3 (text 'ab') vs 0 -> 2 -> 3 (text 'dc')
    g.add_edge(0, 1, element='e01', alternatives=[
        TextEquivType(Unicode='a', conf=0.9, index=0)])
    g.add_edge(1, 3, element='e13', alternatives=[
        TextEquivType(Unicode='b', conf=0.9, index=0)])
    g.add_edge(0, 2, element='e02', alternatives=[
        TextEquivType(Unicode='d', conf=0.9, index=0)])
    g.add_edge(2, 3, element='e23', alternatives=[
        TextEquivType(Unicode='c', conf=0.9, index=0)])

    path, ent, tb = rater.rate_best(g, 0, 3, beam_width=4)
    pathf, entf, _ = rater.next_path(tb[0], ([], tb[1]))
    text = ''.join(te.Unicode for _, te, _ in path + pathf)
    # the training text is 'abcd ' cycles: 'ab' must beat 'dc'
    assert text == 'ab', text
    assert np.isfinite(ent + entf)

    with pytest.raises(ValueError, match='linear lattice'):
        rater.rate_best_device(g, 0, 3, beam_width=4)
    with pytest.raises(ValueError, match='linear lattice'):
        rater.rate_best_batch([g], beam_width=4)


def test_lm_weight_extremes_consistent_across_engines(rater):
    """lm_weight=0.0 (pure OCR confidence) and 1.0 (pure LM) flow
    through different folding in each engine, and the fused path's
    weight cache deliberately excludes lm_weight from its key
    (rater._decode_weights): alternating weights across calls must not
    reuse stale folded costs, and all engines must agree."""
    def make():
        g = nx.DiGraph()
        g.add_node(0)
        # LM prefers the training text 'abcd '; OCR conf prefers the
        # wrong char -> the two weights pick DIFFERENT paths
        for e, true in enumerate('abcd'):
            wrong = 'dcba'[e]
            tes = [TextEquivType(Unicode=true, conf=0.55, index=0),
                   TextEquivType(Unicode=wrong, conf=0.95, index=1)]
            g.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)
        return g

    for lm_weight, expect in ((1.0, 'abcd'), (0.0, 'dcba')):
        texts = {}
        p, ent, tb = rater.rate_best(make(), 0, 4,
                                     lm_weight=lm_weight, beam_width=8)
        pf, entf, _ = rater.next_path(tb[0], ([], tb[1]))
        texts['host'] = ''.join(te.Unicode for _, te, _ in p + pf)
        for fused in (False, True):
            rater.fused_decode = fused
            try:
                p, ent, _ = rater.rate_best_device(
                    make(), 0, 4, lm_weight=lm_weight, beam_width=8)
            finally:
                rater.fused_decode = False
            texts['fused' if fused else 'xla'] = \
                ''.join(te.Unicode for _, te, _ in p)
        assert texts['host'] == texts['xla'] == texts['fused'] \
            == expect, (lm_weight, texts)


def test_relabeled_linear_chain_decodes_in_path_order(rater):
    """Chain order must come from the successor structure, not node
    labels (rater._linear_edges): a linear lattice whose labels are
    non-monotonic (e.g. relabeled by subgraph extraction) decodes to
    the same text as the 0..N-labeled chain on both device engines."""
    labels = [100, 7, 55, 3, 42]  # 100 -> 7 -> 55 -> 3 -> 42
    g = nx.DiGraph()
    for i, char in enumerate('abcd'):
        wrong = 'dcba'[i]
        g.add_edge(labels[i], labels[i + 1], element='e%d' % i,
                   alternatives=[
                       TextEquivType(Unicode=char, conf=0.6, index=0),
                       TextEquivType(Unicode=wrong, conf=0.6,
                                     index=1)])
    # with equal confidences the LM (trained on 'abcd ') must pick
    # 'abcd' — which only happens if the edges run in PATH order;
    # label-sorted order would step the chars as 3,7,42,55,100
    path, ent, _ = rater.rate_best_device(g, labels[0], labels[-1],
                                          beam_width=4)
    text = ''.join(te.Unicode for _, te, _ in path)
    assert text == 'abcd', text
    assert np.isfinite(ent)
    (batch_res,) = rater.rate_best_batch([g], beam_width=4)
    btext = ''.join(te.Unicode for _, te, _ in batch_res[0])
    assert btext == 'abcd', btext
    # concat_graphs must also chain by successor structure, not a
    # label sort (its output uses fresh monotonic labels 0..N)
    whole = rater.concat_graphs([g])
    order = [whole.edges[(i, i + 1)]['element'] for i in range(4)]
    assert order == ['e0', 'e1', 'e2', 'e3'], order


def test_non_chain_lattices_still_rejected(rater):
    """Merge nodes, parallel components, and detached cycles are not
    chains; the device engines must reject them (rater._linear_edges),
    not decode some arbitrary edge order."""
    te = [TextEquivType(Unicode='a', conf=0.9, index=0)]
    merge = nx.DiGraph()  # 0 -> 2 <- 1 (two starts)
    merge.add_edge(0, 2, element='m0', alternatives=te)
    merge.add_edge(1, 2, element='m1', alternatives=te)
    two = nx.DiGraph()  # 0 -> 1, 5 -> 6 (disconnected)
    two.add_edge(0, 1, element='t0', alternatives=te)
    two.add_edge(5, 6, element='t1', alternatives=te)
    cyc = nx.DiGraph()  # 0 -> 1 -> 2 plus a detached 5 <-> 6 cycle
    cyc.add_edge(0, 1, element='c0', alternatives=te)
    cyc.add_edge(1, 2, element='c1', alternatives=te)
    cyc.add_edge(5, 6, element='c2', alternatives=te)
    cyc.add_edge(6, 5, element='c3', alternatives=te)
    loop = nx.DiGraph()  # self-loop
    loop.add_edge(0, 0, element='l0', alternatives=te)
    for g, end in ((merge, 2), (two, 6), (cyc, 2), (loop, 0)):
        with pytest.raises(ValueError, match='linear lattice'):
            rater.rate_best_device(g, 0, end, beam_width=4)
        with pytest.raises(ValueError, match='linear lattice'):
            rater.rate_best_batch([g], beam_width=4)
