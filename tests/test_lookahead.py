"""Opt-in one-page-lookahead write-back (reference rating.py:736-741):
page N's path is finalized through page N+1's decode by walking pages
in reverse with chained entry slots.
"""
import numpy as np
import pytest

from ocrd_keraslm_tpu.rater import Rater

from helpers import build_workspace, make_tiny_model


def test_walk_chaining_mechanics():
    """Reverse-chained walks across two record blocks ("pages"): the
    later page's walk determines the earlier page's start slot."""
    r = Rater()
    K = 4

    def rows(bp, alt, cost):
        # one edge: row = [bp(K) | alt(K) | cost(K)]
        return np.asarray([list(bp) + list(alt) + list(cost)],
                          np.float32)

    meta = [{'alts': [_TE('a'), _TE('b'), _TE('c'), _TE('d')],
             'parts': None, 'element': None}]
    # page 2: slot 0 (best) backpoints to slot 1 of its initial beam
    page2 = [np.concatenate([np.zeros((1, 3 * K), np.float32)]),
             rows([1, 0, 2, 3], [2, 0, 1, 3], [5., 6., 7., 8.])]
    # page 1: slot 1's choice is alt 3, backpointing to slot 2
    page1 = [np.zeros((1, 3 * K), np.float32),
             rows([0, 2, 1, 3], [0, 3, 1, 2], [1., 2., 3., 4.])]
    pend2 = ('blocks', meta, [np.concatenate(page2)], K)
    pend1 = ('blocks', meta, [np.concatenate(page1)], K)

    (path2, _), entry = r.rate_best_device_finish(
        pend2, start_slot=0, return_entry=True)
    assert entry == 1                      # page 2 entered via slot 1
    assert path2[0][1].Unicode == 'c'      # slot 0's alt = 2 -> 'c'
    (path1, _), entry1 = r.rate_best_device_finish(
        pend1, start_slot=entry, return_entry=True)
    assert path1[0][1].Unicode == 'd'      # slot 1's alt = 3 -> 'd'
    assert entry1 == 2
    # without lookahead, page 1 would walk slot 0 -> 'a'
    path1_imm, _ent = r.rate_best_device_finish(pend1)
    assert path1_imm[0][1].Unicode == 'a'


class _TE:
    def __init__(self, u):
        self.Unicode = u
        self.conf = 0.9


def _make_rater(tmp_path):
    model = make_tiny_model(tmp_path / 'model.h5')
    r = Rater()
    r.load_config(str(model))
    r.stateful = False
    r.incremental = True
    r.configure()
    r.load_weights(str(model))
    return r


def _make_pages(rater, rng, n_pages=3, n_edges=12):
    import networkx as nx

    from ocrd_keraslm_tpu.wrapper.page import TextEquivType
    chars = [c for c in rater.vocab.c2i if c.strip()]
    pages = []
    for _ in range(n_pages):
        g = nx.DiGraph()
        g.add_node(0)
        for e in range(n_edges):
            tes = [TextEquivType(
                Unicode=chars[rng.integers(len(chars))],
                conf=float(0.5 + 0.5 * rng.random()), index=i)
                for i in range(3)]
            g.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)
        pages.append(g)
    return pages


@pytest.mark.parametrize('seed', [7, 19, 42])
def test_lookahead_equals_concatenated_decode(tmp_path, seed):
    """Per-page decode with lookahead lock-in must reproduce EXACTLY
    the decode of all pages as ONE concatenated lattice (the global
    best path) — the reference's workflow invariant.  Immediate mode
    only guarantees each page's locally best hypothesis."""
    r = _make_rater(tmp_path)
    rng = np.random.default_rng(seed)
    pages = _make_pages(r, rng)

    # ONE concatenated lattice = ground-truth global best path
    whole = r.concat_graphs(pages)
    nE = len(whole.edges)
    path_all, _, _ = r.rate_best_device(whole, 0, nE, beam_width=8)
    text_all = ''.join(te.Unicode for _, te, _ in path_all)

    # chained per-page decode, lookahead walks
    tb = None
    pendings = []
    for g in pages:
        pending, tb = r.rate_best_device_begin(
            g, 0, len(g.edges), device_traceback=tb, beam_width=8,
            defer_walk=True)
        pendings.append(pending)
    pendings = r.fetch_pendings(pendings)
    slot = 0
    texts = [None] * len(pages)
    for pi in range(len(pages) - 1, -1, -1):
        (path, _), slot = r.rate_best_device_finish(
            pendings[pi], start_slot=slot, return_entry=True)
        texts[pi] = ''.join(te.Unicode for _, te, _ in path)
    assert ''.join(texts) == text_all


def test_lookahead_workspace_write_order(tmp_path):
    """The processor flag: outputs must exist for every page and be
    written in forward page order."""
    from ocrd_keraslm_tpu.wrapper.mets import Workspace
    from ocrd_keraslm_tpu.wrapper.rate import KerasRate
    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    pages = {'page%d' % i: [['the', 'fox'], ['dog', 'ran']]
             for i in range(1, 4)}
    build_workspace(str(ws_dir), pages)
    model = make_tiny_model(tmp_path / 'model.h5')
    proc = KerasRate(workspace=Workspace(str(ws_dir)),
                     input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': True,
                                'lookahead_writeback': True})
    proc.setup()
    proc.process_workspace(proc.workspace)
    ws = Workspace(str(ws_dir))
    outs = [f for f in ws.mets.find_files(fileGrp='OCR-D-LM')]
    assert len(outs) == 3
    # files on disk, forward page order by modification sequence
    import os
    paths = [os.path.join(str(ws_dir), f.local_filename) for f in outs]
    assert all(os.path.exists(p) for p in paths)
    mtimes = [os.stat(p).st_mtime_ns for p in
              sorted(paths)]  # page1, page2, page3
    assert mtimes == sorted(mtimes)


def test_lookahead_walk_failure_falls_back(tmp_path, monkeypatch):
    """A failing reverse-walk on ONE page must not abort the document
    (the OCRD_MISSING_OUTPUT policy owns page errors): the page falls
    back to its local rank-0 path in the forward write loop and every
    page's output is still written."""
    from ocrd_keraslm_tpu.wrapper.mets import Workspace
    from ocrd_keraslm_tpu.wrapper.rate import KerasRate
    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    pages = {'page%d' % i: [['the', 'fox'], ['dog', 'ran']]
             for i in range(1, 4)}
    build_workspace(str(ws_dir), pages)
    model = make_tiny_model(tmp_path / 'model.h5')
    monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
    monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '-1')
    proc = KerasRate(workspace=Workspace(str(ws_dir)),
                     input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': True,
                                'lookahead_writeback': True})
    proc.setup()
    orig = proc.rater.rate_best_device_finish
    calls = {'walks': 0}

    def flaky(pending, start_slot=0, return_entry=False):
        if return_entry:
            calls['walks'] += 1
            if calls['walks'] == 2:     # middle page of the reverse walk
                raise RuntimeError('injected walk failure')
        return orig(pending, start_slot=start_slot,
                    return_entry=return_entry)

    monkeypatch.setattr(proc.rater, 'rate_best_device_finish', flaky)
    proc.process_workspace(proc.workspace)
    assert calls['walks'] == 3
    ws = Workspace(str(ws_dir))
    outs = list(ws.mets.find_files(fileGrp='OCR-D-LM'))
    assert len(outs) == 3   # the failed walk re-ran in the write loop
