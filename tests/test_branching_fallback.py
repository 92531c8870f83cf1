"""Branching-lattice end-to-end fallback (VERDICT r3 #7).

The wrapper's own builder only emits chains (like the reference,
wrapper/rate.py:343-424), but ``Rater.rate_best`` accepts general
DAGs (reference traversal shape: rating.py:763-773) and the builder
is a documented customization point.  These tests install a builder
that returns a genuinely BRANCHING DiGraph (a diamond bypass) and
assert the documented bail chain end-to-end inside
``process_workspace_stateful``:

  device engines refuse (``NonLinearLatticeError``) -> the page
  decodes via the host DAG engine, is locked in immediately (the
  cross-page beam carry resets at the engine switch), and the run
  completes.
"""
import os
import re

import numpy as np
import pytest

import networkx as nx

from ocrd_keraslm_tpu.rater import NonLinearLatticeError, Rater
from ocrd_keraslm_tpu.wrapper import KerasRate
from ocrd_keraslm_tpu.wrapper import rate as rate_mod
from ocrd_keraslm_tpu.wrapper.mets import Workspace
from ocrd_keraslm_tpu.wrapper.page import TextEquivType, parse_page

from helpers import build_workspace, make_tiny_model

PAGES = {
    'phys_0001': [['abc', 'cab'], ['bca', 'acb']],
    'phys_0002': [['cba', 'bac'], ['abc', 'cab']],
    'phys_0003': [['bca', 'abc'], ['cab', 'cba']],
}
ALTS = {(li, wi, 0): [('a', 0.93), ('b', 0.91)]
        for li in range(2) for wi in range(2)}
# normalized out of byte comparisons: run timestamps, and the
# device_decoding parameter label (the two runs differ in it BY
# construction; everything else must match byte-for-byte)
_VOLATILE = re.compile(
    rb'<(Created|LastChange)>[^<]*</\1>'
    rb'|<Label [^>]*type="device_decoding"[^>]*/?>')


def _branching_builder(orig, branch_pages):
    """Wrap the chain builder: for the given page ids, return a
    DiGraph with a diamond bypass (two parallel routes between two
    chain nodes) — a genuine branch no chain walk can express."""
    def build(level, pcgts, logger=None):
        edges = orig(level, pcgts, logger=logger)
        if pcgts.get_pcGtsId() not in branch_pages:
            return edges
        g = nx.DiGraph()
        g.add_node(0)
        for i, e in enumerate(edges):
            g.add_edge(i, i + 1, **e)
        m = len(edges) // 2
        # bypass m -> 'b' -> m+1 competing with the direct edge
        g.add_edge(m, 'bypass', element=None,
                   alternatives=[TextEquivType(Unicode=' ', conf=0.4,
                                               index=0)])
        g.add_edge('bypass', m + 1, element=None,
                   alternatives=[TextEquivType(Unicode=' ', conf=0.4,
                                               index=0)])
        return g
    return build


def _read_outputs(ws_dir, grp='OCR-D-LM'):
    out = {}
    grp_dir = os.path.join(ws_dir, grp)
    for name in sorted(os.listdir(grp_dir)):
        with open(os.path.join(grp_dir, name), 'rb') as fh:
            out[name] = _VOLATILE.sub(b'', fh.read())
    return out


def _run(ws_dir, model, device, out_grp):
    ws = Workspace(ws_dir)
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp=out_grp,
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'device_decoding': device,
                                'beam_width': 4})
    proc.setup()
    proc.process_workspace(ws)


def test_device_engines_refuse_branching_graph(tmp_path):
    """API-level guard: a diamond DAG is rejected by the device
    engines with the pointer to rate_best."""
    ws = build_workspace(str(tmp_path),
                         {'p1': PAGES['phys_0001']},
                         glyph_alternatives=ALTS)
    del ws
    g = nx.DiGraph()
    for i, ch in enumerate('abc'):
        g.add_edge(i, i + 1, element='e%d' % i,
                   alternatives=[TextEquivType(Unicode=ch, conf=0.9,
                                               index=0)])
    g.add_edge(0, 'x', element=None,
               alternatives=[TextEquivType(Unicode=' ', conf=0.5,
                                           index=0)])
    g.add_edge('x', 1, element=None,
               alternatives=[TextEquivType(Unicode=' ', conf=0.5,
                                           index=0)])
    model = make_tiny_model(tmp_path / 'm.h5', chars='abc \n')
    r = Rater()
    r.load_config(model)
    r.stateful, r.incremental = False, True
    r.configure()
    r.load_weights(model)
    with pytest.raises(NonLinearLatticeError, match='rate_best'):
        r.rate_best_device(g, 0, 3, beam_width=4)
    with pytest.raises(NonLinearLatticeError, match='rate_best'):
        r.rate_best_batch([g], beam_width=4)
    # the host engine decodes it fine (first call returns the empty
    # lookahead path; next_path locks in the final beam)
    _, _, tb = r.rate_best(g, 0, 3, beam_width=4)
    path, entropy, _ = r.next_path(tb[0], ([], tb[1]))
    assert path and np.isfinite(entropy)


def test_single_branching_page_matches_pure_host(tmp_path,
                                                 monkeypatch, caplog):
    """One-page workspace, branching lattice: the device-mode run
    falls back to the host engine and its output equals the pure-host
    (device_decoding=False) run byte-for-byte."""
    ws = build_workspace(str(tmp_path),
                         {'phys_0001': PAGES['phys_0001']},
                         glyph_alternatives=ALTS)
    model = make_tiny_model(tmp_path / 'model.h5', chars='abc \n')
    orig = rate_mod.page_get_linear_lattice_at
    monkeypatch.setattr(rate_mod, 'page_get_linear_lattice_at',
                        _branching_builder(orig, {'phys_0001'}))
    import logging
    with caplog.at_level(logging.INFO):
        _run(ws.directory, model, True, 'OCR-D-LM')
    assert any('host DAG engine' in rec.message
               for rec in caplog.records)
    _run(ws.directory, model, False, 'OCR-D-HOST')
    dev = _read_outputs(ws.directory, 'OCR-D-LM')
    host = _read_outputs(ws.directory, 'OCR-D-HOST')
    assert len(dev) == len(host) == 1
    for (_, a), (_, b) in zip(sorted(dev.items()),
                              sorted(host.items())):
        assert a.replace(b'OCR-D-LM', b'OCR-D-HOST') == b


def test_mixed_document_branching_middle_page(tmp_path, monkeypatch):
    """3-page document whose MIDDLE page branches: the run completes
    with all pages written (outer pages on the device engine), and the
    fallback page's output equals decoding that page alone with the
    pure host engine (the carry reset makes it self-contained)."""
    ws = build_workspace(str(tmp_path / 'ws'), PAGES,
                         glyph_alternatives=ALTS)
    model = make_tiny_model(tmp_path / 'model.h5', chars='abc \n')
    orig = rate_mod.page_get_linear_lattice_at
    monkeypatch.setattr(rate_mod, 'page_get_linear_lattice_at',
                        _branching_builder(orig, {'phys_0002'}))
    _run(ws.directory, model, True, 'OCR-D-LM')
    outs = _read_outputs(ws.directory)
    assert len(outs) == 3
    # every glyph on every page reduced to exactly one TextEquiv
    for name in outs:
        pcgts = parse_page(os.path.join(ws.directory, 'OCR-D-LM',
                                        name))
        for region in pcgts.get_Page().get_TextRegion():
            for line in region.get_TextLine():
                for word in line.get_Word():
                    for glyph in word.get_Glyph():
                        assert len(glyph.get_TextEquiv()) == 1
    # the branching page alone == a pure-host single-page run
    ws2 = build_workspace(str(tmp_path / 'ws2'),
                          {'phys_0002': PAGES['phys_0002']},
                          glyph_alternatives=ALTS)
    _run(ws2.directory, model, False, 'OCR-D-LM')
    solo = _read_outputs(ws2.directory)
    mixed_mid = [v for k, v in outs.items() if 'phys_0002' in k][0]
    solo_mid = list(solo.values())[0]
    assert mixed_mid == solo_mid


def test_native_lane_branching_page_falls_back(tmp_path, monkeypatch):
    """The fallback must also rescue pages loaded through the NATIVE
    byte lane (NativePageDoc lacks the generateDS API the host engine
    walks — the handler converts via to_fast() first).  Forced here by
    enabling fused_decode (CPU pins it off) with a beam width past the
    kernel gate, so the native doc reaches the lxml conversion and the
    (patched) DAG builder inside process_page_pcgts_device_begin."""
    from ocrd_keraslm_tpu.wrapper import page_native
    if not page_native.available():
        pytest.skip('native page lane unavailable')
    ws = build_workspace(str(tmp_path),
                         {'phys_0001': PAGES['phys_0001']},
                         glyph_alternatives=ALTS)
    model = make_tiny_model(tmp_path / 'model.h5', chars='abc \n')
    monkeypatch.setenv('KERASLM_FUSE_PAGES', '0')
    w = Workspace(ws.directory)
    proc = KerasRate(workspace=w, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'device_decoding': True,
                                'beam_width': 40})
    proc.setup()
    # native lane eligibility requires fused_decode (TPU-only default)
    monkeypatch.setattr(proc.rater, 'fused_decode', True)
    assert proc._native_page_eligible()
    orig = rate_mod.page_get_linear_lattice_at
    monkeypatch.setattr(rate_mod, 'page_get_linear_lattice_at',
                        _branching_builder(orig, {'phys_0001'}))
    proc.process_workspace(w)
    outs = _read_outputs(ws.directory)
    assert len(outs) == 1
    pcgts = parse_page(os.path.join(ws.directory, 'OCR-D-LM',
                                    list(outs)[0]))
    for region in pcgts.get_Page().get_TextRegion():
        for line in region.get_TextLine():
            for word in line.get_Word():
                for glyph in word.get_Glyph():
                    assert len(glyph.get_TextEquiv()) == 1
