"""Differential tests: native byte lane (C++ scan + splice) vs the
lxml lanes.

Every stage is pinned against the parity-tested Python implementation:
scan structure, lattice/kernel arrays (bit-exact vs the record path's
native fill), and the full processor output (winners, confidence
scores, projection, metadata) across all three page lanes.
"""
import os

import numpy as np
import pytest

from ocrd_keraslm_tpu import native
from ocrd_keraslm_tpu.rater import DECODE_MERGE_MAX, Rater
from ocrd_keraslm_tpu.wrapper import page_native
from ocrd_keraslm_tpu.wrapper.page import parse_page, to_xml
from ocrd_keraslm_tpu.wrapper.page_fast import parse_page_fast
from ocrd_keraslm_tpu.wrapper.page_native import NativePageDoc
from ocrd_keraslm_tpu.wrapper.rate import page_get_linear_lattice_at

from helpers import build_pcgts, build_workspace, make_tiny_model
from test_page_fast import (_decode_and_serialize, _page_content,
                            _rich_page_xml)

pytestmark = pytest.mark.skipif(not page_native.available(),
                                reason='native page scanner '
                                       'unavailable')


def test_scan_structure():
    xml = _rich_page_xml().encode('utf-8')
    doc = NativePageDoc(xml)
    assert doc.bail is None
    obj = parse_page(xml)
    # element counts by kind
    regions = obj.page.get_AllRegions()
    lines = [l for r in regions for l in r.get_TextLine()]
    words = [w for l in lines for w in l.get_Word()]
    glyphs = [g for w in words for g in w.get_Glyph()]
    kinds = np.bincount(doc.ekind, minlength=4)
    assert list(kinds) == [len(regions), len(lines), len(words),
                           len(glyphs)]
    # ids and first-te texts line up in document order
    native_glyphs = np.nonzero(doc.ekind == 3)[0]
    for gi, g in zip(native_glyphs, glyphs):
        assert doc.elem_id(int(gi)) == g.id
        ft = int(doc.efirst_te[gi])
        assert doc.te_text(ft) == g.get_TextEquiv()[0].Unicode
    # pcGtsId
    assert doc.get_pcGtsId() == obj.pcGtsId


def test_scan_entities_and_multibyte():
    pcgts = build_pcgts([['Mü<h&e', '—ß']],
                        page_id='p&1')
    xml = to_xml(pcgts).encode('utf-8')
    doc = NativePageDoc(xml)
    assert doc.bail is None
    assert doc.get_pcGtsId() == 'p&1'
    words = np.nonzero(doc.ekind == 2)[0]
    texts = [doc.te_text(int(doc.efirst_te[w])) for w in words]
    assert texts == ['Mü<h&e', '—ß']


def test_scan_bails():
    xml = _rich_page_xml()
    cases = [
        ('<?xml version="1.0" encoding="ISO-8859-1"?><PcGts/>',
         'non-UTF-8'),
        # plain DOCTYPE is accepted since round 5; the internal
        # subset (may declare entities) still bails
        ('<!DOCTYPE PcGts [<!ENTITY x "y">]><PcGts xmlns="http://'
         'schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"/>',
         'DOCTYPE subset'),
        ('<other/>', 'root'),
        (xml.replace('<TextRegion id="p1_r2">',
                     '<TextRegion id="p1_r2"><TextRegion id="nested">'
                     '</TextRegion>'), 'nested'),
        (xml.replace('Das', 'D&unknown;as'), 'entity'),
    ]
    for bad, why in cases:
        doc = NativePageDoc(bad.encode('utf-8'))
        assert doc.bail is not None, why
    # a FLAT page's ReadingOrder is semantically inert (document-order
    # lattice, projection only consults it for nested subregions) and
    # must NOT bail — its subtree skips balanced and the splice
    # preserves the bytes
    with_ro = xml.replace(
        '</Page>', '<ReadingOrder><OrderedGroup id="ro">'
        '<RegionRefIndexed index="0" regionRef="p1_r1"/>'
        '</OrderedGroup></ReadingOrder></Page>')
    doc = NativePageDoc(with_ro.encode('utf-8'))
    assert doc.bail is None
    # incomplete metadata also bails (the object path re-emits it)
    doc = NativePageDoc(xml.replace(
        '<LastChange>', '<Ignored>').replace(
        '</LastChange>', '</Ignored>').encode('utf-8'))
    assert doc.bail == 'incomplete Metadata'
    # prefix-bound PAGE namespace bails: spliced fragments are emitted
    # unprefixed and would land in no namespace
    prefixed = xml.replace('<PcGts xmlns="', '<pc:PcGts xmlns:pc="') \
        .replace('</PcGts>', '</pc:PcGts>')
    doc = NativePageDoc(prefixed.encode('utf-8'))
    assert doc.bail is not None


def test_scan_line_ending_normalization():
    """CRLF-saved documents decode like the lxml lanes (XML spec:
    \\r\\n and bare \\r normalize to \\n in parsed text)."""
    xml = _rich_page_xml().encode('utf-8').replace(b'\n', b'\r\n')
    doc = NativePageDoc(xml)
    assert doc.bail is None
    obj = parse_page(xml)
    glyphs = [g for r in obj.page.get_AllRegions()
              for l in r.get_TextLine() for w in l.get_Word()
              for g in w.get_Glyph()]
    native_glyphs = np.nonzero(doc.ekind == 3)[0]
    for gi, g in zip(native_glyphs, glyphs):
        assert doc.te_text(int(doc.efirst_te[gi])) == \
            g.get_TextEquiv()[0].Unicode


def test_empty_reading_direction_falls_through():
    """An EMPTY readingDirection attribute is falsy in the projection
    or-chain (same as missing), like the lxml lanes."""
    xml = _rich_page_xml()
    xml = xml.replace('<TextLine id="p1_r1_l0">',
                      '<TextLine id="p1_r1_l0" '
                      'readingDirection="right-to-left">')
    xml = xml.replace('<Word id="p1_r1_l0_w0">',
                      '<Word id="p1_r1_l0_w0" readingDirection="">')
    out_obj = _decode_and_serialize(parse_page(xml), 'glyph', pick=0)
    doc = NativePageDoc(xml.encode('utf-8'))
    assert doc.bail is None
    out_nat = _native_decode_and_serialize(doc, 'glyph', pick=0)
    assert _page_content(out_nat) == _page_content(out_obj)


def test_self_closing_first_unicode_wins():
    """<Unicode/> followed by <Unicode>x</Unicode>: the FIRST (empty)
    result counts, as in the lxml lanes."""
    xml = _rich_page_xml().replace(
        '<TextEquiv index="0" conf="0.6"><Unicode>s</Unicode>'
        '</TextEquiv>',
        '<TextEquiv index="0" conf="0.6"><Unicode/>'
        '<Unicode>s</Unicode></TextEquiv>', 1)
    doc = NativePageDoc(xml.encode('utf-8'))
    assert doc.bail is None
    obj = parse_page(xml)
    glyphs = [g for r in obj.page.get_AllRegions()
              for l in r.get_TextLine() for w in l.get_Word()
              for g in w.get_Glyph()]
    native_glyphs = np.nonzero(doc.ekind == 3)[0]
    for gi, g in zip(native_glyphs, glyphs):
        assert doc.te_text(int(doc.efirst_te[gi])) == \
            g.get_TextEquiv()[0].Unicode


def _native_decode_and_serialize(doc, level, pick=0):
    """Native-lane analogue of test_page_fast._decode_and_serialize:
    simulate a decode picking alternative ``pick`` per edge via the
    meta arrays, then apply + serialize."""
    lat = doc.lattice(level, True, DECODE_MERGE_MAX)
    assert lat is not None
    n_raw, n_prep, maxlen = lat
    import string
    r = Rater()
    r.voc_size = 100
    r.vocab.assign(string.printable[:99])
    doc.fill(r.vocab._table(), max(n_prep, 8), 4, max(maxlen, 2))
    choices = np.full(n_prep, pick, np.int64)
    # costs chosen so every element's score is 2^-0.5ish per char
    lens = np.maximum(doc.alt_len[np.arange(n_prep),
                                  np.minimum(choices,
                                             (doc.alt_te != -2)
                                             .sum(1) - 1)], 1)
    run_tot = np.zeros(n_prep)
    if len(doc.piece_edge):
        np.add.at(run_tot, doc.piece_edge, doc.piece_len)
    per_edge = np.where(doc.edge_kind == 1, run_tot, lens)
    # diff = -log2(0.75) * chars -> every element scores exactly 0.75,
    # matching test_page_fast._decode_and_serialize's fixed score
    costs = np.cumsum(-np.log2(0.75) * per_edge)
    doc.apply_decode(level, choices, costs, 0.0)
    from ocrd_keraslm_tpu.wrapper.page import to_xml as _to_xml
    return _to_xml(doc)


def _record_arrays(rater, xml, level, merge, E, A, L):
    """Kernel arrays via the parity-tested record path."""
    edges = page_get_linear_lattice_at(level, parse_page_fast(xml))
    rater.merge_runs = merge
    filled = native.decode_fill(edges, merge, DECODE_MERGE_MAX,
                                E, A, L, rater.vocab._table())
    assert filled is not None
    _, chars, mask, conf, valid = filled
    return chars, mask, conf, valid


@pytest.mark.parametrize('level', ['glyph', 'word'])
@pytest.mark.parametrize('merge', [True, False])
def test_lattice_arrays_bit_exact(level, merge):
    import string
    xml = _rich_page_xml().encode('utf-8')
    rater = Rater()
    rater.width, rater.depth, rater.length = 16, 1, 16
    rater.voc_size = 100
    rater.vocab.assign(string.printable[:99])
    doc = NativePageDoc(xml)
    lat = doc.lattice(level, merge, DECODE_MERGE_MAX)
    assert lat is not None
    n_raw, n_prep, maxlen = lat
    # same post-merge layout as the record path's native scan
    edges = page_get_linear_lattice_at(level, parse_page_fast(xml))
    assert n_raw == len(edges)
    scan = native.decode_scan(edges, merge, DECODE_MERGE_MAX)
    assert (n_prep, maxlen) == tuple(scan)
    E = max(n_prep, 8)
    A, L = 4, max(maxlen, 2)
    got = doc.fill(rater.vocab._table(), E, A, L)
    want = _record_arrays(rater, xml, level, merge, E, A, L)
    for g, w, name in zip(got, want, 'chars mask conf valid'.split()):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_lattice_arrays_repair_case():
    """Tokenisation repair (word level): space edge skipped."""
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType
    import string
    pcgts = build_pcgts([['Zeilen', 'umbruch']], page_id='p1')
    line = pcgts.page.regions[0].lines[0]
    line.set_TextEquiv([TextEquivType(Unicode='Zeilenumbruch',
                                      conf=0.9)])
    pcgts.page.regions[0].set_TextEquiv(
        [TextEquivType(Unicode='Zeilenumbruch', conf=0.9)])
    xml = to_xml(pcgts).encode('utf-8')
    rater = Rater()
    rater.voc_size = 100
    rater.vocab.assign(string.printable[:99])
    doc = NativePageDoc(xml)
    lat = doc.lattice('word', True, DECODE_MERGE_MAX)
    edges = page_get_linear_lattice_at('word', parse_page_fast(xml))
    assert lat[0] == len(edges) == 2  # space edge repaired away
    n_prep, maxlen = lat[1], lat[2]
    E, A, L = max(n_prep, 8), 4, max(maxlen, 2)
    got = doc.fill(rater.vocab._table(), E, A, L)
    want = _record_arrays(rater, xml.decode('utf-8'), 'word', True,
                          E, A, L)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize('level', ['glyph', 'word'])
def test_processor_e2e_three_lanes(tmp_path, level, monkeypatch):
    """Full decode through native / lxml-records / object lanes: the
    parsed output content must be identical."""
    from ocrd_keraslm_tpu.wrapper import KerasRate

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']],
             'phys_0002': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('D', 0.9), ('O', 0.88)],
            (1, 0, 1): [('e', 0.7), ('c', 0.69)]}
    outputs = {}
    lanes = {'native': ('1', '1'), 'records': ('1', '0'),
             'object': ('0', '0')}
    for lane, (fast, nat) in lanes.items():
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': level,
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True  # CPU: force the fused kernel
        proc.process_workspace(ws)
        outputs[lane] = {
            page_id: _page_content(open(
                os.path.join(wdir, 'OCR-D-LM',
                             'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in pages}
    assert outputs['native'] == outputs['records'] == outputs['object']


def test_native_lane_actually_used(tmp_path, monkeypatch):
    """Guard against silent fallback: the native lane must serve the
    eligible serving shape."""
    from ocrd_keraslm_tpu.wrapper import KerasRate

    model = make_tiny_model(tmp_path / 'model.h5')
    ws = build_workspace(tmp_path / 'ws',
                         {'phys_0001': [['Das', 'ist']]})
    monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
    monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 4})
    proc.setup()
    proc.rater.fused_decode = True
    doc = proc._load_page(proc.input_files[0], 'phys_0001')
    assert isinstance(doc, NativePageDoc)
    assert doc.bail is None


def test_mixed_lanes_cross_page_chain(tmp_path, monkeypatch):
    """A page the scanner bails on (nested region) drops to the lxml
    lane mid-document; the cross-page beam carry must chain across the
    lane switch and outputs must match an all-lxml run."""
    from ocrd_keraslm_tpu.wrapper import KerasRate

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist']],
             'phys_0002': [['ein', 'Test']],
             'phys_0003': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('D', 0.9), ('O', 0.88)]}
    outputs = {}
    for lane, nat in (('mixed', '1'), ('records', '0')):
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        # page 2 gets a nested TextRegion -> native lane bails there
        p2 = os.path.join(wdir, 'OCR-D-OCR', 'OCR-D-OCR_phys_0002.xml')
        xml = open(p2, encoding='utf-8').read()
        with open(p2, 'w', encoding='utf-8') as fh:
            fh.write(xml.replace(
                '<TextRegion id="phys_0002_r1">',
                '<TextRegion id="phys_0002_r1">'
                '<TextRegion id="phys_0002_r1_nested">'
                '<TextEquiv><Unicode>x</Unicode></TextEquiv>'
                '</TextRegion>'))
        monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True
        if nat == '1':
            docs = [proc._load_page(f, f.pageId)
                    for f in proc.input_files]
            assert isinstance(docs[0], NativePageDoc)
            assert not isinstance(docs[1], NativePageDoc)
        proc.process_workspace(ws)
        outputs[lane] = {
            page_id: _page_content(open(
                os.path.join(wdir, 'OCR-D-LM',
                             'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in pages}
    assert outputs['mixed'] == outputs['records']


def test_splice_preserves_unmodeled_content(tmp_path, monkeypatch):
    """Byte splicing keeps content no lane models (Border, TextStyle,
    comments, custom attributes) verbatim in the decoded output."""
    from ocrd_keraslm_tpu.wrapper import KerasRate
    from ocrd_keraslm_tpu.wrapper.mets import Workspace

    model = make_tiny_model(tmp_path / 'model.h5')
    ws = build_workspace(tmp_path / 'ws',
                         {'phys_0001': [['Das', 'ist']]},
                         glyph_alternatives={
                             (0, 0, 0): [('D', 0.9), ('O', 0.88)]})
    page_path = os.path.join(tmp_path, 'ws', 'OCR-D-OCR',
                             'OCR-D-OCR_phys_0001.xml')
    xml = open(page_path, encoding='utf-8').read()
    xml = xml.replace('<Page ', '<Page customAttr="kept" ')
    xml = xml.replace(
        '<TextRegion id="phys_0001_r1">',
        '<!-- scanned by unit test --><Border>'
        '<Coords points="0,0 9,9"/></Border>'
        '<TextRegion id="phys_0001_r1" orientation="0.5">'
        '<TextStyle fontSize="12.0"/>')
    with open(page_path, 'w', encoding='utf-8') as fh:
        fh.write(xml)
    monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
    monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 4})
    proc.setup()
    proc.rater.fused_decode = True
    doc = proc._load_page(proc.input_files[0], 'phys_0001')
    assert isinstance(doc, NativePageDoc) and doc.bail is None
    proc.process_workspace(ws)
    out = open(os.path.join(tmp_path, 'ws', 'OCR-D-LM',
                            'OCR-D-LM_phys_0001.xml'),
               encoding='utf-8').read()
    assert 'customAttr="kept"' in out
    assert '<Border>' in out and 'points="0,0 9,9"' in out
    assert 'orientation="0.5"' in out
    assert 'fontSize="12.0"' in out
    assert 'scanned by unit test' in out
    # decode happened: glyphs have single winners, agent recorded
    _, content = _page_content(out)
    assert all(len(texts) == 1 for _, texts, _ in content)
    assert 'ocrd-keraslm-rate' in out


def _btt_rtl_page_xml():
    """Layout-directive + self-closing coverage: bottom-to-top region,
    right-to-left line, an empty self-closing word, and a mix of
    conf-attr-present / conf-attr-missing winner TextEquivs."""
    from lxml import etree
    xml = _rich_page_xml()
    root = etree.fromstring(xml.encode('utf-8'))
    ns = {'p': root.nsmap[None] if None in root.nsmap
          else root.nsmap.get('pc', list(root.nsmap.values())[0])}
    regions = root.findall('.//p:TextRegion', ns)
    regions[0].set('textLineOrder', 'bottom-to-top')
    lines = regions[0].findall('.//p:TextLine', ns)
    lines[0].set('readingDirection', 'right-to-left')
    # empty self-closing word at the end of the first line
    etree.SubElement(lines[0], '{%s}Word' % ns['p'], id='p1_w_empty')
    out = etree.tostring(root, encoding='unicode')
    # lxml expands <Word/> only if it has content; ensure self-closing
    assert '<Word id="p1_w_empty"/>' in out
    return out


@pytest.mark.parametrize('level', ['glyph', 'word'])
@pytest.mark.parametrize('xml_fn', [_rich_page_xml, _btt_rtl_page_xml])
@pytest.mark.parametrize('pick', [0, 1])
def test_native_apply_matches_python_apply(level, xml_fn, pick,
                                           monkeypatch):
    """The C++ page_apply/page_emit path must produce the same
    document as the parity-tested Python apply/splice on the same
    decode result: same parsed content (texts + confs) and identical
    bytes up to the LastChange timestamp."""
    import re as _re
    xml = xml_fn()
    data = xml.encode('utf-8') if isinstance(xml, str) else xml
    outs = {}
    for mode in ('native', 'python'):
        monkeypatch.setenv('KERASLM_NATIVE_APPLY',
                           '0' if mode == 'python' else '1')
        doc = NativePageDoc(data)
        assert doc.bail is None
        outs[mode] = _native_decode_and_serialize(doc, level,
                                                  pick=pick)
        assert doc._native_applied == (mode == 'native')

    def strip_ts(s):
        return _re.sub(r'<LastChange>[^<]*</LastChange>',
                       '<LastChange/>', s)

    assert _page_content(outs['native']) == _page_content(outs['python'])
    assert strip_ts(outs['native']) == strip_ts(outs['python'])


def test_native_apply_used_in_processor(tmp_path, monkeypatch):
    """The e2e processor output is identical with the native apply on
    and off (the three-lane test runs with it on by default)."""
    import os as _os

    from ocrd_keraslm_tpu.wrapper import KerasRate
    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']],
             'phys_0002': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('D', 0.9), ('O', 0.88)],
            (1, 0, 1): [('e', 0.7), ('c', 0.69)]}
    outs = {}
    for mode in ('1', '0'):
        wdir = tmp_path / ('ws_%s' % mode)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        monkeypatch.setenv('KERASLM_NATIVE_APPLY', mode)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True  # CPU: force the fused kernel
        proc.process_workspace(ws)
        outs[mode] = {
            page_id: _page_content(open(
                _os.path.join(wdir, 'OCR-D-LM',
                              'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in pages}
    assert outs['1'] == outs['0']


def test_self_closing_tag_name_with_tab_newline_attrs(monkeypatch):
    """Pretty-printed self-closing elements (tab/newline-indented
    attributes) must reopen with a clean closing tag in BOTH apply
    paths — the name scan stops at any XML whitespace."""
    from lxml import etree
    xml = _rich_page_xml()
    # raw byte injection: lxml would normalize the attribute
    # whitespace away on re-serialization
    marker = '</Word>'
    assert marker in xml
    data = xml.replace(marker,
                       marker + '<Word\n\tid="p1_w_tabbed"/>',
                       1).encode('utf-8')
    assert b'<Word\n\tid="p1_w_tabbed"/>' in data
    nsuri = etree.fromstring(data).nsmap[None]
    for mode in ('1', '0'):
        monkeypatch.setenv('KERASLM_NATIVE_APPLY', mode)
        doc = NativePageDoc(data)
        assert doc.bail is None
        out = _native_decode_and_serialize(doc, 'glyph')
        assert '</p1_w_tabbed' not in out  # no attr leaked into name
        parsed = etree.fromstring(out.encode('utf-8'))  # parseable
        w = parsed.find('.//{%s}Word[@id="p1_w_tabbed"]' % nsuri)
        assert w is not None and len(w) == 1  # one projected TextEquiv


def test_flat_reading_order_stays_native(tmp_path, monkeypatch):
    """Real OCR outputs commonly carry a flat ReadingOrder (one
    OrderedGroup of RegionRefIndexed).  It is semantically inert for
    this lane's pages (document-order lattice; projection only
    consults reading order for nested subregions), so the native lane
    must SERVE such documents — content equal to the records lane,
    and the ReadingOrder bytes preserved verbatim in the output."""
    from ocrd_keraslm_tpu.wrapper import KerasRate

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']],
             'phys_0002': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('D', 0.9), ('O', 0.88)]}
    outputs = {}
    for lane, nat in (('native', '1'), ('records', '0')):
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        for page_id in pages:
            path = os.path.join(
                str(wdir), 'OCR-D-OCR', 'OCR-D-OCR_%s.xml' % page_id)
            xml = open(path, encoding='utf-8').read()
            with open(path, 'w', encoding='utf-8') as fh:
                fh.write(xml.replace(
                    '</Page>',
                    '<ReadingOrder><OrderedGroup id="ro_%s">'
                    '<RegionRefIndexed index="0" regionRef="%s_r1"/>'
                    '</OrderedGroup></ReadingOrder></Page>'
                    % (page_id, page_id)))
        monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True
        if nat == '1':
            # guard: the native lane must actually serve these pages
            doc = proc._load_page(proc.input_files[0], 'phys_0001')
            assert isinstance(doc, NativePageDoc) and doc.bail is None
        proc.process_workspace(ws)
        outputs[lane] = {
            page_id: open(os.path.join(
                wdir, 'OCR-D-LM', 'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read()
            for page_id in pages}
    for page_id in pages:
        nat_out = outputs['native'][page_id]
        # the RO subtree survives the splice write-back verbatim
        assert ('<ReadingOrder><OrderedGroup id="ro_%s">' % page_id) \
            in nat_out
        assert _page_content(nat_out) == \
            _page_content(outputs['records'][page_id]), page_id


def test_cross_line_join_is_not_inert(tmp_path, monkeypatch):
    """Relation type=join between the LAST word of line i and the
    FIRST word of line i+1 suppresses the newline in the region
    projection — on a FLAT page (wrapper/rate.py, region_unicode
    loop).  Pins (a) the lxml lane honors the join, (b) the native
    scanner collects the pairs, and (c) both native apply paths
    (C++ page_apply and the Python _project) produce the SAME joined
    region text as the lxml lane."""
    from ocrd_keraslm_tpu.wrapper.page import parse_page
    from ocrd_keraslm_tpu.wrapper.rate import (
        page_update_higher_textequiv_levels)

    pcgts = build_pcgts([['Auf', 'klae'], ['rung', 'jetzt']])
    xml = to_xml(pcgts)
    # join last word of line 0 with first word of line 1
    lines = pcgts.page.get_TextRegion()[0].get_TextLine()
    w_src = lines[0].get_Word()[-1].id
    w_tgt = lines[1].get_Word()[0].id
    joined = xml.replace(
        '</Page>', '<Relations><Relation type="join">'
        '<SourceRegionRef regionRef="%s"/>'
        '<TargetRegionRef regionRef="%s"/>'
        '</Relation></Relations></Page>' % (w_src, w_tgt))
    # (a) the lxml projection suppresses the newline across the join
    doc_plain = parse_page(xml)
    page_update_higher_textequiv_levels('word', doc_plain)
    doc_join = parse_page(joined)
    page_update_higher_textequiv_levels('word', doc_join)
    text_plain = doc_plain.page.get_TextRegion()[0] \
        .get_TextEquiv()[0].Unicode
    text_join = doc_join.page.get_TextRegion()[0] \
        .get_TextEquiv()[0].Unicode
    assert text_plain == 'Auf klae\nrung jetzt'
    assert text_join == 'Auf klaerung jetzt'
    # (b) the native scanner serves the document and collects the pair
    doc = NativePageDoc(joined.encode('utf-8'))
    assert doc.bail is None
    assert doc.joins == {(w_src, w_tgt)}
    # (c) both native apply paths project the joined region text
    for native_apply in ('1', '0'):
        monkeypatch.setenv('KERASLM_NATIVE_APPLY', native_apply)
        nd = NativePageDoc(joined.encode('utf-8'))
        out = _native_decode_and_serialize(nd, 'word', pick=0)
        reparsed = parse_page(out)
        got = reparsed.page.get_TextRegion()[0] \
            .get_TextEquiv()[0].Unicode
        assert got == text_join, ('apply=%s' % native_apply, got)


def test_processor_e2e_with_joins_three_lanes(tmp_path, monkeypatch):
    """Full decode of a workspace whose first page carries a
    cross-line Relation join: native (fused) / records / object lanes
    must produce identical content, and the native output must keep
    the Relations bytes verbatim."""
    from ocrd_keraslm_tpu.wrapper import KerasRate

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Auf', 'klae'], ['rung', 'jetzt']],
             'phys_0002': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('A', 0.9), ('O', 0.88)]}
    outputs = {}
    for lane, (fast, nat) in (('native', ('1', '1')),
                              ('records', ('1', '0')),
                              ('object', ('0', '0'))):
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        p1 = os.path.join(str(wdir), 'OCR-D-OCR',
                          'OCR-D-OCR_phys_0001.xml')
        xml = open(p1, encoding='utf-8').read()
        # join the last word of line 1 with the first word of line 2
        from ocrd_keraslm_tpu.wrapper.page import parse_page
        doc0 = parse_page(xml)
        lines0 = doc0.page.get_TextRegion()[0].get_TextLine()
        w_src = lines0[0].get_Word()[-1].id
        w_tgt = lines0[1].get_Word()[0].id
        with open(p1, 'w', encoding='utf-8') as fh:
            fh.write(xml.replace(
                '</Page>', '<Relations><Relation type="join">'
                '<SourceRegionRef regionRef="%s"/>'
                '<TargetRegionRef regionRef="%s"/>'
                '</Relation></Relations></Page>' % (w_src, w_tgt)))
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True
        if nat == '1':
            doc = proc._load_page(proc.input_files[0], 'phys_0001')
            assert isinstance(doc, NativePageDoc) and doc.bail is None
        proc.process_workspace(ws)
        outputs[lane] = {
            page_id: open(os.path.join(
                wdir, 'OCR-D-LM', 'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read()
            for page_id in pages}
    from test_page_fast import _page_content
    for page_id in pages:
        assert _page_content(outputs['native'][page_id]) == \
            _page_content(outputs['records'][page_id]) == \
            _page_content(outputs['object'][page_id]), page_id
    # the joined region text has NO newline at the join
    assert '<Relations>' in outputs['native']['phys_0001']
    reparsed = parse_page(outputs['native']['phys_0001'])
    region_text = reparsed.page.get_TextRegion()[0] \
        .get_TextEquiv()[0].Unicode
    assert '\n' not in region_text, region_text


def test_scan_parity_edge_cases_review():
    """Review batch: shapes where the scanner must match (or refuse)
    what the lxml lanes do."""
    xml = _rich_page_xml()
    # 1. a TextRegion inside an untracked container (TableRegion) is
    #    IGNORED like lxml's direct-children findall — never adopted
    #    as a top-level region
    adopted = xml.replace(
        '</Page>',
        '<TableRegion id="tab1"><TextRegion id="inner">'
        '<TextEquiv><Unicode>x</Unicode></TextEquiv>'
        '</TextRegion></TableRegion></Page>')
    doc = NativePageDoc(adopted.encode('utf-8'))
    assert doc.bail is None
    ids = {doc.elem_id(int(i))
           for i in np.nonzero(doc.ekind == 0)[0]}
    assert 'inner' not in ids
    obj = parse_page(adopted)
    assert {r.id for r in obj.page.get_TextRegion()} == ids
    # 2. a TextLine nested through a wrapper element is ignored too
    wrapped = xml.replace(
        '<TextLine id="p1_r1_l0">',
        '<Wrapper><TextLine id="ghost"><TextEquiv><Unicode>g'
        '</Unicode></TextEquiv></TextLine></Wrapper>'
        '<TextLine id="p1_r1_l0">')
    doc = NativePageDoc(wrapped.encode('utf-8'))
    assert doc.bail is None
    line_ids = {doc.elem_id(int(i))
                for i in np.nonzero(doc.ekind == 1)[0]}
    assert 'ghost' not in line_ids
    # 3. a comment inside Unicode splits .text in lxml -> bail
    doc = NativePageDoc(xml.replace(
        '<Unicode>Das</Unicode>',
        '<Unicode>Da<!-- x -->s</Unicode>').encode('utf-8'))
    assert doc.bail is not None
    # 4. count-balanced but MISMATCHED close tags bail (lxml raises)
    doc = NativePageDoc(xml.replace(
        '<Unicode>Das</Unicode>',
        '<Unicode>Das</Foo>', 1).replace(
        '</TextEquiv>', '</Unicode></TextEquiv>', 1).encode('utf-8'))
    assert doc.bail is not None
    # 5. XML-invalid character references bail (lxml rejects them)
    for ref in ('&#3;', '&#xD800;', '&#4294967297;'):
        doc = NativePageDoc(xml.replace(
            'Das', 'D%ss' % ref).encode('utf-8'))
        assert doc.bail is not None, ref


def test_join_regionref_fallback_form(tmp_path, monkeypatch):
    """Relation joins expressed as two generic RegionRef children (the
    form parse_relations supports as refs[0]/refs[1]) are collected by
    the scanner and honored by the projection — and ReadingOrder's own
    RegionRefs never leak into the join set."""
    from ocrd_keraslm_tpu.wrapper.page import parse_page
    from ocrd_keraslm_tpu.wrapper.rate import (
        page_update_higher_textequiv_levels)

    pcgts = build_pcgts([['Auf', 'klae'], ['rung', 'jetzt']])
    xml = to_xml(pcgts)
    lines = pcgts.page.get_TextRegion()[0].get_TextLine()
    w_src = lines[0].get_Word()[-1].id
    w_tgt = lines[1].get_Word()[0].id
    joined = xml.replace(
        '</Page>',
        '<ReadingOrder><OrderedGroup id="ro">'
        '<RegionRefIndexed index="0" regionRef="page1_r1"/>'
        '</OrderedGroup></ReadingOrder>'
        '<Relations><Relation type="join">'
        '<RegionRef regionRef="%s"/><RegionRef regionRef="%s"/>'
        '</Relation></Relations></Page>' % (w_src, w_tgt))
    doc = NativePageDoc(joined.encode('utf-8'))
    assert doc.bail is None
    assert doc.joins == {(w_src, w_tgt)}
    # projection parity vs the lxml lane
    obj = parse_page(joined)
    page_update_higher_textequiv_levels('word', obj)
    want = obj.page.get_TextRegion()[0].get_TextEquiv()[0].Unicode
    for native_apply in ('1', '0'):
        monkeypatch.setenv('KERASLM_NATIVE_APPLY', native_apply)
        nd = NativePageDoc(joined.encode('utf-8'))
        out = _native_decode_and_serialize(nd, 'word', pick=0)
        got = parse_page(out).page.get_TextRegion()[0] \
            .get_TextEquiv()[0].Unicode
        assert got == want, ('apply=%s' % native_apply, got)


def test_scan_doctype_and_cdata_accepted():
    """Round-5 scanner extension: a plain DOCTYPE declaration is
    skipped and CDATA sections join <Unicode> text literally (both
    lxml parity) — these were tied with nested TextRegion as the top
    bail causes in the realistic-mix measurement.  Lattice arrays must
    be bit-identical to the undoctored document's."""
    import string

    xml = _rich_page_xml()
    base = NativePageDoc(xml.encode('utf-8'))
    assert base.bail is None
    r = Rater()
    r.voc_size = 100
    r.vocab.assign(string.printable[:99])

    def arrays(doc):
        lat = doc.lattice('glyph', True, DECODE_MERGE_MAX)
        assert lat is not None
        n_raw, n_prep, maxlen = lat
        return doc.fill(r.vocab._table(), max(n_prep, 8), 4,
                        max(maxlen, 2))

    ref = arrays(base)

    # plain DOCTYPE before the root
    i = xml.find('?>')
    with_doctype = xml[:i + 2] + '\n<!DOCTYPE PcGts>' + xml[i + 2:]
    doc = NativePageDoc(with_doctype.encode('utf-8'))
    assert doc.bail is None, doc.bail
    got = arrays(doc)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    # CDATA splitting a Unicode's text: joined literally with the
    # surrounding character data
    j = xml.find('<Unicode>')
    k = xml.find('</Unicode>', j)
    inner = xml[j + 9:k]
    assert inner
    cut = max(1, len(inner) // 2)
    with_cdata = (xml[:j] + '<Unicode><![CDATA[' + inner[:cut] + ']]>'
                  + inner[cut:] + '</Unicode>' + xml[k + 10:])
    doc = NativePageDoc(with_cdata.encode('utf-8'))
    assert doc.bail is None, doc.bail
    got = arrays(doc)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    # CDATA containing markup-special characters stays literal
    with_lt = (xml[:j] + '<Unicode><![CDATA[<&]]></Unicode>'
               + xml[k + 10:])
    doc = NativePageDoc(with_lt.encode('utf-8'))
    assert doc.bail is None, doc.bail
