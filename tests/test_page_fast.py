"""Differential tests: etree-direct fast PAGE path vs object model.

The fast path (wrapper/page_fast.py) must behave EXACTLY like the
object-model path through every processor phase — lattice construction,
tokenisation repair, write-back, higher-level projection, metadata
agents, serialization — plus preserve content the object model drops.
"""
import os

import pytest

from ocrd_keraslm_tpu.wrapper.page import (Glyph, PcGts, RegionRefType,
                                           RelationType, RelationsType,
                                           TextEquivType, TextLine,
                                           TextRegion, Word, parse_page,
                                           to_xml)
from ocrd_keraslm_tpu.wrapper.page_fast import parse_page_fast
from ocrd_keraslm_tpu.wrapper.rate import (
    _page_update_from_path, page_get_linear_lattice_at,
    page_update_higher_textequiv_levels)

from helpers import build_pcgts, build_workspace, make_tiny_model


def _rich_page_xml():
    """Two regions, alternatives with/without conf and index, one
    empty-ish word, line/region annotations."""
    pcgts = build_pcgts(
        [['Das', 'ist'], ['ein', 'Test']], page_id='p1',
        glyph_alternatives={
            (0, 0, 0): [('D', 0.9), ('O', 0.85), ('Q', 0.2)],
            (1, 1, 2): [('s', 0.6), ('S', 0.55)],
        })
    region2 = TextRegion('p1_r2')
    line = TextLine('p1_r2_l0')
    word = Word('p1_r2_w0')
    word.add_TextEquiv(TextEquivType(Unicode='Ende', conf=0.8))
    for gi, ch in enumerate('Ende'):
        glyph = Glyph('p1_r2_w0_g%d' % gi)
        # no conf, no index on purpose (None-conf handling)
        glyph.add_TextEquiv(TextEquivType(Unicode=ch))
        word.add_Glyph(glyph)
    line.add_Word(word)
    line.add_TextEquiv(TextEquivType(Unicode='Ende', conf=0.8))
    region2.add_TextLine(line)
    region2.add_TextEquiv(TextEquivType(Unicode='Ende', conf=0.8))
    pcgts.page.add_TextRegion(region2)
    return to_xml(pcgts)


def _alts(edges):
    return [(edge['element'].id if edge['element'] is not None else None,
             [(te.Unicode, pytest.approx(te.conf))
              for te in edge['alternatives']])
            for edge in edges]


@pytest.mark.parametrize('level', ['glyph', 'word', 'line', 'region'])
def test_lattice_parity(level):
    xml = _rich_page_xml()
    edges_obj = page_get_linear_lattice_at(level, parse_page(xml))
    edges_fast = page_get_linear_lattice_at(level, parse_page_fast(
        xml.encode('utf-8')))
    assert _alts(edges_fast) == _alts(edges_obj)


def test_lattice_tokenisation_repair_parity():
    """Line text concatenates its words without space -> the artificial
    space edge must be skipped identically on both paths."""
    pcgts = build_pcgts([['Zeilen', 'umbruch']], page_id='p1')
    # annotate the line WITHOUT the joining space (tokenisation problem)
    line = pcgts.page.regions[0].lines[0]
    line.set_TextEquiv([TextEquivType(Unicode='Zeilenumbruch',
                                      conf=0.9)])
    pcgts.page.regions[0].set_TextEquiv(
        [TextEquivType(Unicode='Zeilenumbruch', conf=0.9)])
    xml = to_xml(pcgts)
    edges_obj = page_get_linear_lattice_at('word', parse_page(xml))
    edges_fast = page_get_linear_lattice_at(
        'word', parse_page_fast(xml.encode('utf-8')))
    texts = [e['alternatives'][0].Unicode for e in edges_obj]
    assert ' ' not in texts  # the repair actually fired
    assert _alts(edges_fast) == _alts(edges_obj)


def _decode_and_serialize(doc, level, pick=1):
    """Simulate a decode outcome: per element pick alternative
    ``pick`` (or the last when fewer), write back with a score,
    project, serialize."""
    edges = page_get_linear_lattice_at(level, doc)
    path = []
    for edge in edges:
        alts = edge['alternatives']
        te = alts[min(pick, len(alts) - 1)]
        path.append((edge['element'], te, 0.75))
    _page_update_from_path(level, path, entropy=12.0)
    page_update_higher_textequiv_levels(level, doc)
    return to_xml(doc)


def _page_content(xml):
    """Parsed content snapshot: (id, texts, confs) of every element."""
    pcgts = parse_page(xml)
    out = []
    for region in pcgts.page.get_AllRegions():
        def snap(el):
            out.append((el.id,
                        [te.Unicode for te in el.get_TextEquiv()],
                        [te.conf and round(te.conf, 5)
                         for te in el.get_TextEquiv()]))
        snap(region)
        for line in region.get_TextLine():
            snap(line)
            for word in line.get_Word():
                snap(word)
                for glyph in word.get_Glyph():
                    snap(glyph)
    return pcgts.pcGtsId, out


@pytest.mark.parametrize('level', ['glyph', 'word'])
def test_writeback_projection_parity(level):
    xml = _rich_page_xml()
    out_obj = _decode_and_serialize(parse_page(xml), level)
    out_fast = _decode_and_serialize(
        parse_page_fast(xml.encode('utf-8')), level)
    assert _page_content(out_fast) == _page_content(out_obj)
    # the decode replaced alternatives with single winners at the
    # decoded level and above (below it they are untouched — e.g.
    # glyph alternatives survive a word-level decode on both paths)
    _, content = _page_content(out_fast)
    assert all(len(texts) == 1 for eid, texts, _ in content
               if level == 'glyph' or '_g' not in eid)


def test_writeback_projection_parity_rtl_btt_joins():
    """Layout directives (right-to-left words, bottom-to-top lines) and
    Relation type=join must project identically."""
    def build():
        pcgts = build_pcgts([['abc', 'def'], ['ghi', 'jkl']],
                            page_id='p1')
        region = pcgts.page.regions[0]
        region.textLineOrder = 'bottom-to-top'
        region.lines[0].readingDirection = 'right-to-left'
        rels = RelationsType()
        rel = RelationType('join')
        rel._source = RegionRefType(region.lines[0].words[-1].id)
        rel._target = RegionRefType(region.lines[1].words[0].id)
        rels.relations.append(rel)
        pcgts.page.relations = rels
        return to_xml(pcgts)

    xml = build()
    out_obj = _decode_and_serialize(parse_page(xml), 'glyph', pick=0)
    out_fast = _decode_and_serialize(
        parse_page_fast(xml.encode('utf-8')), 'glyph', pick=0)
    assert _page_content(out_fast) == _page_content(out_obj)
    # RTL line really reversed in the projection
    _, content = _page_content(out_fast)
    line0 = dict((i, t) for i, t, _ in content)['p1_r1_l0']
    assert line0 == ['fed cba']


def test_fast_preserves_unmodeled_content():
    """Content outside the object model (Border, TextStyle, Coords,
    custom attributes) must survive the fast round-trip."""
    xml = _rich_page_xml()
    # inject unmodeled content the object path would DROP
    xml = xml.replace(
        '<Page ',
        '<Page customAttr="kept" ')
    xml = xml.replace(
        '<TextRegion id="p1_r1">',
        '<Border><Coords points="0,0 9,9"/></Border>'
        '<TextRegion id="p1_r1" orientation="0.5">'
        '<TextStyle fontSize="12.0"/>')
    doc = parse_page_fast(xml.encode('utf-8'))
    out = _decode_and_serialize(doc, 'glyph')
    assert 'customAttr="kept"' in out
    assert '<Border>' in out and 'points="0,0 9,9"' in out
    assert 'orientation="0.5"' in out
    assert 'fontSize="12.0"' in out
    # and the decode still happened (single winners, scores written)
    _, content = _page_content(out)
    assert all(len(texts) == 1 for _, texts, _ in content)


def test_fast_metadata_agent_and_pcgtsid():
    xml = _rich_page_xml()
    doc = parse_page_fast(xml.encode('utf-8'))
    from ocrd_keraslm_tpu.wrapper.page import MetadataItem
    doc.set_pcGtsId('OUT_0001')
    doc.add_metadata_item(MetadataItem(
        type='processingStep', name='recognition/text-recognition',
        value='ocrd-keraslm-rate',
        labels={'parameters': {'beam_width': '16'}}))
    out = to_xml(doc)
    back = parse_page(out)
    assert back.pcGtsId == 'OUT_0001'
    items = [item for item in back.metadata.items
             if item.value == 'ocrd-keraslm-rate']
    assert items and items[0].labels['parameters']['beam_width'] == '16'
    # Metadata stays schema-ordered: Creator, Created, LastChange first
    assert out.index('<Creator>') < out.index('<Created>') \
        < out.index('<LastChange>') < out.index('<MetadataItem')


@pytest.mark.parametrize('level', ['glyph', 'word'])
def test_processor_e2e_fast_vs_object(tmp_path, level, monkeypatch):
    """Full KerasRate decode runs bit-equal content through both page
    backends."""
    from ocrd_keraslm_tpu.wrapper import KerasRate
    from ocrd_keraslm_tpu.wrapper.mets import Workspace

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']],
             'phys_0002': [['Ende', 'gut']]}
    alts = {(0, 0, 0): [('D', 0.9), ('O', 0.88)],
            (1, 0, 1): [('e', 0.7), ('c', 0.69)]}
    outputs = {}
    for fast in ('1', '0'):
        wdir = tmp_path / ('ws_fast%s' % fast)
        ws = build_workspace(wdir, pages, glyph_alternatives=alts)
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': level,
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.process_workspace(ws)
        outputs[fast] = {
            page_id: _page_content(open(
                os.path.join(wdir, 'OCR-D-LM',
                             'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in pages}
    assert outputs['1'] == outputs['0']


def test_processor_e2e_fast_vs_object_scoring(tmp_path, monkeypatch):
    """Stateless scoring (alternative_decoding=false) parity."""
    from ocrd_keraslm_tpu.wrapper import KerasRate
    from ocrd_keraslm_tpu.wrapper.mets import Workspace

    model = make_tiny_model(tmp_path / 'model.h5')
    pages = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']]}
    outputs = {}
    for fast in ('1', '0'):
        wdir = tmp_path / ('wss_fast%s' % fast)
        ws = build_workspace(wdir, pages)
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'word',
                                    'alternative_decoding': False})
        proc.setup()
        proc.process_workspace(ws)
        outputs[fast] = _page_content(open(
            os.path.join(wdir, 'OCR-D-LM', 'OCR-D-LM_phys_0001.xml'),
            encoding='utf-8').read())
    assert outputs['1'] == outputs['0']


def test_set_textequiv_twice_after_projection():
    """Re-setting TextEquivs on an element whose previous set came
    from projection (plain TextEquivType, no source node) must replace
    the materialized node, not crash or duplicate it."""
    xml = _rich_page_xml()
    doc = parse_page_fast(xml.encode('utf-8'))
    word = doc.page.get_AllRegions()[0].get_TextLine()[0].get_Word()[0]
    word.set_TextEquiv([TextEquivType(Unicode='erste', conf=0.5)])
    word.set_TextEquiv([TextEquivType(Unicode='zweite', conf=0.6)])
    out = to_xml(doc)
    reparsed = parse_page(out)
    w2 = reparsed.page.get_AllRegions()[0].get_TextLine()[0] \
        .get_Word()[0]
    assert [te.Unicode for te in w2.get_TextEquiv()] == ['zweite']


def test_textequiv_inserted_before_textstyle():
    """PAGE schema order: a materialized TextEquiv must precede an
    existing TextStyle child (a trailing append breaks validation)."""
    from lxml import etree

    xml = _rich_page_xml()
    # give the first word a TextStyle child
    xml = xml.replace('</Word>',
                      '<TextStyle fontSize="8"/></Word>', 1)
    doc = parse_page_fast(xml.encode('utf-8'))
    word = doc.page.get_AllRegions()[0].get_TextLine()[0].get_Word()[0]
    word.set_TextEquiv([TextEquivType(Unicode='neu', conf=0.5)])
    out = to_xml(doc)
    root = etree.fromstring(out.encode('utf-8')
                            if isinstance(out, str) else out)
    ns = {'p': 'http://schema.primaresearch.org/PAGE/gts/'
               'pagecontent/2019-07-15'}
    w_el = root.find('.//p:Word', ns)
    tags = [etree.QName(ch).localname for ch in w_el]
    assert 'TextEquiv' in tags and 'TextStyle' in tags
    assert tags.index('TextEquiv') < tags.index('TextStyle')


def test_region_textequiv_inserted_after_lines():
    """Regression (review finding): UserDefined/Labels are LEADING
    children in the PAGE schema — a region-level TextEquiv must land
    AFTER the region's TextLines (before TextStyle only), not before
    them."""
    from lxml import etree

    xml = _rich_page_xml()
    # region with a leading UserDefined and a trailing TextStyle
    xml = xml.replace(
        '<TextRegion id="p1_r1">',
        '<TextRegion id="p1_r1"><UserDefined><UserAttribute '
        'name="k" value="v"/></UserDefined>')
    xml = xml.replace('</TextRegion>',
                      '<TextStyle fontSize="9"/></TextRegion>', 1)
    doc = parse_page_fast(xml.encode('utf-8'))
    region = doc.page.get_AllRegions()[0]
    region.set_TextEquiv([TextEquivType(Unicode='R', conf=0.5)])
    out = to_xml(doc)
    root = etree.fromstring(out.encode('utf-8')
                            if isinstance(out, str) else out)
    ns = {'p': 'http://schema.primaresearch.org/PAGE/gts/'
               'pagecontent/2019-07-15'}
    r_el = root.find('.//p:TextRegion', ns)
    tags = [etree.QName(ch).localname for ch in r_el]
    assert tags.index('UserDefined') < tags.index('TextLine')
    assert tags.index('TextLine') < tags.index('TextEquiv')
    assert tags.index('TextEquiv') < tags.index('TextStyle')
