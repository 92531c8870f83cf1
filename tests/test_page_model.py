"""Unit tests of the standalone PAGE-XML model: parse/serialize
round-trip, reading-order/direction-aware text projection, joins,
tokenisation repair, METS round-trip."""
import os

from ocrd_keraslm_tpu.wrapper.mets import (Mets, MetsFile, Workspace,
                                           mets_to_xml, parse_mets)
from ocrd_keraslm_tpu.wrapper.page import (Glyph, OrderedGroupType,
                                           PcGts, ReadingOrder,
                                           RegionRefIndexedType,
                                           RelationsType, RelationType,
                                           TextEquivType, TextLine,
                                           TextRegion, Word, parse_page,
                                           to_xml)
from ocrd_keraslm_tpu.wrapper.rate import (
    _page_get_tokenisation_problems, _repair_tokenisation,
    page_get_linear_graph_at, page_update_higher_textequiv_levels)

from helpers import build_pcgts


def test_page_roundtrip():
    pcgts = build_pcgts([['Hallo', 'Welt'], ['zweite', 'Zeile']],
                        page_id='t1')
    xml = to_xml(pcgts)
    back = parse_page(xml)
    assert back.get_pcGtsId() == 't1'
    region = back.get_Page().get_TextRegion()[0]
    assert len(region.get_TextLine()) == 2
    words = region.get_TextLine()[0].get_Word()
    assert [w.get_TextEquiv()[0].Unicode for w in words] == \
        ['Hallo', 'Welt']
    glyphs = words[0].get_Glyph()
    assert ''.join(g.get_TextEquiv()[0].Unicode for g in glyphs) == \
        'Hallo'
    assert abs(words[0].get_TextEquiv()[0].conf - 0.9) < 1e-6


def test_projection_plain():
    pcgts = build_pcgts([['ab', 'cd'], ['ef']])
    # wipe word annotations, keep glyphs; project up from glyph
    for region in pcgts.get_Page().get_TextRegion():
        for line in region.get_TextLine():
            for word in line.get_Word():
                word.set_TextEquiv([])
            line.set_TextEquiv([])
        region.set_TextEquiv([])
    page_update_higher_textequiv_levels('glyph', pcgts)
    region = pcgts.get_Page().get_TextRegion()[0]
    assert region.get_TextEquiv()[0].Unicode == 'ab cd\nef'


def test_projection_rtl_and_btt():
    """right-to-left words and bottom-to-top lines are traversed in
    reverse when concatenating."""
    pcgts = build_pcgts([['ab', 'cd'], ['ef', 'gh']])
    region = pcgts.get_Page().get_TextRegion()[0]
    region.textLineOrder = 'bottom-to-top'
    for line in region.get_TextLine():
        line.readingDirection = 'right-to-left'
    page_update_higher_textequiv_levels('word', pcgts)
    # lines reversed; words within each line reversed
    assert region.get_TextEquiv()[0].Unicode == 'gh ef\ncd ab'


def test_projection_join_relation():
    """Relation type=join suppresses the whitespace between two words."""
    pcgts = build_pcgts([['foo', 'bar']])
    region = pcgts.get_Page().get_TextRegion()[0]
    line = region.get_TextLine()[0]
    w1, w2 = line.get_Word()
    rels = RelationsType()
    rels.relations.append(RelationType('join', w1.id, w2.id))
    pcgts.get_Page().relations = rels
    # join applies at the line->region step via last/first words
    pcgts2 = build_pcgts([['foo'], ['bar']])
    region2 = pcgts2.get_Page().get_TextRegion()[0]
    la, lb = region2.get_TextLine()
    rels2 = RelationsType()
    rels2.relations.append(RelationType(
        'join', la.get_Word()[-1].id, lb.get_Word()[0].id))
    pcgts2.get_Page().relations = rels2
    page_update_higher_textequiv_levels('word', pcgts2)
    assert region2.get_TextEquiv()[0].Unicode == 'foobar'


def test_reading_order_sorting():
    """Subregions listed out of order are concatenated by their
    OrderedGroup index."""
    pcgts = PcGts()
    parent = TextRegion('parent')
    sub_b = TextRegion('r_b')
    sub_b.add_TextEquiv(TextEquivType(Unicode='SECOND', conf=1.0))
    sub_a = TextRegion('r_a')
    sub_a.add_TextEquiv(TextEquivType(Unicode='FIRST', conf=1.0))
    parent.text_regions = [sub_b, sub_a]  # document order wrong
    pcgts.page.add_TextRegion(parent)
    ro = ReadingOrder()
    group = OrderedGroupType('g1')
    group.region_refs = [RegionRefIndexedType('r_a', 0),
                         RegionRefIndexedType('r_b', 1)]
    ro.ordered_group = group
    pcgts.page.reading_order = ro
    page_update_higher_textequiv_levels('line', pcgts)
    assert parent.get_TextEquiv()[0].Unicode == 'FIRST\nSECOND'


def test_tokenisation_repair():
    # annotation concatenates 'foobar', children tokenised 'foo','bar'
    assert _repair_tokenisation('foobar baz', 'foo', 'bar')
    assert not _repair_tokenisation('foo bar baz', 'foo', 'bar')


def test_tokenisation_problem_detection_and_graph():
    pcgts = build_pcgts([['foo', 'bar']])
    region = pcgts.get_Page().get_TextRegion()[0]
    line = region.get_TextLine()[0]
    # line annotation joins without space -> tokenisation problem
    line.set_TextEquiv([TextEquivType(Unicode='foobar', conf=1.0)])
    problems = _page_get_tokenisation_problems('word', pcgts)
    assert line.id in problems
    graph, start, end = page_get_linear_graph_at('word', pcgts)
    # 2 word edges, NO space edge between them (repair applied)
    edges = [graph.edges[e] for e in graph.edges]
    texts = [e['alternatives'][0].Unicode for e in edges]
    assert texts == ['foo', 'bar']


def test_linear_graph_spaces():
    pcgts = build_pcgts([['ab', 'cd'], ['ef']])
    graph, start, end = page_get_linear_graph_at('word', pcgts)
    texts = [graph.edges[e]['alternatives'][0].Unicode
             for e in sorted(graph.edges)]
    assert texts == ['ab', ' ', 'cd', '\n', 'ef']


def test_mets_roundtrip(tmp_path):
    mets = Mets(unique_identifier='urn:x/test_doc_1784')
    mets.file_groups['GRP'] = [MetsFile(
        ID='GRP_0001', fileGrp='GRP', local_filename='GRP/0001.xml',
        pageId='phys_0001')]
    mets.page_ids.append('phys_0001')
    xml = mets_to_xml(mets)
    path = tmp_path / 'mets.xml'
    path.write_text(xml)
    back = parse_mets(str(path))
    assert back.unique_identifier == 'urn:x/test_doc_1784'
    files = list(back.find_files(fileGrp='GRP'))
    assert len(files) == 1
    assert files[0].pageId == 'phys_0001'
    assert files[0].local_filename == 'GRP/0001.xml'


def test_workspace_add_file(tmp_path):
    ws = Workspace(str(tmp_path))
    ws.add_file('OUT', 'OUT_1', 'p1', 'OUT/OUT_1.xml',
                content='<x/>')
    ws.save_mets()
    assert os.path.exists(tmp_path / 'OUT' / 'OUT_1.xml')
    ws2 = Workspace(str(tmp_path))
    assert next(ws2.mets.find_files(ID='OUT_1')).pageId == 'p1'
    # duplicate add raises unless forced
    try:
        ws2.add_file('OUT', 'OUT_1', 'p1', 'OUT/OUT_1.xml',
                     content='<y/>')
        raised = False
    except FileExistsError:
        raised = True
    assert raised


def test_reading_order_nested_indexed_groups():
    """Nested indexed groups reference their region via regionRef —
    subregion sorting must key on that, not the group id."""
    from ocrd_keraslm_tpu.wrapper.page import OrderedGroupIndexedType
    pcgts = PcGts()
    parent = TextRegion('parent')
    sub_b = TextRegion('r_b')
    sub_b.add_TextEquiv(TextEquivType(Unicode='SECOND', conf=1.0))
    sub_a = TextRegion('r_a')
    sub_a.add_TextEquiv(TextEquivType(Unicode='FIRST', conf=1.0))
    parent.text_regions = [sub_b, sub_a]  # document order wrong
    pcgts.page.add_TextRegion(parent)
    ro = ReadingOrder()
    group = OrderedGroupType('g0')
    # subregions ordered through nested indexed groups (id != ref)
    ga = OrderedGroupIndexedType('g_a', 0)
    ga.regionRef = 'r_a'
    gb = OrderedGroupIndexedType('g_b', 1)
    gb.regionRef = 'r_b'
    group.ordered_groups = [ga, gb]
    ro.ordered_group = group
    pcgts.page.reading_order = ro
    page_update_higher_textequiv_levels('line', pcgts)
    assert parent.get_TextEquiv()[0].Unicode == 'FIRST\nSECOND'


def test_conf_zero_preserved():
    """An explicit conf=0.0 alternative stays least-confident (the
    reference falsy-coerces it to 1.0 — documented deviation)."""
    from ocrd_keraslm_tpu.wrapper.rate import _filter_choices
    tes = [TextEquivType(Unicode='a', conf=0.9, index=0),
           TextEquivType(Unicode='b', conf=0.0, index=1)]
    kept = _filter_choices(tes)
    # 0.0 is preserved, so 'b' falls outside the 0.1-conf window
    assert [te.Unicode for te in kept] == ['a']
    tes2 = [TextEquivType(Unicode='a', conf=None, index=0)]
    kept2 = _filter_choices(tes2)
    assert kept2[0].conf == 1.0
