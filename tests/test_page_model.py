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
    # subregions carry their text on a LINE (realistic shape): the
    # children-first projection re-derives each subregion's text from
    # its lines BEFORE the parent joins them, so a lineless subregion
    # with only a preset TextEquiv would be cleared first (reference
    # semantics: overwrite=True recomputes every level)

    def sub_region(rid, text):
        sub = TextRegion(rid)
        line = TextLine(rid + '_l0')
        line.add_TextEquiv(TextEquivType(Unicode=text, conf=1.0))
        sub.add_TextLine(line)
        sub.add_TextEquiv(TextEquivType(Unicode='stale', conf=0.1))
        return sub

    sub_b = sub_region('r_b', 'SECOND')
    sub_a = sub_region('r_a', 'FIRST')
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
    # subregions carry their text on a LINE (realistic shape): the
    # children-first projection re-derives each subregion's text from
    # its lines BEFORE the parent joins them, so a lineless subregion
    # with only a preset TextEquiv would be cleared first (reference
    # semantics: overwrite=True recomputes every level)

    def sub_region(rid, text):
        sub = TextRegion(rid)
        line = TextLine(rid + '_l0')
        line.add_TextEquiv(TextEquivType(Unicode=text, conf=1.0))
        sub.add_TextLine(line)
        sub.add_TextEquiv(TextEquivType(Unicode='stale', conf=0.1))
        return sub

    sub_b = sub_region('r_b', 'SECOND')
    sub_a = sub_region('r_a', 'FIRST')
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


def test_mets_save_preserves_unmodeled_content(tmp_path):
    """Review regression: saving must UPDATE the original mets.xml in
    place — metsHdr/agents, LOGICAL structMap, div ORDER attributes,
    and custom file attributes all survive; new files/fptrs appear."""
    from lxml import etree

    from ocrd_keraslm_tpu.wrapper.mets import Workspace

    mets_xml = '''<?xml version="1.0" encoding="UTF-8"?>
<mets:mets xmlns:mets="http://www.loc.gov/METS/"
           xmlns:xlink="http://www.w3.org/1999/xlink"
           xmlns:mods="http://www.loc.gov/mods/v3" LABEL="kant">
  <mets:metsHdr CREATEDATE="2020-01-01T00:00:00">
    <mets:agent ROLE="CREATOR"><mets:name>ocrd/core</mets:name>
    </mets:agent>
  </mets:metsHdr>
  <mets:dmdSec ID="DMDLOG_0001"><mets:mdWrap MDTYPE="MODS">
    <mets:xmlData><mods:mods>
      <mods:identifier type="purl">urn:x/kant_1784</mods:identifier>
    </mods:mods></mets:xmlData></mets:mdWrap></mets:dmdSec>
  <mets:fileSec>
    <mets:fileGrp USE="OCR-D-OCR">
      <mets:file ID="OCR_0001" MIMETYPE="application/vnd.prima.page+xml"
                 GROUPID="g1">
        <mets:FLocat LOCTYPE="OTHER" OTHERLOCTYPE="FILE"
                     xlink:href="OCR-D-OCR/OCR_0001.xml"/>
      </mets:file>
    </mets:fileGrp>
  </mets:fileSec>
  <mets:structMap TYPE="LOGICAL">
    <mets:div TYPE="monograph" ORDERLABEL="Kant"/>
  </mets:structMap>
  <mets:structMap TYPE="PHYSICAL">
    <mets:div TYPE="physSequence">
      <mets:div TYPE="page" ID="phys_0001" ORDER="1">
        <mets:fptr FILEID="OCR_0001"/>
      </mets:div>
    </mets:div>
  </mets:structMap>
</mets:mets>'''
    with open(tmp_path / 'mets.xml', 'w', encoding='utf-8') as fh:
        fh.write(mets_xml)
    ws = Workspace(str(tmp_path))
    assert ws.mets.unique_identifier == 'urn:x/kant_1784'
    ws.add_file('OCR-D-LM', 'LM_0001', 'phys_0001',
                'OCR-D-LM/LM_0001.xml', content='<x/>')
    ws.save_mets()
    out = open(tmp_path / 'mets.xml', encoding='utf-8').read()
    root = etree.fromstring(out.encode('utf-8'))
    M = '{http://www.loc.gov/METS/}'
    # unmodeled content survives
    assert root.get('LABEL') == 'kant'
    assert root.find(M + 'metsHdr') is not None
    assert 'ocrd/core' in out
    logical = [sm for sm in root.findall(M + 'structMap')
               if sm.get('TYPE') == 'LOGICAL']
    assert logical and logical[0][0].get('ORDERLABEL') == 'Kant'
    # the original file keeps its custom attribute
    f_old = root.find('.//%sfile[@ID="OCR_0001"]' % M)
    assert f_old is not None and f_old.get('GROUPID') == 'g1'
    # the page div keeps ORDER and gains the new fptr
    div = root.find('.//%sdiv[@ID="phys_0001"]' % M)
    assert div.get('ORDER') == '1'
    assert {fp.get('FILEID') for fp in div.findall(M + 'fptr')} == \
        {'OCR_0001', 'LM_0001'}
    # the new file landed in a new group
    f_new = root.find('.//%sfile[@ID="LM_0001"]' % M)
    assert f_new is not None
    assert f_new.getparent().get('USE') == 'OCR-D-LM'
    # re-parse sees both
    ws2 = Workspace(str(tmp_path))
    assert {f.ID for f in ws2.mets.find_files()} == \
        {'OCR_0001', 'LM_0001'}


def test_mets_force_replace_across_groups(tmp_path):
    """Force-replacing a file into a DIFFERENT group drops the old
    entry everywhere (model + persisted tree)."""
    from lxml import etree

    from ocrd_keraslm_tpu.wrapper.mets import Workspace

    ws = Workspace(str(tmp_path))
    ws.add_file('A', 'X', 'p1', 'A/X.xml', content='<a/>')
    ws.save_mets()
    ws2 = Workspace(str(tmp_path))  # parsed: has an original tree
    ws2.add_file('B', 'X', 'p1', 'B/X.xml', content='<b/>',
                 force=True)
    assert [f.fileGrp for f in ws2.mets.find_files(ID='X')] == ['B']
    ws2.save_mets()
    root = etree.parse(str(tmp_path / 'mets.xml')).getroot()
    M = '{http://www.loc.gov/METS/}'
    els = root.findall('.//%sfile[@ID="X"]' % M)
    assert len(els) == 1 and els[0].getparent().get('USE') == 'B'


def test_parse_page_root_rejects_and_upgrades():
    """Review regression: a bare Page fragment in the PAGE namespace
    must REJECT (not yield an empty document); a legacy no-namespace
    PcGts must parse with its children visible."""
    import pytest

    from ocrd_keraslm_tpu.wrapper.page import (PAGE_NS, parse_page,
                                               parse_page_root)

    with pytest.raises(ValueError):
        parse_page_root('<Page xmlns="%s"/>' % PAGE_NS)
    doc = parse_page(
        '<PcGts><Page><TextRegion id="r1"><TextEquiv>'
        '<Unicode>text</Unicode></TextEquiv></TextRegion>'
        '</Page></PcGts>')
    assert doc.page.get_TextRegion()[0].id == 'r1'


def test_nested_region_emit_order():
    """PAGE XSD: nested TextRegions (base RegionType particle) precede
    the extension's TextLine*/TextEquiv*."""
    from lxml import etree

    from ocrd_keraslm_tpu.wrapper.page import parse_page, to_xml

    xml = build_pcgts([['a']])
    outer = xml.page.get_TextRegion()[0]
    from ocrd_keraslm_tpu.wrapper.page import TextEquivType, TextRegion
    sub = TextRegion('sub1')
    sub.add_TextEquiv(TextEquivType(Unicode='s', conf=0.5))
    outer.text_regions.append(sub)
    outer.add_TextEquiv(TextEquivType(Unicode='x', conf=0.5))
    out = to_xml(xml)
    root = etree.fromstring(out.encode('utf-8'))
    ns = {'p': 'http://schema.primaresearch.org/PAGE/gts/'
               'pagecontent/2019-07-15'}
    r = root.find('.//p:TextRegion', ns)
    tags = [etree.QName(ch).localname for ch in r]
    assert tags.index('TextRegion') < tags.index('TextLine')
    assert tags.index('TextLine') < tags.index('TextEquiv')
    # round trip preserves the nesting
    reparsed = parse_page(out)
    assert reparsed.page.get_TextRegion()[0].get_TextRegion()[0].id \
        == 'sub1'


def test_metadata_labels_externalmodel_roundtrip():
    """Labels with externalModel (or neither attribute) round-trip
    verbatim instead of being rewritten as comments / merged."""
    from ocrd_keraslm_tpu.wrapper.page import parse_page, to_xml

    xml = ('<?xml version="1.0"?>'
           '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
           'pagecontent/2019-07-15">'
           '<Metadata><Creator>c</Creator>'
           '<Created>2020-01-01T00:00:00</Created>'
           '<LastChange>2020-01-01T00:00:00</LastChange>'
           '<MetadataItem type="processingStep" name="n" value="v">'
           '<Labels externalModel="http://example.org/m">'
           '<Label type="a" value="1"/></Labels>'
           '<Labels><Label type="b" value="2"/></Labels>'
           '<Labels><Label type="c" value="3"/></Labels>'
           '</MetadataItem></Metadata><Page/></PcGts>')
    out = to_xml(parse_page(xml))
    assert 'externalModel="http://example.org/m"' in out
    assert 'comments="http://example.org/m"' not in out
    # BOTH attribute-less groups survive separately
    assert out.count('<Labels>') == 2
    assert '<Label type="b" value="2"/>' in out
    assert '<Label type="c" value="3"/>' in out


def test_nested_projection_children_first():
    """A parent region must join its subregions' FRESHLY projected
    texts, not their pre-decode TextEquivs (the reference's stated
    depth-first contract, wrapper/rate.py:517-519) — regression for
    the round-5 staleness fix."""
    pcgts = PcGts()
    outer = TextRegion('outer')
    sub = TextRegion('sub1')
    line = TextLine('l1')
    word = Word('w1')
    word.add_TextEquiv(TextEquivType(Unicode='OLD', conf=0.5))
    for ch in 'neu':
        g = Glyph('g_' + ch)
        g.add_TextEquiv(TextEquivType(Unicode=ch, conf=0.9))
        word.add_Glyph(g)
    line.add_Word(word)
    sub.add_TextLine(line)
    sub.add_TextEquiv(TextEquivType(Unicode='STALE-SUB', conf=0.5))
    outer.text_regions.append(sub)
    pcgts.page.add_TextRegion(outer)
    page_update_higher_textequiv_levels('glyph', pcgts)
    assert word.text_equivs[0].Unicode == 'neu'
    assert sub.text_equivs[0].Unicode == 'neu'
    assert outer.text_equivs[0].Unicode == 'neu'
