"""Seeded fuzz: randomized raw PAGE-XML through all three page lanes.

The existing differential tests pin hand-picked shapes; this module
generates WHOLE documents as raw XML text (never via the object-model
serializer), so it exercises the native C++ scanner's actual parsing
surface: randomized attribute order and intra-tag whitespace, XML
comments, character references, CRLF endings, missing/extra conf and
index attributes, layout-direction attributes, tokenisation problems,
plus ReadingOrder groups and Relation type=join blocks (served by
the native lane; joins must suppress line-boundary newlines
identically in every lane).

Contract under test (same as test_page_native.py's three-lane e2e):
for ANY well-formed PAGE document, decoded output CONTENT is identical
across native / lxml-record / object lanes.  Serialized bytes may
differ (the native lane splices the original bytes); parsed content
may not.
"""
import os
import random

import pytest

from ocrd_keraslm_tpu.wrapper import page_native
from ocrd_keraslm_tpu.wrapper.mets import Mets, MetsFile, Workspace, \
    mets_to_xml

from helpers import make_tiny_model
from test_page_fast import _page_content

pytestmark = pytest.mark.skipif(not page_native.available(),
                                reason='native page scanner '
                                       'unavailable')

PAGE_NS = 'http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15'

# mostly in-vocab (tiny model alphabet) with a few multibyte /
# escape-needing characters; unknown chars map to index 0 by design
CHARS = 'abcdefgh stu.&<"ä—'


def _esc(text, rnd):
    """XML-escape; occasionally as numeric character references."""
    out = []
    for ch in text:
        if ch == '&':
            out.append('&amp;')
        elif ch == '<':
            out.append('&lt;')
        elif ch == '"':
            out.append('&quot;')
        elif rnd.random() < 0.08:
            out.append('&#%d;' % ord(ch))
        else:
            out.append(ch)
    return ''.join(out)


def _ws(rnd):
    """Random intra-tag whitespace."""
    return rnd.choice([' ', '  ', '\n    ', ' \t'])


def _comment(rnd):
    return '<!-- f%d -->' % rnd.randrange(100) \
        if rnd.random() < 0.15 else ''


def _conf_str(rnd, conf):
    """Randomized float formats the XML spec allows."""
    style = rnd.random()
    if style < 0.1:
        return '%.1e' % conf            # exponent notation
    if style < 0.2 and abs(conf - round(conf)) < 1e-9:
        return '%d' % round(conf)       # integer format
    return repr(round(conf, 3))


def _textequiv(rnd, text, conf, index):
    """A TextEquiv with randomized attribute order/whitespace and
    optional attribute omission."""
    attrs = []
    if conf is not None and rnd.random() < 0.9:
        attrs.append('conf="%s"' % _conf_str(rnd, conf))
    if index is not None and rnd.random() < 0.8:
        attrs.append('index="%d"' % index)
    rnd.shuffle(attrs)
    sep = _ws(rnd)
    head = ('TextEquiv' + (sep if attrs else '') + sep.join(attrs))
    if not text and rnd.random() < 0.5:
        return '<%s><Unicode/></TextEquiv>' % head
    return '<%s><Unicode>%s</Unicode></TextEquiv>' % (head,
                                                      _esc(text, rnd))


def fuzz_page_xml(rnd, page_id):
    """One randomized PAGE document as raw XML text.  Returns
    (xml_str, wants_bail)."""
    parts = []
    parts.append('<?xml version="1.0" encoding="UTF-8"?>')
    parts.append('<PcGts xmlns="%s" pcGtsId="%s">' % (PAGE_NS, page_id))
    parts.append('<Metadata><Creator>fuzz</Creator>'
                 '<Created>2026-01-01T00:00:00</Created>'
                 '<LastChange>2026-01-01T00:00:00</LastChange>'
                 '</Metadata>')
    page_attrs = 'imageFilename="img.png" imageWidth="100" ' \
                 'imageHeight="100"'
    if rnd.random() < 0.15:
        page_attrs += ' textLineOrder="%s"' % rnd.choice(
            ['top-to-bottom', 'bottom-to-top', ''])
    parts.append('<Page %s>' % page_attrs)

    n_regions = rnd.randint(1, 2)
    region_ids = ['%s_r%d' % (page_id, ri) for ri in range(n_regions)]
    wants_ro = rnd.random() < 0.2
    if wants_ro and n_regions > 1:
        # a ReadingOrder group permuting the regions: inert for flat
        # pages in every lane (document-order lattice; the projection
        # only consults reading order for nested subregions)
        order = list(range(n_regions))
        rnd.shuffle(order)
        parts.append('<ReadingOrder><OrderedGroup id="%s_ro">' % page_id)
        for idx, ri in enumerate(order):
            parts.append('<RegionRefIndexed index="%d" regionRef="%s"/>'
                         % (idx, region_ids[ri]))
        parts.append('</OrderedGroup></ReadingOrder>')

    # (line_id, [word ids]) per region: Relation-join generation below
    # picks real line-boundary word pairs from these
    region_line_words = []
    for ri in range(n_regions):
        rattr = ''
        if rnd.random() < 0.2:
            rattr = ' textLineOrder="%s"' % rnd.choice(
                ['bottom-to-top', 'top-to-bottom', ''])
        parts.append('%s<TextRegion id="%s"%s>'
                     % (_comment(rnd), region_ids[ri], rattr))
        line_words = []
        region_line_words.append(line_words)
        line_texts = []
        for li in range(rnd.randint(1, 2)):
            lattr = ''
            if rnd.random() < 0.2:
                lattr = ' readingDirection="%s"' % rnd.choice(
                    ['right-to-left', 'left-to-right', ''])
            lid = '%s_l%d' % (region_ids[ri], li)
            parts.append('<TextLine id="%s"%s>' % (lid, lattr))
            word_texts = []
            word_ids = []
            line_words.append(word_ids)
            for wi in range(rnd.randint(1, 3)):
                wid = '%s_w%d' % (lid, wi)
                word_ids.append(wid)
                parts.append('%s<Word id="%s">' % (_comment(rnd), wid))
                glyph_chars = []
                for gi in range(rnd.randint(1, 4)):
                    gid = '%s_g%d' % (wid, gi)
                    parts.append('<Glyph id="%s">' % gid)
                    best = rnd.choice(CHARS)
                    glyph_chars.append(best)
                    # up to 6 alternatives: >4 exercises the choice
                    # filter (max 4, conf drop <= 0.1) identically in
                    # every lane
                    n_alts = rnd.choice([0, 1, 1, 2, 3, 4, 5, 6])
                    conf = round(rnd.uniform(0.5, 0.99), 3)
                    tie = rnd.random() < 0.2  # equal confs: doc order
                    for ai in range(n_alts):
                        ch = best if ai == 0 else rnd.choice(CHARS)
                        parts.append(_textequiv(
                            rnd, ch,
                            None if rnd.random() < 0.1 else
                            conf if tie else
                            round(max(conf - 0.05 * ai, 0.01), 3),
                            ai))
                    parts.append('</Glyph>')
                word = ''.join(glyph_chars)
                word_texts.append(word)
                parts.append(_textequiv(rnd, word,
                                        round(rnd.uniform(0.5, 0.99), 3),
                                        None))
                parts.append('</Word>')
            # occasionally concatenate words WITHOUT spaces in the
            # line annotation (tokenisation problem -> repair path)
            joiner = '' if rnd.random() < 0.15 else ' '
            line_text = joiner.join(word_texts)
            line_texts.append(line_text)
            parts.append(_textequiv(rnd, line_text,
                                    round(rnd.uniform(0.5, 0.99), 3),
                                    None))
            parts.append('</TextLine>')
        parts.append(_textequiv(rnd, '\n'.join(line_texts), 0.9, None))
        parts.append('</TextRegion>')
    if rnd.random() < 0.3:
        # Relation type=join across a real line boundary (all lanes
        # must suppress the newline identically), sometimes a pair
        # that matches no boundary (must be ignored identically), and
        # sometimes a non-join Relation type
        rels = []
        for _ in range(rnd.randint(1, 2)):
            lws = rnd.choice(region_line_words)
            if len(lws) >= 2 and rnd.random() < 0.7:
                li = rnd.randrange(len(lws) - 1)
                src, tgt = lws[li][-1], lws[li + 1][0]
            else:
                src = rnd.choice([w for ws_ in lws for w in ws_])
                tgt = 'no_such_word'
            rtype = 'join' if rnd.random() < 0.8 else 'link'
            rels.append('<Relation type="%s">'
                        '<SourceRegionRef regionRef="%s"/>'
                        '<TargetRegionRef regionRef="%s"/>'
                        '</Relation>' % (rtype, src, tgt))
        parts.append('<Relations>%s</Relations>' % ''.join(rels))
    parts.append('</Page>')
    parts.append('</PcGts>')
    joiner = '\n' if rnd.random() < 0.7 else ''
    xml = joiner.join(parts)
    if rnd.random() < 0.25:
        xml = xml.replace('\n', '\r\n')
    return xml, wants_ro


def _build_raw_workspace(tmpdir, page_xmls,
                         identifier='urn:fuzz/test_1784'):
    """Workspace from RAW page XML strings (no object-model round
    trip)."""
    file_grp = 'OCR-D-OCR'
    os.makedirs(os.path.join(tmpdir, file_grp), exist_ok=True)
    mets = Mets(unique_identifier=identifier)
    mets.file_groups[file_grp] = []
    for page_id, xml in page_xmls.items():
        fid = '%s_%s' % (file_grp, page_id)
        fname = os.path.join(file_grp, fid + '.xml')
        with open(os.path.join(tmpdir, fname), 'w', encoding='utf-8',
                  newline='') as fh:
            fh.write(xml)
        mets.file_groups[file_grp].append(MetsFile(
            ID=fid, fileGrp=file_grp, local_filename=fname,
            pageId=page_id))
        mets.page_ids.append(page_id)
    with open(os.path.join(tmpdir, 'mets.xml'), 'w',
              encoding='utf-8') as fh:
        fh.write(mets_to_xml(mets))
    return Workspace(str(tmpdir))


@pytest.fixture(scope='module')
def tiny_model(tmp_path_factory):
    return make_tiny_model(
        tmp_path_factory.mktemp('fuzz_model') / 'model.h5')


N_SEEDS = int(os.environ.get('KERASLM_FUZZ_SEEDS', '16'))


@pytest.mark.parametrize('seed', range(N_SEEDS))
def test_fuzz_three_lane_equality(tmp_path, monkeypatch, tiny_model,
                                  seed):
    from ocrd_keraslm_tpu.wrapper import KerasRate

    rnd = random.Random(1000 + seed)
    level = 'word' if rnd.random() < 0.25 else 'glyph'
    page_xmls = {}
    for pi in range(rnd.randint(1, 2)):
        page_id = 'phys_%04d' % (pi + 1)
        xml, _ = fuzz_page_xml(rnd, page_id)
        page_xmls[page_id] = xml

    outputs = {}
    lanes = {'native': ('1', '1'), 'records': ('1', '0'),
             'object': ('0', '0')}
    for lane, (fast, nat) in lanes.items():
        wdir = tmp_path / ('ws_%s' % lane)
        ws = _build_raw_workspace(wdir, page_xmls)
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': tiny_model,
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
            for page_id in page_xmls}

    assert outputs['native'] == outputs['records'], \
        'seed %d: native lane diverged' % seed
    assert outputs['records'] == outputs['object'], \
        'seed %d: record lane diverged' % seed


def _run_lanes(tmp_path, monkeypatch, model, page_xmls, parameter,
               lanes):
    from ocrd_keraslm_tpu.wrapper import KerasRate

    outputs = {}
    for lane, (fast, nat) in lanes.items():
        wdir = tmp_path / ('ws_%s' % lane)
        ws = _build_raw_workspace(wdir, page_xmls)
        monkeypatch.setenv('KERASLM_FAST_PAGE', fast)
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', nat)
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter=dict(parameter, model_file=model))
        proc.setup()
        proc.rater.fused_decode = True
        proc.process_workspace(ws)
        outputs[lane] = {
            page_id: _page_content(open(
                os.path.join(wdir, 'OCR-D-LM',
                             'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in page_xmls}
    return outputs


@pytest.mark.parametrize('seed', range(max(2, N_SEEDS // 3)))
def test_fuzz_lookahead_lane_equality(tmp_path, monkeypatch,
                                      tiny_model, seed):
    """Lookahead write-back (reference lock-in emulation): the native
    lane gates itself off; the lxml and requested-native runs must
    match the object lane exactly."""
    rnd = random.Random(5000 + seed)
    page_xmls = {}
    for pi in range(2):
        page_id = 'phys_%04d' % (pi + 1)
        xml, _ = fuzz_page_xml(rnd, page_id)
        page_xmls[page_id] = xml
    outputs = _run_lanes(
        tmp_path, monkeypatch, tiny_model, page_xmls,
        {'textequiv_level': 'glyph', 'alternative_decoding': True,
         'lookahead_writeback': True, 'beam_width': 4},
        {'native': ('1', '1'), 'records': ('1', '0'),
         'object': ('0', '0')})
    assert outputs['native'] == outputs['records'] == \
        outputs['object'], 'seed %d: lookahead lanes diverged' % seed


@pytest.mark.parametrize('seed', range(max(2, N_SEEDS // 3)))
def test_fuzz_scoring_lane_equality(tmp_path, monkeypatch, tiny_model,
                                    seed):
    """Plain scoring (alternative_decoding=false): record and object
    lanes blend confidences identically on fuzzed documents."""
    rnd = random.Random(7000 + seed)
    level = 'word' if rnd.random() < 0.5 else 'glyph'
    page_xmls = {}
    for pi in range(rnd.randint(1, 2)):
        page_id = 'phys_%04d' % (pi + 1)
        xml, _ = fuzz_page_xml(rnd, page_id)
        page_xmls[page_id] = xml
    outputs = _run_lanes(
        tmp_path, monkeypatch, tiny_model, page_xmls,
        {'textequiv_level': level, 'alternative_decoding': False},
        {'records': ('1', '0'), 'object': ('0', '0')})
    assert outputs['records'] == outputs['object'], \
        'seed %d: scoring lanes diverged' % seed


def test_fuzz_native_scanner_mutation_safety():
    """The C++ byte scanner parses UNTRUSTED files: under random byte
    mutations (truncations, flips, span deletes/duplications, hostile
    insertions) it must either bail or scan successfully — never
    crash.  Runs in a subprocess so a segfault fails THIS test with
    the offending seed instead of killing the pytest process."""
    import subprocess
    import sys

    script = r'''
import os
import sys
tests_dir = %r
sys.path.insert(0, tests_dir)
sys.path.insert(0, os.path.dirname(tests_dir))
import numpy as np
from helpers import build_pcgts
from ocrd_keraslm_tpu.wrapper import page_native
from ocrd_keraslm_tpu.wrapper.page import to_xml
from ocrd_keraslm_tpu.wrapper.page_native import NativePageDoc

if not page_native.available():
    print('SKIP')
    sys.exit(0)

base = to_xml(build_pcgts(
    [['Das', 'ist'], ['ein', 'Test']],
    glyph_alternatives={(0, 0, 0): [('D', 0.9), ('O', 0.8)]}
)).encode('utf-8')
N = int(os.environ.get('KERASLM_FUZZ_N', '300'))
rng = np.random.default_rng(20260819)
hostile = [b'<', b'>', b'&', b'&#x0;', b'&amp', b'<TextEquiv>',
           b'</Word>', b'\xff\xfe', b'\xc3', b'<![CDATA[', b'\x00']
for trial in range(N):
    data = bytearray(base)
    for _ in range(int(rng.integers(1, 4))):
        op = int(rng.integers(5))
        if op == 0 and len(data) > 10:       # truncate
            data = data[:int(rng.integers(1, len(data)))]
        elif op == 1 and len(data) > 1:      # flip bytes
            for _ in range(int(rng.integers(1, 8))):
                data[int(rng.integers(len(data)))] = \
                    int(rng.integers(256))
        elif op == 2 and len(data) > 20:     # delete a span
            a = int(rng.integers(len(data) - 10))
            b2 = a + int(rng.integers(1, min(64, len(data) - a)))
            del data[a:b2]
        elif op == 3 and len(data) > 20:     # duplicate a span
            a = int(rng.integers(len(data) - 10))
            b2 = a + int(rng.integers(1, min(64, len(data) - a)))
            data[a:a] = data[a:b2]
        else:                                # hostile insertion
            frag = hostile[int(rng.integers(len(hostile)))]
            a = int(rng.integers(len(data)))
            data[a:a] = frag
    try:
        doc = NativePageDoc(bytes(data))
        if doc.bail is None:
            # a successful scan must survive its accessors too
            doc.get_pcGtsId()
            lat = doc.lattice('glyph', True, 8)
            if lat is not None and lat[1] > 0:
                import string
                table = np.zeros(1114112, np.int32)
                for i, c in enumerate(string.printable):
                    table[ord(c)] = i + 1
                doc.fill(table, max(lat[1], 8), 4,
                         max(min(lat[2], 64), 1))
    except (ValueError, RuntimeError, MemoryError):
        pass  # a Python-level error is an acceptable rejection
print('OK %%d' %% N)
''' % os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, '-c', script],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        capture_output=True, text=True,
        timeout=max(300, int(os.environ.get('KERASLM_FUZZ_N',
                                            '300')) // 2))
    assert proc.returncode == 0, (
        'scanner crashed under mutation fuzzing:\n%s\n%s'
        % (proc.stdout[-2000:], proc.stderr[-2000:]))
    assert 'OK ' in proc.stdout or 'SKIP' in proc.stdout
