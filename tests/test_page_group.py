"""Page-group fused dispatch: consecutive native-lane pages decode in
ONE kernel call (wrapper/rate.py ``_flush_page_group``,
rater ``rate_best_device_begin_arrays_group``).

The contract under test: grouping is a pure dispatch-count
optimization — outputs must be BYTE-identical to per-page dispatches
(``KERASLM_FUSE_PAGES=0``), across group-size limits, mid-document
flushes, and cross-group carry.
"""
import os
import re

import pytest

from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper import KerasRate, page_native

from helpers import build_workspace, make_tiny_model

pytestmark = pytest.mark.skipif(not page_native.available(),
                                reason='native page scanner '
                                       'unavailable')

PAGES = {'phys_0001': [['Das', 'ist'], ['ein', 'Test']],
         'phys_0002': [['Ende', 'gut']],
         'phys_0003': [['alles', 'gut']],
         'phys_0004': [['und', 'aus']]}
# ambiguity the cross-page LM carry can act on
ALTS = {(0, 0, 0): [('D', 0.9), ('O', 0.88)],
        (1, 0, 1): [('e', 0.7), ('c', 0.69)],
        (3, 0, 0): [('u', 0.8), ('n', 0.79)]}


def _run(tmp_path, monkeypatch, lane_name, fuse, model,
         e_buckets=None, spy=None):
    wdir = tmp_path / ('ws_%s' % lane_name)
    ws = build_workspace(wdir, PAGES, glyph_alternatives=ALTS)
    monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
    monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
    monkeypatch.setenv('KERASLM_FUSE_PAGES', '1' if fuse else '0')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 4})
    proc.setup()
    proc.rater.fused_decode = True  # CPU: force the fused kernel
    if e_buckets is not None:
        proc.rater._E_BUCKETS = e_buckets
    if spy is not None:
        orig = Rater.rate_best_device_begin_arrays_group

        def spying(self, segs, **kw):
            spy.append([s[0] for s in segs])
            return orig(self, segs, **kw)

        monkeypatch.setattr(Rater, 'rate_best_device_begin_arrays_group',
                            spying)
    proc.process_workspace(ws)
    return {
        page_id: _strip_timestamps(open(
            os.path.join(wdir, 'OCR-D-LM',
                         'OCR-D-LM_%s.xml' % page_id),
            encoding='utf-8').read())
        for page_id in PAGES}


def _strip_timestamps(xml: str) -> str:
    """Byte-identical modulo the run's wall-clock metadata."""
    return re.sub(r'<(Created|LastChange)>[^<]*</\1>', r'<\1/>', xml)


def test_group_fusion_byte_identical(tmp_path, monkeypatch):
    """One fused group dispatch == per-page dispatches, byte for
    byte; and the group path must actually run (spy guard against a
    silent fallback)."""
    model = make_tiny_model(tmp_path / 'model.h5')
    spy = []
    fused = _run(tmp_path, monkeypatch, 'fused', True, model, spy=spy)
    plain = _run(tmp_path, monkeypatch, 'plain', False, model)
    assert fused == plain
    assert len(spy) == 1, 'all 4 pages must fuse into one dispatch'
    assert len(spy[0]) == len(PAGES)


def test_group_split_by_bucket_limit(tmp_path, monkeypatch):
    """When the group no longer fits one kernel block, it flushes and
    a new group starts — multiple groups chain the beam carry across
    dispatches and stay byte-identical to per-page runs."""
    model = make_tiny_model(tmp_path / 'model.h5')
    # the pages prep to 4/2/2/2 merged edges: a 4-edge bucket cap
    # forces group splits ([4], [2,2], [2])
    spy = []
    fused = _run(tmp_path, monkeypatch, 'split', True, model,
                 e_buckets=(4,), spy=spy)
    plain = _run(tmp_path, monkeypatch, 'plain2', False, model,
                 e_buckets=(4,))
    assert fused == plain
    assert len(spy) >= 2, 'the bucket cap must force multiple groups'
    assert sum(len(s) for s in spy) == len(PAGES)


def test_group_flush_on_ineligible_page(tmp_path, monkeypatch):
    """A mid-document page the native lane bails on (nested region)
    flushes the open group, decodes through the lxml lane, and the
    next pages regroup — byte-identical to the unfused run."""
    model = make_tiny_model(tmp_path / 'model.h5')

    def poison(wdir):
        p2 = os.path.join(str(wdir), 'OCR-D-OCR',
                          'OCR-D-OCR_phys_0002.xml')
        xml = open(p2, encoding='utf-8').read()
        with open(p2, 'w', encoding='utf-8') as fh:
            fh.write(xml.replace(
                '<TextRegion id="phys_0002_r1">',
                '<TextRegion id="phys_0002_r1">'
                '<TextRegion id="phys_0002_r1_nested">'
                '<TextEquiv><Unicode>x</Unicode></TextEquiv>'
                '</TextRegion>'))

    outputs = {}
    for lane, fuse in (('mixfuse', True), ('mixplain', False)):
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, PAGES, glyph_alternatives=ALTS)
        poison(wdir)
        monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
        monkeypatch.setenv('KERASLM_FUSE_PAGES',
                           '1' if fuse else '0')
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True
        spy = []
        if fuse:
            orig = Rater.rate_best_device_begin_arrays_group

            def spying(self, segs, _spy=spy, _orig=orig, **kw):
                _spy.append([s[0] for s in segs])
                return _orig(self, segs, **kw)

            monkeypatch.setattr(
                Rater, 'rate_best_device_begin_arrays_group', spying)
        proc.process_workspace(ws)
        if fuse:
            # page 1 alone, then pages 3+4 after the lxml page 2
            assert [len(s) for s in spy] == [1, 2]
        outputs[lane] = {
            page_id: _strip_timestamps(open(os.path.join(
                wdir, 'OCR-D-LM', 'OCR-D-LM_%s.xml' % page_id),
                encoding='utf-8').read())
            for page_id in PAGES}
    assert outputs['mixfuse'] == outputs['mixplain']


def test_group_matches_xla_reference(tmp_path, monkeypatch):
    """The fused group run matches the non-fused XLA device engine
    content-wise (winner texts and confidences), pinning the group
    kernel against an independent engine."""
    from test_page_fast import _page_content

    model = make_tiny_model(tmp_path / 'model.h5')
    fused = _run(tmp_path, monkeypatch, 'gfuse', True, model)

    wdir = tmp_path / 'ws_xla'
    ws = build_workspace(wdir, PAGES, glyph_alternatives=ALTS)
    monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
    monkeypatch.setenv('KERASLM_NATIVE_PAGE', '0')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 4})
    proc.setup()
    proc.rater.fused_decode = False  # XLA scan engine
    proc.process_workspace(ws)
    for page_id in PAGES:
        xla = _page_content(open(os.path.join(
            wdir, 'OCR-D-LM', 'OCR-D-LM_%s.xml' % page_id),
            encoding='utf-8').read())
        assert _page_content(fused[page_id]) == xla, page_id


def test_decode_weight_cache_cross_instance(tmp_path):
    """Two Raters over the same (unchanged) h5 share the
    process-wide device decode weights; any params change or a
    rewritten model file disables the reuse."""
    import time

    from ocrd_keraslm_tpu import rater as rater_mod

    model = make_tiny_model(tmp_path / 'm.h5')
    rater_mod._DECODE_WCACHE.clear()

    def fresh():
        r = Rater()
        r.load_config(model)
        r.configure()
        r.load_weights(model)
        return r

    r1, r2 = fresh(), fresh()
    w1 = r1._decode_weights(None, 0.5)
    w2 = r2._decode_weights(None, 0.5)
    assert w1['emb'] is w2['emb'], 'same file -> shared device arrays'

    # an API weight change invalidates the fingerprint epoch
    r2._params_changed()
    w3 = r2._decode_weights(None, 0.5)
    assert w3['emb'] is not w1['emb']

    # a rewritten model file (new size/mtime) must miss
    time.sleep(0.01)
    make_tiny_model(tmp_path / 'm.h5', seed=1)
    r4 = fresh()
    w4 = r4._decode_weights(None, 0.5)
    assert w4['emb'] is not w1['emb']


@pytest.mark.parametrize('policy', ['SKIP', 'COPY'])
def test_group_error_policy_mid_document(tmp_path, monkeypatch,
                                         policy):
    """A corrupt (non-XML) page mid-document under page-group fusion:
    the open group flushes, the bad page routes through the
    OCRD_MISSING_OUTPUT policy, and the following pages regroup —
    outputs equal the unfused run's."""
    model = make_tiny_model(tmp_path / 'model.h5')
    outputs = {}
    for lane, fuse in (('polfuse', True), ('polplain', False)):
        wdir = tmp_path / ('ws_%s' % lane)
        ws = build_workspace(wdir, PAGES, glyph_alternatives=ALTS)
        bad = os.path.join(str(wdir), 'OCR-D-OCR',
                           'OCR-D-OCR_phys_0002.xml')
        with open(bad, 'w', encoding='utf-8') as fh:
            fh.write('this is not XML <<<')
        monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
        monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
        monkeypatch.setenv('KERASLM_FUSE_PAGES',
                           '1' if fuse else '0')
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', policy)
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '-1')
        proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.rater.fused_decode = True
        proc.process_workspace(ws)
        got = {}
        for page_id in PAGES:
            path = os.path.join(wdir, 'OCR-D-LM',
                                'OCR-D-LM_%s.xml' % page_id)
            got[page_id] = (_strip_timestamps(open(
                path, encoding='utf-8').read())
                if os.path.exists(path) else None)
        outputs[lane] = got
    fused, plain = outputs['polfuse'], outputs['polplain']
    assert fused == plain
    assert fused['phys_0001'] is not None
    assert fused['phys_0003'] is not None and \
        fused['phys_0004'] is not None
    if policy == 'COPY':
        assert fused['phys_0002'] == 'this is not XML <<<'
    else:
        assert fused['phys_0002'] is None


def test_group_fallback_failure_routes_page_policy(tmp_path,
                                                   monkeypatch):
    """Review regression: when the GROUP dispatch fails and one page's
    per-page fallback also fails, that failure routes through the
    OCRD_MISSING_OUTPUT policy attributed to ITS page — the remaining
    group pages still dispatch and write."""
    model = make_tiny_model(tmp_path / 'model.h5')
    wdir = tmp_path / 'ws_fb'
    ws = build_workspace(wdir, PAGES, glyph_alternatives=ALTS)
    monkeypatch.setenv('KERASLM_FAST_PAGE', '1')
    monkeypatch.setenv('KERASLM_NATIVE_PAGE', '1')
    monkeypatch.setenv('KERASLM_FUSE_PAGES', '1')
    monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
    monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '-1')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 4})
    proc.setup()
    proc.rater.fused_decode = True

    def boom_group(self, segs, **kw):
        raise RuntimeError('simulated group dispatch failure')

    monkeypatch.setattr(Rater, 'rate_best_device_begin_arrays_group',
                        boom_group)
    orig_begin = KerasRate.process_page_pcgts_device_begin

    def begin(self, pcgts, device_tb, file_id, page_id):
        if page_id == 'phys_0002':
            raise RuntimeError('simulated per-page failure')
        return orig_begin(self, pcgts, device_tb, file_id, page_id)

    monkeypatch.setattr(KerasRate, 'process_page_pcgts_device_begin',
                        begin)
    proc.process_workspace(ws)
    written = {page_id: os.path.exists(os.path.join(
        wdir, 'OCR-D-LM', 'OCR-D-LM_%s.xml' % page_id))
        for page_id in PAGES}
    assert written == {'phys_0001': True, 'phys_0002': False,
                       'phys_0003': True, 'phys_0004': True}, written
