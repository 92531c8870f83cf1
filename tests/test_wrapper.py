"""Integration tests of the OCR-D-style wrapper over synthetic PAGE-XML
workspaces (model: the reference's behavioral/metric test style,
test/test_wrapper.py, against a fake workspace instead of a cloned
asset repo)."""
import logging
import os

import numpy as np
import pytest

from ocrd_keraslm_tpu.wrapper import KerasRate
from ocrd_keraslm_tpu.wrapper.mets import Workspace
from ocrd_keraslm_tpu.wrapper.page import parse_page, to_xml

from helpers import (build_pcgts, build_workspace, make_tiny_model,
                     train_tiny_model)

PAGES = {
    'phys_0001': [['Was', 'ist', 'Aufklärung'],
                  ['der', 'Mensch', 'denkt']],
    'phys_0002': [['die', 'Vernunft', 'siegt'],
                  ['am', 'Ende', 'doch']],
}


def _flat_words(workspace, file_grp):
    words = []
    for f in workspace.mets.find_files(fileGrp=file_grp):
        pcgts = parse_page(os.path.join(workspace.directory,
                                        f.local_filename))
        for region in pcgts.get_Page().get_TextRegion():
            for line in region.get_TextLine():
                words.extend(line.get_Word())
    return words


def test_scoring_mode(tmp_path, caplog):
    """alternative_decoding=false at word level: every word ends with
    exactly 1 TextEquiv, ppl log line emitted, metadata recorded."""
    ws = build_workspace(str(tmp_path), PAGES)
    model = make_tiny_model(tmp_path / 'model.h5',
                            chars='abcdefghijklmnorstuvwzäßAVEMW ü\n'
                                  'kfgpD')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': False})
    proc.setup()
    with caplog.at_level(logging.INFO):
        proc.process_workspace(ws)
    outputs = list(ws.mets.find_files(fileGrp='OCR-D-LM'))
    assert len(outputs) == len(PAGES)
    words = _flat_words(ws, 'OCR-D-LM')
    assert len(words) == sum(len(lw) for page in PAGES.values()
                             for lw in page)
    for word in words:
        assert len(word.get_TextEquiv()) == 1
        assert 0 <= word.get_TextEquiv()[0].conf <= 1
    ppl_lines = [r for r in caplog.records
                 if 'char ppl' in r.getMessage()]
    assert len(ppl_lines) == len(PAGES)
    # reconstruct ppl value from the (API-stable) log line format
    msg = ppl_lines[0].getMessage()
    ppl = float(msg.split('char ppl: ')[1].split(',')[0])
    assert np.isfinite(ppl) and ppl > 1
    # metadata agent recorded
    out = outputs[0]
    pcgts = parse_page(os.path.join(ws.directory, out.local_filename))
    steps = [i for i in pcgts.metadata.items
             if i.type == 'processingStep']
    assert steps and steps[0].value == 'ocrd-keraslm-rate'


@pytest.mark.parametrize('device', [True, False])
def test_decoding_mode(tmp_path, device):
    """alternative_decoding=true at glyph level with confusable glyph
    alternatives: each glyph ends with exactly 1 TextEquiv, both pages
    written (cross-page traceback flush); both the on-device and the
    host/parity decoder paths."""
    alternatives = {}
    # give every first glyph of every word a wrong-but-likely
    # alternative
    for li in range(2):
        for wi in range(3):
            alternatives[(li, wi, 0)] = [('X', 0.93), ('Y', 0.91)]
    ws = build_workspace(str(tmp_path), PAGES,
                         glyph_alternatives=alternatives)
    model = make_tiny_model(tmp_path / 'model.h5',
                            chars='abcdefghijklmnorstuvwzäßAVEMWXY '
                                  'üD\nkfgp')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'device_decoding': device,
                                'beam_width': 3})
    proc.setup()
    proc.process_workspace(ws)
    outputs = list(ws.mets.find_files(fileGrp='OCR-D-LM'))
    assert len(outputs) == len(PAGES)
    for f in ws.mets.find_files(fileGrp='OCR-D-LM'):
        pcgts = parse_page(os.path.join(ws.directory,
                                        f.local_filename))
        glyphs = []
        for region in pcgts.get_Page().get_TextRegion():
            for line in region.get_TextLine():
                for word in line.get_Word():
                    glyphs.extend(word.get_Glyph())
        assert glyphs
        for glyph in glyphs:
            assert len(glyph.get_TextEquiv()) == 1
        # higher levels were re-projected from the decoded glyphs
        for region in pcgts.get_Page().get_TextRegion():
            for line in region.get_TextLine():
                for word in line.get_Word():
                    want = ''.join(g.get_TextEquiv()[0].Unicode
                                   for g in word.get_Glyph())
                    assert word.get_TextEquiv()[0].Unicode == want


@pytest.mark.parametrize('device', [True, False])
def test_decoding_prefers_lm(tmp_path, device):
    """A model overfit on 'abcd ' must pick the LM-consistent
    alternative over a higher-OCR-conf wrong one (both decoders)."""
    text = 'abcd ' * 400
    model, nll = train_tiny_model(tmp_path / 'lm.h5', text, steps=400)
    assert nll < 0.5, 'tiny model failed to overfit (nll %f)' % nll
    # OCR proposes 'x' (conf .92) vs correct 'c' (conf .90) inside
    # every 'abcd' word
    pages = {'p1': [['abcd', 'abcd'], ['abcd', 'abcd']]}
    alternatives = {(li, wi, 2): [('x', 0.92), ('c', 0.90)]
                    for li in range(2) for wi in range(2)}
    ws = build_workspace(str(tmp_path), pages,
                         glyph_alternatives=alternatives)
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'device_decoding': device,
                                'beam_width': 4,
                                'lm_weight': 0.8})
    proc.setup()
    proc.process_workspace(ws)
    for f in ws.mets.find_files(fileGrp='OCR-D-LM'):
        pcgts = parse_page(os.path.join(ws.directory,
                                        f.local_filename))
        for region in pcgts.get_Page().get_TextRegion():
            for line in region.get_TextLine():
                for word in line.get_Word():
                    got = ''.join(g.get_TextEquiv()[0].Unicode
                                  for g in word.get_Glyph())
                    assert got == 'abcd', got


def test_existing_output_skip(tmp_path):
    ws = build_workspace(str(tmp_path), {'p1': [['ab']]})
    model = make_tiny_model(tmp_path / 'model.h5', chars='ab')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': False})
    proc.setup()
    proc.process_workspace(ws)
    n1 = len(list(ws.mets.find_files(fileGrp='OCR-D-LM')))
    # second run: outputs exist, default policy skips
    proc.process_workspace(ws)
    n2 = len(list(ws.mets.find_files(fileGrp='OCR-D-LM')))
    assert n1 == n2 == 1


@pytest.mark.parametrize('policy', ['SKIP', 'COPY', 'ABORT', 'RATIO',
                                    'RATIO_OK'])
def test_missing_output_policy_on_corrupt_page(tmp_path, policy,
                                               monkeypatch):
    """A non-PAGE input mid-document is a page FAILURE under the
    OCRD_MISSING_OUTPUT policy (reference behavior model: OCR-D core
    routes page errors through SKIP/COPY/ABORT and the
    OCRD_MAX_MISSING_OUTPUTS ratio), not a silent skip: SKIP keeps
    the other pages' outputs, COPY emits the input file as fallback,
    ABORT raises, and a tight ratio raises 'too many failures'."""
    pages = {
        'phys_0001': [['Was', 'ist', 'Aufklärung']],
        'phys_0002': [['der', 'Mensch', 'denkt']],
        'phys_0003': [['die', 'Vernunft', 'siegt']],
    }
    ws = build_workspace(str(tmp_path), pages)
    bad = os.path.join(str(tmp_path), 'OCR-D-OCR',
                       'OCR-D-OCR_phys_0002.xml')
    with open(bad, 'w', encoding='utf-8') as fh:
        fh.write('this is not XML <<<')
    model = make_tiny_model(tmp_path / 'model.h5',
                            chars='abcdefghijklmnorstuvwzäßAVEMW ü\n'
                                  'kfgpD')
    if policy == 'RATIO':
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '0.1')
    elif policy == 'RATIO_OK':
        # 1 failure of 3 pages = 0.33 < 0.5: must NOT abort.  (In
        # device mode successes are only counted in the finish loop,
        # so a dispatch-loop ratio over successes-so-far would see
        # 1/1 = 1.0 at the failure and spuriously abort the document.)
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '0.5')
    else:
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', policy)
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '-1')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': True,
                                'device_decoding': True,
                                'beam_width': 3})
    proc.setup()
    if policy in ('ABORT', 'RATIO'):
        with pytest.raises((ValueError, RuntimeError)) as exc:
            proc.process_workspace(ws)
        if policy == 'RATIO':
            assert 'too many failures' in str(exc.value)
        return
    proc.process_workspace(ws)
    outputs = {f.pageId: f for f in ws.mets.find_files(
        fileGrp='OCR-D-LM')}
    # the good pages decode despite the mid-document failure
    assert 'phys_0001' in outputs and 'phys_0003' in outputs
    if policy == 'COPY':
        assert 'phys_0002' in outputs
        with open(os.path.join(ws.directory,
                               outputs['phys_0002'].local_filename),
                  encoding='utf-8') as fh:
            assert fh.read() == 'this is not XML <<<'
    else:
        assert 'phys_0002' not in outputs


@pytest.mark.parametrize('policy', ['SKIP', 'COPY', 'RATIO',
                                    'RATIO_OK'])
def test_missing_output_policy_stateless(tmp_path, policy, monkeypatch):
    """The batched scoring path (alternative_decoding=false) applies
    the same OCRD_MISSING_OUTPUT policy + OCRD_MAX_MISSING_OUTPUTS
    accounting to a corrupt page as the stateful loops."""
    pages = {
        'phys_0001': [['Was', 'ist', 'Aufklärung']],
        'phys_0002': [['der', 'Mensch', 'denkt']],
        'phys_0003': [['die', 'Vernunft', 'siegt']],
    }
    ws = build_workspace(str(tmp_path), pages)
    bad = os.path.join(str(tmp_path), 'OCR-D-OCR',
                       'OCR-D-OCR_phys_0002.xml')
    with open(bad, 'w', encoding='utf-8') as fh:
        fh.write('not XML at all')
    model = make_tiny_model(tmp_path / 'model.h5',
                            chars='abcdefghijklmnorstuvwzäßAVEMW ü\n'
                                  'kfgpD')
    if policy == 'RATIO':
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '0.1')
    elif policy == 'RATIO_OK':
        # 1 of 3 pages = 0.33 < 0.5 tolerated: must not abort
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'SKIP')
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '0.5')
    else:
        monkeypatch.setenv('OCRD_MISSING_OUTPUT', policy)
        monkeypatch.setenv('OCRD_MAX_MISSING_OUTPUTS', '-1')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': False})
    proc.setup()
    if policy == 'RATIO':
        with pytest.raises(RuntimeError, match='too many failures'):
            proc.process_workspace(ws)
        return
    proc.process_workspace(ws)
    outputs = {f.pageId: f for f in ws.mets.find_files(
        fileGrp='OCR-D-LM')}
    assert 'phys_0001' in outputs and 'phys_0003' in outputs
    assert ('phys_0002' in outputs) == (policy == 'COPY')


def _durability_setup(tmp_path):
    pages = {
        'phys_0001': [['Was', 'ist', 'Aufklärung']],
        'phys_0002': [['der', 'Mensch', 'denkt']],
        'phys_0003': [['die', 'Vernunft', 'siegt']],
    }
    ws = build_workspace(str(tmp_path), pages)
    model = make_tiny_model(tmp_path / 'model.h5',
                            chars='abcdefghijklmnorstuvwzäßAVEMW ü\n'
                                  'kfgpD')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': 'word',
                                'alternative_decoding': False})
    proc.setup()
    return ws, proc


def test_mets_abort_save_durability(tmp_path, monkeypatch):
    """A Python-level abort mid-run persists the pages registered so
    far to the on-disk METS (the deferred-save except arm)."""
    monkeypatch.setenv('KERASLM_METS_FLUSH_PAGES', '0')
    ws, proc = _durability_setup(tmp_path)
    orig_write = proc._write_page

    def write_then_boom(pcgts, file_id, page_id):
        if page_id == 'phys_0003':
            raise RuntimeError('boom on page 3')
        return orig_write(pcgts, file_id, page_id)

    monkeypatch.setattr(proc, '_write_page', write_then_boom)
    monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'ABORT')
    with pytest.raises(RuntimeError, match='boom'):
        proc.process_workspace(ws)
    # a FRESH load of the on-disk METS registers the completed pages
    on_disk = Workspace(ws.directory)
    got = {f.pageId for f in on_disk.mets.find_files(
        fileGrp='OCR-D-LM')}
    assert got == {'phys_0001', 'phys_0002'}


def test_mets_abort_save_never_masks_root_cause(tmp_path, monkeypatch):
    """When the deferred METS save itself fails during an abort, the
    ORIGINAL error must propagate (not the save failure)."""
    monkeypatch.setenv('KERASLM_METS_FLUSH_PAGES', '0')
    ws, proc = _durability_setup(tmp_path)
    orig_write = proc._write_page

    def write_then_boom(pcgts, file_id, page_id):
        if page_id == 'phys_0003':
            raise RuntimeError('root cause')
        return orig_write(pcgts, file_id, page_id)

    monkeypatch.setattr(proc, '_write_page', write_then_boom)
    monkeypatch.setenv('OCRD_MISSING_OUTPUT', 'ABORT')

    def broken_save():
        raise OSError('mets server is gone')

    monkeypatch.setattr(ws, 'save_mets', broken_save)
    with pytest.raises(RuntimeError, match='root cause'):
        proc.process_workspace(ws)


def test_mets_periodic_flush_window(tmp_path, monkeypatch):
    """KERASLM_METS_FLUSH_PAGES=1 flushes the METS per page, bounding
    what a hard kill (SIGKILL/OOM) can lose; the default window saves
    once at end-of-run."""
    for window, min_saves in (('1', 3), ('0', 1)):
        wdir = tmp_path / ('w%s' % window)
        wdir.mkdir()
        monkeypatch.setenv('KERASLM_METS_FLUSH_PAGES', window)
        ws, proc = _durability_setup(wdir)
        calls = []
        orig_save = ws.save_mets
        monkeypatch.setattr(
            ws, 'save_mets',
            lambda orig_save=orig_save, calls=calls:
                (calls.append(1), orig_save())[1])
        proc.process_workspace(ws)
        assert len(calls) >= min_saves, window
        if window == '0':
            assert len(calls) == 1  # ONE end-of-run save
        on_disk = Workspace(ws.directory)
        got = {f.pageId for f in on_disk.mets.find_files(
            fileGrp='OCR-D-LM')}
        assert got == {'phys_0001', 'phys_0002', 'phys_0003'}


def test_parse_params_number_formats():
    """-P number overrides accept ints, decimals, AND scientific
    notation (review regression: '1e-1' crashed int())."""
    from ocrd_keraslm_tpu.wrapper.cli import _parse_params

    params = _parse_params(None, [('lm_weight', '1e-1'),
                                  ('beam_width', '12')])
    assert params['lm_weight'] == 0.1
    assert params['beam_width'] == 12
