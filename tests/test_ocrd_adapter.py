"""Genuine-OCR-D adapter: selection logic and page processing.

No real ``ocrd`` distribution exists in this environment, so the
genuine core is STUBBED in sys.modules: the tests cover (a) the
selection logic (standalone vs adapter, KERASLM_STANDALONE override)
and (b) that the adapter's page processing drives this package's
lattice/decode machinery through the generateDS-style PAGE API the
real ``ocrd_models`` exposes (reference wrapper/rate.py:8-37).
"""
import sys
import types

import pytest

import ocrd_keraslm_tpu.wrapper.ocrd_adapter as adapter
from ocrd_keraslm_tpu.wrapper.rate import KerasRate

from helpers import build_workspace, make_tiny_model


class FakeProcessor:
    """Permissive stand-in for ocrd.Processor (attribute surface the
    adapter uses: parameter, logger, workspace, resolve_resource)."""

    def __init__(self, workspace=None, parameter=None, **kwargs):
        import logging
        self.workspace = workspace
        self.parameter = dict(parameter or {})
        self.logger = logging.getLogger('fake-ocrd')

    def resolve_resource(self, name):
        return name


class FakePageResult:
    def __init__(self, pcgts):
        self.pcgts = pcgts


@pytest.fixture
def fake_ocrd(monkeypatch):
    ocrd_mod = types.ModuleType('ocrd')
    ocrd_mod.Processor = FakeProcessor
    ocrd_mod.OcrdPageResult = FakePageResult
    models_mod = types.ModuleType('ocrd_models')
    page_mod = types.ModuleType('ocrd_models.ocrd_page')
    page_mod.OcrdPage = object
    models_mod.ocrd_page = page_mod
    monkeypatch.setitem(sys.modules, 'ocrd', ocrd_mod)
    monkeypatch.setitem(sys.modules, 'ocrd_models', models_mod)
    monkeypatch.setitem(sys.modules, 'ocrd_models.ocrd_page', page_mod)
    monkeypatch.setattr(adapter, '_CACHED', None)
    yield ocrd_mod
    monkeypatch.setattr(adapter, '_CACHED', None)


def test_selection_standalone_without_ocrd(monkeypatch):
    monkeypatch.delitem(sys.modules, 'ocrd', raising=False)
    assert not adapter.genuine_ocrd_available()
    assert adapter.select_processor_class() is KerasRate


def test_selection_adapter_with_ocrd(fake_ocrd):
    assert adapter.genuine_ocrd_available()
    cls = adapter.select_processor_class()
    assert issubclass(cls, FakeProcessor)
    assert cls is not KerasRate
    # cached: second call returns the same class
    assert adapter.select_processor_class() is cls


def test_selection_forced_standalone(fake_ocrd, monkeypatch):
    monkeypatch.setenv('KERASLM_STANDALONE', '1')
    assert not adapter.genuine_ocrd_available()
    assert adapter.select_processor_class() is KerasRate


def test_adapter_processes_pages(fake_ocrd, tmp_path):
    """The adapter's process_page_pcgts must rate/decode real PAGE
    trees through this package's machinery (our standalone PAGE model
    mirrors the generateDS API of genuine ocrd_models)."""
    from ocrd_keraslm_tpu.wrapper.mets import Workspace
    from ocrd_keraslm_tpu.wrapper.page import parse_page

    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    pages = {'page1': [['the', 'quick'], ['brown', 'fox']],
             'page2': [['jumps', 'over'], ['the', 'dog']]}
    build_workspace(str(ws_dir), pages)
    model = make_tiny_model(tmp_path / 'model.h5')

    cls = adapter.make_processor_class()
    ws = Workspace(str(ws_dir))

    # scoring mode
    proc = cls(workspace=ws, parameter={
        'model_file': model, 'textequiv_level': 'word',
        'alternative_decoding': False, 'beam_width': 10,
        'lm_weight': 0.5})
    proc.setup()
    for f in ws.mets.find_files(fileGrp='OCR-D-OCR'):
        pcgts = parse_page(str(ws_dir / f.local_filename))
        result = proc.process_page_pcgts(pcgts, page_id=f.pageId)
        assert isinstance(result, FakePageResult)
        words = [w for region in pcgts.get_Page().get_TextRegion()
                 for line in region.get_TextLine()
                 for w in line.get_Word()]
        assert words
        for w in words:
            tes = w.get_TextEquiv()
            assert len(tes) == 1         # single blended TextEquiv
            assert tes[0].conf is not None

    # decoding mode (device lattice decoder, cross-page carry)
    proc2 = cls(workspace=ws, parameter={
        'model_file': model, 'textequiv_level': 'word',
        'alternative_decoding': True, 'beam_width': 4,
        'lm_weight': 0.5})
    proc2.setup()
    tb0 = None
    for f in ws.mets.find_files(fileGrp='OCR-D-OCR'):
        pcgts = parse_page(str(ws_dir / f.local_filename))
        result = proc2.process_page_pcgts(pcgts, page_id=f.pageId)
        assert isinstance(result, FakePageResult)
        # the cross-page device traceback advances page to page
        assert proc2._device_tb is not None
        assert proc2._device_tb is not tb0
        tb0 = proc2._device_tb


def test_adapter_host_decoding(fake_ocrd, tmp_path):
    """device_decoding=false must route the adapter through the HOST
    beam engine (rate_best + immediate next_path lock-in) with a
    cross-page traceback carry — not silently keep using the device
    decoder."""
    from ocrd_keraslm_tpu.wrapper.mets import Workspace
    from ocrd_keraslm_tpu.wrapper.page import parse_page

    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    pages = {'page1': [['the', 'quick'], ['brown', 'fox']],
             'page2': [['jumps', 'over'], ['the', 'dog']]}
    build_workspace(str(ws_dir), pages)
    model = make_tiny_model(tmp_path / 'model.h5')

    cls = adapter.make_processor_class()
    ws = Workspace(str(ws_dir))
    proc = cls(workspace=ws, parameter={
        'model_file': model, 'textequiv_level': 'word',
        'alternative_decoding': True, 'device_decoding': False,
        'beam_width': 4, 'lm_weight': 0.5})
    proc.setup()
    tb0 = None
    for f in ws.mets.find_files(fileGrp='OCR-D-OCR'):
        pcgts = parse_page(str(ws_dir / f.local_filename))
        result = proc.process_page_pcgts(pcgts, page_id=f.pageId)
        assert isinstance(result, FakePageResult)
        # host traceback advances; the device carry stays untouched
        assert proc._host_tb is not None
        assert proc._host_tb is not tb0
        tb0 = proc._host_tb
        assert proc._device_tb is None
        words = [w for region in pcgts.get_Page().get_TextRegion()
                 for line in region.get_TextLine()
                 for w in line.get_Word()]
        assert words
        for w in words:
            tes = w.get_TextEquiv()
            assert len(tes) == 1        # decode locked one winner
            assert tes[0].Unicode


def test_adapter_lookahead_warns(fake_ocrd, tmp_path, caplog):
    """lookahead_writeback cannot be honored under the genuine core
    (pages are written as returned); the adapter must say so instead
    of silently ignoring the parameter."""
    import logging
    model = make_tiny_model(tmp_path / 'model.h5')
    cls = adapter.make_processor_class()
    proc = cls(workspace=None, parameter={
        'model_file': model, 'textequiv_level': 'word',
        'alternative_decoding': True, 'lookahead_writeback': True,
        'beam_width': 4, 'lm_weight': 0.5})
    with caplog.at_level(logging.WARNING, logger='fake-ocrd'):
        proc.setup()
    assert any('lookahead_writeback' in rec.message
               for rec in caplog.records)


def test_main_routes_standalone_subcommands(fake_ocrd, monkeypatch):
    """With the genuine core importable, the console script must still
    reach the standalone-only subcommands (worker / server /
    mets-server) — the genuine single-command CLI has no equivalent."""
    from ocrd_keraslm_tpu.wrapper import cli

    for sub in ('worker', 'server', 'mets-server'):
        monkeypatch.setattr(sys, 'argv', ['ocrd-keraslm-rate', sub,
                                          '--help'])
        with pytest.raises(SystemExit) as exc:
            cli.main()
        # click --help exits 0; the genuine CLI (no subcommands) would
        # fail with a usage error (exit code 2)
        assert exc.value.code == 0, sub
