"""METS server, page-parallel processing, worker/server subcommands.

Mirrors the reference's multi-process test setup
(/root/reference/test/conftest.py:39-69): a genuine second process
serves the METS while page-parallel workers write results through it.
"""
import json
import multiprocessing
import os
import time
import urllib.request

import pytest

from ocrd_keraslm_tpu.wrapper.mets import Workspace
from ocrd_keraslm_tpu.wrapper.mets_server import (MetsServer,
                                                  RemoteWorkspace)
from ocrd_keraslm_tpu.wrapper.rate import KerasRate

from helpers import build_workspace, make_tiny_model

PAGES = {
    'page1': [['the', 'quick', 'brown'], ['fox', 'jumps']],
    'page2': [['over', 'the', 'lazy'], ['dog', 'today']],
    'page3': [['many', 'hands', 'make'], ['light', 'work']],
    'page4': [['time', 'flies', 'like'], ['an', 'arrow']],
}


def _serve(directory, url):
    server = MetsServer(Workspace(directory), url)
    server.serve_forever()


@pytest.fixture
def served_workspace(tmp_path):
    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    build_workspace(str(ws_dir), PAGES)
    url = str(tmp_path / 'mets.sock')
    # spawn, not fork: the test process has JAX (multithreaded) loaded,
    # and forking it is deadlock-prone (CPython emits a RuntimeWarning)
    ctx = multiprocessing.get_context('spawn')
    proc = ctx.Process(target=_serve, args=(str(ws_dir), url),
                       daemon=True)
    proc.start()
    for _ in range(600):  # spawn re-imports the test module (slow)
        if os.path.exists(url):
            break
        time.sleep(0.05)
    else:
        raise RuntimeError('METS server did not start')
    yield str(ws_dir), url
    proc.terminate()
    proc.join(timeout=5)


def test_remote_workspace_roundtrip(served_workspace):
    ws_dir, url = served_workspace
    remote = RemoteWorkspace(url)
    assert remote.directory == os.path.abspath(ws_dir)
    assert remote.mets.unique_identifier == 'urn:test/kant_1784'
    assert remote.mets.page_ids == list(PAGES)
    files = list(remote.mets.find_files(fileGrp='OCR-D-OCR'))
    assert len(files) == len(PAGES)
    # write through the server
    remote.add_file('OCR-D-NEW', 'OCR-D-NEW_page1', 'page1',
                    'OCR-D-NEW/OCR-D-NEW_page1.xml',
                    content='<PcGts/>')
    remote.save_mets()
    # a second client sees the mutation
    remote2 = RemoteWorkspace(url)
    assert next(remote2.mets.find_files(ID='OCR-D-NEW_page1'), None)
    # and the on-disk mets.xml was updated by the server process
    local = Workspace(ws_dir)
    assert next(local.mets.find_files(ID='OCR-D-NEW_page1'), None)
    assert os.path.exists(os.path.join(ws_dir, 'OCR-D-NEW',
                                       'OCR-D-NEW_page1.xml'))
    remote.close()
    remote2.close()


def test_duplicate_add_rejected(served_workspace):
    _, url = served_workspace
    remote = RemoteWorkspace(url)
    remote.add_file('G', 'dup', 'page1', 'G/dup.xml', content='<a/>')
    # the server's FileExistsError must cross the protocol AS
    # FileExistsError — KerasRate's OCRD_EXISTING_OUTPUT policy
    # handling catches that type
    with pytest.raises(FileExistsError, match='already exists'):
        remote.add_file('G', 'dup', 'page1', 'G/dup.xml',
                        content='<a/>')
    remote.close()


def test_page_parallel_scoring_via_mets_server(served_workspace,
                                               tmp_path, monkeypatch):
    """Page-parallel scoring against the served METS must produce the
    same outputs as a plain sequential local run."""
    ws_dir, url = served_workspace
    model = make_tiny_model(tmp_path / 'model.h5')

    # local sequential run on a copy
    import shutil
    local_dir = tmp_path / 'local'
    shutil.copytree(ws_dir, local_dir)
    params = {'model_file': model, 'textequiv_level': 'word',
              'alternative_decoding': False}
    p1 = KerasRate(workspace=Workspace(str(local_dir)),
                   input_file_grp='OCR-D-OCR',
                   output_file_grp='OCR-D-LM', parameter=params)
    p1.setup()
    p1.process_workspace(p1.workspace)

    # remote page-parallel run
    monkeypatch.setenv('OCRD_MAX_PARALLEL_PAGES', '4')
    remote = RemoteWorkspace(url)
    p2 = KerasRate(workspace=remote, input_file_grp='OCR-D-OCR',
                   output_file_grp='OCR-D-LM', parameter=params)
    p2.setup()
    p2.process_workspace(remote)
    remote.refresh()

    outs = sorted(f.ID for f in remote.mets.find_files(
        fileGrp='OCR-D-LM'))
    assert outs == sorted(f.ID for f in Workspace(str(local_dir))
                          .mets.find_files(fileGrp='OCR-D-LM'))
    assert len(outs) == len(PAGES)
    import re

    def _normalize(text):  # timestamps legitimately differ
        return re.sub(r'<(Created|LastChange)>[^<]*</\1>', '', text)

    for page_id in PAGES:
        a = open(os.path.join(ws_dir, 'OCR-D-LM',
                              'OCR-D-LM_%s.xml' % page_id)).read()
        b = open(os.path.join(local_dir, 'OCR-D-LM',
                              'OCR-D-LM_%s.xml' % page_id)).read()
        assert _normalize(a) == _normalize(b), \
            'page %s differs between parallel-remote and ' \
            'sequential-local runs' % page_id
    remote.close()


def test_worker_cli(tmp_path, monkeypatch):
    from click.testing import CliRunner

    from ocrd_keraslm_tpu.wrapper.cli import ocrd_keraslm_rate
    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    build_workspace(str(ws_dir), PAGES)
    model = make_tiny_model(tmp_path / 'model.h5')
    queue = tmp_path / 'spool'
    queue.mkdir()
    job = {'mets': str(ws_dir), 'input_file_grp': 'OCR-D-OCR',
           'output_file_grp': 'OCR-D-LM',
           'parameter': {'textequiv_level': 'word',
                         'alternative_decoding': False}}
    with open(queue / 'job1.json', 'w') as fh:
        json.dump(job, fh)
    result = CliRunner().invoke(ocrd_keraslm_rate, [
        'worker', '--queue', str(queue), '--once',
        '-P', 'model_file', str(model),
        '-P', 'textequiv_level', 'word',
        '-P', 'alternative_decoding', 'false'])
    assert result.exit_code == 0, result.output
    with open(queue / 'job1.result.json') as fh:
        assert json.load(fh)['state'] == 'SUCCESS'
    assert (queue / 'job1.json.done').exists()
    ws = Workspace(str(ws_dir))
    assert len(list(ws.mets.find_files(fileGrp='OCR-D-LM'))) == \
        len(PAGES)


def test_processing_server(tmp_path):
    import threading

    from ocrd_keraslm_tpu.wrapper.cli import make_processing_server
    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    build_workspace(str(ws_dir), PAGES)
    model = make_tiny_model(tmp_path / 'model.h5')
    httpd = make_processing_server('127.0.0.1:0', {
        'model_file': str(model), 'textequiv_level': 'word',
        'alternative_decoding': False})
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = 'http://127.0.0.1:%d' % port
        with urllib.request.urlopen(base + '/health') as resp:
            assert json.load(resp)['status'] == 'ok'
        with urllib.request.urlopen(base + '/info') as resp:
            assert json.load(resp)['executable'] == 'ocrd-keraslm-rate'
        req = urllib.request.Request(
            base + '/process',
            data=json.dumps({'mets': str(ws_dir),
                             'input_file_grp': 'OCR-D-OCR',
                             'output_file_grp': 'OCR-D-LM'}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req) as resp:
            assert json.load(resp)['state'] == 'SUCCESS'
        ws = Workspace(str(ws_dir))
        assert len(list(ws.mets.find_files(fileGrp='OCR-D-LM'))) == \
            len(PAGES)
        # second job against the warm rater: a fresh copy workspace
        import shutil
        ws2 = tmp_path / 'ws2'
        shutil.copytree(ws_dir, ws2, ignore=shutil.ignore_patterns(
            'OCR-D-LM*'))
        # (mets.xml still lists OCR-D-LM files; point at missing paths
        # is fine — output exists check uses IDs, overwrite is off, so
        # use a distinct output group instead)
        req = urllib.request.Request(
            base + '/process',
            data=json.dumps({'mets': str(ws2),
                             'input_file_grp': 'OCR-D-OCR',
                             'output_file_grp': 'OCR-D-LM2'}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req) as resp:
            assert json.load(resp)['state'] == 'SUCCESS'
        assert len(list(Workspace(str(ws2)).mets.find_files(
            fileGrp='OCR-D-LM2'))) == len(PAGES)
    finally:
        httpd.shutdown()
        thread.join(timeout=5)


def test_server_never_unlinks_non_socket(tmp_path):
    """A regular file at the --url path (e.g. the user passed the
    mets.xml itself) must raise, NEVER be unlinked as a 'stale
    socket'."""
    from ocrd_keraslm_tpu.wrapper.mets_server import MetsServer

    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    build_workspace(str(ws_dir), PAGES)
    mets_path = ws_dir / 'mets.xml'
    assert mets_path.exists()
    with pytest.raises(OSError, match='not a socket'):
        MetsServer(Workspace(str(ws_dir)), str(mets_path))
    assert mets_path.exists(), 'mets.xml was deleted'


def test_remote_mirror_force_replace_across_groups(tmp_path):
    """Review regression: the client-side snapshot mirror must drop a
    force-replaced ID from WHATEVER group held it (the server already
    moves it), not leave a stale duplicate in the old group."""
    from ocrd_keraslm_tpu.wrapper.mets_server import (MetsServer,
                                                      RemoteWorkspace)

    ws_dir = tmp_path / 'ws'
    ws_dir.mkdir()
    build_workspace(str(ws_dir), PAGES)
    sock = str(tmp_path / 'mets.sock')
    server = MetsServer(Workspace(str(ws_dir)), sock)
    server.start()
    try:
        remote = RemoteWorkspace(sock)
        remote.add_file('A', 'X', 'p1', 'A/X.xml', content='<a/>')
        remote.add_file('B', 'X', 'p1', 'B/X.xml', content='<b/>',
                        force=True)
        assert [f.fileGrp for f in remote.mets.find_files(ID='X')] \
            == ['B']
        assert all(f.ID != 'X'
                   for f in remote.mets.file_groups.get('A', []))
    finally:
        server.stop()
