"""Serving-loop soak test (VERDICT r3 #4): bounded memory and stable
outputs over hundreds of documents in ONE process.

The serving path holds several process-level caches (decode weights
keyed by file fingerprint in ``rater._DECODE_WCACHE``, per-Rater
compiled-length buckets, native .so handles, lxml trees in the record
lane); a leak there is invisible to the short functional tests.  This
drives 200+ documents through ``process_workspace_stateful`` (native
lane + page-group fused dispatch + weight cache, re-instantiating the
processor per run like a serving deployment) and asserts:

* RSS growth after warmup stays bounded (second-half growth is the
  leak signal; the first reps still populate caches);
* the output PAGE-XML bytes are identical on every repetition.

Opt-in (KERASLM_SOAK=1): ~200 documents take a few minutes on the CPU
backend.  The measured figure lives in docs/ROADMAP.md.
"""
import gc
import hashlib
import os
import re

import pytest

from ocrd_keraslm_tpu.wrapper import KerasRate
from ocrd_keraslm_tpu.wrapper.mets import Workspace

from helpers import build_workspace, make_tiny_model

N_PAGES = 8
# 26 x 8 = 208 documents by default; KERASLM_SOAK_REPS scales the
# campaign (e.g. 130 -> 1,040 documents)
REPS = int(os.environ.get('KERASLM_SOAK_REPS', '26'))


def _rss_mb():
    with open('/proc/self/status') as fh:
        for line in fh:
            if line.startswith('VmRSS:'):
                return int(line.split()[1]) / 1024.0
    return 0.0  # pragma: no cover


_VOLATILE = re.compile(
    rb'<(Created|LastChange)>[^<]*</\1>')


def _out_digest(ws_dir, file_grp='OCR-D-LM'):
    """Digest of the output PAGE-XML with the run timestamps
    (Metadata Created/LastChange, written fresh per run by design)
    stripped — everything else must be byte-identical."""
    h = hashlib.sha256()
    grp_dir = os.path.join(ws_dir, file_grp)
    for name in sorted(os.listdir(grp_dir)):
        with open(os.path.join(grp_dir, name), 'rb') as fh:
            h.update(name.encode())
            h.update(_VOLATILE.sub(b'', fh.read()))
    return h.hexdigest()


@pytest.mark.skipif(os.environ.get('KERASLM_SOAK') != '1',
                    reason='opt-in soak: set KERASLM_SOAK=1 '
                           '(~200 documents, minutes on CPU)')
def test_serving_soak_bounded_memory_stable_outputs(tmp_path):
    words = ['abc', 'cab', 'bca', 'acb', 'bac']
    pages = {}
    for p in range(N_PAGES):
        pages['phys_%04d' % (p + 1)] = [
            [words[(p + li + wi) % len(words)] for wi in range(6)]
            for li in range(4)]
    alternatives = {}
    for li in range(4):
        for wi in range(6):
            alternatives[(li, wi, 0)] = [('a', 0.93), ('b', 0.91),
                                         ('c', 0.90)]
    ws = build_workspace(str(tmp_path), pages,
                         glyph_alternatives=alternatives)
    model = make_tiny_model(tmp_path / 'model.h5', chars='abc \n')
    prior = os.environ.get('OCRD_EXISTING_OUTPUT')
    os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'

    def run_once():
        # re-instantiate per run (serving shape): exercises the
        # process-wide weight cache, not a single Rater's own caches
        w = Workspace(ws.directory)
        proc = KerasRate(workspace=w, input_file_grp='OCR-D-OCR',
                         output_file_grp='OCR-D-LM',
                         parameter={'model_file': model,
                                    'textequiv_level': 'glyph',
                                    'alternative_decoding': True,
                                    'beam_width': 4})
        proc.setup()
        proc.process_workspace(w)

    try:
        run_once()  # compile + stage caches
        run_once()
        gc.collect()
        rss_start = _rss_mb()
        digest = _out_digest(ws.directory)
        rss_series = []
        for rep in range(REPS):
            run_once()
            if rep % 5 == 4:
                gc.collect()
                rss_series.append(_rss_mb())
                assert _out_digest(ws.directory) == digest, \
                    'outputs drifted at rep %d' % rep
        gc.collect()
        rss_end = _rss_mb()
    finally:
        if prior is None:
            os.environ.pop('OCRD_EXISTING_OUTPUT', None)
        else:
            os.environ['OCRD_EXISTING_OUTPUT'] = prior

    total_growth = rss_end - rss_start
    # second-half growth is the leak signal (first half may still
    # fault in lazily-allocated pages)
    mid = rss_series[len(rss_series) // 2]
    tail_growth = rss_end - mid
    print('soak RSS: start %.1f MB, end %.1f MB, growth %.1f MB '
          '(tail %.1f MB) over %d documents'
          % (rss_start, rss_end, total_growth, tail_growth,
             REPS * N_PAGES))
    assert total_growth < 80.0, rss_series
    assert tail_growth < 40.0, rss_series
