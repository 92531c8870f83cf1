"""The driver's capture parses the LAST LINE of a ~2000-char output
tail as JSON (BENCH_r04.json went "parsed": null when the detailed
line hit 4.9k chars).  Pin the contract: bench.py's final stdout line
stays under the tail window and parses, for both realistic and
adversarially bloated metric sets."""
import importlib.util
import json
import sys
from pathlib import Path

import pytest


@pytest.fixture(scope='module')
def bench_mod():
    path = Path(__file__).resolve().parent.parent / 'bench.py'
    spec = importlib.util.spec_from_file_location('bench', path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['bench'] = mod
    spec.loader.exec_module(mod)
    return mod


def _headline():
    return {'rating_x': 372.2, 'rating_median': 1763283.1,
            'decode_realistic_x_median': 183.6,
            'workflow_x_median': 114.1, 'workflow_pages_per_sec': 63.6,
            'train_x': 249.8, 'gen_1k_x': 354.61, 'gen_long_x': 501.1,
            'gen_streams_x': 603.4, 'mfu_pct': 33.0,
            'mfu_bound_pct': 52.3, 'native_hit_pct': 87.5,
            'baseline_decode_cps': 466.0}


def test_final_line_compact_and_parses(bench_mod):
    extra = {'headline': _headline(),
             'decode_realistic_chars_per_sec_median': 85546.4,
             'workflow_chars_per_sec_median': 53172.0,
             'train_chars_per_sec': 4111008.4,
             'rtt_ms_median': 24.2,
             # a long detailed key that must NOT reach stdout
             'decode_batch_clean_median_method': 'x' * 500}
    detail, line = bench_mod.final_json_lines(1763283.1, 4738.0, extra)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed['metric'] == 'rating_chars_per_sec'
    assert parsed['unit'] == 'chars/s'
    assert parsed['vs_baseline'] == pytest.approx(372.14, abs=0.1)
    # headline ratios present; bulky detail key only in the detail line
    assert parsed['extra']['workflow_x_median'] == 114.1
    assert 'decode_batch_clean_median_method' not in parsed['extra']
    dparsed = json.loads(detail)
    assert 'decode_batch_clean_median_method' in dparsed['extra']


def test_final_line_bounded_under_bloat(bench_mod):
    # even with an adversarially bloated headline, the final line
    # shrinks itself under the tail window and stays valid JSON
    extra = {'headline': {('k%03d' % i): float(i) for i in range(400)}}
    _, line = bench_mod.final_json_lines(1.0, 1.0, extra)
    assert len(line) <= 1800
    json.loads(line)


def test_final_line_drops_bulkiest_first(bench_mod):
    # one oversized value must not evict the small ratios behind it
    headline = dict(_headline())
    headline['huge'] = 'y' * 3000
    _, line = bench_mod.final_json_lines(1.0, 1.0,
                                         {'headline': headline})
    parsed = json.loads(line)
    assert len(line) <= 1800
    assert 'huge' not in parsed['extra']
    assert parsed['extra']['workflow_x_median'] == 114.1
    assert parsed['extra']['detail'].startswith('full metrics')


def test_final_line_without_headline(bench_mod):
    # early-abort runs may never build a headline dict
    _, line = bench_mod.final_json_lines(100.0, 2.0, {})
    parsed = json.loads(line)
    assert parsed['vs_baseline'] == 50.0
