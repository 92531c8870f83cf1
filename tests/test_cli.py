"""Smoke coverage of the full ``keraslm-rate`` command surface — the
10-command CLI is pinned API (reference scripts/run.py:14-225; SURVEY
§2.15).  Other suites exercise ``train`` deeply (test_pipeline,
test_multihost); this one drives every command end-to-end in-process
through CliRunner so a wiring regression in any of them turns red."""
import json

import pytest
from click.testing import CliRunner

from helpers import train_tiny_model

from ocrd_keraslm_tpu.scripts.run import cli


@pytest.fixture(scope='module')
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp('cli') / 'lm.h5'
    # '\n' included: the corpus fixture's files are newline-terminated
    train_tiny_model(str(path), 'the quick brown fox \n' * 100,
                     steps=300)
    return str(path)


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    # two files: stateful training splits file-wise (train/validation)
    d = tmp_path_factory.mktemp('corpus')
    paths = []
    for name in ('author_title_1808', 'author_work_1799'):
        f = d / (name + '.txt')
        f.write_text('the quick brown fox \n' * 40, encoding='utf-8')
        paths.append(str(f))
    return paths


def test_cli_train(tmp_path, corpus):
    model = tmp_path / 'trained.h5'
    res = CliRunner().invoke(cli, [
        'train', '-m', str(model), '-C', str(tmp_path / 'ckpt.h5'),
        '-w', '16', '-d', '1', '-l', '32', '-e', '2', '-b', '16']
        + corpus)
    assert res.exit_code == 0, res.output
    assert model.exists()


def test_cli_test(model, corpus):
    res = CliRunner().invoke(cli, ['test', '-m', model, corpus[0]])
    assert res.exit_code == 0, res.output
    ppl = float(res.output.strip().splitlines()[-1])
    assert 1.0 < ppl < 50.0


def test_cli_apply(model):
    res = CliRunner().invoke(cli, ['apply', '-m', model,
                                   'the quick brown fox'])
    assert res.exit_code == 0, res.output
    lines = res.output.strip().splitlines()
    ppl = float(lines[-2])
    ratings = json.loads(lines[-1])
    assert 1.0 < ppl < 50.0
    assert len(ratings) == len('the quick brown fox')
    assert ratings[0][1] == 1.0  # first char unconditioned, ref parity


def test_cli_generate(model):
    res = CliRunner().invoke(cli, ['generate', '-m', model,
                                   '-n', '8', '-v', '2', 'the q'])
    assert res.exit_code == 0, res.output
    variants = res.output.strip('\n').splitlines()
    assert len(variants) == 2
    assert all(v.startswith('the ') for v in variants)


def test_cli_print_history(model):
    res = CliRunner().invoke(cli, ['print-history', '-m', model])
    assert res.exit_code == 0, res.output


def test_cli_print_charset(model):
    res = CliRunner().invoke(cli, ['print-charset', '-m', model])
    assert res.exit_code == 0, res.output
    # every training-text char is mapped and listed
    for ch in 'quickbrownfx':
        assert ch in res.output


def test_cli_prune_charset(model, tmp_path):
    # prune on a COPY: the module model is shared across tests
    import shutil
    target = tmp_path / 'pruned.h5'
    shutil.copy(model, target)
    res = CliRunner().invoke(cli, ['prune-charset', '-m', str(target),
                                   'q'])
    assert res.exit_code == 0, res.output
    res = CliRunner().invoke(cli, ['print-charset', '-m', str(target)])
    assert res.exit_code == 0
    # 'q' no longer mapped: rating text containing it logs unmapped
    from ocrd_keraslm_tpu.rater import Rater
    r = Rater()
    r.load_config(str(target))
    assert 'q' not in r.vocab
    assert 'u' in r.vocab


@pytest.mark.parametrize('command,args', [
    ('plot-char-embeddings-similarity', []),
    ('plot-context-embeddings-similarity', ['-n', '1']),
    ('plot-context-embeddings-projection', ['-n', '1']),
])
def test_cli_plots(model, tmp_path, command, args):
    pytest.importorskip('matplotlib')
    pytest.importorskip('sklearn')
    out = tmp_path / (command + '.png')
    res = CliRunner().invoke(cli, [command, '-m', model] + args
                             + [str(out)])
    assert res.exit_code == 0, res.output
    assert out.exists() and out.stat().st_size > 0
