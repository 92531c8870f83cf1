"""Tests for the Orbax checkpoint format and CLI profiling flags."""
import os
import subprocess
import sys

import numpy as np

import jax

from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.utils import orbaxio
from ocrd_keraslm_tpu.utils.vocab import Vocab


def test_orbax_roundtrip(tmp_path):
    cfg = LMConfig(width=16, depth=2, length=8, voc_size=12,
                   contexts=((20, 4),))
    params = init_params(cfg, jax.random.PRNGKey(1))
    vocab = Vocab('abcdefghijk')
    path = str(tmp_path / 'model.orbax')
    orbaxio.save_model(path, params, cfg, vocab, {'loss': [2.0]})
    params2, cfg2, vocab2, history2 = orbaxio.load_model(path)
    assert cfg2.width == 16 and cfg2.depth == 2
    assert vocab2.c2i == vocab.c2i
    assert history2 == {'loss': [2.0]}
    np.testing.assert_allclose(np.asarray(params['char_embedding']),
                               np.asarray(params2['char_embedding']),
                               rtol=1e-6)


def test_rater_orbax_save_load(tmp_path):
    r = Rater()
    r.width, r.depth, r.length = 8, 1, 8
    r.vocab = Vocab('abc')
    r.voc_size = r.vocab.size
    r.configure()
    r.status = 2
    path = str(tmp_path / 'm.orbax')
    r.save(path)
    r2 = Rater()
    r2.load_config(path)
    r2.configure()
    r2.load_weights(path)
    probs = r2.rate('abca', None)
    assert len(probs) == 4 and probs[0] == 1.0


def test_vocab_encode_vectorized_matches_dict():
    v = Vocab('abcxyzä€')
    text = 'abc?ä€zzz☃'
    ids = v.encode(text)
    expect = [v.c2i.get(c, 0) for c in text]
    assert list(ids) == expect
