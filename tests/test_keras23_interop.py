"""Interop against byte-faithful TF-1.15/Keras-2.3 weight files that
this repo's own h5 writer did NOT produce (tests/keras23_fixture.py):
fixed-length string attrs, weightless layer groups, model_weights/
nesting, attribute chunking, CuDNNLSTM naming + double bias, and
graph-uniquified layer names."""
import numpy as np
import pytest

import jax

from keras23_fixture import write_keras23_weights
from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
from ocrd_keraslm_tpu.utils import h5io


@pytest.fixture(scope='module', params=[1, 2, 3],
                ids=['d1', 'd2', 'd3'])
def params_cfg(request):
    """Depths 1-3 exercise the positional layer-name loops (lstm_1..,
    cu_dnnlstm_1..) the published models only use at depth 2."""
    cfg = LMConfig(width=12, depth=request.param, length=16,
                   voc_size=20, contexts=((200, 10),))
    params = init_params(cfg, jax.random.PRNGKey(7))
    params = jax.tree_util.tree_map(np.asarray, params)
    return params, cfg


def _assert_params_equal(got, want, atol=0):
    np.testing.assert_allclose(got['char_embedding'],
                               want['char_embedding'], atol=atol)
    for a, b in zip(got['context_embeddings'],
                    want['context_embeddings']):
        np.testing.assert_allclose(a, b, atol=atol)
    for a, b in zip(got['lstm'], want['lstm']):
        np.testing.assert_allclose(a['kernel'], b['kernel'], atol=atol)
        np.testing.assert_allclose(a['recurrent'], b['recurrent'],
                                   atol=atol)
        np.testing.assert_allclose(a['bias'], b['bias'], atol=atol)


def test_load_genuine_layout_plain(tmp_path, params_cfg):
    params, cfg = params_cfg
    path = str(tmp_path / 'tf115.h5')
    write_keras23_weights(path, params)
    got = h5io.load_weights(path, cfg)
    _assert_params_equal(got, params)


def test_load_genuine_layout_cudnn(tmp_path, params_cfg):
    """GPU-trained files: cu_dnnlstm_<i> layer names (positional match,
    like Keras itself) and (8W,) double bias summed on load."""
    params, cfg = params_cfg
    path = str(tmp_path / 'tf115_cudnn.h5')
    write_keras23_weights(path, params, cudnn=True)
    got = h5io.load_weights(path, cfg)
    _assert_params_equal(got, params, atol=1e-6)


def test_load_genuine_layout_model_save(tmp_path, params_cfg):
    """Full model.save files nest everything under model_weights/."""
    params, cfg = params_cfg
    path = str(tmp_path / 'tf115_full.h5')
    write_keras23_weights(path, params, nest_model_weights=True)
    got = h5io.load_weights(path, cfg)
    _assert_params_equal(got, params)


def test_load_genuine_layout_chunked_attrs(tmp_path, params_cfg):
    params, cfg = params_cfg
    path = str(tmp_path / 'tf115_chunked.h5')
    write_keras23_weights(path, params, chunk_attrs=True)
    got = h5io.load_weights(path, cfg)
    _assert_params_equal(got, params)


def test_load_genuine_layout_uniquified_names(tmp_path, params_cfg):
    """TF graph name uniquification can suffix layer names
    (char_embedding_1) when a model is rebuilt in one session."""
    params, cfg = params_cfg
    path = str(tmp_path / 'tf115_uniq.h5')
    write_keras23_weights(path, params, uniquify_suffix=True)
    got = h5io.load_weights(path, cfg)
    _assert_params_equal(got, params)


def test_genuine_file_end_to_end(tmp_path, params_cfg):
    """A genuine-layout weight file + reference-schema config group
    loads into a working Rater (logits identical to the source
    params)."""
    from ocrd_keraslm_tpu.rater import Rater
    from ocrd_keraslm_tpu.utils.vocab import Vocab
    params, cfg = params_cfg
    chars = 'abcdefghijklmnopqrs'  # 19 chars -> voc_size 20
    vocab = Vocab(chars)
    path = str(tmp_path / 'tf115_e2e.h5')
    write_keras23_weights(path, params, cudnn=True)
    h5io.save_config(path, cfg, vocab, {'loss': [1.0]})

    r = Rater()
    r.load_config(path)
    r.configure()
    r.load_weights(path)
    probs = r.rate('abc abc', None)
    assert len(probs) == 7 and probs[0] == 1.0
    assert all(0 <= p <= 1 for p in probs)
