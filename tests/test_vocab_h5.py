"""Tests of the vocabulary mapping and the Keras-2.3-compatible h5
checkpoint layer, including loading a file written in the exact
reference layout (built by hand here with h5py, no Keras needed)."""
import json

import h5py
import numpy as np
import pytest

import jax

from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
from ocrd_keraslm_tpu.utils import h5io
from ocrd_keraslm_tpu.utils.vocab import Vocab


def test_vocab_roundtrip():
    v = Vocab('abcxyz')
    assert v.size == 7
    assert v.get('a') == 1
    assert v.get('?') == 0  # unmapped -> 0
    cps = v.to_codepoints()
    v2 = Vocab.from_codepoints(cps)
    assert v2.c2i == v.c2i
    assert v2.i2c == v.i2c


def test_vocab_grow_and_remove():
    v = Vocab('abc')
    added = v.grow('abde')
    assert added == ['d', 'e']
    assert v.get('d') == 4 and v.get('e') == 5
    idx = v.remove(char='b')
    assert idx == 2
    # reindexed down
    assert v.get('c') == 2 and v.get('d') == 3 and v.get('e') == 4
    assert 'b' not in v


def test_vocab_encode_decode():
    v = Vocab('abc')
    ids = v.encode('abcq')
    assert list(ids) == [1, 2, 3, 0]
    assert v.decode([1, 2, 3]) == 'abc'


def test_h5_model_roundtrip(tmp_path):
    cfg = LMConfig(width=16, depth=2, length=8, voc_size=12,
                   contexts=((20, 4),))
    params = init_params(cfg, jax.random.PRNGKey(1))
    vocab = Vocab('abcdefghijk')
    path = str(tmp_path / 'model.h5')
    history = {'loss': [2.0, 1.5], 'val_loss': [2.2, 1.7]}
    h5io.save_model(path, params, cfg, vocab, history)
    params2, cfg2, vocab2, history2 = h5io.load_model(path)
    assert cfg2.width == 16 and cfg2.depth == 2 and cfg2.length == 8
    assert cfg2.stateful == cfg.stateful
    assert vocab2.c2i == vocab.c2i
    assert history2 == history
    np.testing.assert_allclose(np.asarray(params['char_embedding']),
                               params2['char_embedding'], rtol=1e-6)
    for a, b in zip(params['lstm'], params2['lstm']):
        np.testing.assert_allclose(np.asarray(a['kernel']), b['kernel'],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a['recurrent']),
                                   b['recurrent'], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a['bias']), b['bias'],
                                   rtol=1e-6)


def _write_reference_layout(path, voc_size, width, depth, length,
                            cudnn_bias=False, rng=None):
    """Hand-build an h5 file in the exact Keras 2.3 save_weights layout
    the reference produces (rating.py:918-945 + Keras HDF5 schema)."""
    rng = rng or np.random.default_rng(7)
    vlen = h5py.special_dtype(vlen=bytes)

    def names(ns):
        return np.array([n.encode() for n in ns], dtype=vlen)

    weights = {}
    with h5py.File(path, 'w') as f:
        layer_names = (['char_input', 'context1_input', 'char_embedding',
                        'context1_embedding', 'concat_hidden_input'] +
                       ['lstm_%d' % (i + 1) for i in range(depth)] +
                       ['char_output'])
        f.attrs['layer_names'] = names(layer_names)
        f.attrs['backend'] = b'tensorflow'
        f.attrs['keras_version'] = b'2.3.1'
        for name in layer_names:
            g = f.create_group(name)
            wn = []
            if name == 'char_embedding':
                w = rng.normal(0, 0.1, (voc_size, width)).astype('f4')
                wn = ['char_embedding/embeddings:0']
                g.create_dataset(wn[0], data=w)
                weights['char_embedding'] = w
            elif name == 'context1_embedding':
                w = rng.normal(0, 0.1, (200, 10)).astype('f4')
                wn = ['context1_embedding/embeddings:0']
                g.create_dataset(wn[0], data=w)
                weights['context1_embedding'] = w
            elif name.startswith('lstm_'):
                in_dim = width + 10 if name == 'lstm_1' else width
                k = rng.normal(0, 0.1, (in_dim, 4 * width)).astype('f4')
                r = rng.normal(0, 0.1, (width, 4 * width)).astype('f4')
                bshape = 8 * width if cudnn_bias else 4 * width
                b = rng.normal(0, 0.1, (bshape,)).astype('f4')
                wn = ['%s/kernel:0' % name,
                      '%s/recurrent_kernel:0' % name,
                      '%s/bias:0' % name]
                g.create_dataset(wn[0], data=k)
                g.create_dataset(wn[1], data=r)
                g.create_dataset(wn[2], data=b)
                weights[name] = (k, r, b)
            g.attrs['weight_names'] = names(wn)
        # reference config group (rating.py:930-945)
        grp = f.create_group('config')
        grp.create_dataset('history', data=json.dumps({'loss': [1.0]}))
        grp.create_dataset('width', data=np.array(width))
        grp.create_dataset('depth', data=np.array(depth))
        grp.create_dataset('length', data=np.array(length))
        grp.create_dataset('stateful', data=np.array(True))
        grp.create_dataset('variable_length', data=np.array(False))
        mapping = np.zeros((voc_size,), np.uint32)
        for i in range(1, voc_size):
            mapping[i] = ord('a') + i - 1
        grp.create_dataset('mapping', data=mapping)
    return weights


@pytest.mark.parametrize('cudnn_bias', [False, True])
def test_load_reference_layout(tmp_path, cudnn_bias):
    """Load an h5 written exactly like the reference tool writes it
    (incl. CuDNNLSTM double-bias variant)."""
    path = str(tmp_path / 'ref.h5')
    voc, width, depth, length = 15, 8, 2, 32
    weights = _write_reference_layout(path, voc, width, depth, length,
                                      cudnn_bias=cudnn_bias)
    params, cfg, vocab, history = h5io.load_model(path)
    assert cfg.width == width and cfg.depth == depth
    assert cfg.length == length and cfg.stateful
    assert vocab.size == voc
    assert vocab.get('a') == 1
    assert history == {'loss': [1.0]}
    np.testing.assert_allclose(params['char_embedding'],
                               weights['char_embedding'])
    for i in range(depth):
        k, r, b = weights['lstm_%d' % (i + 1)]
        np.testing.assert_allclose(params['lstm'][i]['kernel'], k)
        np.testing.assert_allclose(params['lstm'][i]['recurrent'], r)
        expect_b = b[:4 * width] + b[4 * width:] if cudnn_bias else b
        np.testing.assert_allclose(params['lstm'][i]['bias'], expect_b,
                                   rtol=1e-6)


def test_reference_can_read_our_config(tmp_path):
    """Our saved file must contain the exact config schema the reference
    ``load_config`` reads (rating.py:947-964)."""
    cfg = LMConfig(width=16, depth=1, length=8, voc_size=5,
                   contexts=((200, 10),), stateful=True)
    params = init_params(cfg, jax.random.PRNGKey(3))
    vocab = Vocab('abcd')
    path = str(tmp_path / 'ours.h5')
    h5io.save_model(path, params, cfg, vocab, {})
    with h5py.File(path, 'r') as f:
        grp = f['config']
        for key in ('history', 'width', 'depth', 'length', 'stateful',
                    'variable_length', 'mapping'):
            assert key in grp, key
        assert int(grp['width'][()]) == 16
        mapping = grp['mapping'][()]
        assert mapping.dtype == np.uint32
        assert mapping[0] == 0 and chr(mapping[1]) == 'a'
        # weights in Keras layout
        assert 'layer_names' in f.attrs
        assert 'char_embedding/embeddings:0' in f['char_embedding']
        assert 'lstm_1/kernel:0' in f['lstm_1']


def test_rejects_keras3_weights_layout(tmp_path):
    """A Keras 3 ``.weights.h5`` (per-layer ``vars`` groups, no
    layer_names attributes) must fail with an actionable
    "unsupported layout" error, not a bare KeyError (VERDICT r3 #10)."""
    path = str(tmp_path / 'k3.weights.h5')
    with h5py.File(path, 'w') as f:
        layers = f.create_group('layers')
        emb = layers.create_group('embedding')
        emb.create_group('vars').create_dataset(
            '0', data=np.zeros((5, 16), np.float32))
        lstm = layers.create_group('lstm')
        lstm.create_group('vars').create_dataset(
            '0', data=np.zeros((16, 64), np.float32))
        f.create_group('optimizer')
    cfg = LMConfig(width=16, depth=1, length=8, voc_size=5)
    with pytest.raises(ValueError, match='Keras 3'):
        h5io.load_weights(path, cfg)
    with pytest.raises(ValueError, match='config'):
        h5io.load_config(path)


def test_rejects_zip_archive(tmp_path):
    """A Keras 3 ``.keras`` file is a zip archive; the loader names
    the format instead of surfacing h5py's signature error."""
    import zipfile
    path = str(tmp_path / 'model.keras')
    with zipfile.ZipFile(path, 'w') as z:
        z.writestr('metadata.json', '{}')
    with pytest.raises(ValueError, match='zip archive'):
        h5io.load_config(path)
    with pytest.raises(ValueError, match='zip archive'):
        h5io.load_weights(path, LMConfig(width=16, depth=1,
                                         length=8, voc_size=5))


def test_rejects_non_hdf5_garbage(tmp_path):
    path = str(tmp_path / 'garbage.h5')
    with open(path, 'wb') as fh:
        fh.write(b'\x00\x01not an hdf5 file at all' * 8)
    with pytest.raises(ValueError, match='not an HDF5 file'):
        h5io.load_config(path)
