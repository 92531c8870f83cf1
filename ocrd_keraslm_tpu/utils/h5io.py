"""HDF5 checkpoint I/O, bit-compatible with the reference format.

Two things live in one ``.h5`` file (see reference ``Rater.save`` /
``load_config`` / ``load_weights``,
/root/reference/ocrd_keraslm/lib/rating.py:918-974):

1. **weights** in the Keras 2.3 ``save_weights`` HDF5 layout:
   top-level attr ``layer_names``; per-layer group with attr
   ``weight_names`` and datasets at those names.  Relevant layers:
   ``char_embedding`` (``embeddings:0`` (V, W)),
   ``context<i>_embedding``, and ``lstm_<i>``
   (``kernel:0`` (in, 4W), ``recurrent_kernel:0`` (W, 4W),
   ``bias:0`` (4W,)) with gate order i, f, c, o.
   CuDNNLSTM-trained files carry a doubled bias (8W,) — the two halves
   are summed on load (the same conversion Keras applies).

2. **config** group with datasets
   ``config/{history,width,depth,length,stateful,variable_length,mapping}``
   where ``mapping`` is a positional uint32 codepoint array (0 = gap).

We both read and write this layout, so checkpoints are interchangeable
with the reference tool (including its published ``model_dta_full.h5``).
"""
from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import h5py
import numpy as np

from ..models.lstm_lm import LMConfig, Params
from .vocab import Vocab


class NumpyJSONEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


# ----------------------------------------------------------------------
# config group
# ----------------------------------------------------------------------

def save_config(filename: str, cfg: LMConfig, vocab: Vocab,
                history: Optional[Dict[str, Any]] = None) -> None:
    """Append the reference-schema ``config/`` group to an h5 file."""
    with h5py.File(filename, 'a') as f:
        if 'config' in f:
            del f['config']
        group = f.create_group('config')
        group.create_dataset('history', data=json.dumps(
            history or {}, cls=NumpyJSONEncoder))
        group.create_dataset('width', data=np.array(cfg.width))
        group.create_dataset('depth', data=np.array(cfg.depth))
        group.create_dataset('length', data=np.array(cfg.length))
        group.create_dataset('stateful', data=np.array(cfg.stateful))
        group.create_dataset('variable_length',
                             data=np.array(cfg.variable_length))
        group.create_dataset('mapping', data=vocab.to_codepoints())
        # extension beyond the reference schema (ignored by it):
        # configurable context variable list
        group.create_dataset('contexts', data=np.array(
            cfg.contexts, dtype=np.int64).reshape(-1, 2))


def load_config(filename: str
                ) -> Tuple[LMConfig, Vocab, Dict[str, Any]]:
    """Read the ``config/`` group; return (LMConfig, Vocab, history)."""
    with h5py.File(filename, 'r') as f:
        group = f['config']
        history = (json.loads(group['history'][()])
                   if 'history' in group else {})
        codepoints = group['mapping'][()]
        vocab = Vocab.from_codepoints(codepoints)
        if 'contexts' in group:
            contexts = tuple(tuple(int(v) for v in row)
                             for row in group['contexts'][()])
        else:
            contexts = ((200, 10),)
        cfg = LMConfig(
            width=int(group['width'][()]),
            depth=int(group['depth'][()]),
            length=int(group['length'][()]),
            voc_size=vocab.size,
            contexts=contexts,
            stateful=bool(group['stateful'][()]),
            variable_length=bool(group['variable_length'][()]),
        )
    return cfg, vocab, history


# ----------------------------------------------------------------------
# weights (Keras 2.3 save_weights layout)
# ----------------------------------------------------------------------

def _encode_names(names):
    return np.array([n.encode('utf8') for n in names],
                    dtype=h5py.special_dtype(vlen=bytes))


def save_weights(filename: str, params: Params, cfg: LMConfig) -> None:
    """Write weights in the Keras 2.3 ``save_weights`` HDF5 layout."""
    layer_names = ['char_input']
    for i in range(cfg.n_contexts):
        layer_names.append('context%d_input' % (i + 1))
    layer_names.append('char_embedding')
    for i in range(cfg.n_contexts):
        layer_names.append('context%d_embedding' % (i + 1))
    layer_names.append('concat_hidden_input')
    for i in range(cfg.depth):
        layer_names.append('lstm_%d' % (i + 1))
        if i > 0:
            layer_names.append('dropout_%d' % i)
    layer_names.append('char_output')

    with h5py.File(filename, 'w') as f:
        f.attrs['layer_names'] = _encode_names(layer_names)
        f.attrs['backend'] = b'jax'
        f.attrs['keras_version'] = b'2.3.1'
        for name in layer_names:
            g = f.create_group(name)
            weight_names, weights = [], []
            if name == 'char_embedding':
                weight_names = ['char_embedding/embeddings:0']
                weights = [np.asarray(params['char_embedding'])]
            elif name.startswith('context') and name.endswith('_embedding'):
                i = int(name[len('context'):-len('_embedding')]) - 1
                weight_names = ['%s/embeddings:0' % name]
                weights = [np.asarray(params['context_embeddings'][i])]
            elif name.startswith('lstm_'):
                i = int(name[len('lstm_'):]) - 1
                lp = params['lstm'][i]
                weight_names = ['%s/kernel:0' % name,
                                '%s/recurrent_kernel:0' % name,
                                '%s/bias:0' % name]
                weights = [np.asarray(lp['kernel']),
                           np.asarray(lp['recurrent']),
                           np.asarray(lp['bias'])]
            g.attrs['weight_names'] = _encode_names(weight_names)
            for wname, w in zip(weight_names, weights):
                g.create_dataset(wname, data=w.astype(np.float32))


def load_weights(filename: str, cfg: LMConfig) -> Params:
    """Read weights from a Keras-2.3-layout h5 file into a param pytree.

    Handles both plain-LSTM (bias (4W,)) and CuDNNLSTM-trained
    (bias (8W,), summed) files; gate order i, f, c, o in both.
    """
    with h5py.File(filename, 'r') as f:
        layers = _collect_layer_weights(f)
        params: Params = {'context_embeddings': [], 'lstm': []}
        emb = _find_weight(layers, 'char_embedding', 'embeddings')
        if emb is None:
            raise ValueError(
                '%s: no char_embedding/embeddings weight found' % filename)
        params['char_embedding'] = emb
        for i in range(cfg.n_contexts):
            cemb = _find_weight(layers, 'context%d_embedding' % (i + 1),
                                'embeddings')
            if cemb is None:
                raise ValueError('%s: missing context%d_embedding'
                                 % (filename, i + 1))
            params['context_embeddings'].append(cemb)
        for i in range(cfg.depth):
            lname = 'lstm_%d' % (i + 1)
            kernel = _find_weight(layers, lname, 'kernel')
            rec = _find_weight(layers, lname, 'recurrent_kernel')
            bias = _find_weight(layers, lname, 'bias')
            if kernel is None or rec is None or bias is None:
                raise ValueError('%s: missing %s weights'
                                 % (filename, lname))
            W = rec.shape[0]
            if bias.shape[0] == 8 * W:  # CuDNN double bias
                bias = bias[:4 * W] + bias[4 * W:]
            params['lstm'].append({
                'kernel': kernel, 'recurrent': rec, 'bias': bias})
    return params


def _collect_layer_weights(f: h5py.File) -> Dict[str, Dict[str, np.ndarray]]:
    """Map layer name -> {short weight name -> array}."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    if 'layer_names' in f.attrs:
        layer_names = [n.decode('utf8') if isinstance(n, bytes) else n
                       for n in f.attrs['layer_names']]
    else:  # fall back to top-level groups (skip our config group)
        layer_names = [k for k in f.keys() if k != 'config']
    for name in layer_names:
        if name not in f:
            continue
        g = f[name]
        weights: Dict[str, np.ndarray] = {}
        wnames = g.attrs.get('weight_names', [])
        for wname in wnames:
            if isinstance(wname, bytes):
                wname = wname.decode('utf8')
            if wname not in g:
                continue
            short = wname.split('/')[-1].split(':')[0]
            weights[short] = np.asarray(g[wname], dtype=np.float32)
        out[name] = weights
    return out


def _find_weight(layers, layer_name, short) -> Optional[np.ndarray]:
    lw = layers.get(layer_name)
    if lw is None:
        # Keras sometimes nests (e.g. 'model_1/lstm_1'); search suffixes
        for k, v in layers.items():
            if k.endswith('/' + layer_name) or k == layer_name:
                lw = v
                break
    if lw is None:
        return None
    return lw.get(short)


# ----------------------------------------------------------------------
# whole-model convenience
# ----------------------------------------------------------------------

def save_model(filename: str, params: Params, cfg: LMConfig, vocab: Vocab,
               history: Optional[Dict[str, Any]] = None) -> None:
    save_weights(filename, params, cfg)
    save_config(filename, cfg, vocab, history)


def load_model(filename: str
               ) -> Tuple[Params, LMConfig, Vocab, Dict[str, Any]]:
    cfg, vocab, history = load_config(filename)
    params = load_weights(filename, cfg)
    cfg = cfg.replace(voc_size=params['char_embedding'].shape[0])
    return params, cfg, vocab, history
