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
    """Append the reference-schema ``config/`` group to an h5 file.

    Multihost-safe: no-op on non-main processes (one writer per
    shared path)."""
    if not _is_writer():
        return
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


def _open_h5(filename: str) -> h5py.File:
    """Open for reading with an actionable error for non-HDF5 files
    (e.g. a Keras 3 ``.keras`` archive, which is a zip, or a TF2
    ``.ckpt`` index) instead of h5py's bare signature failure."""
    try:
        return h5py.File(filename, 'r')
    except OSError as err:
        try:
            with open(filename, 'rb') as fh:
                magic = fh.read(4)
        except OSError:
            raise
        if magic == b'\x89HDF':
            # a GENUINE HDF5 file failing to open (locking,
            # truncation, permissions) is an I/O problem, not a
            # format problem — keep the original error type/message
            raise
        if magic[:2] == b'PK':
            raise ValueError(
                '%s: unsupported model format: this is a zip archive '
                '(Keras 3 ".keras" file), not an HDF5 checkpoint. '
                'Expected the Keras 2.3 save_weights layout the '
                'reference tool writes (TF 1.15 era); re-export the '
                'weights to that layout or train with this tool.'
                % filename) from err
        raise ValueError(
            '%s: not an HDF5 file (%s). Expected a Keras 2.3 h5 '
            'checkpoint as written by the reference tool or this '
            'one.' % (filename, err)) from err


def _layout_hint(f) -> str:
    """A one-line diagnosis of a recognisable-but-unsupported h5
    layout (Keras 3 ``.weights.h5``, TF2 object-graph h5), appended to
    rejection errors so users know WHAT they loaded, not just that it
    failed."""
    keys = set(f.keys())
    if {'layers', 'vars'} & keys or '_layer_checkpoint_dependencies' \
            in keys or any(isinstance(f.get(k), h5py.Group) and
                           'vars' in f[k] for k in keys):
        return (' The file uses the Keras 3 ".weights.h5" layout '
                '(per-layer "vars" groups); only the Keras 2.3 '
                'save_weights layout (layer_names/weight_names '
                'attributes, as written by TF 1.15 or this tool) is '
                'supported — re-export accordingly.')
    if 'optimizer_weights' in keys and 'model_weights' not in keys:
        return (' The file looks like a Keras optimizer-state dump, '
                'not a weights checkpoint.')
    return ''


def load_config(filename: str
                ) -> Tuple[LMConfig, Vocab, Dict[str, Any]]:
    """Read the ``config/`` group; return (LMConfig, Vocab, history)."""
    with _open_h5(filename) as f:
        if 'config' not in f:
            raise ValueError(
                '%s: no "config" group: not a keraslm model file '
                '(expected config/{width,depth,length,stateful,'
                'variable_length,mapping} as written by the reference '
                'Rater.save, rating.py:918-945, or this tool).%s'
                % (filename, _layout_hint(f)))
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


def _fetch(a) -> np.ndarray:
    """Host copy of a (possibly sharded) array.  Model-parallel
    multihost shardings (vocab-split embedding) span non-addressable
    devices, where ``np.asarray`` raises — gather those through
    ``process_allgather`` first."""
    try:
        return np.asarray(a)
    except RuntimeError:
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(a, tiled=True))


def _is_writer() -> bool:
    """One writer per shared path in a multihost job (pod launches run
    the identical command everywhere)."""
    try:
        import jax
        return jax.process_count() == 1 or jax.process_index() == 0
    except Exception:
        return True


def gather_params(params: Params) -> Params:
    """Host-gather every weight in the pytree.

    ``process_allgather`` is a COLLECTIVE: on a multihost mesh with
    model-parallel (vocab-sharded) params, every process must enter it
    or the job deadlocks.  ``save_weights``/``save_model`` therefore
    run this phase unconditionally on all processes and gate only the
    h5py file write on process 0 — call them from ALL processes, never
    from behind an ``is_main`` gate."""
    import jax
    return jax.tree_util.tree_map(_fetch, params)


def save_weights(filename: str, params: Params, cfg: LMConfig) -> None:
    """Write weights in the Keras 2.3 ``save_weights`` HDF5 layout.

    Multihost-safe: the device→host gather is collective and runs on
    every process; the file write happens on process 0 only.  Call
    from ALL processes."""
    params = gather_params(params)
    if not _is_writer():
        return
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
                weights = [_fetch(params['char_embedding'])]
            elif name.startswith('context') and name.endswith('_embedding'):
                i = int(name[len('context'):-len('_embedding')]) - 1
                weight_names = ['%s/embeddings:0' % name]
                weights = [_fetch(params['context_embeddings'][i])]
            elif name.startswith('lstm_'):
                i = int(name[len('lstm_'):]) - 1
                lp = params['lstm'][i]
                weight_names = ['%s/kernel:0' % name,
                                '%s/recurrent_kernel:0' % name,
                                '%s/bias:0' % name]
                weights = [_fetch(lp['kernel']),
                           _fetch(lp['recurrent']),
                           _fetch(lp['bias'])]
            g.attrs['weight_names'] = _encode_names(weight_names)
            for wname, w in zip(weight_names, weights):
                g.create_dataset(wname, data=w.astype(np.float32))


def load_weights(filename: str, cfg: LMConfig) -> Params:
    """Read weights from a Keras-2.3-layout h5 file into a param pytree.

    Handles the byte-level variation genuine TF-1.15/Keras-2.3 files
    exhibit: fixed- or variable-length string attributes, chunked
    attributes (``layer_names0``, ``layer_names1``, ...), weightless
    layer groups (inputs, dropout, lambdas), ``model_weights/``
    nesting (full ``model.save`` files as opposed to ``save_weights``),
    CuDNNLSTM-trained files (layers auto-named ``cu_dnnlstm_<i>``, bias
    doubled to (8W,) — halves summed, the conversion Keras applies),
    and name-scope suffixes.  Like Keras' own ``load_weights``, layer
    matching is ultimately POSITIONAL over the layers that carry
    weights; exact names are only a fast path.  Gate order i, f, c, o
    throughout.
    """
    with _open_h5(filename) as f:
        root = f['model_weights'] if 'model_weights' in f else f
        layers = _collect_layer_weights(root)
        if not layers:
            raise ValueError(
                '%s: no weight-carrying layers found in the Keras 2.3 '
                'save_weights layout (layer_names/weight_names '
                'attributes).%s' % (filename, _layout_hint(f)))
        params: Params = {'context_embeddings': [], 'lstm': []}
        # classify by weight structure (Keras matches positionally, so
        # layer names may differ: lstm_1 vs cu_dnnlstm_1 vs scoped)
        embeddings = [(name, lw) for name, lw in layers
                      if set(lw) == {'embeddings'}]
        lstms = [(name, lw) for name, lw in layers
                 if 'kernel' in lw and 'recurrent_kernel' in lw]
        emb = _named(embeddings, 'char_embedding')
        if emb is None and embeddings:
            # positional: the char embedding is built first (reference
            # rating.py:104-114) and is the one with width columns
            wide = [lw['embeddings'] for _, lw in embeddings
                    if lw['embeddings'].shape[1] == cfg.width]
            emb = wide[0] if len(wide) == 1 \
                else embeddings[0][1]['embeddings']
        if emb is None:
            raise ValueError(
                '%s: no char embedding weight found' % filename)
        params['char_embedding'] = emb
        ctx_pos = [lw for name, lw in embeddings
                   if lw['embeddings'] is not emb]
        for i in range(cfg.n_contexts):
            cemb = _named(embeddings, 'context%d_embedding' % (i + 1))
            if cemb is None and i < len(ctx_pos):
                cemb = ctx_pos[i]['embeddings']
            if cemb is None:
                raise ValueError('%s: missing context%d_embedding'
                                 % (filename, i + 1))
            params['context_embeddings'].append(cemb)
        if len(lstms) < cfg.depth:
            raise ValueError('%s: found %d recurrent layers, need %d'
                             % (filename, len(lstms), cfg.depth))
        # resolve by name only when the names form a COMPLETE and
        # DISTINCT assignment; otherwise use positional order for all
        # depths.  (Per-depth name-then-positional mixing could assign
        # one file layer to two depths: with graph-uniquified names
        # lstm_2/lstm_3, depth 0 fell back positionally to lstm_2 and
        # depth 1 name-matched lstm_2 again.)
        chosen = [(_layer(lstms, 'lstm_%d' % (i + 1)) or
                   _layer(lstms, 'cu_dnnlstm_%d' % (i + 1)))
                  for i in range(cfg.depth)]
        if any(lw is None for lw in chosen) or \
                len({id(lw) for lw in chosen}) != cfg.depth:
            chosen = [lstms[i][1] for i in range(cfg.depth)]
        for i in range(cfg.depth):
            lw = chosen[i]
            kernel = lw.get('kernel')
            rec = lw.get('recurrent_kernel')
            bias = lw.get('bias')
            if kernel is None or rec is None or bias is None:
                raise ValueError('%s: incomplete LSTM layer %d weights'
                                 % (filename, i + 1))
            W = rec.shape[0]
            if bias.shape[0] == 8 * W:  # CuDNN double bias
                bias = bias[:4 * W] + bias[4 * W:]
            params['lstm'].append({
                'kernel': kernel, 'recurrent': rec, 'bias': bias})
    return params


def _matches(name: str, target: str) -> bool:
    """Layer-name match tolerating name scopes ('model_1/lstm_1') and
    TF graph-uniquification suffixes ('lstm_1_1')."""
    tail = name.rsplit('/', 1)[-1]
    return tail == target or tail.startswith(target + '_')


def _named(layers, target) -> Optional[np.ndarray]:
    for name, lw in layers:
        if _matches(name, target) and 'embeddings' in lw:
            return lw['embeddings']
    return None


def _layer(layers, target) -> Optional[Dict[str, np.ndarray]]:
    for name, lw in layers:
        if _matches(name, target):
            return lw
    return None


def _read_attr_list(group, name) -> Optional[list]:
    """A Keras-written string-list attribute: plain, or chunked into
    ``<name>0``, ``<name>1``, ... when over 64KB (Keras
    ``load_attributes_from_hdf5_group``)."""
    if name in group.attrs:
        items = list(group.attrs[name])
    elif name + '0' in group.attrs:
        items = []
        chunk = 0
        while name + str(chunk) in group.attrs:
            items.extend(group.attrs[name + str(chunk)])
            chunk += 1
    else:
        return None
    return [n.decode('utf8') if isinstance(n, bytes) else str(n)
            for n in items]


def _collect_layer_weights(f) -> list:
    """Ordered [(layer name, {short weight name -> array})], only
    layers that carry weights (Keras' positional-matching set)."""
    out = []
    layer_names = _read_attr_list(f, 'layer_names')
    if layer_names is None:  # fall back to groups (skip config group)
        layer_names = [k for k in f.keys() if k != 'config']
    for name in layer_names:
        if name not in f:
            continue
        g = f[name]
        weights: Dict[str, np.ndarray] = {}
        for wname in _read_attr_list(g, 'weight_names') or []:
            if wname not in g:
                continue
            short = wname.split('/')[-1].split(':')[0]
            weights[short] = np.asarray(g[wname], dtype=np.float32)
        if weights:
            out.append((name, weights))
    return out


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
