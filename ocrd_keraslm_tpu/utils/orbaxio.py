"""Orbax-native checkpoint format (TPU-first alternative to h5).

The h5 format (utils/h5io.py) is the interop surface with the reference
tool; this module adds a native directory-based format via Orbax
(async-capable, sharding-aware, the standard JAX production format) as
foreseen in SURVEY.md §5.4.  A checkpoint directory holds:

* ``params/``    — the parameter pytree (Orbax PyTree checkpoint)
* ``config.json`` — LMConfig fields + vocab codepoints + history

Selected automatically by ``Rater``-level helpers when the model path
is a directory (or ends in ``.orbax``).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.lstm_lm import LMConfig, Params
from .h5io import NumpyJSONEncoder
from .vocab import Vocab


def is_orbax_path(path: str) -> bool:
    return (path.endswith('.orbax') or path.endswith('/') or
            os.path.isdir(path))


def save_model(path: str, params: Params, cfg: LMConfig, vocab: Vocab,
               history: Optional[Dict[str, Any]] = None) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, 'params'), params, force=True)
    meta = {
        'width': cfg.width, 'depth': cfg.depth, 'length': cfg.length,
        'voc_size': cfg.voc_size,
        'contexts': [list(c) for c in cfg.contexts],
        'stateful': cfg.stateful,
        'variable_length': cfg.variable_length,
        'mapping': vocab.to_codepoints().tolist(),
        'history': history or {},
    }
    with open(os.path.join(path, 'config.json'), 'w',
              encoding='utf-8') as fh:
        json.dump(meta, fh, cls=NumpyJSONEncoder)


def load_config(path: str) -> Tuple[LMConfig, Vocab, Dict[str, Any]]:
    with open(os.path.join(path, 'config.json'), encoding='utf-8') as fh:
        meta = json.load(fh)
    vocab = Vocab.from_codepoints(
        np.asarray(meta['mapping'], dtype=np.uint32))
    cfg = LMConfig(
        width=int(meta['width']), depth=int(meta['depth']),
        # honor the stored voc_size when larger than the mapping (a
        # reference h5 model can carry more embedding rows than mapped
        # chars; h5io.load_model guards the same case)
        length=int(meta['length']),
        voc_size=max(int(meta.get('voc_size', 0)), vocab.size),
        contexts=tuple(tuple(c) for c in meta['contexts']),
        stateful=bool(meta['stateful']),
        variable_length=bool(meta['variable_length']))
    return cfg, vocab, meta.get('history', {})


def load_weights(path: str, cfg: LMConfig) -> Params:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), 'params'))


def load_model(path: str
               ) -> Tuple[Params, LMConfig, Vocab, Dict[str, Any]]:
    cfg, vocab, history = load_config(path)
    params = load_weights(path, cfg)
    rows = params['char_embedding'].shape[0]
    if rows != cfg.voc_size:  # reconcile with the actual embedding
        cfg = cfg.replace(voc_size=rows)
    return params, cfg, vocab, history
