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

import jax

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


def _restore_numpy(ckptr, path: str):
    """Restore a pytree checkpoint to HOST numpy leaves.

    Restoring without explicit ``restore_args`` makes Orbax replay the
    sharding layout stored in the checkpoint — which is wrong (and
    warns) when the restoring process has a different device topology
    than the saver (e.g. resume a mesh run on one chip, or vice
    versa).  Numpy leaves are topology-free; the consumers re-shard
    (training re-applies its mesh shard_fn after restore, the rater
    uploads on first use)."""
    import orbax.checkpoint as ocp
    item = ckptr.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)
    return ckptr.restore(path, restore_args=restore_args)


def load_weights(path: str, cfg: LMConfig) -> Params:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return _restore_numpy(
        ckptr, os.path.join(os.path.abspath(path), 'params'))


def load_model(path: str
               ) -> Tuple[Params, LMConfig, Vocab, Dict[str, Any]]:
    cfg, vocab, history = load_config(path)
    params = load_weights(path, cfg)
    rows = params['char_embedding'].shape[0]
    if rows != cfg.voc_size:  # reconcile with the actual embedding
        cfg = cfg.replace(voc_size=rows)
    return params, cfg, vocab, history


# ----------------------------------------------------------------------
# full train-state checkpoint/resume (SURVEY §5.4 TPU-native extension)
# ----------------------------------------------------------------------
#
# The reference resumes from weights only (run.py:49-59; epoch ckpts
# are weights-only, rating.py:284-285): a mid-run kill loses the Adam
# moments, the early-stopping bookkeeping, and the RNG position.  This
# checkpointer snapshots the COMPLETE training state at every epoch
# boundary so a killed run resumes exactly where the last completed
# epoch left it:
#
#   <dir>/ep_NNNN/state/   Orbax pytree: params, best_params, and the
#                          optimizer-state leaves (flattened; the optax
#                          treedef is rebuilt from a fresh init at
#                          restore time, so namedtuple structure
#                          round-trips exactly)
#   <dir>/ep_NNNN/meta.json  counters, history, RNG keys, the split's
#                          file lists + window split, vocab mapping
#
# Crash consistency: state is written into ``ep_NNNN.tmp`` and renamed
# to ``ep_NNNN`` only when complete, so a kill -9 mid-write leaves the
# previous snapshot intact and the loader only ever sees finished
# snapshots.  Saves are ASYNC (ocp.AsyncCheckpointer): the write of
# epoch N overlaps the compute of epoch N+1, and a background thread
# commits (renames) as soon as the write lands.  Sharding-awareness:
# leaves are materialized host-side before saving, and training.py
# re-applies its mesh sharding (shard_fn) after restore, so a mesh run
# resumes onto the same mesh layout.


class TrainCheckpointer:
    """Atomic, async, versioned train-state snapshots.

    ``save`` returns as soon as the Orbax async write is started; a
    background thread waits for it and then COMMITS the snapshot (one
    atomic rename), so the commit lands as early as the write allows
    while the train loop already runs the next epoch.  A kill at any
    instant leaves either the committed snapshot or the previous one —
    never a torn directory."""

    def __init__(self, path: str):
        import orbax.checkpoint as ocp
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())
        self._committer = None
        self._commit_error = None

    def save(self, epoch_done: int, state: Dict[str, Any],
             meta: Dict[str, Any]) -> None:
        """Snapshot after epoch ``epoch_done`` (1-based) completed."""
        import shutil
        import threading
        self.finalize()
        tag = 'ep_%04d' % epoch_done
        tmp = os.path.join(self.path, tag + '.tmp')
        final = os.path.join(self.path, tag)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        state = jax.device_get(state)  # materialize (sharded) leaves
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, 'meta.json'), 'w',
                  encoding='utf-8') as fh:
            json.dump(meta, fh, cls=NumpyJSONEncoder)
        self._ckptr.save(os.path.join(tmp, 'state'), state, force=True)
        self._committer = threading.Thread(
            target=self._wait_and_commit, args=(tmp, final),
            daemon=True)
        self._committer.start()

    def _wait_and_commit(self, tmp: str, final: str) -> None:
        import shutil
        # a failure here (disk full, permissions, Orbax write error)
        # must NOT die silently with the daemon thread: training would
        # keep running believing every epoch is checkpointed.  Record
        # it and re-raise at the next synchronization point.
        try:
            self._ckptr.wait_until_finished()
            os.rename(tmp, final)
        except BaseException as err:  # noqa: BLE001 — surfaced below
            self._commit_error = err
            return
        # prune everything but the newest committed snapshot
        for entry in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, entry)
            if full != final and entry.startswith('ep_'):
                shutil.rmtree(full, ignore_errors=True)

    def finalize(self) -> None:
        """Block until the in-flight snapshot (if any) is committed.
        Raises the commit thread's failure, if it had one."""
        if self._committer is not None:
            self._committer.join()
            self._committer = None
        if self._commit_error is not None:
            err, self._commit_error = self._commit_error, None
            raise RuntimeError('checkpoint snapshot commit failed: %s'
                               % err) from err

    def close(self) -> None:
        self.finalize()


def load_train_state(path: str) -> Optional[Dict[str, Any]]:
    """Load the newest complete snapshot, or None if there is none.

    Returns ``{'state': pytree, 'meta': dict}`` where state holds
    params / best_params / flat opt leaves (as saved by
    training.train_rater) and meta the counters/history/rng/file
    lists."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    tags = sorted(e for e in os.listdir(path)
                  if e.startswith('ep_') and not e.endswith('.tmp')
                  and os.path.isdir(os.path.join(path, e)))
    if not tags:
        return None
    snap = os.path.join(path, tags[-1])
    with open(os.path.join(snap, 'meta.json'), encoding='utf-8') as fh:
        meta = json.load(fh)
    ckptr = ocp.PyTreeCheckpointer()
    state = _restore_numpy(ckptr, os.path.join(snap, 'state'))
    return {'state': state, 'meta': meta}
