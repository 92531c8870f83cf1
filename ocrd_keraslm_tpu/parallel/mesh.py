"""Device-mesh construction and sharding layouts.

The reference is strictly single-process (SURVEY.md §2 parallelism
note; /root/reference/ocrd_keraslm/wrapper/rate.py:65 pins
max_workers=1).  This module is NEW capability, designed TPU-first:

* ``data`` axis — data parallelism: batch (and per-stream carries)
  sharded across chips; the gradient all-reduce is inserted by XLA
  from sharding propagation (rides ICI).
* ``model`` axis — tensor parallelism over the **vocabulary** dim of
  the tied char embedding: the embedding table and therefore the
  weight-tied softmax output is the only dimension of this model
  family that grows with the task (charset size); the (B, T, V) logits
  stay sharded on V and the cross-entropy is computed via on-device
  collectives.  The tiny LSTM cells (width 128) are replicated —
  sharding a 128-wide recurrence would be all communication and no
  compute.

Sequence parallelism is deliberately absent: the recurrence is
sequential in T by definition; the batch/hypothesis dimension is the
scaling dimension here (SURVEY.md §5.7).  Expert parallelism likewise
has no surface — the model family is a dense LSTM stack, no MoE
layers exist to shard.  Pipeline parallelism (depth-staged GPipe for
deep stacks) lives in ``parallel/pipeline.py`` over a (data, pipe)
mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None,
              second_axis: str = MODEL_AXIS) -> Mesh:
    """Build a (data, <second_axis>) mesh over the given/available
    devices — ``model`` for dp/tp (default), ``pipe`` for pipeline
    stages (parallel/pipeline.py)."""
    if devices is None:
        # prefer the accelerator whenever one is the default backend;
        # comparing device COUNTS preferred CPU on single-chip
        # machines (1 chip vs 1 CPU device -> silent CPU training)
        if jax.default_backend() == 'cpu':
            devices = jax.devices('cpu')
        else:
            devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0, \
        'n_devices must be divisible by the %s-axis size' % second_axis
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, second_axis))


def param_shardings(mesh: Mesh, params):
    """Sharding pytree for the param pytree: embedding vocab-sharded on
    the model axis, everything else replicated."""
    def repl():
        return NamedSharding(mesh, P())
    return {
        'char_embedding': NamedSharding(mesh, P(MODEL_AXIS, None)),
        'context_embeddings': [repl() for _ in
                               params['context_embeddings']],
        'lstm': [{'kernel': repl(), 'recurrent': repl(), 'bias': repl()}
                 for _ in params['lstm']],
    }


def batch_shardings(mesh: Mesh, n_contexts: int, stateful_targets: bool):
    """Shardings for (x, zs, y, mask): batch dim split on data axis."""
    bs = NamedSharding(mesh, P(DATA_AXIS, None))
    zs = tuple(NamedSharding(mesh, P(DATA_AXIS))
               for _ in range(n_contexts))
    ys = bs if stateful_targets else NamedSharding(mesh, P(DATA_AXIS))
    return bs, zs, ys, ys


def carry_sharding(mesh: Mesh):
    """(depth, B, W) carry: batch dim split on data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None))


def adam_opt_shardings(mesh: Mesh, opt_state, pspec):
    """Sharding tree for an optax chain's state: Adam moments get
    their params' shardings (sharded params' moments must NOT be
    replicated — that would forfeit the memory scaling), every other
    leaf replicated.  Shared by the dp/tp and pipeline train steps."""
    import optax
    repl = NamedSharding(mesh, P())

    def rec(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=pspec,
                                          nu=pspec)
        if isinstance(node, tuple) and hasattr(node, '_fields'):
            return type(node)(*(rec(x) for x in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(x) for x in node)
        return jax.tree_util.tree_map(lambda _: repl, node)
    return rec(opt_state)
