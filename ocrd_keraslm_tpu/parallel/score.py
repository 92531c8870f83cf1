"""Sharded multi-chip INFERENCE: data-parallel batch scoring.

The reference has no multi-device inference at all (SURVEY.md §5.8);
this is the TPU-native equivalent of page-parallel workers: the
stream batch of ``Rater._score_batch`` (one row per page/text) is
sharded over the mesh ``data`` axis, parameters are replicated, and
every chip scores its rows independently — no collectives on the
forward path, the final per-stream NLL/prob fetch is the only
cross-chip gather.

Used automatically by ``Rater`` when ``rater.mesh`` is set (the same
mesh also shards training, parallel/train.py).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def make_sharded_score_step(mesh: Mesh):
    """Jit ``rater._score_stream`` over ``mesh`` with the batch dim
    sharded on the data axis (params replicated)."""
    from ..rater import _score_stream

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(DATA_AXIS, None))
    row = NamedSharding(mesh, P(DATA_AXIS))
    carry = NamedSharding(mesh, P(None, DATA_AXIS, None))
    probs = NamedSharding(mesh, P(None, DATA_AXIS, None))
    return jax.jit(
        _score_stream,
        static_argnames=('cfg', 'n_chunks', 'use_pallas', 'fused'),
        in_shardings=(repl, rows, row, row, row, (carry, carry)),
        out_shardings=(probs, row, (carry, carry)),
    )
