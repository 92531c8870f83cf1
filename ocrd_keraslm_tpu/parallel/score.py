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
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def make_sharded_score_step(mesh: Mesh):
    """Jit ``rater._score_stream`` over ``mesh`` with the batch dim
    sharded on the data axis (params replicated).

    The body runs under ``jax.shard_map`` (same pattern as
    parallel/decode.py's fused kernels), NOT plain GSPMD
    ``in_shardings``: when the rater's TPU defaults route the stream
    through the fused Pallas scoring kernel (``fused=True``) or the
    Pallas LSTM scan (``use_pallas=True``), the lowered
    ``tpu_custom_call`` has no SPMD partitioning rule — under bare
    auto-partitioning XLA would have to all-gather the global batch
    onto every chip and run the full-size kernel replicated.  With
    shard_map each chip traces ``_score_stream`` at its LOCAL row
    count and the Pallas kernels stay per-chip; the forward path has
    no collectives (rows are independent streams).
    """
    from ..rater import _score_stream

    rows = P(DATA_AXIS, None)
    row = P(DATA_AXIS)
    carry = P(None, DATA_AXIS, None)
    probs = P(None, DATA_AXIS, None)

    def sharded(params, cfg, xflat, zs, lens, last, carry_in,
                n_chunks, use_pallas, fused):
        def body(p, x, z, ln, la, ca):
            return _score_stream(p, cfg, x, z, ln, la, ca,
                                 n_chunks, use_pallas, fused)
        fn = jax.shard_map(
            body, mesh=mesh,
            # P() is a pytree prefix covering the whole params tree;
            # `row` likewise covers each (B,) context row in zs
            in_specs=(P(), rows, row, row, row, (carry, carry)),
            out_specs=(probs, row, (carry, carry)),
            check_vma=False)
        return fn(params, xflat, zs, lens, last, carry_in)

    return jax.jit(sharded, static_argnames=('cfg', 'n_chunks',
                                             'use_pallas', 'fused'))
