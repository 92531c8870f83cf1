"""Sharded multi-chip / multi-document lattice DECODING.

Serving-oriented: N INDEPENDENT documents (or pages of independent
documents) decode in ONE dispatch — ``decode_lattice_device`` vmapped
over a leading document axis; when a :class:`jax.sharding.Mesh` is
given, that axis is sharded over the mesh ``data`` axis so every chip
decodes its own documents with replicated parameters and no
collectives on the search path (the TPU-native equivalent of the
reference's page-parallel worker pool, SURVEY §5.8 — which the
reference itself only had for *scoring*, not for beam decoding).

Used by :meth:`ocrd_keraslm_tpu.rater.Rater.rate_best_batch`.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

_CACHE: dict = {}


def make_batch_decode(cfg, E: int, A: int, L: int, K: int,
                      lm_weight: float, mesh: Optional[Mesh] = None):
    """Jit (and optionally shard) a document-batched decode.

    Returns ``fn(params, chars (N,E,A,L), mask, conf, valid (N,E,A),
    zs, h0 (N,D,K,W), c0, x0 (N,K), cost0 (N,K)) -> packed (N,E+1,2)``.
    """
    key = (cfg, E, A, L, K, round(float(lm_weight), 6),
           id(mesh) if mesh is not None else None)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn
    from ..ops.beam_device import decode_lattice_device

    def one(params, chars, mask, conf, valid, zs, h0, c0, x0, cost0):
        packed, _h, _c, _x, _cost = decode_lattice_device(
            params, cfg, chars, mask, conf, valid, zs, h0, c0, x0,
            cost0, lm_weight, E, A, L, K, device_walk=True)
        return packed

    vd = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, None, 0, 0, 0, 0))
    if mesh is None:
        fn = jax.jit(vd)
    else:
        repl = NamedSharding(mesh, P())
        d1 = NamedSharding(mesh, P(DATA_AXIS))            # (N, ...)
        fn = jax.jit(
            vd,
            in_shardings=(repl, d1, d1, d1, d1, repl, d1, d1, d1, d1),
            out_shardings=d1)
    _CACHE[key] = fn
    return fn
