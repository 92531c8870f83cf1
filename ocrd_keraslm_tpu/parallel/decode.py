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
    # Mesh is hashable — id() could collide after GC and serve a
    # compiled fn bound to dead devices
    key = (cfg, E, A, L, K, round(float(lm_weight), 6), mesh)
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


def make_fused_batch_decode(mesh: Mesh, N: int, E: int, A: int, L: int,
                            K: int, D: int, W: int, v_pad: int,
                            v_real: int, lm_weight: float):
    """Shard-mapped document-batched FUSED decode: every chip runs
    ``decode_lattice_pallas_batch`` on its own N = 128/K documents
    (weights replicated, no collectives on the search path), so a
    serving batch of n_data * N documents decodes in one dispatch at
    full fused-kernel speed per chip.

    Returns ``fn(emb, embT, wcat, bias, chars (S, E, N*A, L), mask,
    conf, valid (S, E, N*A, 1), steps (S, E, 1) [per-SHARD per-edge
    char-step bounds — each chip's fori_loop runs to its own docs'
    max alternative length], state (S, N*K, Sd), cost (S, N*K, 1))
    -> (records (S, E, 8, 128), stateF, costF)`` with S = mesh data
    size.
    """
    from ..ops.decode_kernel import decode_lattice_pallas_batch

    key = ('fused', mesh, N, E, A, L, K, D, W, v_pad, v_real,
           round(float(lm_weight), 6))
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    def body(emb, embT, wcat, bias, chars, mask, conf, valid,
             steps, state, cost):
        rec, stateF, costF = decode_lattice_pallas_batch(
            emb, embT, wcat, bias, chars[0], mask[0], conf[0],
            valid[0], state[0], cost[0],
            n_docs=N, n_edges=E, n_alts=A, alt_len=L, beam=K,
            depth=D, width=W, v_pad=v_pad, v_real=v_real,
            lm_weight=lm_weight, alt_steps=steps[0])
        return rec[None], stateF[None], costF[None]

    d1 = P(DATA_AXIS)
    repl = P()
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, repl, repl, d1, d1, d1, d1, d1,
                  d1, d1),
        out_specs=(d1, d1, d1),
        check_vma=False))
    _CACHE[key] = fn
    return fn


def make_fused_batch_walk(mesh: Mesh, N: int, K: int):
    """Shard-mapped on-device backpointer walk for the sharded fused
    decode: per chip, ``walk_records_batch`` over its own records.
    ``fn(records (S, E, 8, 128), k_in (S, N)) -> (k_out (S, N),
    walks (S, N, E, 2))``."""
    from ..ops.decode_kernel import walk_records_batch

    key = ('walk', mesh, N, K)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    def body(records, k_in):
        k_out, walks = walk_records_batch(records[0], k_in[0],
                                          n_docs=N, beam=K)
        return k_out[None], walks[None]

    d1 = P(DATA_AXIS)
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(d1, d1),
                               out_specs=(d1, d1), check_vma=False))
    _CACHE[key] = fn
    return fn
