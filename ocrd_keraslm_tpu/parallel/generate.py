"""Sharded multi-chip GENERATION serving: stream-parallel beam search.

The third leg of the inference-sharding triad (scoring: score.py,
lattice decoding: decode.py).  ``generate_device_best`` — the
one-dispatch beam sampler — is vmapped over a leading stream axis and
that axis is sharded over the mesh ``data`` axis: S prompts spread
across n_data chips, parameters replicated, no collectives anywhere on
the search path (each stream's beam is independent), so a serving tier
answers n_data x the prompts of one chip per dispatch at unchanged
per-chip cost.

The reference has no batched generation at all (its ``generate``,
/root/reference/ocrd_keraslm/lib/rating.py:642-709, is one prefix per
call with a host round-trip per character), let alone a multi-device
one.  Used automatically by :func:`ocrd_keraslm_tpu.ops.beam_device.
generate_streams` when ``rater.mesh`` is set.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

_CACHE: dict = {}


def data_size(mesh: Mesh) -> int:
    """Number of devices along the mesh data axis."""
    return int(mesh.shape[DATA_AXIS])


def make_stream_generate(mesh: Optional[Mesh], run_length: int,
                         v_real: int):
    """Jit (and optionally shard) a stream-batched generation.

    Returns ``fn(emb, embT, wcat, bias, prefix_ids (S, P),
    prefix_mask (S, P), out_length) -> (seqs (S, run_length), costs
    (S,))`` — seqs are valid in positions [0, out_length), which is a
    RUNTIME scalar so varied serving lengths share one compile per
    length bucket.  With a mesh, S must be a multiple of the data-axis
    size (the caller pads; see ``generate_streams``) and the stream
    axis is sharded over it; weights are replicated over both mesh
    axes.
    """
    # Mesh is hashable; id() could collide after GC (see decode.py)
    key = (mesh, run_length, v_real)
    fn = _CACHE.get(key)
    if fn is not None:
        return fn
    from ..ops.beam_device import generate_device_best

    def one(emb, embT, wcat, bias, pids, pmask, out_length):
        return generate_device_best(
            emb, embT, wcat, bias, pids, pmask, run_length,
            out_length, v_real)

    vd = jax.vmap(one, in_axes=(None, None, None, None, 0, 0, None))
    if mesh is None:
        fn = jax.jit(vd)
    else:
        repl = NamedSharding(mesh, P())
        d1 = NamedSharding(mesh, P(DATA_AXIS))
        fn = jax.jit(vd,
                     in_shardings=(repl, repl, repl, repl, d1, d1,
                                   repl),
                     out_shardings=(d1, d1))
    _CACHE[key] = fn
    return fn
