"""Parity tests: fused Pallas generation kernel vs the XLA scan engine
(interpret mode on CPU).

The kernel (ops/gen_kernel.py) reformulates the per-step fringe
re-selection (bisection threshold + row-prefix compaction instead of
``lax.top_k``), so these tests pin that the produced STRINGS — and for
multi-variant calls their order — are identical to the XLA engine's on
trained models across depths, prefix lengths, contexts, and the
dead-beam (absolute-threshold) corner.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from helpers import train_tiny_model
from ocrd_keraslm_tpu.rater import Rater


@pytest.fixture(scope='module', params=[1, 2])
def rater(request, tmp_path_factory):
    depth = request.param
    path = tmp_path_factory.mktemp('m') / ('lm_d%d.h5' % depth)
    model, _ = train_tiny_model(str(path), 'abcd bda cab dab ' * 300,
                                depth=depth, steps=400)
    r = Rater()
    r.load_config(model)
    r.configure()
    r.load_weights(model)
    return r


def _both(rater, *args, **kwargs):
    rater.fused_generate = False
    xla = rater.generate(*args, **kwargs)
    rater.fused_generate = 'force'
    try:
        fused = rater.generate(*args, **kwargs)
    finally:
        rater.fused_generate = False
    return xla, fused


def test_fused_matches_xla_single(rater):
    xla, fused = _both(rater, 'ab', 12)
    assert xla == fused
    assert len(fused) == 1 and len(fused[0]) == 13  # prefix[-1] + 12


def test_fused_matches_xla_variants_order(rater):
    xla, fused = _both(rater, 'ab', 12, variants=3)
    assert xla == fused
    assert len(fused) == 3


def test_fused_variants_chunked_traceback(rater, monkeypatch):
    # the multi-cursor traceback chunks when the (variants, T) SMEM
    # output would overflow scalar memory; force a tiny budget so a
    # 6-variant request walks in 3 passes of 2 cursors and still
    # matches both the unchunked fused result and the XLA engine
    from ocrd_keraslm_tpu.ops import gen_kernel
    rater.fused_generate = 'force'
    try:
        whole = rater.generate('ab', 10, variants=6)
        monkeypatch.setattr(gen_kernel, '_TB_SMEM_OUT_BYTES', 2 * 4 * 16)
        gen_kernel.generate_pallas_variants._clear_cache()
        chunked = rater.generate('ab', 10, variants=6)
    finally:
        rater.fused_generate = False
    monkeypatch.undo()
    gen_kernel.generate_pallas_variants._clear_cache()
    xla = rater.generate('ab', 10, variants=6)
    assert chunked == whole == xla
    assert len(chunked) == 6


def test_fused_matches_xla_long_prefix(rater):
    # prefix longer than the smallest bucket exercises the masked
    # prefix scan inside the kernel's jit
    xla, fused = _both(rater, 'abcd bda cab dab abcd bda', 8)
    assert xla == fused


def test_fused_dead_beam_matches_xla(rater):
    # an absolute threshold close to 1.0 kills every candidate at the
    # first step in BOTH engines: the fused path must report the dead
    # beam (cost >= BIG) exactly like the XLA path, not emit garbage
    from ocrd_keraslm_tpu.ops.beam_device import (_gen_weights,
                                                  generate_device_best)
    from ocrd_keraslm_tpu.ops.gen_kernel import generate_pallas_best
    emb, embT, wcat, bias, v_real = _gen_weights(
        rater, rater.underspecify_contexts())
    ids = rater.vocab.encode('ab')
    prefix = np.zeros((16,), np.int32)
    prefix[:len(ids)] = ids
    mask = np.zeros((16,), np.float32)
    mask[:len(ids) - 1] = 1.0
    args = (emb, embT, wcat, bias, jnp.asarray(prefix),
            jnp.asarray(mask))
    seq_x, cost_x = generate_device_best(*args, 16, 8, int(v_real),
                                         threshold=0.999)
    seq_p, cost_p = generate_pallas_best(*args, 16, 8, int(v_real),
                                         threshold=0.999)
    assert float(cost_x) >= 1e38
    assert float(cost_p) >= 1e38


def test_fused_records_match_xla_live_set(rater):
    # per-step live candidate SETS agree (slot order differs by
    # design: the kernel emits row-major source order, the XLA engine
    # rank order) — compare the sorted (char, cost) multisets
    from ocrd_keraslm_tpu.ops.beam_device import (_gen_weights,
                                                  generate_device)
    from ocrd_keraslm_tpu.ops.gen_kernel import generate_pallas
    emb, embT, wcat, bias, v_real = _gen_weights(
        rater, rater.underspecify_contexts())
    ids = rater.vocab.encode('ab')
    prefix = np.zeros((16,), np.int32)
    prefix[:len(ids)] = ids
    mask = np.zeros((16,), np.float32)
    mask[:len(ids) - 1] = 1.0
    args = (emb, embT, wcat, bias, jnp.asarray(prefix),
            jnp.asarray(mask))
    ch_x, _, co_x = generate_device(*args, 8, int(v_real))
    ch_p, _, co_p = generate_pallas(*args, 8, int(v_real))
    ch_x, co_x = np.asarray(ch_x), np.asarray(co_x)
    ch_p, co_p = np.asarray(ch_p), np.asarray(co_p)
    for t in range(8):
        live_x = co_x[t] < 1e38
        live_p = co_p[t] < 1e38
        assert live_x.sum() == live_p.sum()
        sx = sorted(zip(ch_x[t][live_x].tolist(),
                        np.round(co_x[t][live_x], 5).tolist()))
        sp = sorted(zip(ch_p[t][live_p].tolist(),
                        np.round(co_p[t][live_p], 5).tolist()))
        assert sx == sp, 'live-set mismatch at step %d' % t


def test_fused_nondefault_fringe_topk(rater):
    # the kernel's selection math (row extraction, bisection boundary,
    # prefix compaction) must generalize beyond the reference's
    # 10/256 semantics: compare engines at topk=5 / fringe=64
    import numpy as np

    import jax.numpy as jnp

    from ocrd_keraslm_tpu.ops.beam_device import (_gen_weights,
                                                  generate_device)
    from ocrd_keraslm_tpu.ops.gen_kernel import generate_pallas
    emb, embT, wcat, bias, v_real = _gen_weights(
        rater, rater.underspecify_contexts())
    ids = rater.vocab.encode('ab')
    prefix = np.zeros((16,), np.int32)
    prefix[:len(ids)] = ids
    mask = np.zeros((16,), np.float32)
    mask[:len(ids) - 1] = 1.0
    args = (emb, embT, wcat, bias, jnp.asarray(prefix),
            jnp.asarray(mask))
    kw = dict(topk=5, fringe=64)
    ch_x, _, co_x = generate_device(*args, 8, int(v_real), **kw)
    ch_p, _, co_p = generate_pallas(*args, 8, int(v_real), **kw)
    ch_x, co_x = np.asarray(ch_x), np.asarray(co_x)
    ch_p, co_p = np.asarray(ch_p), np.asarray(co_p)
    for t in range(8):
        lx = co_x[t] < 1e38
        lp = co_p[t] < 1e38
        assert lx.sum() == lp.sum()
        sx = sorted(zip(ch_x[t][lx].tolist(),
                        np.round(co_x[t][lx], 5).tolist()))
        sp = sorted(zip(ch_p[t][lp].tolist(),
                        np.round(co_p[t][lp], 5).tolist()))
        assert sx == sp, 'live-set mismatch at step %d' % t


def test_varied_lengths_share_bucket_compile(rater):
    # serving regression guard: out_length is a RUNTIME scalar, so
    # requests of different lengths within one bucket must reuse one
    # compiled program per engine (a static out_length cost ~20-40 s
    # of tunneled compile per distinct length)
    from ocrd_keraslm_tpu.ops.beam_device import generate_device_best
    from ocrd_keraslm_tpu.ops.gen_kernel import generate_pallas_variants
    for fn in (generate_pallas_variants, generate_device_best):
        fn._clear_cache()
    rater.fused_generate = 'force'
    try:
        outs = {n: rater.generate('ab', n)[0] for n in (5, 9, 12)}
        outs_v = {n: rater.generate('ab', n, variants=2)
                  for n in (6, 11)}
    finally:
        rater.fused_generate = False
    xla = {n: rater.generate('ab', n)[0] for n in (5, 9, 12)}
    # variants=1 (the generate_pallas_best wrapper) and variants=2
    # share the bucket but differ in the static `variants` arg -> 2
    assert generate_pallas_variants._cache_size() == 2
    assert generate_device_best._cache_size() == 1
    for n in (5, 9, 12):
        assert len(outs[n]) == n + 1 and outs[n] == xla[n]
    for n in (6, 11):
        assert all(len(o) == n + 1 for o in outs_v[n])


def test_fused_gate_vmem_fallback(rater, monkeypatch):
    # the routing gate: TPU default on, opt-out respected, and models
    # whose kernel would not fit VMEM fall back to the XLA engine
    # instead of failing Mosaic allocation
    from ocrd_keraslm_tpu.ops import beam_device
    assert not beam_device._use_fused_gen(rater, 256)  # CPU backend
    rater.fused_generate = 'force'
    assert beam_device._use_fused_gen(rater, 256)
    monkeypatch.setattr(beam_device.jax, 'default_backend',
                        lambda: 'tpu')
    rater.fused_generate = True
    assert beam_device._use_fused_gen(rater, 256)
    wide = type('W', (), {'depth': 4, 'width': 2048,
                          'fused_generate': True})()
    assert not beam_device._use_fused_gen(wide, 4096)
    wide.fused_generate = False
    assert not beam_device._use_fused_gen(wide, 4096)
    rater.fused_generate = False


def test_fused_generate_with_context(rater):
    if not rater.contexts:
        pytest.skip('model has no context variables')
    # a non-default context changes the folded layer-0 bias in both
    # engines the same way (the rows are untrained, which is fine —
    # the engines must still agree)
    xla, fused = _both(rater, 'ab', 10, context=[5])
    assert xla == fused


def test_generate_variants_zero_returns_empty(rater):
    """Review regression: variants=0 must return [] on the fused
    engine (host/XLA already did; the kernel's traceback concatenate
    crashed on an empty chunk list)."""
    rater.fused_generate = 'force'
    try:
        assert rater.generate('ab', 4, variants=0) == []
    finally:
        rater.fused_generate = False
