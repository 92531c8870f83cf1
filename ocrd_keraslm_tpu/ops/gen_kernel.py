"""Fused Pallas TPU kernel: whole generation beam search on-chip.

The XLA generation engine (ops/beam_device.generate_device) is one
dispatch, but on this platform every ``lax.scan`` step pays a ~8 us
sequential overhead floor (measured: a scan whose body is a single
trivial op costs the same per step as one with a (256,512)@(512,512)
matmul) — the beam step's actual compute is almost free next to it.
This kernel runs the complete per-character beam step — the LSTM
stack, tied-softmax log-probs, per-hypothesis exact top-10, the global
exact 256-of-2560 fringe re-selection, and the fringe reorder — inside
ONE ``pallas_call`` with a sequential grid over output characters, so
the scan overhead disappears and the weights/fringe state never leave
VMEM.

Semantics match ``generate_device`` (reference semantics
/root/reference/ocrd_keraslm/lib/rating.py:693-704: per-hypothesis
top-10 candidates, absolute probability threshold 0.004, fringe capped
at 256, cumulative-cost ordering):

* per-row candidates come out of an iterative exact argmax, so each
  row's candidate list is ASCENDING in cumulative cost by
  construction;
* the global fringe re-selection finds the exact 256th-smallest
  candidate cost by 31-step bisection on the raw float bits (all costs
  are >= 0, where IEEE-754 ordering equals int32 ordering), with ties
  at the threshold taken in ascending flat (row-major) candidate index
  — the same boundary set ``jax.lax.top_k`` selects;
* because each row's candidates are sorted, the selected candidates of
  a row always form a PREFIX of that row, which turns the fringe
  compaction into a single one-hot selection matmul (house style of
  ops/decode_kernel.py: 0/1 matrices at Precision.HIGHEST are exact
  f32 pass-throughs) instead of a scatter;
* the new fringe is emitted in row-major source order rather than
  cost-rank order.  Slot order is semantically free: the per-step
  records (char, backpointer, cost) stay internally consistent, and
  best-path extraction ranks by cost at the end.

Only live-candidate sets are compared against the XLA engine (dead
slots carry cost >= 3e38 and are masked from expansion and from the
final ranking, exactly as there).

Tie caveat: on logits that are EXACTLY equal (e.g. an untrained model
whose first step emits a uniform distribution) the two engines may
keep different members of a tied boundary class — the XLA engine's
``approx_max_k`` uses hardware PartialReduce order, this kernel takes
the smallest char id.  Both are valid orders of the same tied set;
trained models (the parity tests here, and a 1024-char TPU run) agree
string-for-string.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one-hot "gather" matmuls must pass f32 values through exactly (the
# MXU's default bf16 input rounding would quantize carried costs)
EXACT = jax.lax.Precision.HIGHEST

BIG = 3.0e38  # matches ops/beam_device.NEG_INF
BIG_BITS = int(np.float32(BIG).view(np.int32))


def _make_gen_kernel(D, W, V, K, TOPK, v_real, log_thresh):
    S = (2 * D + 1) * W  # packed state rows [xemb | h_0.. | c_0..]

    def kernel(emb_ref, embT_ref, wcat_ref, bias_ref,   # VMEM weights
               state0_ref, cost0_ref,                   # init
               rec_ref,                                 # output
               state_ref, cost_ref):                    # scratch
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state_ref[:] = state0_ref[:]
            cost_ref[:] = cost0_ref[:]

        state = state_ref[:]   # (K, S)
        cost = cost_ref[:]     # (K, 1)

        # ---- LSTM stack + tied softmax stats (K fringe rows) ----
        new_h, new_c = [], []
        inp = None
        for d in range(D):
            if d == 0:
                operand = state[:, 0:2 * W]
            else:
                operand = jnp.concatenate(
                    [inp, state[:, (1 + d) * W:(2 + d) * W]], axis=1)
            z = (jnp.dot(operand, wcat_ref[d],
                         preferred_element_type=jnp.float32)
                 + bias_ref[d])
            i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
            f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
            g = jnp.tanh(z[:, 2 * W:3 * W])
            o = jax.nn.sigmoid(z[:, 3 * W:4 * W])
            c2 = f * state[:, (1 + D + d) * W:(2 + D + d) * W] + i * g
            h2 = o * jnp.tanh(c2)
            new_h.append(h2)
            new_c.append(c2)
            inp = h2
        viota = jax.lax.broadcasted_iota(jnp.int32, (K, V), 1)
        logits = jnp.dot(inp, embT_ref[:],
                         preferred_element_type=jnp.float32)
        logits = jnp.where(viota < v_real, logits, -BIG)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        lse = mx + jnp.log(
            jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))

        # ---- per-row exact top-TOPK (iterative argmax; ties at equal
        # logits resolve to the smallest char id) ----
        work = logits
        vals, idxs = [], []
        for _ in range(TOPK):
            mj = jnp.max(work, axis=-1, keepdims=True)
            ij = jnp.min(jnp.where(work == mj, viota, V), axis=-1,
                         keepdims=True)
            vals.append(mj)
            idxs.append(ij)
            work = jnp.where(viota == ij, -BIG, work)
        val = jnp.concatenate(vals, axis=1)   # (K, TOPK) logits desc
        idx = jnp.concatenate(idxs, axis=1)   # (K, TOPK) char ids

        # candidate costs, ASCENDING per row; reference masks:
        # absolute probability threshold and dead-parent exclusion
        # preserve the ascending order (the threshold is monotone along
        # the row, dead parents mask whole rows)
        nll = jnp.maximum(lse - val, 0.0)     # nats
        cand = cost + nll                     # (K, TOPK)
        cand = jnp.where(val - lse < log_thresh, BIG, cand)
        cand = jnp.where(cost >= BIG / 2, BIG, cand)
        # the unmapped-char candidate (id 0, at most one per row since
        # extracted ids are distinct) is removed by shifting the row
        # tail left one slot — unlike masking in place, this keeps the
        # row ascending; the candidate SET equals the XLA engine's
        # (whose char-0 candidate is masked to a dead filler)
        jiota = jax.lax.broadcasted_iota(jnp.int32, (K, TOPK), 1)
        pos0 = jnp.min(jnp.where(idx == 0, jiota, TOPK), axis=1,
                       keepdims=True)
        cand_s = jnp.concatenate(
            [cand[:, 1:], jnp.full((K, 1), BIG, jnp.float32)], axis=1)
        idx_s = jnp.concatenate(
            [idx[:, 1:], jnp.zeros((K, 1), jnp.int32)], axis=1)
        cand = jnp.where(jiota >= pos0, cand_s, cand)
        idx = jnp.where(jiota >= pos0, idx_s, idx)
        cand = jnp.minimum(cand, BIG)

        # ---- global exact K-of-(K*TOPK): bisect the raw float bits
        # for the K-th smallest cost (all costs >= 0, so int32 order
        # equals float order); then ties at the threshold fill the
        # remaining slots in ascending flat index, the same boundary
        # set lax.top_k keeps.  The per-iteration count runs on the
        # TRANSPOSED (TOPK, K) view — 4 vregs instead of 32 per
        # compare+reduce (measured ~1 us/char on the 31-step chain) ----
        u = pltpu.bitcast(cand, jnp.int32)
        uT = jnp.transpose(u)                              # (TOPK, K)

        def bis(_, lh):
            lo, hi = lh
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((uT <= mid).astype(jnp.float32))
            ok = cnt >= K
            return (jnp.where(ok, lo, mid + 1),
                    jnp.where(ok, mid, hi))
        lo, hi = jax.lax.fori_loop(
            0, 31, bis, (jnp.int32(0), jnp.int32(BIG_BITS)))
        thr = lo

        less_r = jnp.sum((u < thr).astype(jnp.float32), axis=1,
                         keepdims=True)                    # (K, 1)
        eq_r = jnp.sum((u == thr).astype(jnp.float32), axis=1,
                       keepdims=True)
        need = jnp.float32(K) - jnp.sum(less_r)
        # exclusive row cumsums as ONE strict-lower-triangular 0/1
        # matmul; the tie-take prefix has the closed form
        # min(eq_pfx, need) (ties are taken greedily in row order until
        # `need` is exhausted), so no second dependent matmul
        riota_col = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        riota_row = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        Lx = (riota_row < riota_col).astype(jnp.float32)   # (K, K)
        pfx2 = jnp.dot(Lx, jnp.concatenate([eq_r, less_r], axis=1),
                       precision=EXACT,
                       preferred_element_type=jnp.float32)
        eq_pfx = pfx2[:, 0:1]
        less_pfx = pfx2[:, 1:2]
        take_r = jnp.clip(need - eq_pfx, 0.0, eq_r)
        n_r = less_r + take_r       # selected per row (a row PREFIX)
        n_pfx = less_pfx + jnp.minimum(eq_pfx, need)

        # ---- compaction: slot s sources row r with
        # n_pfx[r] <= s < n_pfx[r] + n_r[r], candidate j = s - n_pfx[r]
        s_col = riota_col.astype(jnp.float32)              # (K, 1)
        npfx_row = jnp.transpose(n_pfx)                    # (1, K)
        nr_row = jnp.transpose(n_r)
        P = ((s_col >= npfx_row) &
             (s_col < npfx_row + nr_row)).astype(jnp.float32)
        # per-slot [cand.. | idx.. | src_row | src_pfx | h.. | c..]
        # — the whole fringe compaction in ONE selection matmul
        hs = jnp.concatenate(new_h + new_c, axis=1)        # (K, 2DW)
        feats = jnp.concatenate(
            [cand, idx.astype(jnp.float32),
             riota_col.astype(jnp.float32), n_pfx, hs], axis=1)
        fsel = jnp.dot(P, feats, precision=EXACT,
                       preferred_element_type=jnp.float32)
        cand_sel = fsel[:, 0:TOPK]
        idx_sel = fsel[:, TOPK:2 * TOPK]
        src_row = fsel[:, 2 * TOPK:2 * TOPK + 1]
        src_pfx = fsel[:, 2 * TOPK + 1:2 * TOPK + 2]
        hsel = fsel[:, 2 * TOPK + 2:]
        jsel = (s_col - src_pfx).astype(jnp.int32)         # (K, 1)
        onehot_j = (jiota == jsel).astype(jnp.float32)     # (K, TOPK)
        cost_new = jnp.sum(onehot_j * cand_sel, axis=1,
                           keepdims=True)
        char_new = jnp.sum(onehot_j * idx_sel, axis=1,
                           keepdims=True)                  # f32, exact

        # ---- fringe state: selected parent rows + new char embedding
        onehot_v = (viota ==
                    char_new.astype(jnp.int32)).astype(jnp.float32)
        xemb = jnp.dot(onehot_v, emb_ref[:], precision=EXACT,
                       preferred_element_type=jnp.float32)
        state_ref[:] = jnp.concatenate([xemb, hsel], axis=1)
        cost_ref[:] = cost_new

        # ---- per-step records: [char | backptr | cost] over K lanes
        # (one packed (K, 3) transpose instead of three (K, 1) ones)
        pack3 = jnp.concatenate([char_new, src_row, cost_new], axis=1)
        rec = jnp.concatenate(
            [jnp.transpose(pack3),
             jnp.zeros((5, K), jnp.float32)], axis=0)      # (8, K)
        rec_ref[0] = rec

    return kernel, S


def _gen_pallas_raw(emb, embT, wcat, bias, state0, cost0, length,
                    v_real, topk, fringe, threshold):
    """Trace the kernel call (shared by the jitted entry points).

    emb: (V_pad, W); embT: (W, V_pad); wcat: (D, 2W, 4W) fused
    ``[input-kernel; recurrent-kernel]``; bias: (D, 1, 4W) (context
    folded into layer 0); state0: (K, S) packed ``[xemb | h.. | c..]``
    prefix-conditioned fringe; cost0: (K, 1) column costs (BIG = dead).

    Returns the raw per-step record buffer (length, 8, K) with rows
    [char | backptr | cost | 0...] — kept raw so the traceback kernel
    can consume it without a re-stack.
    """
    V, W = emb.shape
    D = wcat.shape[0]
    K = fringe
    TOPK = min(topk, v_real)
    log_thresh = float(np.log(np.float32(threshold)))
    interpret = jax.default_backend() != 'tpu'
    kernel, S = _make_gen_kernel(D, W, V, K, TOPK, v_real, log_thresh)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    rec = pl.pallas_call(
        kernel,
        grid=(length,),
        in_specs=[
            vmem((V, W), lambda t: (0, 0)),
            vmem((W, V), lambda t: (0, 0)),
            vmem((D, 2 * W, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, 1, 4 * W), lambda t: (0, 0, 0)),
            vmem((K, S), lambda t: (0, 0)),
            vmem((K, 1), lambda t: (0, 0)),
        ],
        out_specs=vmem((1, 8, K), lambda t: (t, 0, 0)),  # per step
        out_shape=jax.ShapeDtypeStruct((length, 8, K), jnp.float32),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((K, S), jnp.float32),
            pltpu.VMEM((K, 1), jnp.float32),
        ],
    )(emb, embT, wcat, bias, state0, cost0)
    return rec


def _gen_pallas_call(emb, embT, wcat, bias, state0, cost0, length,
                     v_real, topk, fringe, threshold):
    """(chars (T, K), backptrs (T, K), costs (T, K)) view of the raw
    records, matching ``ops.beam_device.generate_device``'s layout."""
    rec = _gen_pallas_raw(emb, embT, wcat, bias, state0, cost0, length,
                          v_real, topk, fringe, threshold)
    chars = rec[:, 0, :].astype(jnp.int32)
    backptrs = rec[:, 1, :].astype(jnp.int32)
    costs = rec[:, 2, :]
    return chars, backptrs, costs


def _make_tb_kernel(K, T, VARS):
    """Multi-cursor best-path traceback over the raw record buffer: a
    reverse sequential grid carrying ``VARS`` slot cursors in SMEM;
    each step extracts (char, backptr) of every cursor from the
    streamed-in step record with one-hot reduces.  The XLA
    ``lax.scan`` alternative pays the per-step dispatch floor this
    kernel exists to avoid (measured ~1.9 us/char of the full
    generate path), and per-variant passes re-stream the whole
    (T, 8, K) buffer from HBM once per variant — all cursors walk in
    ONE pass here (the unrolled per-cursor reduces are VPU-trivial
    next to the record stream).

    ``out_length`` arrives as a runtime SMEM scalar — NOT a static —
    so a serving loop that asks for varied lengths compiles one
    traceback per BUCKET, not one per distinct length (each new
    compile costs ~20-40 s through the tunneled compile service).
    Steps at or beyond out_length are masked no-ops; the walk starts
    when the reverse grid reaches step out_length - 1."""
    def kernel(best_ref, olen_ref, rec_ref, out_ref, k_ref):
        t = pl.program_id(0)
        b = T - 1 - t                 # record step this grid step reads
        olen = olen_ref[0]

        @pl.when(b == olen - 1)
        def _():
            for v in range(VARS):
                k_ref[v] = best_ref[v]

        @pl.when(b < olen)
        def _():
            rec = rec_ref[0]          # (8, K) step record
            kio = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            for v in range(VARS):
                onehot = (kio == k_ref[v]).astype(jnp.float32)
                out_ref[v, b] = jnp.sum(onehot * rec[0:1]).astype(
                    jnp.int32)
                k_ref[v] = jnp.sum(onehot * rec[1:2]).astype(jnp.int32)
    return kernel


# Per-pass cap on the traceback kernel's SMEM output (VARS, T) so a
# many-variant request at a long bucket chunks into several passes
# instead of overflowing scalar memory (bucket 16384: 4 cursors/pass).
# A chunking heuristic, not a hard ceiling: at buckets >= 65536 the
# floor is one cursor per pass, whose (1, T) output exceeds this
# budget — measured working on the chip up to bucket 131072 (512 KB
# SMEM out, single and multi-variant).
_TB_SMEM_OUT_BYTES = 256 * 1024


def _traceback_pallas(rec, best, out_length):
    """Walk the backpointers of the raw (T, 8, K) record buffer from
    each slot in ``best`` (shape (VARS,)) at step ``out_length - 1``
    (a runtime scalar); returns (VARS, T) char ids in forward order,
    valid in positions [0, out_length)."""
    T, _, K = rec.shape
    VARS = best.shape[0]
    return pl.pallas_call(
        _make_tb_kernel(K, T, VARS),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, K), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((VARS, T), jnp.int32),
        interpret=jax.default_backend() != 'tpu',
        scratch_shapes=[pltpu.SMEM((VARS,), jnp.int32)],
    )(best.astype(jnp.int32),
      jnp.asarray(out_length, jnp.int32)[None], rec)


def _prefix_fringe(emb, embT, wcat, bias, prefix, prefix_mask, v_real,
                   fringe):
    """Condition the initial fringe on the full prefix (the engines'
    shared ``_prefix_state`` scan, with the cost vector in the
    kernel's (K, 1) column layout)."""
    from .beam_device import _prefix_state
    W = emb.shape[1]
    D = wcat.shape[0]
    K = fringe
    S = (2 * D + 1) * W
    root = _prefix_state(emb, embT, wcat, bias, prefix, prefix_mask,
                         v_real)
    state0 = jnp.broadcast_to(root, (K, S))
    cost0 = jnp.where(jnp.arange(K) == 0, 0.0, BIG)[:, None]
    return state0, cost0


@partial(jax.jit, static_argnames=('length', 'v_real', 'topk',
                                   'fringe', 'threshold'))
def generate_pallas(emb, embT, wcat, bias, prefix, prefix_mask,
                    length: int, v_real: int, topk: int = 10,
                    fringe: int = 256, threshold: float = 0.004):
    """Fused-kernel analogue of ``generate_device``: prefix
    conditioning + the whole beam search in ONE dispatch; returns the
    full per-step records (chars, backptrs, costs), each (T, K)."""
    state0, cost0 = _prefix_fringe(emb, embT, wcat, bias, prefix,
                                   prefix_mask, v_real, fringe)
    return _gen_pallas_call(emb, embT, wcat, bias, state0, cost0,
                            length, v_real, topk, fringe, threshold)


def generate_pallas_best(emb, embT, wcat, bias, prefix, prefix_mask,
                         length: int, out_length, v_real: int,
                         topk: int = 10, fringe: int = 256,
                         threshold: float = 0.004):
    """Fused-kernel analogue of ``generate_device_best``: on-device
    traceback of the single best path at step ``out_length`` (a second
    tiny Pallas kernel over the raw record buffer).  ``out_length`` is
    a RUNTIME scalar (only the length bucket is static), so varied
    serving lengths share one compile per bucket; the returned seq is
    (length,), valid in positions [0, out_length).

    Thin wrapper over ``generate_pallas_variants`` (variants=1; stable
    argsort and argmin break cost ties identically, at the smallest
    slot) so the packed-record/traceback logic lives in ONE place."""
    seqs, costs = generate_pallas_variants(
        emb, embT, wcat, bias, prefix, prefix_mask, length,
        out_length, v_real, 1, topk, fringe, threshold)
    return seqs[0], costs[0]


@partial(jax.jit, static_argnames=('length', 'v_real', 'variants',
                                   'topk', 'fringe', 'threshold'))
def generate_pallas_variants(emb, embT, wcat, bias, prefix,
                             prefix_mask, length: int, out_length,
                             v_real: int, variants: int,
                             topk: int = 10, fringe: int = 256,
                             threshold: float = 0.004):
    """The ``variants`` cheapest end slots traced back ON DEVICE in
    one multi-cursor traceback-kernel pass (chunked only when the
    (variants, length) SMEM output would overflow scalar memory), so
    the host fetches (variants, length) char ids + (variants,) costs
    instead of the full (3, length, K) record matrices (~50 MB at
    length 16384 — ~0.8 s over the tunneled link).  Slot order:
    ascending cost, ties by slot index (stable argsort).  ``variants``
    must be <= ``fringe`` (argsort has only K entries; beyond-K
    indices would CLAMP and fabricate duplicates — callers cap, see
    ``generate_beam``)."""
    assert variants <= fringe, (variants, fringe)
    state0, cost0 = _prefix_fringe(emb, embT, wcat, bias, prefix,
                                   prefix_mask, v_real, fringe)
    rec = _gen_pallas_raw(emb, embT, wcat, bias, state0, cost0,
                          length, v_real, topk, fringe, threshold)
    out_length = jnp.asarray(out_length, jnp.int32)
    costs_out = jax.lax.dynamic_index_in_dim(
        rec, out_length - 1, axis=0, keepdims=False)[2]
    order = jnp.argsort(costs_out, stable=True)[:variants]
    chunk = max(1, min(variants, _TB_SMEM_OUT_BYTES // (4 * length)))
    seqs = jnp.concatenate([
        _traceback_pallas(rec, order[i:i + chunk], out_length)
        for i in range(0, variants, chunk)])
    return seqs, costs_out[order]


def fused_gen_vmem_bytes(depth: int, width: int, v_pad: int,
                         fringe: int = 256, topk: int = 10) -> int:
    """Rough VMEM requirement of the fused generation kernel: weights,
    the packed fringe state (x2: init input + scratch), the
    logits-sized intermediates (logits/work/one-hots: ~4 copies), the
    (K, K) selection matrices, and the fused compaction operands
    (feats/fsel: [cand | idx | row | pfx | h.. | c..])."""
    D, W, V, K = depth, width, v_pad, fringe
    S = (2 * D + 1) * W
    weights = (2 * V * W + D * 2 * W * 4 * W + D * 4 * W) * 4
    fringe_state = 2 * K * S * 4
    feats_w = 2 * topk + 2 + 2 * D * W
    intermediates = (4 * K * V * 4 + 2 * K * K * 4
                     + 2 * K * feats_w * 4 + K * 4 * W * 4 * 2)
    records = 8 * K * 4 * 2
    return weights + fringe_state + intermediates + records
