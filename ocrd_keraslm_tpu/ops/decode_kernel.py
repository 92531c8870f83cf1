"""Fused Pallas TPU kernel: whole-lattice beam decoding on-chip.

The XLA version (ops/beam_device.py) is a single dispatch, but each
edge costs ~30-40us in per-op overhead.  This kernel runs the complete
search — expansion, embedding lookup, the LSTM layer stack, tied
softmax scoring, top-K pruning, state gathering — inside ONE
``pallas_call`` with a sequential grid over edges, engineered to
minimize the sequential op chain per edge:

* the whole beam state is ONE packed (K, S) matrix with layout
  ``[xemb | h_0..h_{D-1} | c_0..c_{D-1}]`` (S = (2D+1)W), persisted in
  an output ref across grid steps (constant index map), so beam
  expansion and post-top-K gathering are ONE one-hot MXU matmul each
  instead of 2D+1;
* per layer the input and recurrent projections are fused into one
  (KA, 2W) @ (2W, 4W) matmul over ``[input | h]`` (for layer 0 the
  operand is a contiguous slice of the packed state — no concat);
* costs travel as 128-lane vectors (beam->hypothesis expansion is a
  lane matmul); top-K selection is K unrolled argmin-and-mask
  iterations on a lane vector, accumulating the per-edge
  [backptr | altidx | cost] records into one (8, 128) VMEM tile
  written once per edge;
* all weights stay VMEM-resident; per-edge alternative data streams
  through per-edge VMEM blocks; the page context embedding is folded
  into the layer-0 bias outside the kernel;
* gather-type matmuls (state expansion/reorder, cost expansion,
  embedding lookup) run at Precision.HIGHEST — they must pass f32
  values through exactly (see EXACT below).

Cost semantics identical to ops/beam_device.decode_lattice_device;
parity-tested (including brute-force exhaustive search on toy
lattices).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot "gather" matmuls and the cost-expansion matmul must be exact
# f32 pass-throughs: the MXU's default bf16 input rounding quantizes
# the carried values (at cumulative cost >= 1024 the bf16 ULP is 8, so
# per-edge increments vanish entirely — observed as frozen costs).
EXACT = jax.lax.Precision.HIGHEST

INV_LN2 = 1.4426950408889634
BIG = 1.0e30
LANE = 128


def _lstm_stack(state, wcat_ref, bias_ref, D, W):
    """The D-layer LSTM gate stack over packed rows
    ``[xemb | h_0.. | c_0..]`` — ONE implementation for every decode
    kernel body (masked char step and the batch kernel's L==1 parent-
    row fast path), so dtype handling and gate order can never drift
    between them.  Returns (new_h list, new_c list, top h)."""
    new_h, new_c = [], []
    inp = None
    for d in range(D):
        if d == 0:
            # [xemb | h_0] is contiguous in the packed layout
            operand = state[:, 0:2 * W]
        else:
            operand = jnp.concatenate(
                [inp, state[:, (1 + d) * W:(2 + d) * W]], axis=1)
        # .astype follows the weights' dtype: a no-op at f32; under
        # the opt-in bf16 decode mode the gate matmul runs ONE MXU
        # pass on bf16 inputs (f32 accumulate) instead of the
        # multi-pass f32 decomposition
        z = (jnp.dot(operand.astype(wcat_ref.dtype), wcat_ref[d],
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
    return new_h, new_c, inp


def _char_step(stateE, onehot_cur, wcat_ref, bias_ref, embT_ref,
               emb_ref, D, W, v_real, viota):
    """One masked char step shared by BOTH decode kernels: the LSTM
    stack over packed rows ``[xemb | h_0.. | c_0..]``, the tied-softmax
    -log2 p of the current char, and the updated packed state.  Keeping
    this in ONE place is what makes the batch kernel's "per-doc
    semantics identical to the single-document kernel" guarantee hold
    by construction.  Returns (stateE_new, nll2 (rows, 1))."""
    new_h, new_c, inp = _lstm_stack(stateE, wcat_ref, bias_ref, D, W)

    logits = jnp.dot(inp.astype(embT_ref.dtype), embT_ref[:],
                     preferred_element_type=jnp.float32)
    logits = jnp.where(viota < v_real, logits, -BIG)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    lse = mx + jnp.log(
        jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
    logit_cur = jnp.sum(onehot_cur * logits, axis=-1, keepdims=True)
    nll2 = (lse - logit_cur) * INV_LN2

    # one-hot x emb is exact at any dtype pairing: emb values are
    # already representable in emb_ref.dtype, and exactly one product
    # per row is non-zero.  Mosaic rejects HIGHEST precision on bf16
    # operands (and the single bf16 pass is already exact here)
    xemb_new = jnp.dot(onehot_cur.astype(emb_ref.dtype), emb_ref[:],
                       precision=(EXACT if emb_ref.dtype
                                  == jnp.float32 else None),
                       preferred_element_type=jnp.float32)
    stateE_new = jnp.concatenate([xemb_new] + new_h + new_c, axis=1)
    return stateE_new, nll2


def _make_kernel(D, K, A, L, W, V, V_real, lm_weight, EU=1):
    KA = K * A
    S = (2 * D + 1) * W  # [xemb | h_0.. | c_0..]

    def kernel(chars_ref, mask_ref, conf_ref, valid_ref,  # per-edge
               steps_ref,                         # SMEM (E, 1)
               n_real_ref,                        # SMEM (1, 1)
               emb_ref, embT_ref, wcat_ref, bias_ref,  # VMEM weights
               state0_ref, cost0_ref,             # init
               rec_out_ref, stateF_ref, costF_ref,  # outputs
               state_ref, costf_ref               # scratch (persistent)
               ):
        pid = pl.program_id(0)
        n_p = pl.num_programs(0)

        @pl.when(pid == 0)
        def _():
            state_ref[:] = state0_ref[:]
            costf_ref[:] = cost0_ref[:]

        # EU edges unrolled per grid step amortize the per-step
        # pipeline/launch overhead (whole-resident arrays make this a
        # pure index change)
        for u in range(EU):
            t = pid * EU + u
            # bucket-padding edges skip the whole beam step (measured
            # ~23 us/edge at L=8): a pad edge is semantically an
            # identity pass (one zero-length free alternative), so its
            # records are written CLOSED-FORM — rank k keeps slot k at
            # unchanged cost — which the reverse walk traverses exactly
            # like the computed identity the full body used to produce
            @pl.when(t < n_real_ref[0, 0])
            def _():
                edge_body(t, chars_ref, mask_ref, conf_ref,
                          valid_ref, steps_ref, emb_ref, embT_ref,
                          wcat_ref, bias_ref,
                          rec_out_ref, state_ref, costf_ref)

            @pl.when(t >= n_real_ref[0, 0])
            def _():
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
                bp_lane = jnp.where(lane < K, lane, 0).astype(
                    jnp.float32)
                rec_out_ref[t] = jnp.concatenate(
                    [bp_lane, jnp.zeros((1, LANE), jnp.float32),
                     costf_ref[:],
                     jnp.zeros((5, LANE), jnp.float32)], axis=0)

        @pl.when(pid == n_p - 1)
        def _():
            stateF_ref[:] = state_ref[:]
            costF_ref[:] = costf_ref[:]

    def edge_body(t, chars_ref, mask_ref, conf_ref, valid_ref,
                  steps_ref, emb_ref, embT_ref, wcat_ref, bias_ref,
                  rec_out_ref, state_ref, costf_ref):
        # per-edge rows via dynamic indexing of VMEM-resident arrays:
        # per-step streamed blocks cost ~30-40us/step in pipeline DMA
        # sync (measured); whole-array residency costs nothing at these
        # sizes (chars/mask/conf ~KBs, records ~4MB)
        chars_row = chars_ref[t]    # (A, L) int32
        mask_row = mask_ref[t]      # (A, L)
        conf_row = conf_ref[t]      # (A, L)
        valid_row = valid_ref[t]    # (A, 1)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, 1), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        lane_iota_v = jax.lax.broadcasted_iota(jnp.int32, (KA, V), 1)

        # ---- expansion: ONE matmul for the whole packed state ----
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, K), 1)
        Rexp = (row_iota // A == col_iota).astype(jnp.float32)
        stateE = jnp.dot(Rexp, state_ref[:], precision=EXACT,
                         preferred_element_type=jnp.float32)  # (KA, S)
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        dst_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        Mexp = ((dst_iota // A == src_iota) &
                (dst_iota < KA)).astype(jnp.float32)
        costE = jnp.dot(costf_ref[:], Mexp, precision=EXACT,
                        preferred_element_type=jnp.float32)
        costE = jnp.where(lane_iota < KA, costE, BIG)

        def tile_sub(col):
            # (A, 1) per-alternative column -> (KA, 1) hypothesis rows
            return jnp.tile(col, (K, 1))

        def tile_lane(col, fill=0.0):
            # (A, 1) -> (1, LANE) lane vector [rows repeat per beam]
            v = jnp.tile(col, (K, 1)).reshape(1, KA)
            return jnp.concatenate(
                [v, jnp.full((1, LANE - KA), fill, jnp.float32)],
                axis=1)

        validE = tile_lane(valid_row)

        # ---- char steps: static single step for the L == 1 bucket
        # (the latency shape), else a fori_loop bounded by the
        # PER-EDGE max alternative length (SMEM scalar) — padded steps
        # are fully-masked no-ops, so skipping them is exact, and
        # short edges in a mixed-length block (1-char glyphs next to
        # merged runs) stop paying for the L bucket ----
        def char_step_at(step_t, stateE, acc):
            if L == 1:
                char_col = chars_row[:, 0:1]
                m_col = mask_row[:, 0:1]
                conf_col = conf_row[:, 0:1]
            else:
                sel = lane_iota_L == step_t
                char_col = jnp.sum(jnp.where(sel, chars_row, 0),
                                   axis=1, keepdims=True)
                m_col = jnp.sum(jnp.where(sel, mask_row, 0.0),
                                axis=1, keepdims=True)
                conf_col = jnp.sum(jnp.where(sel, conf_row, 0.0),
                                   axis=1, keepdims=True)
            char_sub = tile_sub(char_col)
            m_sub = tile_sub(m_col)
            m_lane = tile_lane(m_col)
            conf_lane = tile_lane(conf_col)
            onehot_cur = (lane_iota_v == char_sub).astype(jnp.float32)

            stateE_new, nll2 = _char_step(
                stateE, onehot_cur, wcat_ref, bias_ref, embT_ref,
                emb_ref, D, W, V_real, lane_iota_v)
            nll2_lane = nll2.reshape(1, KA)
            nll2_lane = jnp.concatenate(
                [nll2_lane, jnp.zeros((1, LANE - KA), jnp.float32)],
                axis=1)
            acc = acc + m_lane * (lm_weight * nll2_lane +
                                  (1.0 - lm_weight) * conf_lane)
            keep = m_sub > 0
            return jnp.where(keep, stateE_new, stateE), acc

        acc0 = jnp.zeros((1, LANE), jnp.float32)
        if L == 1:
            stateE, acc = char_step_at(0, stateE, acc0)
        else:
            lane_iota_L = jax.lax.broadcasted_iota(jnp.int32, (A, L), 1)
            stateE, acc = jax.lax.fori_loop(
                0, steps_ref[t, 0],
                lambda s, c: char_step_at(s, c[0], c[1]),
                (stateE, acc0))

        # ---- totals + top-K selection (lane vectors only) ----
        total = costE + acc
        total = jnp.where(lane_iota < KA, total, BIG)
        total = jnp.where(validE > 0.5, total, BIG)

        # top-K by RANKING instead of K serial argmin iterations:
        # rank_i = #{j : total_j precedes total_i} under the exact
        # lexicographic order (cost, lane index) — one (1,L)@(L,L)
        # matmul of a 0/1 matrix (exact in bf16), fully parallel
        total_col = jnp.transpose(total)                 # (LANE, 1)
        iota_col = jnp.transpose(lane_iota)              # (LANE, 1)
        prec = ((total_col < total) |
                ((total_col == total) &
                 (iota_col < lane_iota))).astype(jnp.float32)
        ranks = jnp.dot(jnp.ones((1, LANE), jnp.float32), prec,
                        preferred_element_type=jnp.float32)  # (1, LANE)
        ranks_i = ranks.astype(jnp.int32)
        # selection matrix: S[j, i] = 1 iff rank_i == j  (K x LANE)
        s_row = jax.lax.broadcasted_iota(jnp.int32, (K, LANE), 0)
        Ssel_full = (jnp.broadcast_to(ranks_i, (K, LANE)) ==
                     s_row).astype(jnp.float32)
        # rank-ordered records: ONE matmul with the 0/1 selector for
        # all three record columns (exact)
        parentf = jnp.transpose((lane_iota // A).astype(jnp.float32))
        altf = jnp.transpose((lane_iota % A).astype(jnp.float32))
        feats = jnp.concatenate([parentf, altf, total_col], axis=1)
        sel = jnp.dot(Ssel_full, feats, precision=EXACT,
                      preferred_element_type=jnp.float32)   # (K, 3)
        bp_lane = jnp.transpose(sel[:, 0:1])                # (1, K)
        alt_lane = jnp.transpose(sel[:, 1:2])
        cost_lane = jnp.transpose(sel[:, 2:3])
        pad = jnp.zeros((1, LANE - K), jnp.float32)
        bp_lane = jnp.concatenate([bp_lane, pad], axis=1)
        alt_lane = jnp.concatenate([alt_lane, pad], axis=1)
        cost_lane = jnp.concatenate([cost_lane, pad + BIG], axis=1)
        Ssel = Ssel_full[:, :KA]

        rec = jnp.concatenate(
            [bp_lane, alt_lane, cost_lane,
             jnp.zeros((5, LANE), jnp.float32)], axis=0)
        rec_out_ref[t] = rec
        costf_ref[:] = cost_lane

        # ---- gather: ONE matmul for the whole packed state ----
        # (final carry outputs are written ONCE in the kernel epilogue:
        # output refs with constant maps written per step forced a
        # write-back each grid step; scratch refs persist for free)
        state_ref[:] = jnp.dot(Ssel, stateE, precision=EXACT,
                               preferred_element_type=jnp.float32)

    return kernel, S


@partial(jax.jit, static_argnames=('n_edges', 'n_alts', 'alt_len',
                                   'beam', 'depth', 'width', 'v_pad',
                                   'v_real', 'lm_weight',
                                   'device_walk', 'edge_unroll'))
def decode_lattice_pallas(emb, embT, wcat, bias,
                          alt_chars, alt_mask, alt_conf_bits,
                          alt_valid, state0, cost0,
                          n_edges: int, n_alts: int, alt_len: int,
                          beam: int, depth: int, width: int,
                          v_pad: int, v_real: int, lm_weight: float,
                          device_walk: bool = False,
                          edge_unroll: int = 1, alt_steps=None,
                          n_real=None):
    """One-dispatch fused lattice decode.

    emb: (V_pad, W); embT: (W, V_pad); wcat: (D, 2W, 4W) fused
    ``[input-kernel; recurrent-kernel]``; bias: (D, 1, 4W) (context
    folded into layer 0); alt_chars/mask: (E, A, L);
    alt_conf_bits: (E, A, L) per-char bits; alt_valid: (E, A, 1);
    state0: (K, (2D+1)W) packed
    ``[xemb | h.. | c..]``; cost0: (1, 128) lane vector.

    Returns (packed (E+1, 3K) host-bound records in the XLA path's
    layout, stateF (K, S), costF (1, 128)).
    """
    E, A, L = n_edges, n_alts, alt_len
    D, W, K, V = depth, width, beam, v_pad
    EU = edge_unroll if E % edge_unroll == 0 else 1
    if alt_steps is None:
        alt_steps = jnp.full((E, 1), L, jnp.int32)
    if n_real is None:
        n_real = E
    n_real_arr = jnp.full((1, 1), n_real, jnp.int32)
    interpret = jax.default_backend() != 'tpu'
    kernel, S = _make_kernel(D, K, A, L, W, V, v_real, lm_weight, EU)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    records, stateF, costF = pl.pallas_call(
        kernel,
        grid=(E // EU,),
        in_specs=[
            vmem((E, A, L), lambda t: (0, 0, 0)),
            vmem((E, A, L), lambda t: (0, 0, 0)),
            vmem((E, A, L), lambda t: (0, 0, 0)),
            vmem((E, A, 1), lambda t: (0, 0, 0)),
            pl.BlockSpec((E, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            vmem((V, W), lambda t: (0, 0)),
            vmem((W, V), lambda t: (0, 0)),
            vmem((D, 2 * W, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, 1, 4 * W), lambda t: (0, 0, 0)),
            vmem((K, S), lambda t: (0, 0)),
            vmem((1, LANE), lambda t: (0, 0)),
        ],
        out_specs=(
            vmem((E, 8, LANE), lambda t: (0, 0, 0)),
            vmem((K, S), lambda t: (0, 0)),
            vmem((1, LANE), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, 8, LANE), jnp.float32),
            jax.ShapeDtypeStruct((K, S), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((K, S), jnp.float32),
            pltpu.VMEM((1, LANE), jnp.float32),
        ],
    )(alt_chars, alt_mask, alt_conf_bits, alt_valid, alt_steps,
      n_real_arr, emb, embT, wcat, bias, state0, cost0)

    bp = records[:, 0, :beam]
    alt = records[:, 1, :beam]
    costs = records[:, 2, :beam]
    min_in = jnp.min(jnp.where(jnp.arange(LANE) < beam, cost0[0], BIG))
    if device_walk:
        # reverse backpointer walk on device: rank 0 = best final slot;
        # host fetches only (E+1, 2)
        def back_step(k, rec_):
            bp_e, alt_e, co_e = rec_
            return bp_e[k].astype(jnp.int32), (alt_e[k], co_e[k])
        k_fin, (choices, path_costs) = jax.lax.scan(
            back_step, jnp.int32(0), (bp, alt, costs), reverse=True)
        # the emission anchor is the ENTRY slot's initial cost (the
        # walked path may continue from a non-best previous-page
        # hypothesis), matching the host engine's exact
        # prev_anchor.cost_after — min(cost0) would deflate the first
        # edge's conf and inflate the page entropy by the entry slot's
        # deficit
        start_in = cost0[0, k_fin]
        header = jnp.stack([start_in, jnp.float32(0)])[None, :]
        packed = jnp.concatenate([
            header,
            jnp.stack([choices, path_costs], axis=1),
        ], axis=0)
        return packed, stateF, costF
    # records protocol: the host walks later, so ship the whole
    # initial-beam cost row in the header's cost third — the walker
    # anchors at its computed entry slot ([0, 0] keeps min for compat)
    header = jnp.zeros((1, 3 * beam), jnp.float32).at[0, 0].set(min_in)
    header = header.at[0, 2 * beam:3 * beam].set(cost0[0, :beam])
    packed = jnp.concatenate(
        [header, jnp.concatenate([bp, alt, costs], axis=1)], axis=0)
    return packed, stateF, costF


# ----------------------------------------------------------------------
# document-batched fused decode
# ----------------------------------------------------------------------
#
# N INDEPENDENT documents decode in ONE kernel by stacking their beams
# in the MXU *row* (sublane) dimension: the packed state becomes
# (N*K, S), candidate costs travel as (N*KA, 1) COLUMNS instead of the
# single-document kernel's 128-lane vectors, and every gather-type
# matmul gets a block-diagonal doc term in its iota-built selector.
# MXU rows are nearly free at these sizes (a K=16 beam uses 64 of the
# 128 rows of one tile), so decoding 8 documents costs far less than
# 8x one document — this is the serving-throughput shape the
# single-document kernel (latency shape) cannot reach.
#
# Layout invariants: N*K <= 128 (records pack into one 128-lane row
# per field) and N*K*A <= 512 (bounds the per-edge compare matrix and
# intermediate state at (512, S)).  Per-doc semantics are IDENTICAL to
# the single-document kernel: same cost model, same exact per-edge
# top-K with (cost, candidate-index) lexicographic ties, verified by
# the batch-vs-sequential parity tests.


def _make_batch_kernel(N, D, K, A, L, W, V, V_real, lm_weight):
    KA = K * A
    NK = N * K
    NKA = N * KA
    NA = N * A
    S = (2 * D + 1) * W  # [xemb | h_0.. | c_0..]

    # iota-built selector matrices (constants folded at compile time):
    # Rexp expands each doc's K beam rows into its K*A candidate rows;
    # Texp tiles each doc's A alternative rows into its K*A candidate
    # rows (both block-diagonal over docs).
    def kernel(chars_ref, mask_ref, conf_ref, valid_ref,  # per-edge
               steps_ref,                               # SMEM (E, 1)
               n_real_ref,                              # SMEM (1, 1)
               emb_ref, embT_ref, wcat_ref, bias_ref,   # VMEM weights
               state0_ref, cost0_ref,                   # init
               rec_out_ref, stateF_ref, costF_ref,      # outputs
               state_ref, cost_ref):                    # scratch
        pid = pl.program_id(0)
        n_p = pl.num_programs(0)

        @pl.when(pid == 0)
        def _():
            state_ref[:] = state0_ref[:]
            cost_ref[:] = cost0_ref[:]

        t = pid

        @pl.when(t < n_real_ref[0, 0])
        def _():
            if L == 1:
                fast_edge_body(t, chars_ref, mask_ref, conf_ref,
                               valid_ref, emb_ref, embT_ref, wcat_ref,
                               bias_ref, rec_out_ref, state_ref,
                               cost_ref)
            else:
                edge_body(t, chars_ref, mask_ref, conf_ref, valid_ref,
                          steps_ref, emb_ref, embT_ref, wcat_ref,
                          bias_ref, rec_out_ref, state_ref, cost_ref)

        # bucket-pad edges beyond the group's real maximum skip the
        # beam step in closed form: every doc's pad edge is an identity
        # pass (one zero-length free alternative), so rank k keeps its
        # slot k at unchanged cost — exactly what the full body
        # computes there (see the single-document kernel's guard)
        @pl.when(t >= n_real_ref[0, 0])
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            bp_lane = jnp.where(lane < NK, lane % K, 0).astype(
                jnp.float32)
            cost_row = jnp.transpose(cost_ref[:])        # (1, NK)
            if LANE - NK:
                cost_row = jnp.concatenate(
                    [cost_row, jnp.zeros((1, LANE - NK), jnp.float32)],
                    axis=1)
            rec_out_ref[t] = jnp.concatenate(
                [bp_lane, jnp.zeros((1, LANE), jnp.float32), cost_row,
                 jnp.zeros((5, LANE), jnp.float32)], axis=0)

        @pl.when(pid == n_p - 1)
        def _():
            stateF_ref[:] = state_ref[:]
            costF_ref[:] = cost_ref[:]

    def fast_edge_body(t, chars_ref, mask_ref, conf_ref, valid_ref,
                       emb_ref, embT_ref, wcat_ref, bias_ref,
                       rec_out_ref, state_ref, cost_ref):
        """Single-char-alternative (L == 1) edge: the char step depends
        only on the PARENT state, so the LSTM stack, tied-softmax
        logits, and logsumexp run at NK parent rows instead of NKA
        candidate rows (~3x fewer MACs at N=8/K=16/A=4 — this kernel
        is MXU-compute-bound, measured).  Candidate-space work is just
        exact one-hot picks of the current-char logit, the shared
        rank/top-K/records code, and a parent-indexed state select.
        Cost semantics and selection order are IDENTICAL to
        ``edge_body``: per-row dot products are unchanged, only their
        batching differs."""
        char_a = chars_ref[t][:, 0:1].astype(jnp.float32)  # (NA, 1)
        m_a = mask_ref[t][:, 0:1]                          # (NA, 1)
        conf_a = conf_ref[t][:, 0:1]                       # (NA, 1)
        valid_a = valid_ref[t]                             # (NA, 1)
        state = state_ref[:]                               # (NK, S)

        # ---- LSTM stack + softmax stats at NK parent rows ----
        new_h, new_c, inp = _lstm_stack(state, wcat_ref, bias_ref,
                                        D, W)
        viota_nk = jax.lax.broadcasted_iota(jnp.int32, (NK, V), 1)
        logits = jnp.dot(inp.astype(embT_ref.dtype), embT_ref[:],
                         preferred_element_type=jnp.float32)  # (NK, V)
        logits = jnp.where(viota_nk < V_real, logits, -BIG)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        lse = mx + jnp.log(
            jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))

        # ---- candidate space: exact expansions + one-hot picks ----
        row_i = jax.lax.broadcasted_iota(jnp.int32, (NKA, 1), 0)
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, NKA), 1)
        colK = jax.lax.broadcasted_iota(jnp.int32, (NKA, NK), 1)
        Rexp = ((row_i // KA == colK // K) &
                ((row_i % KA) // A == colK % K)).astype(jnp.float32)
        colA = jax.lax.broadcasted_iota(jnp.int32, (NKA, NA), 1)
        Texp = ((row_i // KA == colA // A) &
                (row_i % A == colA % A)).astype(jnp.float32)

        # parent-level logits and [lse | cost] -> candidate rows (two
        # matmuls keep lane widths 128-aligned)
        logitsE = jnp.dot(Rexp, logits, precision=EXACT,
                          preferred_element_type=jnp.float32)  # (NKA, V)
        lc = jnp.concatenate([lse, cost_ref[:]], axis=1)
        lcE = jnp.dot(Rexp, lc, precision=EXACT,
                      preferred_element_type=jnp.float32)   # (NKA, 2)
        lseE = lcE[:, 0:1]
        costE = lcE[:, 1:2]
        # per-alternative [char | mask | conf | valid] -> candidates
        alt4 = jnp.concatenate([char_a, m_a, conf_a, valid_a], axis=1)
        altE = jnp.dot(Texp, alt4, precision=EXACT,
                       preferred_element_type=jnp.float32)  # (NKA, 4)
        char_c = altE[:, 0:1].astype(jnp.int32)
        m_c = altE[:, 1:2]
        conf_c = altE[:, 2:3]
        valid_c = altE[:, 3:4]
        lane_iota_v = jax.lax.broadcasted_iota(jnp.int32, (NKA, V), 1)
        onehot_c = (lane_iota_v == char_c).astype(jnp.float32)
        logit_cur = jnp.sum(onehot_c * logitsE, axis=-1, keepdims=True)
        nll2 = (lseE - logit_cur) * INV_LN2
        acc = m_c * (lm_weight * nll2 + (1.0 - lm_weight) * conf_c)

        # ---- totals + per-doc top-K (IDENTICAL to edge_body) ----
        total_col = jnp.where(valid_c > 0.5, costE + acc, BIG)
        total_col = jnp.minimum(total_col, BIG)          # (NKA, 1)
        total_row = jnp.transpose(total_col)             # (1, NKA)
        same_doc = (row_i // KA) == (iota_row // KA)     # (NKA, NKA)
        prec = (same_doc &
                ((total_col < total_row) |
                 ((total_col == total_row) &
                  (row_i % KA < iota_row % KA)))).astype(jnp.float32)
        ranks_row = jnp.dot(jnp.ones((1, NKA), jnp.float32), prec,
                            preferred_element_type=jnp.float32)
        ranks_i = ranks_row.astype(jnp.int32)            # (1, NKA)
        rowK = jax.lax.broadcasted_iota(jnp.int32, (NK, 1), 0)
        colKA = jax.lax.broadcasted_iota(jnp.int32, (NK, NKA), 1)
        Sbig = ((jnp.broadcast_to(ranks_i, (NK, NKA)) == rowK % K) &
                (rowK // K == colKA // KA)).astype(jnp.float32)
        cost_ref[:] = jnp.dot(Sbig, total_col, precision=EXACT,
                              preferred_element_type=jnp.float32)

        # ---- records (IDENTICAL to edge_body) ----
        ranks_col = jnp.transpose(ranks_i)               # (NKA, 1)
        colNK = jax.lax.broadcasted_iota(jnp.int32, (NKA, NK), 1)
        SbigT = ((jnp.broadcast_to(ranks_col, (NKA, NK)) == colNK % K) &
                 (row_i // KA == colNK // K)).astype(jnp.float32)
        parent_row = ((iota_row % KA) // A).astype(jnp.float32)
        alt_row = (iota_row % A).astype(jnp.float32)
        featsT = jnp.concatenate([parent_row, alt_row, total_row],
                                 axis=0)                 # (3, NKA)
        selT = jnp.dot(featsT, SbigT, precision=EXACT,
                       preferred_element_type=jnp.float32)  # (3, NK)
        pad_cols = LANE - NK
        if pad_cols:
            selT = jnp.concatenate(
                [selT, jnp.zeros((3, pad_cols), jnp.float32)], axis=1)
        rec = jnp.concatenate(
            [selT, jnp.zeros((5, LANE), jnp.float32)], axis=0)
        rec_out_ref[t] = rec

        # ---- new beam state from PARENT-indexed tables ----
        # chosen candidate j: parent k, current char, mask via Sbig
        parent_c = ((row_i % KA) // A).astype(jnp.float32)
        chf = jnp.concatenate(
            [parent_c, char_c.astype(jnp.float32), m_c], axis=1)
        chosen = jnp.dot(Sbig, chf, precision=EXACT,
                         preferred_element_type=jnp.float32)  # (NK, 3)
        parent_abs = ((rowK // K) * K +
                      chosen[:, 0:1].astype(jnp.int32))   # (NK, 1)
        char_sel = chosen[:, 1:2].astype(jnp.int32)
        m_sel = chosen[:, 2:3]
        colNK2 = jax.lax.broadcasted_iota(jnp.int32, (NK, NK), 1)
        Sparent = (colNK2 == parent_abs).astype(jnp.float32)
        # stepped (h, c) and the unstepped packed state of the chosen
        # parent, selected in ONE matmul
        cat = jnp.concatenate(new_h + new_c + [state], axis=1)
        selcat = jnp.dot(Sparent, cat, precision=EXACT,
                         preferred_element_type=jnp.float32)
        hc_sel = selcat[:, 0:2 * D * W]
        parent_packed = selcat[:, 2 * D * W:]
        onehot_sel = (viota_nk == char_sel).astype(emb_ref.dtype)
        xemb_sel = jnp.dot(onehot_sel, emb_ref[:],
                           precision=(EXACT if emb_ref.dtype
                                      == jnp.float32 else None),
                           preferred_element_type=jnp.float32)
        stepped = jnp.concatenate([xemb_sel, hc_sel], axis=1)
        state_ref[:] = jnp.where(m_sel > 0, stepped, parent_packed)

    def edge_body(t, chars_ref, mask_ref, conf_ref, valid_ref,
                  steps_ref, emb_ref, embT_ref, wcat_ref, bias_ref,
                  rec_out_ref, state_ref, cost_ref):
        chars_row = chars_ref[t].astype(jnp.float32)  # (NA, L)
        mask_row = mask_ref[t]                        # (NA, L)
        conf_row = conf_ref[t]                        # (NA, L)
        valid_row = valid_ref[t]                      # (NA, 1)

        row_i = jax.lax.broadcasted_iota(jnp.int32, (NKA, 1), 0)
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, NKA), 1)
        lane_iota_v = jax.lax.broadcasted_iota(jnp.int32, (NKA, V), 1)

        # ---- expansion: block-diag one-hot matmuls (EXACT) ----
        colK = jax.lax.broadcasted_iota(jnp.int32, (NKA, NK), 1)
        Rexp = ((row_i // KA == colK // K) &
                ((row_i % KA) // A == colK % K)).astype(jnp.float32)
        stateE = jnp.dot(Rexp, state_ref[:], precision=EXACT,
                         preferred_element_type=jnp.float32)  # (NKA, S)
        costE = jnp.dot(Rexp, cost_ref[:], precision=EXACT,
                        preferred_element_type=jnp.float32)   # (NKA, 1)
        colA = jax.lax.broadcasted_iota(jnp.int32, (NKA, NA), 1)
        Texp = ((row_i // KA == colA // A) &
                (row_i % A == colA % A)).astype(jnp.float32)

        validE = jnp.dot(Texp, valid_row, precision=EXACT,
                         preferred_element_type=jnp.float32)  # (NKA, 1)

        # ---- char steps, costs in COLUMN space.  The loop bound is
        # the PER-EDGE max alternative length (SMEM scalar): padded
        # steps beyond it are fully-masked no-ops (state kept, acc
        # += 0), so skipping them is exact — and most edges in a
        # mixed-length group are far shorter than the L bucket
        # (1-char glyph alternatives next to 8-char merged runs) ----
        t_lim = steps_ref[t, 0]
        lane_iota_L = jax.lax.broadcasted_iota(jnp.int32, (NA, L), 1)

        def char_body(step_t, carry):
            stateE, acc = carry
            sel = lane_iota_L == step_t
            col3 = jnp.concatenate(
                [jnp.sum(jnp.where(sel, chars_row, 0.0), axis=1,
                         keepdims=True),
                 jnp.sum(jnp.where(sel, mask_row, 0.0), axis=1,
                         keepdims=True),
                 jnp.sum(jnp.where(sel, conf_row, 0.0), axis=1,
                         keepdims=True)], axis=1)           # (NA, 3)
            sub3 = jnp.dot(Texp, col3, precision=EXACT,
                           preferred_element_type=jnp.float32)
            # float char ids are exact (< 2^24) -> int for the one-hot
            char_sub = sub3[:, 0:1].astype(jnp.int32)
            m_sub = sub3[:, 1:2]
            conf_sub = sub3[:, 2:3]
            onehot_cur = (lane_iota_v == char_sub).astype(jnp.float32)

            stateE_new, nll2 = _char_step(
                stateE, onehot_cur, wcat_ref, bias_ref, embT_ref,
                emb_ref, D, W, V_real, lane_iota_v)   # nll2 (NKA, 1)
            acc = acc + m_sub * (lm_weight * nll2 +
                                 (1.0 - lm_weight) * conf_sub)
            keep = m_sub > 0
            return jnp.where(keep, stateE_new, stateE), acc

        stateE, acc = jax.lax.fori_loop(
            0, t_lim, char_body,
            (stateE, jnp.zeros((NKA, 1), jnp.float32)))

        # ---- totals + per-doc top-K via rank matmul ----
        total_col = jnp.where(validE > 0.5, costE + acc, BIG)
        total_col = jnp.minimum(total_col, BIG)          # (NKA, 1)
        total_row = jnp.transpose(total_col)             # (1, NKA)
        # prec[j, i] = 1 iff candidate j precedes i within i's doc
        # under the exact lexicographic (cost, index) order
        same_doc = (row_i // KA) == (iota_row // KA)     # (NKA, NKA)
        prec = (same_doc &
                ((total_col < total_row) |
                 ((total_col == total_row) &
                  (row_i % KA < iota_row % KA)))).astype(jnp.float32)
        ranks_row = jnp.dot(jnp.ones((1, NKA), jnp.float32), prec,
                            preferred_element_type=jnp.float32)
        ranks_i = ranks_row.astype(jnp.int32)            # (1, NKA)

        # selection matrices from ranks (block-diag over docs)
        rowK = jax.lax.broadcasted_iota(jnp.int32, (NK, 1), 0)
        colKA = jax.lax.broadcasted_iota(jnp.int32, (NK, NKA), 1)
        Sbig = ((jnp.broadcast_to(ranks_i, (NK, NKA)) == rowK % K) &
                (rowK // K == colKA // KA)).astype(jnp.float32)

        state_ref[:] = jnp.dot(Sbig, stateE, precision=EXACT,
                               preferred_element_type=jnp.float32)
        cost_sel = jnp.dot(Sbig, total_col, precision=EXACT,
                           preferred_element_type=jnp.float32)
        cost_ref[:] = cost_sel

        # ---- records: [bp | alt | cost] rows over NK lanes ----
        ranks_col = jnp.transpose(ranks_i)               # (NKA, 1)
        rowKA = jax.lax.broadcasted_iota(jnp.int32, (NKA, 1), 0)
        colNK = jax.lax.broadcasted_iota(jnp.int32, (NKA, NK), 1)
        SbigT = ((jnp.broadcast_to(ranks_col, (NKA, NK)) == colNK % K) &
                 (rowKA // KA == colNK // K)).astype(jnp.float32)
        parent_row = ((iota_row % KA) // A).astype(jnp.float32)
        alt_row = (iota_row % A).astype(jnp.float32)
        featsT = jnp.concatenate([parent_row, alt_row, total_row],
                                 axis=0)                 # (3, NKA)
        selT = jnp.dot(featsT, SbigT, precision=EXACT,
                       preferred_element_type=jnp.float32)  # (3, NK)
        pad_cols = LANE - NK
        if pad_cols:
            selT = jnp.concatenate(
                [selT, jnp.zeros((3, pad_cols), jnp.float32)], axis=1)
        rec = jnp.concatenate(
            [selT, jnp.zeros((5, LANE), jnp.float32)], axis=0)
        rec_out_ref[t] = rec

    return kernel, S


@partial(jax.jit, static_argnames=('n_docs', 'n_edges', 'n_alts',
                                   'alt_len', 'beam', 'depth', 'width',
                                   'v_pad', 'v_real', 'lm_weight'))
def decode_lattice_pallas_batch(emb, embT, wcat, bias,
                                alt_chars, alt_mask, alt_conf_bits,
                                alt_valid, state0, cost0,
                                n_docs: int, n_edges: int, n_alts: int,
                                alt_len: int, beam: int, depth: int,
                                width: int, v_pad: int, v_real: int,
                                lm_weight: float, alt_steps=None,
                                n_real=None):
    """One-dispatch fused decode of N INDEPENDENT documents.

    alt_chars/mask/conf_bits: (E, N*A, L) doc-major per-edge rows;
    alt_valid: (E, N*A, 1); state0: (N*K, S) packed per-doc beams;
    cost0: (N*K, 1) column costs (BIG = dead slot); alt_steps:
    (E, 1) int32 per-edge char-step bound (max alternative length over
    the group at that edge; None = the full L bucket every edge).

    Returns (records (E, 8, 128) with rows [bp | alt | cost] over
    doc-major NK lanes, stateF (N*K, S), costF (N*K, 1)).
    """
    N, E, A, L = n_docs, n_edges, n_alts, alt_len
    D, W, K, V = depth, width, beam, v_pad
    if N * K > LANE or N * K * A > 512:
        raise ValueError('batched fused decode: N*K must be <= 128 '
                         'and N*K*A <= 512 (got N=%d K=%d A=%d)'
                         % (N, K, A))
    if alt_steps is None:
        alt_steps = jnp.full((E, 1), L, jnp.int32)
    if n_real is None:
        n_real = E
    n_real_arr = jnp.full((1, 1), n_real, jnp.int32)
    interpret = jax.default_backend() != 'tpu'
    kernel, S = _make_batch_kernel(N, D, K, A, L, W, V, v_real,
                                   lm_weight)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    records, stateF, costF = pl.pallas_call(
        kernel,
        grid=(E,),
        in_specs=[
            vmem((E, N * A, L), lambda t: (0, 0, 0)),
            vmem((E, N * A, L), lambda t: (0, 0, 0)),
            vmem((E, N * A, L), lambda t: (0, 0, 0)),
            vmem((E, N * A, 1), lambda t: (0, 0, 0)),
            pl.BlockSpec((E, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            vmem((V, W), lambda t: (0, 0)),
            vmem((W, V), lambda t: (0, 0)),
            vmem((D, 2 * W, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, 1, 4 * W), lambda t: (0, 0, 0)),
            vmem((N * K, S), lambda t: (0, 0)),
            vmem((N * K, 1), lambda t: (0, 0)),
        ],
        out_specs=(
            vmem((E, 8, LANE), lambda t: (0, 0, 0)),
            vmem((N * K, S), lambda t: (0, 0)),
            vmem((N * K, 1), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, 8, LANE), jnp.float32),
            jax.ShapeDtypeStruct((N * K, S), jnp.float32),
            jax.ShapeDtypeStruct((N * K, 1), jnp.float32),
        ),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((N * K, S), jnp.float32),
            pltpu.VMEM((N * K, 1), jnp.float32),
        ],
    )(alt_chars, alt_mask, alt_conf_bits, alt_valid, alt_steps,
      n_real_arr, emb, embT, wcat, bias, state0, cost0)
    return records, stateF, costF


@partial(jax.jit, static_argnames=('n_docs', 'beam'))
def walk_records_batch(records, k_in, n_docs: int, beam: int):
    """Reverse backpointer walk of a batched record block ON DEVICE.

    The records array is (E, 8, 128) and would cost a multi-MB fetch
    per block over the host link; the winning path per document is
    (E, 2).  ``k_in`` (N,) is the starting slot per document (rank 0 =
    best final hypothesis; for chained blocks pass the previous walk's
    ``k_out``).  Returns (k_out (N,), walks (N, E, 2) [alt | cost]).
    """
    E = records.shape[0]
    K, N = beam, n_docs
    bp = records[:, 0, :N * K].reshape(E, N, K)
    alt = records[:, 1, :N * K].reshape(E, N, K)
    cost = records[:, 2, :N * K].reshape(E, N, K)

    def one(bp_d, alt_d, co_d, k0):
        def back_step(k, rec_):
            b, a, c = rec_
            return b[k].astype(jnp.int32), (a[k], c[k])
        k_fin, (choices, costs) = jax.lax.scan(
            back_step, k0, (bp_d, alt_d, co_d), reverse=True)
        return k_fin, choices, costs

    k_out, choices, costs = jax.vmap(one, in_axes=(1, 1, 1, 0))(
        bp, alt, cost, k_in)
    return k_out, jnp.stack([choices, costs], axis=-1)
