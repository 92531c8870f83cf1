"""Fused Pallas TPU kernel: whole-lattice beam decoding on-chip.

The XLA version (ops/beam_device.py) is already a single dispatch, but
each edge costs ~30-40us in per-op overhead.  This kernel runs the
complete search — expansion, embedding lookup, both LSTM layers, tied
softmax scoring, top-K pruning, state gathering — inside ONE
``pallas_call`` with a sequential grid over edges:

* all weights (embedding + transposed embedding + per-layer input and
  recurrent kernels) stay VMEM-resident for the whole lattice;
* the beam state (h, c per layer, previous-char embeddings, costs)
  lives in the kernel's output refs (constant index maps -> persistent
  across grid steps), so the final state doubles as the cross-page
  carry;
* per-edge alternative data (char ids, masks, confidence bits) streams
  through SMEM blocks;
* "gathers" are one-hot matmuls on the MXU (beam expansion (KA, K) @
  (K, W); state re-ordering (K, KA) @ (KA, W); embedding lookup
  (KA, V) @ (V, W)) — no dynamic indexing;
* top-K selection is K unrolled argmin-and-mask iterations on a lane
  vector (VPU), emitting backpointers/alternative ids as SMEM scalars.

The page context variables are constant per page, so their embedding
contribution is folded into the layer-0 bias outside the kernel
(one less matmul per char step).

Cost semantics identical to ops/beam_device.decode_lattice_device
(lm_weight * -log2 p_LM per char + (1 - lm_weight) * -log2 conf per
char); parity-tested against it.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INV_LN2 = 1.4426950408889634
BIG = 1.0e30


def _lstm_gates_pl(z, c):
    W = c.shape[-1]
    i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
    f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
    g = jnp.tanh(z[:, 2 * W:3 * W])
    o = jax.nn.sigmoid(z[:, 3 * W:4 * W])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2


def _make_kernel(D, K, A, L, W, V, V_real, lm_weight):
    KA = K * A
    LANE = 128  # padded lane width for cost vectors

    def kernel(chars_ref, mask_ref, conf_ref,     # per-edge SMEM
               emb_ref, embT_ref, kin_ref, rec_ref, bias_ref,  # VMEM
               h0_ref, c0_ref, xemb0_ref, cost0_ref,  # init
               bp_ref, alt_ref, costs_ref,        # per-edge outputs
               h_ref, c_ref, xemb_ref, costf_ref  # persistent state
               ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[:] = h0_ref[:]
            c_ref[:] = c0_ref[:]
            xemb_ref[:] = xemb0_ref[:]
            for j in range(K):
                costf_ref[0, j] = cost0_ref[0, j]

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, 1), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        lane_iota_v = jax.lax.broadcasted_iota(jnp.int32, (KA, V), 1)

        # ---- expansion: beam (K) -> hypotheses (KA = K * A) ----
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, K), 1)
        Rexp = (row_iota // A == col_iota).astype(jnp.float32)
        hE = [jnp.dot(Rexp, h_ref[d], preferred_element_type=jnp.float32)
              for d in range(D)]
        cE = [jnp.dot(Rexp, c_ref[d], preferred_element_type=jnp.float32)
              for d in range(D)]
        xembE = jnp.dot(Rexp, xemb_ref[:],
                        preferred_element_type=jnp.float32)
        # costs: lane vector (1, LANE), lanes >= KA invalid
        costE = jnp.zeros((1, LANE), jnp.float32) + BIG
        for j in range(K):
            cj = costf_ref[0, j]
            costE = jnp.where((lane_iota >= j * A) &
                              (lane_iota < (j + 1) * A), cj, costE)

        # per-hypothesis conf bits (lane vector)
        confE = jnp.zeros((1, LANE), jnp.float32)
        nchars = jnp.zeros((1, LANE), jnp.float32)
        for a in range(A):
            conf_a = conf_ref[0, a, 0]
            confE = jnp.where(lane_iota % A == a, conf_a, confE)

        acc = jnp.zeros((1, LANE), jnp.float32)

        # ---- char steps (unrolled) ----
        for step_t in range(L):
            # current char id / mask per hypothesis (sublane + lane)
            char_sub = jnp.zeros((KA, 1), jnp.int32)
            m_sub = jnp.zeros((KA, 1), jnp.float32)
            m_lane = jnp.zeros((1, LANE), jnp.float32)
            for a in range(A):
                ca = chars_ref[0, a, step_t]
                ma = mask_ref[0, a, step_t]
                char_sub = jnp.where(row_iota % A == a, ca, char_sub)
                m_sub = jnp.where(row_iota % A == a, ma, m_sub)
                m_lane = jnp.where(lane_iota % A == a, ma, m_lane)
            onehot_cur = (lane_iota_v == char_sub).astype(jnp.float32)

            # layer stack
            inp = xembE
            new_h, new_c = [], []
            for d in range(D):
                z = (jnp.dot(inp, kin_ref[d],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(hE[d], rec_ref[d],
                               preferred_element_type=jnp.float32)
                     + bias_ref[d])  # (1, 4W) block broadcasts
                h2, c2 = _lstm_gates_pl(z, cE[d])
                new_h.append(h2)
                new_c.append(c2)
                inp = h2

            # tied softmax: logits (KA, V), mask padded vocab lanes
            logits = jnp.dot(inp, embT_ref[:],
                             preferred_element_type=jnp.float32)
            logits = jnp.where(lane_iota_v < V_real, logits, -BIG)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            lse = mx + jnp.log(
                jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
            logit_cur = jnp.sum(onehot_cur * logits, axis=-1,
                                keepdims=True)
            nll2_sub = (lse - logit_cur) * INV_LN2    # (KA, 1) bits
            # accumulate in lane orientation
            nll2_lane = nll2_sub.reshape(1, KA)
            pad = jnp.zeros((1, LANE - KA), jnp.float32)
            nll2_lane = jnp.concatenate([nll2_lane, pad], axis=1)
            acc = acc + m_lane * (lm_weight * nll2_lane)
            nchars = nchars + m_lane

            # masked state update
            keep = m_sub > 0
            for d in range(D):
                hE[d] = jnp.where(keep, new_h[d], hE[d])
                cE[d] = jnp.where(keep, new_c[d], cE[d])
            xemb_new = jnp.dot(onehot_cur, emb_ref[:],
                               preferred_element_type=jnp.float32)
            xembE = jnp.where(keep, xemb_new, xembE)

        # ---- totals + top-K selection ----
        total = costE + acc + (1.0 - lm_weight) * confE * nchars
        total = jnp.where(lane_iota < KA, total, BIG)
        total = jnp.where(confE >= BIG, BIG, total)

        S = jnp.zeros((K, KA), jnp.float32)
        srow_iota = jax.lax.broadcasted_iota(jnp.int32, (K, KA), 1)
        for j in range(K):
            m = jnp.min(total)
            cand = jnp.where(total == m, lane_iota, LANE)
            first = jnp.min(cand)
            bp_ref[0, j, 0] = (first // A).astype(jnp.int32)
            alt_ref[0, j, 0] = (first % A).astype(jnp.int32)
            costs_ref[0, j, 0] = m
            costf_ref[0, j] = m
            sel_lane = (lane_iota == first)
            S = jnp.where((srow_iota == first) &
                          (jax.lax.broadcasted_iota(jnp.int32, (K, KA),
                                                    0) == j),
                          1.0, S)
            total = jnp.where(sel_lane, BIG, total)

        # ---- gather new beam states (one-hot matmuls) ----
        for d in range(D):
            h_ref[d] = jnp.dot(S, hE[d],
                               preferred_element_type=jnp.float32)
            c_ref[d] = jnp.dot(S, cE[d],
                               preferred_element_type=jnp.float32)
        xemb_ref[:] = jnp.dot(S, xembE,
                              preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=('n_edges', 'n_alts', 'alt_len',
                                   'beam', 'depth', 'width', 'v_pad',
                                   'v_real', 'lm_weight'))
def decode_lattice_pallas(emb, embT, kin, rec, bias,
                          alt_chars, alt_mask, alt_conf_bits,
                          h0, c0, xemb0, cost0,
                          n_edges: int, n_alts: int, alt_len: int,
                          beam: int, depth: int, width: int,
                          v_pad: int, v_real: int, lm_weight: float):
    """One-dispatch fused lattice decode.

    emb: (V_pad, W); embT: (W, V_pad); kin/rec: (D, W, 4W);
    bias: (D, 1, 4W) (context contribution folded into layer 0);
    alt_chars/mask: (E, A, L); alt_conf_bits: (E, A, 1);
    h0/c0: (D, K, W); xemb0: (K, W); cost0: (1, K).

    Returns (packed (E+1, 2), hF, cF, xembF, costF) with the same
    packed layout as ops.beam_device.decode_lattice_device.
    """
    E, A, L = n_edges, n_alts, alt_len
    D, W, K, V = depth, width, beam, v_pad
    interpret = jax.default_backend() != 'tpu'
    kernel = _make_kernel(D, K, A, L, W, V, v_real, lm_weight)
    grid = (E,)
    smem = partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    bp, alt, costs, hF, cF, xembF, costF = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((1, A, L), lambda t: (t, 0, 0)),
            smem((1, A, L), lambda t: (t, 0, 0)),
            smem((1, A, 1), lambda t: (t, 0, 0)),
            vmem((V, W), lambda t: (0, 0)),
            vmem((W, V), lambda t: (0, 0)),
            vmem((D, W, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, W, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, 1, 4 * W), lambda t: (0, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((K, W), lambda t: (0, 0)),
            smem((1, K), lambda t: (0, 0)),
        ],
        out_specs=(
            smem((1, K, 1), lambda t: (t, 0, 0)),
            smem((1, K, 1), lambda t: (t, 0, 0)),
            smem((1, K, 1), lambda t: (t, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((K, W), lambda t: (0, 0)),
            smem((1, K), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((E, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((E, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((D, K, W), jnp.float32),
            jax.ShapeDtypeStruct((D, K, W), jnp.float32),
            jax.ShapeDtypeStruct((K, W), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ),
        interpret=interpret,
    )(alt_chars, alt_mask, alt_conf_bits, emb, embT, kin, rec, bias,
      h0, c0, xemb0, cost0)

    # reverse traceback (tiny XLA scan, same dispatch)
    best = jnp.argmin(costF[0])

    def back_step(k, rec_):
        bp_e, alt_e, co_e = rec_
        return bp_e[k], (alt_e[k], co_e[k])
    _, (choices, path_costs) = jax.lax.scan(
        back_step, best, (bp[..., 0], alt[..., 0], costs[..., 0]),
        reverse=True)
    packed = jnp.concatenate([
        jnp.stack([jnp.min(cost0[0]), costF[0, best]])[None, :],
        jnp.stack([choices.astype(jnp.float32), path_costs], axis=1),
    ], axis=0)
    return packed, hF, cF, xembF, costF
