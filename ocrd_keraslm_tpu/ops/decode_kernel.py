"""Fused Pallas TPU kernel: whole-lattice beam decoding on-chip.

The XLA version (ops/beam_device.py) is a single dispatch, but each
edge costs ~40us in per-op overhead.  This kernel runs the complete
search — expansion, embedding lookup, the LSTM layer stack, tied
softmax scoring, top-K pruning, state gathering — inside ONE
``pallas_call`` with a sequential grid over edges:

* all weights (embedding + transposed embedding + per-layer input and
  recurrent kernels) stay VMEM-resident for the whole lattice;
* the beam state (h, c per layer, previous-char embeddings, costs)
  lives in the kernel's output refs (constant index maps -> persistent
  across grid steps), so the final state doubles as the cross-page
  carry;
* per-edge alternative char ids / masks / confidences stream through
  SMEM scalars (A*L of them per edge);
* "gathers" are one-hot matmuls on the MXU (beam expansion (KA, K) @
  (K, W); state re-ordering (K, KA) @ (KA, W); embedding lookup
  (KA, V) @ (V, W)) — no dynamic indexing;
* costs travel as 128-lane vectors; top-K selection is K unrolled
  argmin-and-mask iterations on a lane vector (VPU), accumulating the
  per-edge [backptr | altidx | cost] records into ONE (8, 128) VMEM
  tile written once per edge — no scalar output writes.

The page context variables are constant per page, so their embedding
contribution is folded into the layer-0 bias outside the kernel.

Cost semantics identical to ops/beam_device.decode_lattice_device
(lm_weight * -log2 p_LM per char + (1 - lm_weight) * -log2 conf per
char); parity-tested against it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INV_LN2 = 1.4426950408889634
BIG = 1.0e30
LANE = 128


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

    def kernel(chars_ref, mask_ref, conf_ref,     # per-edge SMEM
               emb_ref, embT_ref, kin_ref, rec_ref, bias_ref,  # VMEM
               h0_ref, c0_ref, xemb0_ref, cost0_ref,  # init
               rec_out_ref,                       # per-edge records
               h_ref, c_ref, xemb_ref, costf_ref  # persistent state
               ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_ref[:] = h0_ref[:]
            c_ref[:] = c0_ref[:]
            xemb_ref[:] = xemb0_ref[:]
            costf_ref[:] = cost0_ref[:]

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, 1), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        lane_iota_v = jax.lax.broadcasted_iota(jnp.int32, (KA, V), 1)

        # ---- expansion: beam (K) -> hypotheses (KA = K * A) ----
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (KA, K), 1)
        Rexp = (row_iota // A == col_iota).astype(jnp.float32)
        hE = [jnp.dot(Rexp, h_ref[d],
                      preferred_element_type=jnp.float32)
              for d in range(D)]
        cE = [jnp.dot(Rexp, c_ref[d],
                      preferred_element_type=jnp.float32)
              for d in range(D)]
        xembE = jnp.dot(Rexp, xemb_ref[:],
                        preferred_element_type=jnp.float32)
        # cost expansion as a lane-vector matmul:
        # Mexp[src_lane, dst_lane] = 1 iff dst//A == src and dst < KA
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        dst_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        Mexp = ((dst_iota // A == src_iota) &
                (dst_iota < KA)).astype(jnp.float32)
        costE = jnp.dot(costf_ref[:], Mexp,
                        preferred_element_type=jnp.float32)
        costE = jnp.where(lane_iota < KA, costE, BIG)

        # per-hypothesis conf bits (lane vector, SMEM scalar reads)
        confE = jnp.zeros((1, LANE), jnp.float32)
        for a in range(A):
            conf_a = conf_ref[0, a, 0]
            confE = jnp.where(lane_iota % A == a, conf_a, confE)

        acc = jnp.zeros((1, LANE), jnp.float32)
        nchars = jnp.zeros((1, LANE), jnp.float32)

        # ---- char steps (unrolled) ----
        for step_t in range(L):
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

            inp = xembE
            new_h, new_c = [], []
            for d in range(D):
                z = (jnp.dot(inp, kin_ref[d],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(hE[d], rec_ref[d],
                               preferred_element_type=jnp.float32)
                     + bias_ref[d])
                h2, c2 = _lstm_gates_pl(z, cE[d])
                new_h.append(h2)
                new_c.append(c2)
                inp = h2

            logits = jnp.dot(inp, embT_ref[:],
                             preferred_element_type=jnp.float32)
            logits = jnp.where(lane_iota_v < V_real, logits, -BIG)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            lse = mx + jnp.log(
                jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True))
            logit_cur = jnp.sum(onehot_cur * logits, axis=-1,
                                keepdims=True)
            nll2_sub = (lse - logit_cur) * INV_LN2    # (KA, 1) bits
            nll2_lane = nll2_sub.reshape(1, KA)
            nll2_lane = jnp.concatenate(
                [nll2_lane, jnp.zeros((1, LANE - KA), jnp.float32)],
                axis=1)
            acc = acc + m_lane * (lm_weight * nll2_lane)
            nchars = nchars + m_lane

            keep = m_sub > 0
            for d in range(D):
                hE[d] = jnp.where(keep, new_h[d], hE[d])
                cE[d] = jnp.where(keep, new_c[d], cE[d])
            xemb_new = jnp.dot(onehot_cur, emb_ref[:],
                               preferred_element_type=jnp.float32)
            xembE = jnp.where(keep, xemb_new, xembE)

        # ---- totals + top-K selection (lane vectors only) ----
        total = costE + acc + (1.0 - lm_weight) * confE * nchars
        total = jnp.where(lane_iota < KA, total, BIG)
        total = jnp.where(confE >= BIG, BIG, total)

        S = jnp.zeros((K, KA), jnp.float32)
        s_row = jax.lax.broadcasted_iota(jnp.int32, (K, KA), 0)
        s_col = jax.lax.broadcasted_iota(jnp.int32, (K, KA), 1)
        bp_lane = jnp.zeros((1, LANE), jnp.float32)
        alt_lane = jnp.zeros((1, LANE), jnp.float32)
        cost_lane = jnp.full((1, LANE), BIG, jnp.float32)
        for j in range(K):
            m = jnp.min(total)
            cand = jnp.where(total == m, lane_iota, LANE)
            first = jnp.min(cand)
            is_j = lane_iota == j
            bp_lane = jnp.where(is_j, (first // A).astype(jnp.float32),
                                bp_lane)
            alt_lane = jnp.where(is_j, (first % A).astype(jnp.float32),
                                 alt_lane)
            cost_lane = jnp.where(is_j, m, cost_lane)
            S = jnp.where((s_col == first) & (s_row == j), 1.0, S)
            total = jnp.where(lane_iota == first, BIG, total)

        # ONE record write per edge: rows 0..2 = bp / alt / cost
        rec = jnp.concatenate(
            [bp_lane, alt_lane, cost_lane,
             jnp.zeros((5, LANE), jnp.float32)], axis=0)
        rec_out_ref[0] = rec
        costf_ref[:] = cost_lane

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
    bias: (D, 1, 4W) (context folded into layer 0);
    alt_chars/mask: (E, A, L); alt_conf_bits: (E, A, 1);
    h0/c0: (D, K, W); xemb0: (K, W); cost0: (1, 128) lane vector
    (lanes >= K at BIG).

    Returns (packed (E+1, 3K) host-bound records in the same layout as
    the XLA path, hF, cF, xembF, costF (1, 128)).
    """
    E, A, L = n_edges, n_alts, alt_len
    D, W, K, V = depth, width, beam, v_pad
    interpret = jax.default_backend() != 'tpu'
    kernel = _make_kernel(D, K, A, L, W, V, v_real, lm_weight)
    smem = partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    records, hF, cF, xembF, costF = pl.pallas_call(
        kernel,
        grid=(E,),
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
            vmem((1, LANE), lambda t: (0, 0)),
        ],
        out_specs=(
            vmem((1, 8, LANE), lambda t: (t, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((D, K, W), lambda t: (0, 0, 0)),
            vmem((K, W), lambda t: (0, 0)),
            vmem((1, LANE), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, 8, LANE), jnp.float32),
            jax.ShapeDtypeStruct((D, K, W), jnp.float32),
            jax.ShapeDtypeStruct((D, K, W), jnp.float32),
            jax.ShapeDtypeStruct((K, W), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ),
        interpret=interpret,
    )(alt_chars, alt_mask, alt_conf_bits, emb, embT, kin, rec, bias,
      h0, c0, xemb0, cost0)

    # pack host-bound data exactly like the XLA path: row 0 header with
    # min incoming cost, rows 1..E = [bp | alt | cost] per beam slot
    bp = records[:, 0, :beam]
    alt = records[:, 1, :beam]
    costs = records[:, 2, :beam]
    header = jnp.zeros((1, 3 * beam), jnp.float32).at[0, 0].set(
        jnp.min(jnp.where(jnp.arange(LANE) < beam, cost0[0], BIG)))
    packed = jnp.concatenate(
        [header, jnp.concatenate([bp, alt, costs], axis=1)], axis=0)
    return packed, hF, cF, xembF, costF
