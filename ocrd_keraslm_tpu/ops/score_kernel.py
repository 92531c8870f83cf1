"""Fused Pallas TPU kernel: whole-chunk teacher-forced scoring on-chip.

The layered path (models/lstm_lm.forward_seq + log_softmax) runs one
Pallas scan per LSTM layer and then materialises the full (B, T, V)
logits tensor just to gather one probability per position.  For the
``rate``/``test`` hot path (reference rating.py:462-529) that wastes
HBM round-trips on h_all between layers and on logits, and pays the
grid-step pipeline cost twice (once per layer).

This kernel runs the complete per-position computation — all ``depth``
LSTM layers, the tied-softmax normalisation, and the true-next-char
probability / NLL — inside ONE ``pallas_call`` with a sequential grid
over time:

* layer 0's input projection (the only one that depends on the inputs,
  not on recurrent state) is hoisted outside into one large MXU matmul
  over the whole chunk and streamed per-step as (1, B, 4W) blocks;
* for layers d >= 1 the input and recurrent projections are fused into
  one (B, 2W) @ (2W, 4W) matmul over ``[h_{d-1} | h_d]`` (the cuDNN
  trick, same layout as ops/decode_kernel.py);
* the (h, c) carry for all layers lives in (D, B, W) VMEM scratch for
  the whole chunk — no intermediate h_all ever touches HBM;
* the tied output embedding (W, V_pad) stays VMEM-resident; per step
  one (B, W) @ (W, V_pad) MXU matmul + masked logsumexp + one-hot
  target gather produce prob and NLL, written as ONE (1, OUT_W) lane
  row per step (prob in lanes [0:B], NLL in lanes [B:2B]).

Math is bit-compatible with forward_seq + log_softmax on the same
inputs (parity-tested, tests/test_model_core.py).  Forward-only: the
scoring paths never differentiate; training keeps the jnp scan.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e30
LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# timesteps unrolled per grid iteration: amortises the per-grid-step
# pipeline/DMA sync cost (~half the per-step time at U=1, measured);
# SCORE_CHUNK must stay divisible by this
UNROLL = 8


def _make_kernel(D: int, B: int, W: int, Vp: int, v_real: int,
                 out_w: int, U: int):

    def kernel(xp_ref, y_ref, m_ref, h0_ref, c0_ref,
               rec1_ref, kcat_ref, ucat_ref, bias_ref, embT_ref,
               rows_ref, hT_ref, cT_ref,
               h_scr, c_scr):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        # carry lives in registers across the U unrolled steps; VMEM
        # scratch is only touched at block boundaries
        hs = [h_scr[d] for d in range(D)]
        cs = [c_scr[d] for d in range(D)]
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        for u in range(U):
            # ---- layer 0: streamed hoisted input projection ----
            z = xp_ref[u] + jnp.dot(hs[0], rec1_ref[:],
                                    preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
            f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
            g = jnp.tanh(z[:, 2 * W:3 * W])
            o = jax.nn.sigmoid(z[:, 3 * W:4 * W])
            cs[0] = f * cs[0] + i * g
            hs[0] = o * jnp.tanh(cs[0])
            inp = hs[0]

            # ---- layers 1..D-1: input + recurrent projections ----
            for d in range(1, D):
                z = (jnp.dot(inp, kcat_ref[d - 1],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(hs[d], ucat_ref[d - 1],
                               preferred_element_type=jnp.float32)
                     + bias_ref[d - 1])
                i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
                f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
                g = jnp.tanh(z[:, 2 * W:3 * W])
                o = jax.nn.sigmoid(z[:, 3 * W:4 * W])
                cs[d] = f * cs[d] + i * g
                hs[d] = o * jnp.tanh(cs[d])
                inp = hs[d]

            # ---- tied softmax: true-next-char prob + NLL ----
            logits = jnp.dot(inp, embT_ref[:],
                             preferred_element_type=jnp.float32)  # (B, Vp)
            logits = jnp.where(v_iota < v_real, logits, -BIG)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx), axis=-1,
                                       keepdims=True))            # (B, 1)
            y_col = jnp.transpose(y_ref[u])                       # (B, 1)
            onehot = (v_iota == y_col).astype(jnp.float32)
            tgt = jnp.sum(logits * onehot, axis=-1, keepdims=True)
            m_col = jnp.transpose(m_ref[u])                       # (B, 1)
            prob = jnp.exp(tgt - lse) * m_col
            nll = (lse - tgt) * m_col
            pad = jnp.zeros((1, out_w - 2 * B), jnp.float32)
            rows_ref[u] = jnp.concatenate(
                [jnp.transpose(prob), jnp.transpose(nll), pad], axis=1)

        for d in range(D):
            h_scr[d] = hs[d]
            c_scr[d] = cs[d]

        @pl.when(t == n_t - 1)
        def _():
            hT_ref[:] = h_scr[:]
            cT_ref[:] = c_scr[:]

    return kernel


def score_scan_pallas(xp1: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
                      h0: jnp.ndarray, c0: jnp.ndarray,
                      rec1: jnp.ndarray, kcat: jnp.ndarray,
                      ucat: jnp.ndarray, bias: jnp.ndarray,
                      embT: jnp.ndarray, v_real: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                 Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fused scoring of one chunk.

    xp1: (B, T, 4W) hoisted layer-0 input projection (embed @ K0 + b0);
    y, mask: (B, T) targets / validity; h0, c0: (D, B, W) carry;
    rec1: (W, 4W) layer-0 recurrent kernel; kcat/ucat:
    (max(D-1,1), W, 4W) stacked input/recurrent kernels for layers >= 1
    (dummy zeros if D=1); bias: (max(D-1,1), 1, 4W); embT: (W, V_pad)
    transposed tied output embedding (rows beyond ``v_real`` are
    padding).  T divisible by UNROLL is a PERFORMANCE precondition:
    other lengths silently fall back to one timestep per grid step
    (U=1), losing the ~2x unroll amortisation but staying correct.

    Returns (probs (B, T) f32, per-stream NLL sums (B,) f32,
    (hT, cT) each (D, B, W)).
    """
    B, T, F = xp1.shape
    D, _, W = h0.shape
    Vp = embT.shape[1]
    U = UNROLL if T % UNROLL == 0 else 1
    out_w = _round_up(max(2 * B, LANE), LANE)
    xp_tm = jnp.swapaxes(xp1, 0, 1)                  # (T, B, 4W)
    y_tm = jnp.swapaxes(y, 0, 1)[:, None, :]         # (T, 1, B)
    m_tm = jnp.swapaxes(mask, 0, 1)[:, None, :]      # (T, 1, B)
    interpret = jax.default_backend() != 'tpu'
    kernel = _make_kernel(D, B, W, Vp, v_real, out_w, U)
    Dw = kcat.shape[0]
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    rows, hT, cT = pl.pallas_call(
        kernel,
        grid=(T // U,),
        in_specs=[
            vmem((U, B, F), lambda t: (t, 0, 0)),
            vmem((U, 1, B), lambda t: (t, 0, 0)),
            vmem((U, 1, B), lambda t: (t, 0, 0)),
            vmem((D, B, W), lambda t: (0, 0, 0)),
            vmem((D, B, W), lambda t: (0, 0, 0)),
            vmem((W, F), lambda t: (0, 0)),
            vmem((Dw, W, F), lambda t: (0, 0, 0)),
            vmem((Dw, W, F), lambda t: (0, 0, 0)),
            vmem((Dw, 1, F), lambda t: (0, 0, 0)),
            vmem((W, Vp), lambda t: (0, 0)),
        ],
        out_specs=(
            vmem((U, 1, out_w), lambda t: (t, 0, 0)),
            vmem((D, B, W), lambda t: (0, 0, 0)),
            vmem((D, B, W), lambda t: (0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, out_w), jnp.float32),
            jax.ShapeDtypeStruct((D, B, W), jnp.float32),
            jax.ShapeDtypeStruct((D, B, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, B, W), jnp.float32),
            pltpu.VMEM((D, B, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * W * (F * D + Vp) + 10 * T * B * F * D,
            bytes_accessed=4 * (T * B * F + D * 2 * W * F + W * Vp
                                + T * out_w),
            transcendentals=T * B * (4 * W * D + Vp),
        ),
        interpret=interpret,
    )(xp_tm, y_tm, m_tm, h0, c0, rec1, kcat, ucat, bias, embT)
    rows = rows[:, 0]                              # (T, out_w)
    probs = jnp.swapaxes(rows[:, :B], 0, 1)        # (B, T)
    nll_sum = jnp.sum(rows[:, B:2 * B], axis=0)    # (B,)
    return probs, nll_sum, (hT, cT)


def pack_score_weights(params, cfg):
    """Loop-invariant weight transforms for the fused scoring kernel
    (hoisted out of the chunk scan by XLA): stacked input/recurrent
    kernels for layers >= 1, and the vocab-padded transposed tied
    output embedding."""
    W = cfg.width
    lstm = params['lstm']
    if cfg.depth > 1:
        kcat = jnp.stack([lstm[d]['kernel']
                          for d in range(1, cfg.depth)])
        ucat = jnp.stack([lstm[d]['recurrent']
                          for d in range(1, cfg.depth)])
        bias = jnp.stack([lstm[d]['bias'][None, :]
                          for d in range(1, cfg.depth)])
    else:  # dummy operands keep the pallas signature static
        kcat = jnp.zeros((1, W, 4 * W), jnp.float32)
        ucat = jnp.zeros((1, W, 4 * W), jnp.float32)
        bias = jnp.zeros((1, 1, 4 * W), jnp.float32)
    emb = params['char_embedding']                # (V, W)
    v_real = emb.shape[0]
    v_pad = _round_up(max(v_real, LANE), LANE)
    embT = jnp.pad(emb, ((0, v_pad - v_real), (0, 0))).T  # (W, Vp)
    return lstm[0]['recurrent'], kcat, ucat, bias, embT, v_real
