"""Fused LSTM recurrence as a Pallas TPU kernel.

This is the TPU-native analogue of the reference's one native
component, the cuDNN fused LSTM (selected at
/root/reference/ocrd_keraslm/lib/rating.py:78-87).  The input
projection ``x @ W + b`` for the whole sequence is precomputed outside
(one large MXU matmul per layer, see models/lstm_lm.py); this kernel
runs the inherently sequential part — per-step ``h @ U`` plus gate
elementwise ops — entirely on-chip:

* grid iterates over time (TPU grid steps execute sequentially per
  core), with the recurrent kernel U resident in VMEM for the whole
  sequence and the (h, c) carry living in VMEM scratch across steps;
* per step, one (B, W) x (W, 4W) MXU matmul + VPU gate math;
* the per-timestep input projection block is streamed HBM->VMEM by the
  pallas pipeline (time-major layout so blocks are (B, 4W) tiles).

Gate order i, f, g, o; activations sigmoid/tanh — bit-identical math to
``models.lstm_lm.lstm_gates`` (parity-tested).

The custom VJP runs the BACKWARD recurrence as a second Pallas kernel
(reverse time grid): per step it recomputes the gate pre-activations
from the saved (h, c) sequences (one extra matmul instead of storing
(B, T, 4W) activations), forms the gate derivatives, emits the input-
projection cotangent block, chains the recurrent (dh, dc) carries in
VMEM scratch, and accumulates the recurrent-kernel gradient in a VMEM
scratch that is written once at the end.  An exact jnp fallback
(``jax.vjp`` through the ``lax.scan`` reference) is kept for interpret
mode and as the parity baseline.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_math(z: jnp.ndarray, c: jnp.ndarray, W: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
    f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
    g = jnp.tanh(z[:, 2 * W:3 * W])
    o = jax.nn.sigmoid(z[:, 3 * W:4 * W])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _batch_block(B: int, F: int, budget: int = 6 << 20) -> int:
    """Largest batch block (divisor of B) whose per-block VMEM stays
    inside ``budget`` bytes — dominated by the double-buffered f32
    (Bb, 4W) x_proj slabs at ~16*F bytes/row.  Whole-B blocks OOM the
    16MB VMEM at production sizes (w512, B512)."""
    cap = max(8, budget // (16 * F))
    if B <= cap:
        return B
    for bb in range(cap, 0, -1):
        if B % bb == 0:
            return bb
    return B


def _make_scan_kernel(want_c_all: bool):
    """The forward kernel, with or without the c_all residual output:
    XLA cannot DCE a pallas_call output, so the undifferentiated
    (inference) primal would otherwise pay T*B*W*4 bytes of dead
    writes per layer just to discard them."""

    def kernel(xp_ref, rec_ref, h0_ref, c0_ref, *refs):
        if want_c_all:
            hall_ref, call_ref, hT_ref, cT_ref, h_scr, c_scr = refs
        else:
            hall_ref, hT_ref, cT_ref, h_scr, c_scr = refs
            call_ref = None
        # grid (nB, T): batch blocks outer (independent rows), time
        # inner sequential; scratch carries reset per batch block
        t = pl.program_id(1)
        n_t = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        h = h_scr[:]
        c = c_scr[:]
        W = h.shape[-1]
        # bf16 recurrent weights: cast the h operand to the weight
        # dtype (one bf16 MXU pass, f32 accumulate) — same math as
        # _layer_scan_jnp's h.astype(cdt); carry/gates stay f32
        z = xp_ref[0] + jnp.dot(h.astype(rec_ref.dtype), rec_ref[:],
                                preferred_element_type=jnp.float32)
        h_new, c_new = _gate_math(z, c, W)
        h_scr[:] = h_new
        c_scr[:] = c_new
        hall_ref[0] = h_new
        if call_ref is not None:
            call_ref[0] = c_new  # residual for the backward kernel

        @pl.when(t == n_t - 1)
        def _():
            hT_ref[:] = h_new
            cT_ref[:] = c_new

    return kernel


def _lstm_scan_pallas_raw(x_proj, h0, c0, recurrent,
                          want_c_all: bool = True):
    """x_proj: (B, T, 4W); h0, c0: (B, W); recurrent: (W, 4W).
    Returns (h_all (B, T, W), c_all (T, B, W) time-major or None, hT,
    cT); ``want_c_all=False`` (inference) skips the residual output."""
    B, T, F = x_proj.shape
    W = h0.shape[-1]
    # time-major so each grid step's block is a well-tiled (B, 4W) slab
    xp_tm = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4W)
    interpret = jax.default_backend() != 'tpu'
    # batch blocks: big models (w512 x B512) blow the 16MB VMEM budget
    # with whole-B blocks (the f32 x_proj slab alone is B*4W*4 bytes,
    # double-buffered); batch rows are independent, so the grid runs
    # batch blocks in an OUTER dimension with time inner-sequential
    Bb = _batch_block(B, F)
    nB = B // Bb
    tm_spec = pl.BlockSpec((1, Bb, W), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    bw_spec = pl.BlockSpec((Bb, W), lambda b, t: (b, 0),
                           memory_space=pltpu.VMEM)
    out_specs = ((tm_spec, tm_spec, bw_spec, bw_spec) if want_c_all
                 else (tm_spec, bw_spec, bw_spec))
    tm_shape = jax.ShapeDtypeStruct((T, B, W), jnp.float32)
    bw_shape = jax.ShapeDtypeStruct((B, W), jnp.float32)
    out_shape = ((tm_shape, tm_shape, bw_shape, bw_shape)
                 if want_c_all else (tm_shape, bw_shape, bw_shape))
    outs = pl.pallas_call(
        _make_scan_kernel(want_c_all),
        grid=(nB, T),
        in_specs=[
            pl.BlockSpec((1, Bb, F), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, F), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            bw_spec,
            bw_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bb, W), jnp.float32),
            pltpu.VMEM((Bb, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * W * F + 10 * T * B * F,
            bytes_accessed=4 * (T * B * F + W * F + 2 * T * B * W),
            transcendentals=4 * T * B * W,
        ),
        interpret=interpret,
    )(xp_tm, recurrent, h0, c0)
    if want_c_all:
        return outs
    h_all, hT, cT = outs
    return h_all, None, hT, cT


def _lstm_scan_pallas_impl(x_proj: jnp.ndarray, h0: jnp.ndarray,
                           c0: jnp.ndarray, recurrent: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h_all, _, hT, cT = _lstm_scan_pallas_raw(x_proj, h0, c0, recurrent,
                                             want_c_all=False)
    return jnp.swapaxes(h_all, 0, 1), hT, cT


def _lstm_bwd_kernel(xp_ref, hprev_ref, cprev_ref, ccur_ref,
                     dhout_ref, rec_ref, recT_ref, dhT_ref, dcT_ref,
                     dxp_ref, dU_ref, dh0_ref, dc0_ref,
                     dh_scr, dc_scr, dU_scr):
    """Reverse-time backward step (index maps feed blocks in reverse
    time order).  Recomputes z and the gates from the saved states —
    one extra (B, W) x (W, 4W) matmul instead of a (B, T, 4W)
    activation residual.  Grid (nB, T): batch blocks outer, reverse
    time inner; the (dh, dc) carries reset per batch block, the dU
    accumulator spans ALL blocks (zeroed once at the very first
    program, written once at the very last)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        dU_scr[:] = jnp.zeros_like(dU_scr)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]

    h_prev = hprev_ref[0]
    c_prev = cprev_ref[0]
    c_cur = ccur_ref[0]
    W = h_prev.shape[-1]

    # recompute z with the SAME operand dtypes as the forward kernel
    # (bf16 h operand under bf16 weights) so the gates match the
    # primal bit-exactly
    hq = h_prev.astype(rec_ref.dtype)
    z = xp_ref[0] + jnp.dot(hq, rec_ref[:],
                            preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * W:1 * W])
    f = jax.nn.sigmoid(z[:, 1 * W:2 * W])
    g = jnp.tanh(z[:, 2 * W:3 * W])
    o = jax.nn.sigmoid(z[:, 3 * W:4 * W])

    dh_total = dhout_ref[0] + dh_scr[:]
    tc = jnp.tanh(c_cur)
    do = dh_total * tc
    dc_total = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
    di = dc_total * g
    df = dc_total * c_prev
    dg = dc_total * i
    dz = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=1)                                  # (B, 4W)
    dxp_ref[0] = dz
    # recT arrives as f32 (bf16 weight VALUES promoted outside) — the
    # jnp path's AD promotes the bf16 operand the same way
    dh_scr[:] = jnp.dot(dz, recT_ref[:],
                        preferred_element_type=jnp.float32)
    dc_scr[:] = dc_total * f
    # dU += h_prev^T @ dz (contract over batch) with the QUANTIZED h
    # values (AD of h.astype(bf16) @ U differentiates through the
    # cast: dU sees bf16-valued h, f32 math)
    dU_scr[:] = dU_scr[:] + jax.lax.dot_general(
        hq.astype(jnp.float32), dz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(t == n_t - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

    @pl.when((b == pl.num_programs(0) - 1) & (t == n_t - 1))
    def _():
        dU_ref[:] = dU_scr[:]


def _lstm_bwd_pallas(xp_tm, hprev_tm, cprev_tm, call_tm, dhout_tm,
                     recurrent, dhT, dcT):
    """All sequence arrays time-major (T, B, *).  Returns
    (dxp_tm (T, B, 4W), dU (W, 4W), dh0 (B, W), dc0 (B, W))."""
    T, B, F = xp_tm.shape
    W = hprev_tm.shape[-1]
    # (4W, W); f32 — under bf16 weights these are the bf16 VALUES
    # promoted, matching how XLA promotes the AD cotangent matmul
    recT = jnp.swapaxes(recurrent, 0, 1).astype(jnp.float32)
    interpret = jax.default_backend() != 'tpu'
    # tighter budget than the forward: the bwd holds 5 sequence
    # operands, the f32 recT, and the (W, 4W) f32 dU accumulator
    Bb = _batch_block(B, F, budget=3 << 20)
    nB = B // Bb
    rev = lambda b, t: (T - 1 - t, b, 0)  # noqa: E731 — reverse time
    bw = lambda b, t: (b, 0)              # noqa: E731
    fix = lambda b, t: (0, 0)             # noqa: E731
    return pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(nB, T),
        in_specs=[
            pl.BlockSpec((1, Bb, F), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, F), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, W), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, W), bw, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, W), bw, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Bb, F), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, F), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, W), bw, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, W), bw, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, F), jnp.float32),
            jax.ShapeDtypeStruct((W, F), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bb, W), jnp.float32),
            pltpu.VMEM((Bb, W), jnp.float32),
            pltpu.VMEM((W, F), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * W * F + 20 * T * B * F,
            bytes_accessed=4 * (2 * T * B * F + 2 * W * F
                                + 4 * T * B * W),
            transcendentals=5 * T * B * W,
        ),
        interpret=interpret,
    )(xp_tm, hprev_tm, cprev_tm, call_tm, dhout_tm, recurrent, recT,
      dhT, dcT)


def _jnp_scan(x_proj, h0, c0, recurrent):
    from ..models.lstm_lm import _layer_scan_jnp
    return _layer_scan_jnp(x_proj, h0, c0, recurrent)


@jax.custom_vjp
def lstm_scan_pallas(x_proj, h0, c0, recurrent):
    return _lstm_scan_pallas_impl(x_proj, h0, c0, recurrent)


def _fwd(x_proj, h0, c0, recurrent):
    h_all_tm, c_all_tm, hT, cT = _lstm_scan_pallas_raw(
        x_proj, h0, c0, recurrent)
    out = (jnp.swapaxes(h_all_tm, 0, 1), hT, cT)
    return out, (x_proj, h0, c0, recurrent, h_all_tm, c_all_tm)


def _bwd(residuals, cotangents):
    x_proj, h0, c0, recurrent, h_all_tm, c_all_tm = residuals
    dh_all, dhT, dcT = cotangents
    xp_tm = jnp.swapaxes(x_proj, 0, 1)
    # previous-state sequences: h_{t-1}, c_{t-1} rows (t=0 -> h0/c0)
    hprev_tm = jnp.concatenate([h0[None], h_all_tm[:-1]], axis=0)
    cprev_tm = jnp.concatenate([c0[None], c_all_tm[:-1]], axis=0)
    dhout_tm = jnp.swapaxes(dh_all, 0, 1)
    dxp_tm, dU, dh0, dc0 = _lstm_bwd_pallas(
        xp_tm, hprev_tm, cprev_tm, c_all_tm, dhout_tm, recurrent,
        dhT, dcT)
    # cotangent dtype must match the primal input: under bf16 weights
    # the recurrent cotangent is bf16 (exactly what the jnp path's AD
    # produces for a bf16 operand; the outer .astype cast then
    # promotes it into the f32 param grad)
    return (jnp.swapaxes(dxp_tm, 0, 1), dh0, dc0,
            dU.astype(recurrent.dtype))


lstm_scan_pallas.defvjp(_fwd, _bwd)
