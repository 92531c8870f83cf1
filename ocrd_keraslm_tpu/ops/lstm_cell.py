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

A custom VJP recomputes the backward pass through the jnp ``lax.scan``
reference implementation, so the kernel is safe to use under
``jax.grad`` (training defaults to the jnp path anyway; XLA fuses it
well, and gradients stay exact).
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


def _lstm_scan_kernel(xp_ref, rec_ref, h0_ref, c0_ref,
                      hall_ref, hT_ref, cT_ref,
                      h_scr, c_scr):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    W = h.shape[-1]
    z = xp_ref[0] + jnp.dot(h, rec_ref[:],
                            preferred_element_type=jnp.float32)
    h_new, c_new = _gate_math(z, c, W)
    h_scr[:] = h_new
    c_scr[:] = c_new
    hall_ref[0] = h_new

    @pl.when(t == n_t - 1)
    def _():
        hT_ref[:] = h_new
        cT_ref[:] = c_new


def _lstm_scan_pallas_impl(x_proj: jnp.ndarray, h0: jnp.ndarray,
                           c0: jnp.ndarray, recurrent: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x_proj: (B, T, 4W); h0, c0: (B, W); recurrent: (W, 4W).
    Returns (h_all (B, T, W), hT, cT)."""
    B, T, F = x_proj.shape
    W = h0.shape[-1]
    # time-major so each grid step's block is a well-tiled (B, 4W) slab
    xp_tm = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4W)
    interpret = jax.default_backend() != 'tpu'
    h_all, hT, cT = pl.pallas_call(
        _lstm_scan_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, F), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, F), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.float32),
            pltpu.VMEM((B, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * W * F + 10 * T * B * F,
            bytes_accessed=4 * (T * B * F + W * F + T * B * W),
            transcendentals=4 * T * B * W,
        ),
        interpret=interpret,
    )(xp_tm, recurrent, h0, c0)
    return jnp.swapaxes(h_all, 0, 1), hT, cT


def _jnp_scan(x_proj, h0, c0, recurrent):
    from ..models.lstm_lm import _layer_scan_jnp
    return _layer_scan_jnp(x_proj, h0, c0, recurrent)


@jax.custom_vjp
def lstm_scan_pallas(x_proj, h0, c0, recurrent):
    return _lstm_scan_pallas_impl(x_proj, h0, c0, recurrent)


def _fwd(x_proj, h0, c0, recurrent):
    out = _lstm_scan_pallas_impl(x_proj, h0, c0, recurrent)
    return out, (x_proj, h0, c0, recurrent)


def _bwd(residuals, cotangents):
    _, vjp = jax.vjp(_jnp_scan, *residuals)
    return vjp(cotangents)


lstm_scan_pallas.defvjp(_fwd, _bwd)
