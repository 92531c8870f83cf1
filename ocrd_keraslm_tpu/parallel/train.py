"""Sharded multi-chip training step (pjit over a (data, model) mesh).

Data parallelism: batch + recurrent carry sharded on the ``data`` axis;
XLA inserts the gradient all-reduce (psum over ICI) from sharding
propagation.  Tensor parallelism: the tied char embedding is sharded on
the vocabulary dim over the ``model`` axis, so both the input gather
and the (B, T, V) logits/softmax are vocab-sharded, with XLA-inserted
collectives for the log-sum-exp.

New capability relative to the single-process reference (SURVEY.md
§5.8): the equivalent of a DDP/NCCL stack, expressed as shardings.
"""
from __future__ import annotations


import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lstm_lm import LMConfig, forward_seq, regularization_loss, sequence_xent
from ..training import make_optimizer
from .mesh import (adam_opt_shardings, batch_shardings,
                   carry_sharding, param_shardings)


def _loss(params, cfg, x, zs, y, mask, carry, rng, x_mask=None):
    logits, carry = forward_seq(params, cfg, x, list(zs), carry,
                                train=True, rng=rng, x_mask=x_mask)
    if y.ndim == 1:
        logits = logits[:, -1, :]
    nll, acc = sequence_xent(logits, y, mask)
    return nll + regularization_loss(params), (nll, acc, carry)


def make_sharded_train_step(mesh: Mesh, cfg: LMConfig,
                            optimizer=None):
    """Return (train_step, shard_fn) where ``train_step(params,
    opt_state, x, zs, y, mask, carry, rng)`` is jitted over ``mesh``
    with dp/tp shardings, and ``shard_fn(params, opt_state)`` places
    the states onto the mesh."""
    opt = optimizer or make_optimizer()

    def step(params, opt_state, x, zs, y, mask, carry, rng,
             x_mask=None):
        (loss, (nll, acc, carry)), grads = jax.value_and_grad(
            _loss, has_aux=True)(params, cfg, x, zs, y, mask, carry,
                                 rng, x_mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, carry, loss, nll, acc

    def opt_shardings(opt_state, pspec):
        return adam_opt_shardings(mesh, opt_state, pspec)

    def shard_fn(params, opt_state):
        pspec = param_shardings(mesh, params)
        params = jax.device_put(params, pspec)
        opt_state = jax.device_put(opt_state,
                                   opt_shardings(opt_state, pspec))
        return params, opt_state, pspec

    def jit_step(params, opt_state, n_contexts, stateful_targets,
                 variable_length=False):
        pspec = param_shardings(mesh, params)
        ospec = opt_shardings(opt_state, pspec)
        bx, bzs, by, bm = batch_shardings(mesh, n_contexts,
                                          stateful_targets)
        cs = carry_sharding(mesh)
        rs = NamedSharding(mesh, P())
        in_sh = (pspec, ospec, bx, bzs, by, bm, (cs, cs), rs)
        if variable_length:  # masked variable windows: + x_mask
            in_sh = in_sh + (bx,)
        return jax.jit(
            step,
            in_shardings=in_sh,
            out_shardings=(pspec, ospec, (cs, cs), rs, rs, rs),
            # donate params/opt_state/carry like the single-chip step:
            # without this the mesh path double-buffers the (vocab-
            # sharded) embedding + Adam moments every step
            donate_argnums=(0, 1, 6),
        )

    return step, shard_fn, jit_step


def make_sharded_eval_step(mesh: Mesh, cfg: LMConfig):
    """Jitted forward-only evaluation over the mesh.

    The multihost training loop needs this: the single-chip
    ``eval_step`` cannot mix host-local batch arrays with
    globally-sharded params, so validation runs through the same
    batch/carry shardings as the train step (training.py uses it
    whenever ``jax.process_count() > 1``)."""

    def estep(params, x, zs, y, mask, carry, x_mask=None):
        logits, carry = forward_seq(params, cfg, x, list(zs), carry,
                                    train=False, rng=None,
                                    x_mask=x_mask)
        if y.ndim == 1:
            logits = logits[:, -1, :]
        nll, acc = sequence_xent(logits, y, mask)
        return nll, acc, carry

    def jit_eval(params, n_contexts, stateful_targets,
                 variable_length=False):
        pspec = param_shardings(mesh, params)
        bx, bzs, by, bm = batch_shardings(mesh, n_contexts,
                                          stateful_targets)
        cs = carry_sharding(mesh)
        rs = NamedSharding(mesh, P())
        in_sh = (pspec, bx, bzs, by, bm, (cs, cs))
        if variable_length:
            in_sh = in_sh + (bx,)
        return jax.jit(estep, in_shardings=in_sh,
                       out_shardings=(rs, rs, (cs, cs)))

    return jit_eval
