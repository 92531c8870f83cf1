"""Multi-host (multi-process) training: a global mesh over every chip
of every process, data parallelism spanning hosts.

The reference is strictly single-process (SURVEY.md §5.8).  The
TPU-native analogue scales past one host by composing three standard
JAX pieces — this module wires them together and keeps the layout
rule that matters on hardware: the ``model`` (tensor-parallel) axis
stays INSIDE a process so its collectives ride ICI; only the ``data``
axis (one gradient all-reduce per step) crosses hosts over DCN.

* :func:`init_multihost` — join the process group
  (``jax.distributed``).  On TPU pods the coordinator/process count
  auto-detect from the environment; elsewhere pass them (or set
  ``KERASLM_COORDINATOR``/``KERASLM_NUM_PROCESSES``/
  ``KERASLM_PROCESS_ID``).
* :func:`make_global_mesh` — (data, model) mesh over the GLOBAL device
  list, data-major across processes.
* :func:`global_batch` — assemble a global sharded batch from each
  process's LOCAL arrays (`jax.make_array_from_process_local_data`),
  so every host only ever materialises its own slice of the corpus.

The sharded train step itself is unchanged —
:func:`ocrd_keraslm_tpu.parallel.train.make_sharded_train_step`
accepts the global mesh as-is (shardings are process-count agnostic).
Exercised end-to-end by ``tests/test_multihost.py``: two REAL
processes, each with 4 virtual CPU devices, train one step on an
8-device global mesh and agree on the loss (the all-reduce crosses
the process boundary over the Gloo CPU backend standing in for DCN).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join (or create) the JAX process group.

    No-op when already initialized.  With no arguments, relies on
    ``jax.distributed.initialize`` auto-detection (TPU pods, cloud
    cluster environments); otherwise reads the ``KERASLM_*`` env vars
    or the explicit arguments.
    """
    if jax.distributed.is_initialized():
        return  # already in a group
    # NOTE: must run before anything touches the XLA backend
    # (jax.devices(), any computation, ...)
    coordinator = coordinator or os.environ.get('KERASLM_COORDINATOR')
    if num_processes is None:
        n = os.environ.get('KERASLM_NUM_PROCESSES')
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get('KERASLM_PROCESS_ID')
        process_id = int(p) if p else None
    if not coordinator and (num_processes is not None
                            or process_id is not None):
        raise ValueError(
            'KERASLM_NUM_PROCESSES/KERASLM_PROCESS_ID are set but '
            'KERASLM_COORDINATOR is not — refusing to silently '
            'auto-detect (each process would train independently)')
    if coordinator and (num_processes is None or process_id is None):
        # the converse misconfiguration would otherwise surface as a
        # generic detection failure (or a hang) deep inside
        # jax.distributed.initialize
        raise ValueError(
            'KERASLM_COORDINATOR is set but KERASLM_NUM_PROCESSES/'
            'KERASLM_PROCESS_ID are not — an explicit coordinator '
            'needs both (auto-detected environments should set none '
            'of the three)')
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices.

    Devices are laid out data-major across processes with the
    ``model`` axis confined to consecutive devices of one process, so
    tensor-parallel collectives never cross hosts.
    """
    devices = jax.devices()
    n = len(devices)
    per_proc = len(jax.local_devices())
    assert model_parallel <= per_proc and \
        per_proc % model_parallel == 0, \
        'model axis must fit inside one process (%d devices/host)' \
        % per_proc
    assert n % model_parallel == 0
    grid = np.asarray(devices).reshape(n // model_parallel,
                                       model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def global_batch(mesh: Mesh, x_local, zs_local, y_local, mask_local,
                 carry_local) -> Tuple:
    """Assemble the globally-sharded (x, zs, y, mask, carry) from this
    process's LOCAL batch rows.

    Every process passes its own slice (global batch row b lives on
    the process owning mesh position b); the returned jax.Arrays span
    the mesh without any host ever holding the full batch.
    """
    bs = NamedSharding(mesh, P(DATA_AXIS, None))
    zsh = NamedSharding(mesh, P(DATA_AXIS))
    cs = NamedSharding(mesh, P(None, DATA_AXIS, None))
    nproc = jax.process_count()

    def g(local, sharding):
        local = np.asarray(local)
        shard_dim = next((i for i, s in enumerate(
            sharding.spec) if s == DATA_AXIS), 0)
        global_shape = tuple(
            d * nproc if i == shard_dim else d
            for i, d in enumerate(local.shape))
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape)

    x = g(x_local, bs)
    zs = tuple(g(z, zsh) for z in zs_local)
    y = g(y_local, bs if np.asarray(y_local).ndim > 1 else zsh)
    mask = g(mask_local, bs if np.asarray(mask_local).ndim > 1
             else zsh)
    carry = tuple(g(c, cs) for c in carry_local)
    return x, zs, y, mask, carry
