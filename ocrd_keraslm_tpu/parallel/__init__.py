"""Multi-chip parallelism: device meshes, shardings, pjit-ed steps.

New capability relative to the single-process reference (SURVEY.md
§5.8, /root/reference has no DP/TP/NCCL/MPI anywhere): data parallelism
over the batch/carry and tensor parallelism over the tied vocabulary
embedding, expressed as `jax.sharding` annotations over a Mesh with
XLA-inserted collectives.
"""
from .mesh import (DATA_AXIS, MODEL_AXIS, batch_shardings,
                   carry_sharding, make_mesh, param_shardings)
from .train import make_sharded_train_step

__all__ = ['DATA_AXIS', 'MODEL_AXIS', 'batch_shardings',
           'carry_sharding', 'make_mesh', 'param_shardings',
           'make_sharded_train_step']
