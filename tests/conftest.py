"""Test configuration: force the CPU backend with an 8-device virtual
mesh so multi-chip sharding paths compile and run without TPU hardware.

Note: the environment's axon sitecustomize force-registers the remote
TPU plugin and sets ``jax_platforms='axon,cpu'`` at interpreter start,
so the JAX_PLATFORMS env var alone is not enough — the jax config must
be overridden after import, before any backend use.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import tempfile

# epoch checkpoints default to CWD (reference parity); tests must not
# litter the repo root
os.environ.setdefault('KERASLM_CKPT_DIR',
                      tempfile.mkdtemp(prefix='keraslm_test_ckpt_'))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(1234)
