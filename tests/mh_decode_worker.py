"""Worker script for tests/test_multihost.py: one process of a
2-process CPU cluster running the data-axis sharded batch DECODE
(the serving surface, VERDICT r3 #6) on the global mesh.

Same local-shard pattern as the train worker: each process builds
arrays only for ITS OWN documents, assembles the global batch with
``jax.make_array_from_process_local_data``, decodes in one sharded
dispatch, fetches its local output shards, and pins them bit-for-bit
against an UNSHARDED local decode of the same documents.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ['XLA_FLAGS'] = \
        '--xla_force_host_platform_device_count=4'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ocrd_keraslm_tpu.parallel.multihost import (init_multihost,
                                                     make_global_mesh)
    init_multihost(coordinator='127.0.0.1:' + port,
                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.parallel.decode import make_batch_decode
    from ocrd_keraslm_tpu.parallel.mesh import DATA_AXIS

    mesh = make_global_mesh(model_parallel=1)
    n_data = int(mesh.shape[DATA_AXIS])
    cfg = LMConfig(width=16, depth=1, length=8, voc_size=32)
    params = init_params(cfg, jax.random.PRNGKey(0))  # same seed
    D, W, K = cfg.depth, cfg.width, 8
    E, A, L = 16, 4, 1
    n_local = n_data // nproc  # docs owned by this process

    def doc_arrays(seed):
        rng = np.random.default_rng(seed)
        chars = rng.integers(1, 32, (E, A, L)).astype(np.int32)
        mask = np.ones((E, A, L), np.float32)
        conf = rng.uniform(0.5, 1.0, (E, A, L)).astype(np.float32)
        valid = np.ones((E, A), np.float32)
        return chars, mask, conf, valid

    # global doc index = data-major mesh position: process p owns
    # docs [p*n_local, (p+1)*n_local)
    docs = [doc_arrays(1000 + pid * n_local + j)
            for j in range(n_local)]
    chars = np.stack([d[0] for d in docs])
    mask = np.stack([d[1] for d in docs])
    conf = np.stack([d[2] for d in docs])
    valid = np.stack([d[3] for d in docs])
    h0 = np.zeros((n_local, D, K, W), np.float32)
    c0 = np.zeros((n_local, D, K, W), np.float32)
    x0 = np.full((n_local, K), 1, np.int32)
    cost0 = np.full((n_local, K), 3.0e38, np.float32)
    cost0[:, 0] = 0.0
    zs = (np.zeros((1,), np.int32),)

    d1 = NamedSharding(mesh, P(DATA_AXIS))

    def g(local):
        local = np.asarray(local)
        global_shape = (local.shape[0] * nproc,) + local.shape[1:]
        return jax.make_array_from_process_local_data(
            d1, local, global_shape)

    fn = make_batch_decode(cfg, E, A, L, K, 0.5, mesh)
    packed = fn(params, g(chars), g(mask), g(conf), g(valid), zs,
                g(h0), g(c0), g(x0), g(cost0))
    # fetch THIS process's local shards (global fetch would require
    # fully-addressable output); rows arrive in local-device order =
    # this process's doc order
    local_rows = sorted(
        ((s.index[0].start, np.asarray(s.data))
         for s in packed.addressable_shards), key=lambda t: t[0])
    got = np.concatenate([r for _, r in local_rows], axis=0)
    assert got.shape[0] == n_local, got.shape

    # unsharded local reference: same docs through the plain vmapped
    # jit (mesh=None) on this process's own devices
    ref_fn = make_batch_decode(cfg, E, A, L, K, 0.5, None)
    ref = np.asarray(ref_fn(params, chars, mask, conf, valid, zs,
                            h0, c0, x0, cost0))
    np.testing.assert_array_equal(got, ref)
    # cross-process agreement line: digest of the LOCAL results (the
    # driver asserts both processes printed OK with distinct digests)
    import hashlib
    print('MHDECODE %d OK %s'
          % (pid, hashlib.sha256(got.tobytes()).hexdigest()[:16]),
          flush=True)


if __name__ == '__main__':
    main()
