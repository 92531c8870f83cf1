"""Worker script for tests/test_multihost.py: one process of a
2-process CPU cluster running the GPipe pipeline train step on a
(data, pipe) mesh whose DATA axis crosses the process boundary and
whose PIPE axis stays inside each process (the layout rule
parallel/multihost.py documents for the model axis applies to pipe
identically).

Each process contributes its own local batch rows; worker 0 also
recomputes the SAME global step on a single local device (both
processes' rows are derivable from the seeds) and asserts the
pipeline loss matches the plain train_step — so the test pins
cross-process agreement AND single-chip parity in one run.
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

    from ocrd_keraslm_tpu.parallel.multihost import init_multihost
    init_multihost(coordinator='127.0.0.1:' + port,
                   num_processes=nproc, process_id=pid)

    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ocrd_keraslm_tpu.models.lstm_lm import (LMConfig, init_params,
                                                 zero_carry)
    from ocrd_keraslm_tpu.parallel.mesh import DATA_AXIS
    from ocrd_keraslm_tpu.parallel.pipeline import (
        PIPE_AXIS, make_pipeline_train_step_canonical)
    from ocrd_keraslm_tpu.training import make_optimizer, train_step

    # data axis across the processes, pipe axis = the local devices
    # (jax.devices() is process-major, so this reshape keeps every
    # pipe group inside one process)
    grid = np.asarray(jax.devices()).reshape(nproc, 4)
    mesh = Mesh(grid, (DATA_AXIS, PIPE_AXIS))
    cfg = LMConfig(width=16, depth=4, length=8, voc_size=12,
                   dropout=0.0)
    params = init_params(cfg, jax.random.PRNGKey(0))  # same seed
    opt = make_optimizer()
    opt_state = opt.init(params)
    _, shard_fn, jit_step = make_pipeline_train_step_canonical(
        mesh, cfg, n_micro=4, optimizer=opt)
    p, o, _ = shard_fn(params, opt_state)
    stepf = jit_step(p, o, n_contexts=1, stateful_targets=True)

    def local_rows(proc):
        rng = np.random.default_rng(7 + proc)
        Bl, T = 4, 8
        x = rng.integers(1, 12, (Bl, T)).astype(np.int32)
        y = rng.integers(1, 12, (Bl, T)).astype(np.int32)
        return x, y

    x, y = local_rows(pid)
    Bl, T = x.shape
    mask = np.ones((Bl, T), np.float32)
    zs = (np.zeros((Bl,), np.int32),)
    carry = (np.zeros((cfg.depth, Bl, cfg.width), np.float32),
             np.zeros((cfg.depth, Bl, cfg.width), np.float32))
    bs = NamedSharding(mesh, P(DATA_AXIS, None))
    zsh = NamedSharding(mesh, P(DATA_AXIS))
    cs = NamedSharding(mesh, P(None, DATA_AXIS, None))

    def g(local, sh):
        local = np.asarray(local)
        i = next((k for k, s in enumerate(sh.spec)
                  if s == DATA_AXIS), 0)
        gs = tuple(d * nproc if k == i else d
                   for k, d in enumerate(local.shape))
        return jax.make_array_from_process_local_data(sh, local, gs)

    key = jax.random.PRNGKey(3)
    p, o, c2, loss, nll, acc = stepf(
        p, o, g(x, bs), (g(zs[0], zsh),), g(y, bs), g(mask, bs),
        (g(carry[0], cs), g(carry[1], cs)), key)
    loss, nll = float(loss), float(nll)

    if pid == 0:
        # single-chip reference over the ASSEMBLED global batch
        xg = np.concatenate([local_rows(i)[0] for i in range(nproc)])
        yg = np.concatenate([local_rows(i)[1] for i in range(nproc)])
        B = xg.shape[0]
        maskg = np.ones((B, T), np.float32)
        zsg = (jnp.zeros((B,), jnp.int32),)
        cg = zero_carry(cfg, B)
        _, _, _, ref_loss, ref_nll, _ = train_step(
            init_params(cfg, jax.random.PRNGKey(0)), opt.init(params),
            cfg, jnp.asarray(xg), zsg, jnp.asarray(yg),
            jnp.asarray(maskg), cg, key)
        assert abs(loss - float(ref_loss)) < 1e-4, \
            (loss, float(ref_loss))
        assert abs(nll - float(ref_nll)) < 1e-4, (nll, float(ref_nll))
    print('MHPIPE %d %.6f %.6f' % (pid, loss, nll), flush=True)


if __name__ == '__main__':
    main()
