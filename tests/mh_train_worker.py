"""Worker script for tests/test_multihost.py: one process of a
2-process CPU cluster running a sharded train step on the global
mesh.  Prints the loss for cross-process agreement checks."""
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

    from ocrd_keraslm_tpu.parallel.multihost import (global_batch,
                                                     init_multihost,
                                                     make_global_mesh)
    init_multihost(coordinator='127.0.0.1:' + port,
                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    import jax.numpy as jnp
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.parallel.train import make_sharded_train_step
    from ocrd_keraslm_tpu.training import make_optimizer

    mesh = make_global_mesh(model_parallel=2)
    cfg = LMConfig(width=16, depth=2, length=8, voc_size=32)
    params = init_params(cfg, jax.random.PRNGKey(0))  # same seed
    opt = make_optimizer()
    opt_state = opt.init(params)
    step, shard_fn, jit_step = make_sharded_train_step(mesh, cfg,
                                                       optimizer=opt)
    params, opt_state, _ = shard_fn(params, opt_state)
    train_step = jit_step(params, opt_state, n_contexts=1,
                          stateful_targets=True)

    # per-process LOCAL batch rows (data axis = 4 total, 2 per proc)
    rng = np.random.default_rng(7 + pid)
    Bl, T = 2, 8
    D, W = cfg.depth, cfg.width
    x = rng.integers(1, 32, (Bl, T)).astype(np.int32)
    y = rng.integers(1, 32, (Bl, T)).astype(np.int32)
    mask = np.ones((Bl, T), np.float32)
    zs = [np.zeros((Bl,), np.int32)]
    carry = (np.zeros((D, Bl, W), np.float32),
             np.zeros((D, Bl, W), np.float32))
    xg, zsg, yg, maskg, carryg = global_batch(mesh, x, zs, y, mask,
                                              carry)
    key = jax.random.PRNGKey(3)
    params, opt_state, carry2, loss, nll, acc = train_step(
        params, opt_state, xg, zsg, yg, maskg, carryg, key)
    print('MHLOSS %.6f %.6f' % (float(loss), float(nll)), flush=True)

    # checkpoint save with mp=2 (vocab-sharded embedding): EVERY
    # process must call save_weights — its device->host gather is a
    # collective (process_allgather); the file write inside is gated
    # to process 0.  Gating the whole call on is_main deadlocked here
    # (ADVICE r4 high): process 0 entered the collective alone.
    save_path = os.environ.get('KERASLM_MH_SAVE')
    if save_path:
        from ocrd_keraslm_tpu.utils import h5io
        h5io.save_weights(save_path, params, cfg)
        # all processes reach this line only if no one deadlocked
        print('MHSAVED %d' % jax.process_index(), flush=True)


if __name__ == '__main__':
    main()
