"""Multi-host (multi-process) training: two REAL processes, 4 virtual
CPU devices each, form an 8-device global (data=4, model=2) mesh and
run one sharded train step — the gradient all-reduce crosses the
process boundary (Gloo CPU backend standing in for DCN)."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


# failure signatures of the ENVIRONMENT (port TOCTOU races against
# concurrent processes, coordination timeouts on loaded hosts) — the
# test retries these with a fresh port; anything else fails outright
_ENV_FLAKE = ('Address already in use', 'DEADLINE_EXCEEDED',
              'Failed to connect', 'UNAVAILABLE',
              'barrier timed out', 'Connection refused')


def _run_two_process(worker_name):
    """Spawn the 2-process worker script, retrying environment flakes
    with a fresh port; return both processes' stdout."""
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, worker_name)
    repo = os.path.dirname(here)
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    outs = []
    for attempt in range(3):
        port = str(_free_port())
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), '2', port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo) for pid in range(2)]
        outs = []
        failed = None
        for p in procs:
            try:
                out, _ = p.communicate(timeout=280)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                failed = failed or 'timeout:\n' + out[-2000:]
                continue
            outs.append(out)
            if p.returncode != 0:
                failed = failed or out[-2000:]
        if failed is not None:
            if attempt < 2 and any(sig in failed
                                   for sig in _ENV_FLAKE + ('timeout',)):
                continue  # fresh port, try again
            raise AssertionError(failed)
        break
    return outs


def test_two_process_sharded_train_step():
    outs = _run_two_process('mh_train_worker.py')
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith('MHLOSS ')]
        assert lines, out[-2000:]
        losses.append(tuple(float(v) for v in lines[0].split()[1:]))
    # both controllers must agree bit-for-bit on the reduced loss
    assert losses[0] == losses[1], losses


def test_two_process_mp2_checkpoint_save(tmp_path, monkeypatch):
    """Checkpoint save with model-parallel (mp=2, vocab-sharded
    embedding) params on a 2-process mesh: the h5 writer's
    device->host gather is a collective every process must enter
    (ADVICE r4 high: gating the whole save on process 0 deadlocked at
    the first checkpoint).  Both processes must pass the save point,
    and the file process 0 wrote must round-trip."""
    save_path = str(tmp_path / 'mh_ckpt.h5')
    monkeypatch.setenv('KERASLM_MH_SAVE', save_path)
    outs = _run_two_process('mh_train_worker.py')
    saved = sorted(int(ln.split()[1]) for out in outs
                   for ln in out.splitlines()
                   if ln.startswith('MHSAVED '))
    assert saved == [0, 1], outs[0][-1500:]
    assert os.path.exists(save_path)
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig
    from ocrd_keraslm_tpu.utils import h5io
    cfg = LMConfig(width=16, depth=2, length=8, voc_size=32)
    params = h5io.load_weights(save_path, cfg)
    assert params['char_embedding'].shape == (32, 16)
    assert len(params['lstm']) == 2


def test_two_process_sharded_batch_decode():
    """Data-axis sharded batch decode across a REAL process boundary
    (the serving surface; the train test above covers training): each
    process decodes its own documents' shards of one global dispatch
    and pins them bit-for-bit against an unsharded local decode
    (asserted inside mh_decode_worker.py).  Note on mesh composition:
    like the model axis, a ``pipe`` axis must stay INSIDE one process
    (make_global_mesh lays axes data-major across hosts); only the
    data axis crosses processes."""
    outs = _run_two_process('mh_decode_worker.py')
    oks = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith('MHDECODE ')]
        assert lines, out[-2000:]
        oks.append(lines[0].split())
    # both processes finished their parity assertion, on DIFFERENT
    # documents (distinct digests — a same-digest pass would mean the
    # processes decoded the same rows, i.e. the sharding was fake)
    assert {ok[1] for ok in oks} == {'0', '1'}, oks
    assert oks[0][3] != oks[1][3], oks


def test_two_process_pipeline_train_step():
    """The (data, pipe) mesh COMPOSES across processes: data axis over
    the process boundary, pipe stages inside each process (the same
    intra-host rule as the model axis).  Both controllers must agree
    bit-for-bit on the loss, and worker 0 additionally pins the
    pipeline loss against a single-chip train_step over the assembled
    global batch (asserted inside mh_pipe_worker.py).  The CLI still
    keeps pipeline meshes single-host (its batch feed is host-local);
    this covers the step-level composition the parallel API exposes."""
    outs = _run_two_process('mh_pipe_worker.py')
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith('MHPIPE ')]
        assert lines, out[-2000:]
        losses.append(tuple(lines[0].split()[2:]))
    assert losses[0] == losses[1], losses


def test_init_multihost_rejects_partial_config(monkeypatch):
    """Both halves of a partial explicit configuration must be refused
    up front with a clear message — not forwarded into
    jax.distributed.initialize where they surface as a generic
    detection failure or a hang."""
    import jax

    from ocrd_keraslm_tpu.parallel.multihost import init_multihost
    if jax.distributed.is_initialized():
        pytest.skip('process already in a group')
    for var in ('KERASLM_COORDINATOR', 'KERASLM_NUM_PROCESSES',
                'KERASLM_PROCESS_ID'):
        monkeypatch.delenv(var, raising=False)
    # count/id without a coordinator
    with pytest.raises(ValueError, match='KERASLM_COORDINATOR is not'):
        init_multihost(num_processes=2, process_id=0)
    # coordinator without count/id
    with pytest.raises(ValueError, match='needs both'):
        init_multihost(coordinator='127.0.0.1:9999')
    monkeypatch.setenv('KERASLM_COORDINATOR', '127.0.0.1:9999')
    monkeypatch.setenv('KERASLM_NUM_PROCESSES', '2')
    with pytest.raises(ValueError, match='needs both'):
        init_multihost()


def test_two_process_cli_train(tmp_path):
    """END-TO-END CLI multihost training (keraslm-rate train --mesh
    over 2 real processes): previously init_multihost() ran only at
    --mesh handling time — AFTER Rater() had initialised the XLA
    backend — so the CLI multihost path crashed on arrival (round-4
    fix: the process group joins in the cli() group callback).  Both
    controllers must finish with bit-identical val_loss and write
    identical model weights; the loop feeds each process its own
    batch-row shard (training.py mh_shard) and validates through the
    sharded eval step."""
    import re

    import h5py
    import numpy as np

    corpus = tmp_path / 'corpus'
    corpus.mkdir()
    rng = np.random.default_rng(5)
    for name in ('a_b_1800', 'c_d_1810'):
        (corpus / (name + '.txt')).write_text(''.join(
            'abcde '[i] for i in rng.integers(0, 6, 1200)))
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    base_env = {k: v for k, v in os.environ.items()
                if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    base_env.update({
        'PYTHONPATH': repo,
        'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
        'KERASLM_PLATFORM': 'cpu',
        'KERASLM_CKPT_DIR': str(tmp_path / 'ckpt'),
        'KERASLM_NUM_PROCESSES': '2',
    })
    # the REAL pod shape: every worker runs the identical command
    # line, so both share one -m path — only process 0 may write it
    model = str(tmp_path / 'model.h5')
    outs = []
    for attempt in range(3):
        port = str(_free_port())
        procs = []
        for pid in range(2):
            env = dict(base_env)
            env['KERASLM_COORDINATOR'] = '127.0.0.1:' + port
            env['KERASLM_PROCESS_ID'] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, '-m',
                 'ocrd_keraslm_tpu.scripts.run', 'train',
                 '-m', model, '-w', '16', '-d', '1',
                 '-l', '16', '-e', '2', '--mesh', '4x1',
                 str(corpus)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=repo))
        outs = []
        failed = None
        for p in procs:
            try:
                out, _ = p.communicate(timeout=280)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                failed = failed or 'timeout:\n' + out[-2000:]
                continue
            outs.append(out)
            if p.returncode != 0:
                failed = failed or out[-2000:]
        if failed is not None:
            if attempt < 2 and any(sig in failed
                                   for sig in _ENV_FLAKE + ('timeout',)):
                continue
            raise AssertionError(failed)
        break
    finals = []
    for out in outs:
        m = re.search(r'training finished with val_loss ([\d.]+)',
                      out)
        assert m, out[-2000:]
        finals.append(m.group(1))
    assert finals[0] == finals[1], finals
    # process 0 wrote the (single) shared model file with finite
    # weights; the identical val_loss above pins that both
    # controllers trained the same model
    with h5py.File(model) as f0:
        k = f0['lstm_1']['lstm_1/kernel:0'][()]
        assert np.all(np.isfinite(k)) and k.shape == (16 + 10, 64)
