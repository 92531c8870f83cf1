"""Full train-state checkpoint/resume (SURVEY §5.4 TPU-native
extension): a run killed mid-epoch resumes from the last completed
epoch with params + Adam moments + RNG + history intact, and its loss
trajectory matches an uninterrupted run.

The reference can only continue from weight files (run.py:49-59),
losing the optimizer state and the early-stopping position.
"""
import random

import numpy as np
import pytest

import ocrd_keraslm_tpu.native as native
import ocrd_keraslm_tpu.training as training
from ocrd_keraslm_tpu.rater import Rater


@pytest.fixture()
def corpus(tmp_path):
    random.seed(7)
    words = ['die', 'der', 'und', 'ist', 'kant', 'vernunft', 'mensch']
    files = []
    for name in ['a_eins_1781.txt', 'b_zwei_1790.txt',
                 'c_drei_1800.txt']:
        path = tmp_path / name
        with open(path, 'w') as fh:
            for _ in range(60):
                fh.write(' '.join(random.choices(words, k=10)) + '\n')
        files.append(str(path))
    return files


def _train(files, tmp_path, epochs, resume_dir=None, tag='a'):
    """Seeded training run: identical seeds -> identical trajectories
    (the per-epoch data RNG and the stored jax key make a RESUMED run
    replay the interrupted epoch exactly)."""
    old_epochs, old_floor = training.EPOCHS, training.MIN_STEPS_BEFORE_STOP
    training.EPOCHS = epochs
    training.MIN_STEPS_BEFORE_STOP = 10 ** 9  # no early stop here
    try:
        random.seed(11)
        np.random.seed(13)
        r = Rater()
        r.width, r.depth, r.length = 16, 1, 16
        r.batch_size = 32
        r.stateful = True
        r.train_streams = True
        r.ckpt_dir = str(tmp_path / ('ckpt_' + tag))
        if resume_dir:
            r.resume_dir = str(resume_dir)
        r.configure()
        r.train(files)
        return r
    finally:
        training.EPOCHS = old_epochs
        training.MIN_STEPS_BEFORE_STOP = old_floor


class _SimulatedKill(BaseException):
    """Raised mid-epoch to model an abrupt death: nothing after the
    last committed snapshot survives."""


def test_kill_resume_matches_uninterrupted(corpus, tmp_path,
                                           monkeypatch):
    # run A: uninterrupted, 4 epochs
    ra = _train(corpus, tmp_path, 4, tag='a')
    assert ra.status == 2
    hist_a = ra.history
    assert len(hist_a['loss']) == 4

    # run B: identical seeds, snapshots on, killed during epoch 3
    snap = tmp_path / 'snap'
    real_pref = native.Prefetcher

    class DyingPrefetcher:
        epochs = 0

        def __init__(self, gen):
            type(self).epochs += 1
            self.inner = real_pref(gen)

        def __iter__(self):
            for n, batch in enumerate(iter(self.inner)):
                # train and validation passes BOTH prefetch (one
                # instance each per epoch): instance 5 = epoch 3's
                # training pass
                if type(self).epochs == 5 and n == 2:
                    self.inner.close()
                    raise _SimulatedKill()
                yield batch

    monkeypatch.setattr(native, 'Prefetcher', DyingPrefetcher)
    with pytest.raises(_SimulatedKill):
        _train(corpus, tmp_path, 4, resume_dir=snap, tag='b')
    monkeypatch.setattr(native, 'Prefetcher', real_pref)

    # snapshots for epochs 1-2 were committed; epoch 3 died mid-way
    from ocrd_keraslm_tpu.utils.orbaxio import load_train_state
    st = load_train_state(str(snap))
    assert st is not None
    assert st['meta']['epoch_done'] == 2
    assert len(st['meta']['history']['loss']) == 2

    # run C: resume and complete -> trajectory == uninterrupted run
    rc = _train(corpus, tmp_path, 4, resume_dir=snap, tag='c')
    assert rc.status == 2
    assert len(rc.history['loss']) == 4
    for key in hist_a:
        np.testing.assert_allclose(
            rc.history[key], hist_a[key], rtol=1e-5,
            err_msg='resumed %s diverged from uninterrupted run' % key)
    # the resumed run must also have continued the optimizer state,
    # not restarted it: epochs 3-4 improve over epoch 2
    assert rc.history['loss'][3] < rc.history['loss'][1]


def test_resume_restores_best_and_patience(corpus, tmp_path):
    """Early-stopping bookkeeping (best_val/bad_epochs) survives the
    restart: a resumed run reports the globally best epoch."""
    snap = tmp_path / 'snap2'
    rb = _train(corpus, tmp_path, 2, resume_dir=snap, tag='d')
    assert rb.status == 2
    rc = _train(corpus, tmp_path, 4, resume_dir=snap, tag='e')
    assert rc.status == 2
    assert len(rc.history['val_loss']) == 4
    # best val tracks the minimum over ALL epochs including pre-restart
    assert min(rc.history['val_loss']) <= min(rb.history['val_loss'])


def test_mesh_resume_matches_uninterrupted(tmp_path):
    """Sharding-aware resume: a mesh (dp/tp) training run snapshots
    host-side state; the resumed run re-applies the mesh shardings
    (training.py shard_fn) and continues — the trajectory matches an
    uninterrupted mesh run."""
    import jax
    if len(jax.devices('cpu')) < 8:
        pytest.skip('needs 8 virtual CPU devices')
    from ocrd_keraslm_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    files = []
    for name in ('a_b_1800', 'c_d_1810'):
        p = tmp_path / (name + '.txt')
        p.write_text(''.join(
            'abcdefgh '[i] for i in rng.integers(0, 9, 4000)))
        files.append(str(p))

    def run(epochs, resume_dir=None, tag='m'):
        old = training.EPOCHS
        training.EPOCHS = epochs
        try:
            random.seed(21)
            np.random.seed(23)
            r = Rater()
            r.width, r.depth, r.length = 16, 2, 32
            r.stateful = True
            r.batch_size = 8
            r.mesh = make_mesh(8, model_parallel=2,
                               devices=jax.devices('cpu'))
            r.ckpt_dir = str(tmp_path / ('ck_' + tag))
            if resume_dir:
                r.resume_dir = str(resume_dir)
            r.configure()
            r.train(files)
            return r
        finally:
            training.EPOCHS = old

    ra = run(3, tag='a')
    assert ra.status == 2
    snap = tmp_path / 'snap_mesh'
    rb = run(2, resume_dir=snap, tag='b')   # epochs 1-2, snapshotted
    rc = run(3, resume_dir=snap, tag='c')   # resumes onto the mesh
    assert rc.status == 2
    assert len(rc.history['loss']) == 3
    for key in ra.history:
        np.testing.assert_allclose(
            rc.history[key], ra.history[key], rtol=1e-4,
            err_msg='mesh-resumed %s diverged' % key)


def test_resume_ignores_mismatched_topology(corpus, tmp_path):
    """A snapshot written by a different run configuration must be
    ignored (warn + fresh start), not crash with shape mismatches."""
    snap = tmp_path / 'snap3'
    rb = _train(corpus, tmp_path, 2, resume_dir=snap, tag='f')
    assert rb.status == 2
    # different width: the old snapshot cannot be continued
    old = training.EPOCHS
    training.EPOCHS = 1
    try:
        random.seed(11)
        np.random.seed(13)
        r = Rater()
        r.width, r.depth, r.length = 24, 1, 16  # width changed
        r.batch_size = 32
        r.stateful = True
        r.train_streams = True
        r.ckpt_dir = str(tmp_path / 'ckpt_f2')
        r.resume_dir = str(snap)
        r.configure()
        r.train(corpus)
    finally:
        training.EPOCHS = old
    assert r.status == 2
    assert len(r.history['loss']) == 1  # fresh run, not a continuation


def test_cross_topology_resume(tmp_path):
    """A snapshot written by a MESH run resumes on a single device
    (and matches the uninterrupted mesh trajectory): restore yields
    topology-free host numpy leaves (utils/orbaxio._restore_numpy),
    not the saver's sharding layout."""
    import jax
    if len(jax.devices('cpu')) < 8:
        pytest.skip('needs 8 virtual CPU devices')
    from ocrd_keraslm_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    files = []
    for name in ('a_b_1800', 'c_d_1810'):
        p = tmp_path / (name + '.txt')
        p.write_text(''.join(
            'abcdefgh '[i] for i in rng.integers(0, 9, 4000)))
        files.append(str(p))

    def run(epochs, mesh, resume_dir=None, tag='x'):
        old = training.EPOCHS
        training.EPOCHS = epochs
        try:
            random.seed(21)
            np.random.seed(23)
            r = Rater()
            r.width, r.depth, r.length = 16, 2, 32
            r.stateful = True
            r.batch_size = 8
            if mesh:
                r.mesh = make_mesh(8, model_parallel=2,
                                   devices=jax.devices('cpu'))
            r.ckpt_dir = str(tmp_path / ('ck_' + tag))
            if resume_dir:
                r.resume_dir = str(resume_dir)
            r.configure()
            r.train(files)
            return r
        finally:
            training.EPOCHS = old

    ra = run(3, mesh=True, tag='a')          # uninterrupted mesh run
    snap = tmp_path / 'snap_cross'
    run(2, mesh=True, resume_dir=snap, tag='b')   # snapshot epochs 1-2
    rc = run(3, mesh=False, resume_dir=snap, tag='c')  # resume, NO mesh
    assert rc.status == 2
    assert len(rc.history['loss']) == 3      # continued, not restarted
    for key in ra.history:
        np.testing.assert_allclose(
            rc.history[key], ra.history[key], rtol=1e-3,
            err_msg='cross-topology resumed %s diverged' % key)


def test_sigint_mid_epoch_keeps_last_completed_snapshot(
        corpus, tmp_path, monkeypatch):
    """A SIGINT that breaks the batch loop mid-epoch must NOT record
    the partial epoch as completed: resume would skip its unseen data
    (the contract is last-COMPLETED-epoch)."""
    from ocrd_keraslm_tpu.utils.orbaxio import load_train_state

    snap1 = tmp_path / 'snap_sig1'
    _train(corpus, tmp_path, 1, resume_dir=snap1, tag='s1')
    st1 = load_train_state(str(snap1))
    steps_epoch = int(st1['meta']['steps_done'])
    assert st1['meta']['epoch_done'] == 1
    assert steps_epoch > 4

    counter = {'n': 0}
    real_step = training.train_step

    def counting_step(*a, **k):
        counter['n'] += 1
        return real_step(*a, **k)

    class FakeStop:
        """Flips 'received' two steps into epoch 2."""

        def __init__(self, *a, **k):
            pass

        @property
        def received(self):
            return counter['n'] >= steps_epoch + 2

        def restore(self):
            pass

    monkeypatch.setattr(training, 'train_step', counting_step)
    monkeypatch.setattr(training, 'StopSignal', FakeStop)
    snap2 = tmp_path / 'snap_sig2'
    _train(corpus, tmp_path, 4, resume_dir=snap2, tag='s2')
    st2 = load_train_state(str(snap2))
    assert st2['meta']['epoch_done'] == 1, \
        'partial epoch 2 recorded as completed'


def test_snapshot_commit_failure_surfaces(tmp_path):
    """A failed async snapshot commit (disk full, permissions) must
    raise at the next synchronization point, not die silently with
    the daemon thread."""
    from ocrd_keraslm_tpu.utils.orbaxio import (TrainCheckpointer,
                                                load_train_state)

    ck = TrainCheckpointer(str(tmp_path / 'snap'))
    ck.save(1, {'x': np.zeros(3, np.float32)}, {'epoch_done': 1})
    ck.finalize()

    # drive the commit path against a rename that cannot succeed (the
    # same failure mode as disk-full/permissions at commit time)
    ck._wait_and_commit(str(tmp_path / 'snap' / 'missing.tmp'),
                        str(tmp_path / 'snap' / 'ep_0002'))
    with pytest.raises(RuntimeError, match='snapshot commit failed'):
        ck.finalize()
    # a second finalize does not re-raise; the committed snapshot
    # remains the loadable one
    ck.finalize()
    st = load_train_state(str(tmp_path / 'snap'))
    assert st['meta']['epoch_done'] == 1
