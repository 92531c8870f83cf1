"""Training loop: jitted update step + host-side control.

Capability-equivalent to the reference's ``Rater.train`` +
``lib/callbacks.py`` (/root/reference/ocrd_keraslm/lib/rating.py:248-310,
callbacks.py:6-69): up to 100 epochs with early stopping (patience 3,
restore best weights), best-only weight checkpointing
(``ckpt.{epoch:02d}-{val_loss:.2f}.h5``), NaN termination with best-
weight recovery, graceful SIGINT stop (second SIGINT exits), huge-loss
warnings, and stateful carry resets at file boundaries and before
validation.

TPU-first: one jitted, donated train step serves the entire run (static
batch shapes via masking, see data.py); the optimizer is
optax ``clip(1.0) + adam`` matching Keras ``Adam(clipvalue=1.0)``
(rating.py:178); the train-phase-only embedding regularizers are added
inside the loss so evaluation loss stays pure cross-entropy
(perplexity-interpretable, rating.py:218-220,244-246).
"""
from __future__ import annotations

import logging
import os
import signal
import sys
from functools import partial
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .data import (gen_stateful_parity, gen_stateful_streams,
                   gen_stateless, split_data)
from .models.lstm_lm import (LMConfig, forward_seq, regularization_loss,
                             sequence_xent, zero_carry)

LOG = logging.getLogger(__name__)

EPOCHS = 100
PATIENCE = 3
# early stopping is not armed before this many optimizer steps: the
# reference's batch_size=1 stateful layout takes thousands of steps
# per epoch, so its 3-epoch patience never fires during the initial
# low-init-embedding plateau (~100-300 steps) — the TPU parallel-
# streams layout compresses an epoch to tens of steps, and epoch-based
# patience alone would stop during the plateau
MIN_STEPS_BEFORE_STOP = 500


def make_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """Adam with elementwise gradient clipping at 1.0 (Keras
    ``Adam(clipvalue=1.0)`` parity; Keras 2.3 epsilon default 1e-7)."""
    return optax.chain(
        optax.clip(1.0),
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7),
    )


def _loss_fn(params, cfg: LMConfig, x, zs, y, mask, carry, rng,
             train: bool, x_mask=None, use_pallas=False):
    logits, carry = forward_seq(params, cfg, x, list(zs), carry,
                                train=train, rng=rng, x_mask=x_mask,
                                use_pallas=use_pallas)
    if y.ndim == 1:  # stateless windowed: predict only the next char
        logits = logits[:, -1, :]
    nll, acc = sequence_xent(logits, y, mask)
    loss = nll
    if train:
        loss = loss + regularization_loss(params)
    return loss, (nll, acc, carry)


_OPT = make_optimizer()


@partial(jax.jit, static_argnames=('cfg', 'use_pallas'),
         donate_argnums=(0, 1, 7))
def train_step(params, opt_state, cfg: LMConfig, x, zs, y, mask, carry,
               rng, x_mask=None, use_pallas=False):
    # the optimizer transform _OPT is closed over (optax transforms are
    # not hashable for static jit args).  use_pallas routes the LSTM
    # recurrence through the Pallas forward + BACKWARD kernels
    # (ops/lstm_cell.py) — the gradient pass measured 7.0 -> 3.9 ms on
    # the B=128 T=256 flagship step; the jnp scan is the CPU/parity
    # path
    (loss, (nll, acc, carry)), grads = jax.value_and_grad(
        _loss_fn, has_aux=True)(params, cfg, x, zs, y, mask, carry, rng,
                                True, x_mask, use_pallas)
    updates, opt_state = _OPT.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, carry, loss, nll, acc


@partial(jax.jit, static_argnames=('cfg', 'use_pallas'))
def eval_step(params, cfg: LMConfig, x, zs, y, mask, carry,
              x_mask=None, use_pallas=False):
    # use_pallas: same fused-recurrence gate as train_step — the
    # validation pass runs every epoch and should not pay the scan
    # dispatch cost the kernel exists to avoid (forward-only here)
    _, (nll, acc, carry) = _loss_fn(params, cfg, x, zs, y, mask, carry,
                                    None, False, x_mask, use_pallas)
    return nll, acc, carry


class StopSignal:
    """Graceful SIGINT stop: first signal finishes the batch and stops
    training; a second one exits immediately (reference
    callbacks.py:6-34)."""

    def __init__(self, sig=signal.SIGINT, logger=None):
        self.received = False
        self.sig = sig
        self.logger = logger or LOG
        try:
            self.prev = signal.signal(sig, self._handler)
        except ValueError:  # not in main thread
            self.prev = None

    def _handler(self, sig, _frame):
        if self.received:
            self.logger.critical('interrupting')
            sys.exit(0)
        self.logger.critical('stopping training')
        self.received = True

    def restore(self):
        if self.prev is not None:
            signal.signal(self.sig, self.prev)


def train_rater(rater, data, val_data=None) -> None:
    """Train ``rater`` on text files (handles or paths)."""
    assert rater.status > 0
    assert rater.incremental is False
    if jax.process_count() > 1:
        # multihost: the file split, window split, dropout keys and
        # augmentation draws ALL flow (directly or via seeds drawn
        # below) from the np.random GLOBAL — every process must make
        # identical draws (each then feeds only its own batch-row
        # shard), so align the global RNG to process 0's seed up front
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(np.array(
            np.random.randint(0, 2 ** 31 - 1), np.int64)))
        np.random.seed(seed)

    # handles without a re-openable path (StringIO, pipes, stdin)
    # spool to temp files: the generators re-read inputs by name every
    # epoch, so keeping the handle would silently train on nothing
    # after the first read
    spooled: List[str] = []

    def as_path(f):
        name = getattr(f, 'name', None)
        if hasattr(f, 'read') and not (isinstance(name, str)
                                       and os.path.isfile(name)):
            import tempfile
            tmp = tempfile.NamedTemporaryFile(
                'w', suffix='.txt', delete=False, encoding='utf-8')
            tmp.write(f.read())
            tmp.close()
            spooled.append(tmp.name)
            return tmp.name
        return name if hasattr(f, 'read') else f

    files = [as_path(f) for f in data]
    val_files = [as_path(f) for f in val_data] if val_data else None
    try:
        _train_rater(rater, files, val_files)
    finally:
        for name in spooled:
            try:
                os.unlink(name)
            except OSError:
                pass


def _train_rater(rater, files, val_files) -> None:

    # ---- full train-state resume (SURVEY §5.4, TPU-native) ----
    # With rater.resume_dir (or KERASLM_RESUME_DIR) set, every epoch
    # boundary snapshots params + optimizer moments + RNG + history +
    # the data split into an Orbax-backed atomic snapshot dir, and a
    # killed run resumes exactly from the last completed epoch — the
    # reference can only resume from weights (run.py:49-59), losing
    # the Adam state and the early-stopping position.
    resume_dir = (getattr(rater, 'resume_dir', None)
                  or os.environ.get('KERASLM_RESUME_DIR'))
    resume = None
    ckpt_mgr = None
    if resume_dir and jax.process_count() > 1:
        # every process would rmtree/write/rename the SAME snapshot
        # directory concurrently (torn snapshots, ENOTEMPTY races),
        # and device_get of model-sharded state would fetch
        # non-addressable shards — refuse clearly instead
        raise ValueError(
            'resume_dir under multihost training is not supported: '
            'snapshot/restore is single-controller.  Run without '
            '--resume-dir (epoch h5 checkpoints still write from '
            'process 0) or train single-host.')
    if resume_dir:
        from .utils import orbaxio
        resume = orbaxio.load_train_state(resume_dir)
        ckpt_mgr = orbaxio.TrainCheckpointer(resume_dir)
        if resume is not None:
            # a snapshot from a DIFFERENT run configuration cannot be
            # continued (params/opt shapes and the data layout would
            # mismatch): warn and start fresh, same spirit as the
            # reference's topology check for -m continuation
            topo = resume['meta'].get('topology') or {}
            want = {'width': rater.width, 'depth': rater.depth,
                    'length': rater.length,
                    'stateful': bool(rater.stateful),
                    'train_streams': bool(rater.train_streams),
                    'batch_size': rater.batch_size,
                    # these also determine param shapes / data layout
                    # (a contexts mismatch would crash embed_inputs; a
                    # variable_length flip changes the windowing the
                    # pinned window_split was computed for)
                    'contexts': [list(c) for c in rater.contexts],
                    'variable_length': bool(rater.variable_length)}
            if topo and topo != want:
                rater.logger.warning(
                    'ignoring train-state snapshot in %s: it was '
                    'written by a different configuration (%s vs %s)',
                    resume_dir, topo, want)
                resume = None

    if resume is not None:
        # the snapshot pins the split, the vocabulary, and all state —
        # skip split_data entirely: its full corpus read (charset +
        # lengths + shuffle) would be discarded anyway, doubling
        # resume startup on large corpora for nothing
        from .data import SplitPlan
        meta = resume['meta']
        from .utils.vocab import Vocab
        rater.vocab = Vocab.from_codepoints(
            np.asarray(meta['mapping'], dtype=np.uint32))
        plan = SplitPlan(
            training_files=list(meta['training_files']),
            validation_files=list(meta['validation_files']),
            window_split=(np.asarray(meta['window_split'])
                          if meta.get('window_split') is not None
                          else None),
            total_chars=0,
            step=rater.length if rater.stateful else 3,
            charset=[])
        rater.logger.info('resuming training from %s (epoch %d)',
                          resume_dir, meta['epoch_done'] + 1)
    else:
        plan = split_data(
            files, stateful=rater.stateful, length=rater.length,
            validation_split=rater.validation_split,
            val_files=val_files,
            known_chars=set(rater.vocab.c2i.keys()))
        rater.logger.info(
            'training on %d files / %d character tokens for '
            '%d character types',
            len(plan.training_files), plan.total_chars,
            len(plan.charset) + 1)
        # grow vocabulary (index 0 reserved):
        old_chars = [rater.vocab.i2c[i]
                     for i in sorted(rater.vocab.i2c.keys())]
        if old_chars:
            rater.vocab.grow(plan.charset)
        else:
            rater.vocab.assign(plan.charset)
    rater.voc_size = rater.vocab.size
    rater.reconfigure_for_mapping()
    cfg = rater.cfg
    params = rater.params

    opt_state = _OPT.init(params)
    rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
    # data-stream RNG: seeded per epoch so a resumed epoch replays the
    # exact augmentation draws of an uninterrupted run
    data_seed = int(np.random.randint(0, 2 ** 31 - 1))
    # (multihost: rng/data_seed are already identical across
    # processes — train_rater aligned the np.random global up front)
    if resume is not None:
        state = resume['state']
        params = state['params']
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(_OPT.init(params)),
            state['opt'])
        rng = jnp.asarray(np.asarray(meta['rng'], dtype=np.uint32))
        data_seed = int(meta['data_seed'])
        rater.params = params
    stopper = StopSignal(logger=rater.logger)

    # ---- multi-chip: pjit the step over rater.mesh (dp/tp) ----
    # New capability vs the single-process reference (SURVEY §5.8).
    # Set ``rater.mesh = parallel.make_mesh()`` to shard batch+carry on
    # the data axis and the tied embedding on the model axis; XLA
    # inserts the gradient all-reduce over ICI.
    mesh = getattr(rater, 'mesh', None)
    batch_dim_pre = (1 if (rater.stateful and not rater.train_streams)
                     else rater.batch_size)
    sharded_step = None
    sharded_step_masked = None
    if mesh is not None:
        n_data = mesh.shape.get('data', 1)
        if batch_dim_pre % n_data != 0:
            raise ValueError(
                'batch_size %d not divisible by mesh data axis %d'
                % (batch_dim_pre, n_data))
        if 'pipe' in mesh.axis_names:
            # depth-staged GPipe pipeline (parallel/pipeline.py) on
            # the canonical param/carry layout, so validation,
            # checkpointing and resume below stay unchanged
            from .parallel.pipeline import \
                make_pipeline_train_step_canonical
            if not (rater.stateful and rater.train_streams):
                raise ValueError(
                    'pipeline training requires the stateful '
                    'parallel-streams layout (stateful=True, '
                    'train_streams=True); stateless windowed and '
                    'parity layouts use a dp/tp mesh')
            n_stages = int(mesh.shape['pipe'])
            b_loc = batch_dim_pre // n_data
            n_micro = int(getattr(rater, 'pipe_microbatches', 0) or
                          n_stages)
            if b_loc % n_micro != 0:
                raise ValueError(
                    'per-device batch %d not divisible by %d pipeline '
                    'microbatches (set rater.pipe_microbatches or '
                    'adjust batch_size)' % (b_loc, n_micro))
            _, shard_fn, jit_step = make_pipeline_train_step_canonical(
                mesh, cfg, n_micro=n_micro)
        else:
            from .parallel.train import make_sharded_train_step
            _, shard_fn, jit_step = make_sharded_train_step(mesh, cfg)
        params, opt_state, _ = shard_fn(params, opt_state)
        # stateful streams train on (B, T) targets; stateless windowed
        # predicts a single next char -> (B,) targets (data.py)
        var_len = bool(rater.variable_length and not rater.stateful)
        sharded_step = jit_step(params, opt_state,
                                len(rater.contexts), rater.stateful,
                                variable_length=var_len)
        if var_len or rater.stateful:
            sharded_step_masked = sharded_step if var_len else None
        else:
            # fixed-length stateless batches carry an x_mask only when
            # they hold partial (left-padded) windows near a file
            # start (data.py gen_stateless); those dispatch to this
            # masked variant of the step (jit compiles it lazily on
            # first use — many runs never see one)
            sharded_step_masked = jit_step(params, opt_state,
                                           len(rater.contexts),
                                           rater.stateful,
                                           variable_length=True)
        rater.logger.info('training over mesh %s', dict(mesh.shape))

    # ---- multihost: host-local batches -> globally-sharded arrays ----
    # Every process draws the SAME full batches (seeds aligned in
    # train_rater); each feeds only its own row shard of the global
    # array.  Validation runs through a sharded eval step — the
    # single-chip eval_step cannot mix host-local numpy with
    # globally-sharded params.
    mh_shard = mh_carry = None
    sharded_eval = sharded_eval_masked = None
    is_main = jax.process_index() == 0
    if mesh is not None and jax.process_count() > 1:
        if 'pipe' in mesh.axis_names:
            # the (data, pipe) composition is verified at the STEP
            # level across processes (tests/mh_pipe_worker.py), but
            # this loop's eval/batch shardings target dp/tp meshes —
            # refuse clearly instead of crashing in param_shardings
            raise ValueError(
                'multihost pipeline training is not wired into the '
                'training loop (the (data, pipe) step itself '
                'composes across processes — see '
                'tests/mh_pipe_worker.py); use a dp/tp mesh for '
                'multihost training')
        from .parallel.mesh import (batch_shardings as _mh_bsh,
                                    carry_sharding as _mh_csh)
        from .parallel.train import make_sharded_eval_step
        nproc = jax.process_count()
        pid = jax.process_index()
        stateful_targets = bool(rater.stateful)
        bx_sh, bzs_sh, by_sh, _ = _mh_bsh(mesh, len(rater.contexts),
                                          stateful_targets)
        c_sh = _mh_csh(mesh)

        # NOTE: every process builds the FULL batch (identical seeds)
        # and feeds only its row shard.  Deliberate tradeoff vs
        # per-process data pipelines: host-side text windowing is
        # cheap next to the train step, and identical streams keep
        # the validation split, early stopping and augmentation
        # bookkeeping bit-identical on every controller with no
        # extra collectives.
        def _mh_g(arr, sh, axis=0):
            arr = np.asarray(arr)
            n_loc = arr.shape[axis] // nproc
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(pid * n_loc, (pid + 1) * n_loc)
            return jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(arr[tuple(sl)]), arr.shape)

        def mh_shard(batch):
            x = _mh_g(batch.x, bx_sh)
            zs = tuple(_mh_g(z, s)
                       for z, s in zip(batch.zs, bzs_sh))
            y = _mh_g(batch.y, by_sh)
            m = _mh_g(batch.mask, by_sh)
            xm = (_mh_g(batch.x_mask, bx_sh)
                  if batch.x_mask is not None else None)
            return x, zs, y, m, xm

        def mh_carry(carry):
            # fresh host-side zero resets convert; carries already on
            # the mesh (step outputs) pass through
            if getattr(getattr(carry[0], 'sharding', None),
                       'mesh', None) == mesh:
                return carry
            return tuple(_mh_g(c, c_sh, axis=1) for c in carry)

        jit_eval = make_sharded_eval_step(mesh, cfg)
        var_len_eval = bool(rater.variable_length
                            and not rater.stateful)
        sharded_eval = jit_eval(params, len(rater.contexts),
                                stateful_targets,
                                variable_length=var_len_eval)
        if var_len_eval or rater.stateful:
            sharded_eval_masked = sharded_eval if var_len_eval \
                else None
        else:
            sharded_eval_masked = jit_eval(params,
                                           len(rater.contexts),
                                           stateful_targets,
                                           variable_length=True)

    def make_gen(file_list, train, data_rng=None):
        n_ctx = len(rater.contexts)
        if rater.stateful and rater.train_streams:
            return gen_stateful_streams(
                file_list, rater.vocab, length=rater.length,
                batch_size=rater.batch_size, n_contexts=n_ctx,
                train=train, rng=data_rng,
                char_degradation=rater.char_degradation,
                context_degradation=rater.context_degradation)
        if rater.stateful:
            return gen_stateful_parity(
                file_list, rater.vocab, length=rater.length,
                n_contexts=n_ctx, train=train, rng=data_rng,
                char_degradation=rater.char_degradation,
                context_degradation=rater.context_degradation)
        return gen_stateless(
            file_list, rater.vocab, length=rater.length,
            batch_size=rater.batch_size, step=plan.step, train=train,
            window_split=plan.window_split,
            validation_split=rater.validation_split,
            char_degradation=rater.char_degradation,
            context_degradation=rater.context_degradation,
            first_window=rater.first_window, n_contexts=n_ctx,
            variable_length=rater.variable_length, rng=data_rng)

    history: Dict[str, List[float]] = {
        'loss': [], 'accuracy': [], 'val_loss': [], 'val_accuracy': []}
    best_val = np.inf
    # None until the first improvement: aliasing the initial `params`
    # would keep a reference to buffers the first train_step DONATES
    # (donate_argnums=0) — snapshotting them later would device_get
    # deleted arrays
    best_params = None
    best_epoch = -1
    bad_epochs = 0
    nan_seen = False
    steps_done = 0
    start_epoch = 0
    if resume is not None:
        history = {k: list(v) for k, v in meta['history'].items()}
        best_val = (float(meta['best_val'])
                    if meta['best_val'] is not None else np.inf)
        best_params = resume['state'].get('best_params', params)
        best_epoch = int(meta['best_epoch'])
        bad_epochs = int(meta['bad_epochs'])
        steps_done = int(meta['steps_done'])
        start_epoch = int(meta['epoch_done'])

    batch_dim = batch_dim_pre  # one definition; see the mesh check

    def snapshot(epoch_done):
        if ckpt_mgr is None:
            return
        state = {'params': params,
                 'best_params': (best_params if best_params is not None
                                 else params),
                 'opt': jax.tree_util.tree_leaves(opt_state)}
        ckpt_mgr.save(epoch_done, state, {
            'epoch_done': epoch_done,
            'steps_done': steps_done,
            'history': history,
            'best_val': (None if not np.isfinite(best_val)
                         else float(best_val)),
            'best_epoch': best_epoch,
            'bad_epochs': bad_epochs,
            'rng': np.asarray(rng, dtype=np.uint32).tolist(),
            'data_seed': data_seed,
            'training_files': plan.training_files,
            'validation_files': plan.validation_files,
            'window_split': (plan.window_split.tolist()
                             if plan.window_split is not None
                             else None),
            'mapping': rater.vocab.to_codepoints().tolist(),
            'topology': {'width': rater.width, 'depth': rater.depth,
                         'length': rater.length,
                         'stateful': bool(rater.stateful),
                         'train_streams': bool(rater.train_streams),
                         'batch_size': rater.batch_size,
                         'contexts': [list(c)
                                      for c in rater.contexts],
                         'variable_length':
                             bool(rater.variable_length)},
        })

    # Pallas fused recurrence (fwd + bwd kernels) for the unsharded
    # TPU step; the jnp scan serves CPU (interpret mode is slow) and
    # the mesh path (GSPMD does not partition pallas_call operands)
    fast_recurrence = bool(getattr(rater, 'use_pallas', False)
                           and mesh is None
                           and rater.compute_dtype in ('float32',
                                                       'bfloat16'))

    import time as _time
    first_step_logged = False
    try:
        for epoch in range(start_epoch, EPOCHS):
            # ---- training pass ----
            epoch_t0 = _time.perf_counter()
            data_rng = np.random.default_rng([data_seed, epoch])
            carry = zero_carry(cfg, batch_dim)
            # epoch statistics accumulate ON DEVICE: a per-step float()
            # forces a host sync (~100ms over tunneled setups, 10x the
            # step itself); NaN/huge-loss checks happen at epoch end
            acc_nll = jnp.float32(0)
            acc_acc = jnp.float32(0)
            acc_n = 0.0
            last_loss = None
            interrupted = False
            from .native import Prefetcher
            for batch in Prefetcher(make_gen(plan.training_files,
                                             True, data_rng)):
                if batch.reset_carry or not rater.stateful:
                    # stateless windows are INDEPENDENT (reference
                    # stateless Keras inits zero state per batch, and
                    # inference scores windows from zeros): letting
                    # the previous batch's final state leak in would
                    # train under a different initial-state regime
                    # than rate()/rate2() serve with.  Fresh zeros per
                    # batch (the step donates its carry buffer).
                    carry = zero_carry(cfg, batch_dim)
                rng, sub = jax.random.split(rng)
                step_t0 = _time.perf_counter()
                if sharded_step is not None:
                    if mh_shard is not None:
                        bx, bzs, by, bm, bxm = mh_shard(batch)
                        carry = mh_carry(carry)
                    else:
                        bx, bzs, by, bm = (batch.x, tuple(batch.zs),
                                           batch.y, batch.mask)
                        bxm = batch.x_mask
                    args = (params, opt_state, bx, bzs, by, bm,
                            carry, sub)
                    fn = sharded_step
                    if bxm is not None:
                        args = args + (bxm,)
                        fn = sharded_step_masked
                    (params, opt_state, carry, loss, nll,
                     acc) = fn(*args)
                else:
                    (params, opt_state, carry, loss, nll,
                     acc) = train_step(
                        params, opt_state, cfg, batch.x,
                        tuple(batch.zs), batch.y, batch.mask, carry,
                        sub, batch.x_mask,
                        use_pallas=fast_recurrence)
                if not first_step_logged:
                    # compile-vs-step observability (SURVEY §5.1/5.5)
                    float(loss)
                    rater.logger.info(
                        'first train step (incl. jit compile): %.2fs',
                        _time.perf_counter() - step_t0)
                    first_step_logged = True
                w = float(np.sum(batch.mask))
                acc_nll = acc_nll + nll * w
                acc_acc = acc_acc + acc * w
                acc_n += w
                steps_done += 1
                last_loss = loss
                if stopper.received:
                    interrupted = True
                    break
            tr_loss = float(acc_nll)
            tr_acc = float(acc_acc)
            tr_n = acc_n
            if last_loss is not None:
                loss_f = float(last_loss)
                if np.isnan(tr_loss) or np.isnan(loss_f):
                    rater.logger.critical('NaN loss during epoch %d',
                                          epoch + 1)
                    nan_seen = True
                elif loss_f > 25:
                    rater.logger.warning('huge loss (%.1f) at end of '
                                         'epoch %d', loss_f, epoch + 1)
            if tr_n == 0:
                rater.logger.critical('training failed (no data)')
                rater.status = 1
                return
            # ---- validation pass (carry reset before, reference
            # callbacks.py:67-69) ----
            carry = zero_carry(cfg, batch_dim)
            va_nll_acc = jnp.float32(0)
            va_acc_acc = jnp.float32(0)
            va_n = 0.0
            # prefetched like the training pass: eval steps otherwise
            # serialize host batch-building against device compute
            for batch in Prefetcher(make_gen(plan.validation_files,
                                             False)):
                if batch.reset_carry or not rater.stateful:
                    carry = zero_carry(cfg, batch_dim)
                if sharded_eval is not None:
                    bx, bzs, by, bm, bxm = mh_shard(batch)
                    carry = mh_carry(carry)
                    if bxm is not None:
                        nll, acc, carry = sharded_eval_masked(
                            params, bx, bzs, by, bm, carry, bxm)
                    else:
                        nll, acc, carry = sharded_eval(
                            params, bx, bzs, by, bm, carry)
                else:
                    nll, acc, carry = eval_step(
                        params, cfg, batch.x, tuple(batch.zs),
                        batch.y, batch.mask, carry, batch.x_mask,
                        use_pallas=fast_recurrence)
                w = float(np.sum(batch.mask))
                va_nll_acc = va_nll_acc + nll * w
                va_acc_acc = va_acc_acc + acc * w
                va_n += w
            va_loss = float(va_nll_acc)
            va_acc = float(va_acc_acc)
            if va_n <= 0:
                # an empty validation pass would otherwise score 0.0
                # and win best-model selection forever
                rater.logger.critical(
                    'validation yielded no data (files shorter than '
                    'the window, or empty split)')
                va_loss = va_acc = float('nan')
                va_n = 1.0
            ep_loss = tr_loss / tr_n
            ep_acc = tr_acc / tr_n
            ep_vloss = va_loss / va_n
            ep_vacc = va_acc / va_n
            history['loss'].append(ep_loss)
            history['accuracy'].append(ep_acc)
            history['val_loss'].append(ep_vloss)
            history['val_accuracy'].append(ep_vacc)
            chars_per_sec = tr_n / max(
                _time.perf_counter() - epoch_t0, 1e-9)
            rater.logger.info(
                'epoch %d: loss %.4f acc %.4f val_loss %.4f '
                'val_acc %.4f (%.0f chars/s)',
                epoch + 1, ep_loss, ep_acc, ep_vloss, ep_vacc,
                chars_per_sec)

            if nan_seen or np.isnan(ep_vloss):
                break
            if ep_vloss < best_val:
                best_val = ep_vloss
                best_params = jax.tree_util.tree_map(jnp.copy, params)
                best_epoch = epoch
                bad_epochs = 0
                # best-only weight checkpoint (reference
                # rating.py:284-285); directory configurable via
                # rater.ckpt_dir or KERASLM_CKPT_DIR (default: CWD)
                from .utils import h5io
                ckpt_dir = (getattr(rater, 'ckpt_dir', None)
                            or os.environ.get('KERASLM_CKPT_DIR') or '.')
                os.makedirs(ckpt_dir, exist_ok=True)
                ckpt = os.path.join(
                    ckpt_dir, 'ckpt.%02d-%.2f.h5' % (epoch + 1, ep_vloss))
                # ALL processes call save_weights: its device→host
                # gather is a collective (process_allgather for
                # model-sharded params); only the file write inside is
                # gated to process 0
                try:
                    h5io.save_weights(ckpt, params, cfg)
                    if is_main:
                        rater.logger.info('saved checkpoint %s', ckpt)
                except OSError as err:
                    rater.logger.warning(
                        'cannot save checkpoint: %s', err)
            else:
                bad_epochs += 1
                # Keras EarlyStopping semantics: stop once `patience`
                # epochs pass without improvement (wait >= patience) —
                # but never before MIN_STEPS_BEFORE_STOP optimizer
                # steps (see constant)
                if bad_epochs >= PATIENCE and \
                        steps_done >= MIN_STEPS_BEFORE_STOP and \
                        not interrupted:
                    snapshot(epoch + 1)
                    rater.logger.info('early stopping (best epoch %d)',
                                      best_epoch + 1)
                    break
            if interrupted:
                # SIGINT broke the batch loop mid-epoch: keep the
                # previous epoch's snapshot — the resume contract is
                # last-COMPLETED-epoch, and recording the partial pass
                # would make a resume skip its unseen data.  (The
                # validation/improvement bookkeeping above still ran,
                # like the reference's on_epoch_end after stop_training
                # — best weights may come from the partial epoch.)
                break
            snapshot(epoch + 1)
            if stopper.received:
                break
    finally:
        stopper.restore()
        if ckpt_mgr is not None:
            ckpt_mgr.close()  # wait for + commit the in-flight save

    rater.params = best_params if (
        best_epoch >= 0 and best_params is not None) else params
    if hasattr(rater, '_params_changed'):
        rater._params_changed()  # invalidate device weight caches
    rater.history = history
    if best_epoch >= 0:
        rater.logger.info('training finished with val_loss %f',
                          best_val)
        rater.status = 2
    else:
        # no finite best epoch: NaN on epoch 1, empty data, or
        # immediate SIGINT — the weights are not usable; do NOT report
        # success (the caller would save a NaN/garbage model)
        rater.logger.critical('training failed (no usable epoch)')
        rater.status = 1
