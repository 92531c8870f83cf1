"""The LM engine: configure/train/test/rate/generate/decode.

API-equivalent to the reference ``Rater``
(/root/reference/ocrd_keraslm/lib/rating.py:12-1238) with the same
public surface (``train``/``test`` take files, ``rate``/``rate2`` take
strings, ``rate_best`` takes a lattice graph, ``generate`` takes a
prefix, ``predict`` takes parallel hypotheses + explicit states) and the
same checkpoint format, but a TPU-native execution model:

* There is ONE pure model function; the reference's three compile modes
  (stateful / stateless-windowed / incremental) are just different ways
  of threading the explicit (h, c) carry (see models/lstm_lm.py).
* ``rate``/``test`` score whole texts with chunked ``lax.scan`` calls —
  one device dispatch per 4096-char chunk instead of one per batch of
  windows, with the carry threaded across chunks (functional
  statefulness).
* ``predict`` batches all live beam hypotheses into one jitted device
  step with power-of-two batch bucketing (compile-once, reuse).
* Perplexity conventions reproduced exactly: ``test`` returns
  exp(mean natural-log loss) (rating.py:491); ``rate2`` and the decoder
  use base-2 entropy (rating.py:569,576).
"""
from __future__ import annotations

import gc
import logging
import os
import threading
from collections import OrderedDict
from functools import partial, wraps
from math import exp, log
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .models.lstm_lm import (
    DEFAULT_CONTEXTS, LMConfig, Params, forward_seq, forward_step,
    init_params, zero_carry,
)
from .utils import h5io
from .utils.vocab import Vocab, nfc, read_normalized

LOG = logging.getLogger(__name__)

# chunk length for whole-text scoring scans; a text is reshaped into
# (n_chunks, CHUNK) and scored in ONE device call (lax.scan over chunks
# with carry) — device round-trips, not compute, dominate small calls:
SCORE_CHUNK = 4096
# chunk-count buckets (powers of two -> few compilations, texts up to
# CHUNK * max bucket chars in a single call):
CHUNK_COUNT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)
# batch-size buckets for the incremental beam step:
STEP_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
# scoring batches above this many padded elements split in half
# (bounds activation/fetch memory):
SCORE_SPLIT_LIMIT = 1 << 26
# max chars per merged single-alternative decode run: keeps the shared
# L bucket small (char steps at L<=8 are near-free; L=64 for all edges
# was a net loss)
DECODE_MERGE_MAX = 8
# fused Pallas decode limits: K*A must fit the 128-lane layout and the
# kernel fully unrolls the per-edge char steps (ops/decode_kernel.py);
# beyond these the XLA scan path decodes exactly (any K, any length)
FUSED_MAX_BEAM = 32
FUSED_MAX_ALT_LEN = 64

# process-wide device-resident decode weights, keyed by the loaded
# model file's (path, size, mtime_ns) fingerprint + context + dtype:
# a serving loop that re-instantiates the processor per run reuses
# the already-staged device arrays (see Rater._decode_weights).
# Lock-guarded: concurrent Raters in one serving process would
# otherwise race get/move_to_end against the eviction popitem.
_DECODE_WCACHE: 'OrderedDict[tuple, dict]' = OrderedDict()
_DECODE_WCACHE_LOCK = threading.Lock()


# shared bucketing helpers (historic local names kept: half the
# dispatch paths reference them)
from .utils.buckets import bucket as _bucket  # noqa: E402
from .utils.buckets import bucket_unbounded as _bucket_unbounded  # noqa: E402,E501


_CACHE_ENABLED = False


def _enable_compilation_cache():
    """Persistent XLA compilation cache — OPT-IN via
    KERASLM_COMPILE_CACHE=1.

    Disabled by default: under the axon remote-compile PJRT plugin a
    cache hit was observed to return a stale executable with silently
    wrong numerics (decode costs off by 4x); remote compiles are not
    accelerated by the local cache anyway."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get('KERASLM_COMPILE_CACHE') != '1':
        return
    _CACHE_ENABLED = True
    try:
        cache_dir = os.environ.get(
            'KERASLM_COMPILE_CACHE_DIR',
            os.path.expanduser('~/.cache/keraslm_tpu_xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.5)
    except Exception as err:  # cache is an optimization, never fatal
        LOG.debug('compilation cache unavailable: %s', err)


# ----------------------------------------------------------------------
# jitted device functions (cfg is a hashable frozen dataclass -> static)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=('cfg', 'use_pallas', 'fused'))
def _score_text_jit(params, cfg: LMConfig, xc, zs, yc, maskc, carry,
                    use_pallas: bool = False, fused: bool = False):
    """Whole-text scoring in ONE device dispatch.

    xc, yc, maskc: (C, B, T) — C sequential chunks of B parallel text
    streams; carry threads across chunks via lax.scan (functional
    statefulness).  Returns (probs (C, B, T) float16, per-stream NLL
    sums (B,) nats, per-stream base-2 entropies (B,) bits — both f32 —
    and the final carry).

    Probs travel to the host as float16: device->host bandwidth, not
    compute, dominates (measured 96ms fetch vs 21ms compute for 256k
    chars over the tunnel); the exact ppl aggregates (f32 NLL sums) are
    computed on device, so the downsampling only touches reported
    per-char confidences.

    With ``fused`` the whole per-chunk computation (all LSTM layers +
    tied-softmax target prob/NLL) runs in ONE Pallas kernel
    (ops/score_kernel.py) instead of one kernel per layer plus a
    materialised (B, T, V) logits tensor."""
    return _score_chunks_scan(params, cfg, xc, zs, yc, maskc, carry,
                              use_pallas, fused)


def _score_stream(params, cfg: LMConfig, xflat, zs, lens, last,
                  carry, n_chunks: int, use_pallas: bool = False,
                  fused: bool = False):
    """Like ``_score_text_jit`` but taking the COMPACT input stream:
    only the (B, C*T) char ids (uint16 when the vocab allows),
    per-stream lengths and final targets travel host->device — the
    shifted teacher-forcing targets and validity mask are derived here.
    Host->device bandwidth over a tunneled PJRT link otherwise
    dominates small-batch scoring (measured 47ms of the 230ms
    single-stream budget for the 3x int32/float32 layout)."""
    B, N = xflat.shape
    T = N // n_chunks
    xflat = xflat.astype(jnp.int32)
    yflat = jnp.concatenate(
        [xflat[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    yflat = yflat.at[jnp.arange(B), jnp.maximum(lens - 1, 0)].set(
        jnp.where(lens > 0, last.astype(jnp.int32), yflat[:, 0]))
    mask = (jnp.arange(N)[None, :] < lens[:, None]).astype(jnp.float32)

    def chunk(a):
        return jnp.swapaxes(a.reshape(B, n_chunks, T), 0, 1)
    return _score_chunks_scan(params, cfg, chunk(xflat), zs,
                              chunk(yflat), chunk(mask), carry,
                              use_pallas, fused)


_score_stream_jit = partial(jax.jit, static_argnames=(
    'cfg', 'n_chunks', 'use_pallas', 'fused'))(_score_stream)


def _score_chunks_scan(params, cfg, xc, zs, yc, maskc, carry,
                       use_pallas, fused):
    if fused:
        from .models.lstm_lm import embed_inputs
        from .ops.score_kernel import pack_score_weights, score_scan_pallas
        rec1, kcat, ucat, bias, embT, v_real = pack_score_weights(
            params, cfg)
        lp0 = params['lstm'][0]

        def body(carry, inp):
            x, y, m = inp
            xemb = embed_inputs(params, cfg, x, list(zs))
            xp1 = (jnp.einsum('btd,df->btf', xemb, lp0['kernel'],
                              preferred_element_type=jnp.float32)
                   + lp0['bias'])
            probs, nll, carry = score_scan_pallas(
                xp1, y, m, carry[0], carry[1], rec1, kcat, ucat, bias,
                embT, v_real)
            return carry, (probs.astype(jnp.float16), nll)
    else:
        def body(carry, inp):
            x, y, m = inp
            logits, carry = forward_seq(params, cfg, x, list(zs), carry,
                                        use_pallas=use_pallas)
            logp = jax.nn.log_softmax(logits, axis=-1)
            tgt = jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
            nll = -jnp.sum(tgt * m, axis=-1)
            return carry, (jnp.exp(tgt).astype(jnp.float16) *
                           m.astype(jnp.float16), nll)
    carry, (probs, nlls) = jax.lax.scan(body, carry, (xc, yc, maskc))
    return probs, jnp.sum(nlls, axis=0), carry


@partial(jax.jit, static_argnames='cfg')
def _predict_step(params, cfg: LMConfig, x, zs, h, c):
    probs, (h2, c2) = forward_step(params, cfg, x, list(zs), (h, c))
    return probs, h2, c2


@partial(jax.jit, static_argnames='cfg')
def _window_probs(params, cfg: LMConfig, x, zs):
    """Stateless windowed next-char distribution: x (B, L) -> (B, V)."""
    logits, _ = forward_seq(params, cfg, x, list(zs), None)
    return jax.nn.softmax(logits[:, -1, :], axis=-1)


@partial(jax.jit, static_argnames=('s_sh', 'n', 'k', 's', 'w'))
def _fused_batch_beam_init(nl_emb, s_sh: int, n: int, k: int, s: int,
                           w: int):
    """Fresh per-document beam for the doc-batched fused decode, built
    ON DEVICE (a host-built init cost a blocking ~320KB upload plus a
    sync on the newline-embedding fetch, per call)."""
    from .ops.decode_kernel import BIG as big  # dead-slot cost
    state = jnp.zeros((s_sh, n * k, s), jnp.float32)
    state = state.at[:, :, :w].set(nl_emb[None, None, :])
    rows = jnp.arange(n * k)
    cost = jnp.where((rows % k == 0)[None, :, None], 0.0, big)
    return state, jnp.broadcast_to(cost, (s_sh, n * k, 1)) \
        .astype(jnp.float32)


def _gc_paused(fn):
    """Pause the cyclic GC across a hot decode call.

    Lattice prep allocates thousands of container objects per document
    (edge meta dicts, path tuples); every ~700 allocations the gen-0
    collector scans ALL tracked objects — including the caller's whole
    lattice graph (~100k containers for a 16-document serving batch).
    Measured on 1000-edge pages: native decode_fill 2.1 -> 0.9 ms/doc
    with the collector paused, and most of the best-vs-median decode
    spread disappears.  Nothing here creates reference cycles; deferred
    collection is safe.  Restores the collector's prior state (no-op
    when already disabled, e.g. under an outer paused call)."""
    @wraps(fn)
    def wrapper(*args, **kwargs):
        if not gc.isenabled():
            return fn(*args, **kwargs)
        gc.disable()
        try:
            return fn(*args, **kwargs)
        finally:
            gc.enable()
    return wrapper


class NonLinearLatticeError(ValueError):
    """A branching (general-DAG) lattice reached a device engine.

    The device engines decode CHAINS (one beam round per edge); the
    host engine ``Rater.rate_best`` accepts general DAGs (reference
    traversal shape: rating.py:763-773).  The OCR-D wrapper catches
    this to fall back to the host engine per page
    (wrapper/rate.py process_workspace_stateful)."""


def _linear_edges(graph):
    """Edge data dicts of a LINEAR lattice in topological order.

    The device engines run the edge list as a sequential chain (one
    beam round per edge), so a branching DAG passed here would
    silently decode as if its edges were consecutive.  The wrapper
    only builds chains (reference wrapper/rate.py:343-424 likewise),
    but ``rate_best`` (the host engine) accepts general DAGs — reject
    non-chains here with a pointer there instead of corrupting.

    A successor-map walk (O(E), no sort) rather than a sorted edge
    list: chain order must not depend on node labels, so a linear
    lattice whose labels are not monotonic (e.g. relabeled by subgraph
    extraction) still decodes in path order.
    """
    succ = {}
    tails = set()
    for u, v, d in graph.edges(data=True):
        if u in succ or u == v:
            raise NonLinearLatticeError(
                'device decoding requires a linear lattice, but node '
                '%r has multiple outgoing edges; use rate_best() for '
                'general DAG lattices' % (u,))
        succ[u] = (v, d)
        tails.add(v)
    if not succ:
        return []
    starts = [u for u in succ if u not in tails]
    if len(starts) != 1:
        raise NonLinearLatticeError(
            'device decoding requires a linear lattice (single '
            'chain), but found %d start nodes; use rate_best() for '
            'general DAG lattices' % len(starts))
    node = starts[0]
    out = []
    for _ in range(len(succ)):
        if node not in succ:
            raise NonLinearLatticeError(
                'device decoding requires a linear lattice, but the '
                'chain from %r ends after %d of %d edges (merge node '
                'or disconnected component); use rate_best() for '
                'general DAG lattices' % (starts[0], len(out),
                                          len(succ)))
        node, d = succ[node]
        out.append(d)
    return out


def _stacked_fetch(items):
    """ONE host fetch per distinct array shape.

    ``items`` is ``[(key, device_array), ...]``; returns
    ``{key: np.ndarray}``.  Each host<->device sync costs a full RTT
    (~25ms over tunneled setups, measured), so same-shape arrays cross
    in one ``jnp.stack`` instead of one fetch each."""
    out: Dict[Any, np.ndarray] = {}
    by_shape: Dict[Any, list] = {}
    for key, arr in items:
        by_shape.setdefault(tuple(arr.shape), []).append((key, arr))
    for group in by_shape.values():
        if len(group) == 1:
            key, arr = group[0]
            out[key] = np.asarray(arr)
            continue
        stacked = np.asarray(jnp.stack([a for _, a in group]))
        for row, (key, _) in enumerate(group):
            out[key] = stacked[row]
    return out


def _alt_steps(alt_mask):
    """Per-edge char-step bound for the fused kernels' ``fori_loop``
    (ops/decode_kernel.py): the longest real alternative at each edge.
    Exact — steps beyond the bound are fully-masked no-ops.

    ``alt_mask``: (E, rows, L) char mask -> (E, 1) int32 bounds.
    Single definition for the single-document and document-batched
    paths so the bound's semantics cannot drift between them.
    """
    return alt_mask.sum(axis=2).max(axis=1).astype(np.int32)[:, None]


def _spread_labels(points, iters=40):
    """De-overlap 2-D label positions by iterative pairwise repulsion
    (capability of the reference's optional adjustText extra,
    reference lib/rating.py:1222-1234): labels closer than ~2% of the
    plot span push each other apart; the anchor points stay put."""
    pts = np.asarray(points, np.float64).copy()
    if len(pts) < 2:
        return pts
    span = max(float(np.ptp(pts[:, 0])), float(np.ptp(pts[:, 1])),
               1e-9)
    min_d = 0.02 * span
    for _ in range(iters):
        diff = pts[:, None, :] - pts[None, :, :]      # (N, N, 2)
        dist = np.sqrt((diff ** 2).sum(-1))
        np.fill_diagonal(dist, np.inf)
        close = dist < min_d
        if not close.any():
            break
        # unit push away from every too-close neighbor; exactly
        # coincident pairs separate along per-index directions
        with np.errstate(invalid='ignore', divide='ignore'):
            unit = diff / dist[..., None]
        ang = np.linspace(0, 2 * np.pi, len(pts), endpoint=False)
        fallback = np.stack([np.cos(ang), np.sin(ang)], axis=1)
        unit = np.where(np.isfinite(unit), unit,
                        fallback[:, None, :])
        push = (unit * close[..., None]).sum(axis=1)
        norm = np.sqrt((push ** 2).sum(-1, keepdims=True))
        push = np.where(norm > 0, push / np.maximum(norm, 1e-12), 0.0)
        pts = pts + push * (min_d * 0.25)
    return pts


class Rater:
    """A character-level LSTM language model for rating text (TPU)."""

    def __init__(self, logger=None):
        # configuration variables (reference parity, rating.py:35-59)
        self.width = 0
        self.depth = 0
        self.length = 0
        self.variable_length = True
        self.first_window = 0.1
        self.char_degradation = 0.01
        self.context_degradation = 0.1
        self.stateful = True
        self.contexts: Tuple[Tuple[int, int], ...] = DEFAULT_CONTEXTS
        self.vocab = Vocab()
        # configuration constants
        self.batch_size = 128
        self.validation_split = 0.2
        self.smoothing = 0.2
        # TPU-specific knobs
        self.use_pallas = jax.default_backend() == 'tpu'
        self.train_streams = True  # parallel-streams stateful training
        self.device_beam = True    # on-device beam search (1 dispatch)
        # fused Pallas decode kernel: fastest on TPU (12us/edge vs 15
        # for the XLA scan); interpret mode is too slow on CPU
        self.fused_decode = jax.default_backend() == 'tpu'
        # fused Pallas scoring kernel (all layers + tied softmax in one
        # grid, ops/score_kernel.py); f32-only, interpret too slow on CPU
        self.fused_score = jax.default_backend() == 'tpu'
        self.merge_runs = True     # merge single-alternative edge runs
        self.compute_dtype = 'float32'  # or 'bfloat16' (training speed)
        # multi-chip training: set to parallel.make_mesh(...) to pjit
        # the train step over a (data, model) mesh (SURVEY §5.8)
        self.mesh = None
        # full train-state checkpoint/resume directory (Orbax; also
        # settable via KERASLM_RESUME_DIR) — see training.train_rater
        self.resume_dir = None
        self._decode_cache: Dict[Any, Any] = {}
        # bumped on every weight change; keys the device weight cache
        # (id(params) is unsafe: in-place mutation keeps the id, and
        # freed dicts can reuse one)
        self._params_epoch = 0
        # (path, size, mtime_ns) of the loaded h5 + the epoch right
        # after loading: keys the PROCESS-wide decode-weight cache
        self._weights_fp = None
        self._fp_epoch = None
        self._sharded_score = None  # (mesh, jitted fn) cache
        _enable_compilation_cache()
        # runtime variables
        self.logger = logger or logging.getLogger(__name__)
        self.incremental = False
        self.params: Optional[Params] = None
        self.cfg: Optional[LMConfig] = None
        self.history: Dict[str, Any] = {}
        self.status = 0
        self.voc_size = 0

    # -- reference-compat mapping view --------------------------------

    @property
    def mapping(self):
        return (self.vocab.c2i, self.vocab.i2c)

    @mapping.setter
    def mapping(self, value):
        self.vocab.c2i, self.vocab.i2c = dict(value[0]), dict(value[1])
        # invalidate encode caches keyed on the mapping version
        self.vocab._version += 1

    # -- configuration -------------------------------------------------

    def configure(self):
        """Build the model configuration (and init params if needed).

        Unlike the reference (which compiles one of three separate Keras
        graphs here, rating.py:61-179), this only pins shapes: the same
        pure function serves stateful, windowed and incremental use.
        """
        if self.stateful:
            self.variable_length = False
            self.first_window = 0
        self.logger.info(
            'configuring %s %s TPU model of depth %d width %d length %s '
            'size %d (backend %s)',
            'stateful' if self.stateful else 'stateless',
            'incremental' if self.incremental else 'contiguous',
            self.depth, self.width,
            'variable' if self.variable_length else str(self.length),
            self.voc_size, jax.default_backend())
        self.cfg = LMConfig(
            width=self.width, depth=self.depth, length=self.length,
            voc_size=max(self.voc_size, 1), contexts=self.contexts,
            stateful=self.stateful,
            variable_length=self.variable_length,
            compute_dtype=self.compute_dtype)
        if self.params is None and self.voc_size > 0:
            self.params = init_params(self.cfg, jax.random.PRNGKey(42))
        if self.status < 1:
            self.status = 1

    def underspecify_contexts(self) -> List[int]:
        """Default (zero = underspecified) context variable input."""
        self.logger.info('using underspecification (zero) for %d context '
                         'variables', len(self.contexts))
        return [0] * len(self.contexts)

    def reconfigure_for_mapping(self):
        """Rebuild params after vocab change, transferring old embedding
        rows (reference rating.py:387-414)."""
        assert self.status >= 1
        old_params = self.params
        old_voc = (old_params['char_embedding'].shape[0]
                   if old_params is not None else 0)
        if old_voc < self.voc_size:
            if self.status >= 2 and old_params is not None and old_voc > 0:
                self.logger.warning(
                    'transferring weights from previous model with only '
                    '%d character types', old_voc)
                self.params = None
                self.configure()
                new_emb = np.array(self.params['char_embedding'],
                                   copy=True)
                new_emb[:old_voc] = np.asarray(
                    old_params['char_embedding'])
                self.params['char_embedding'] = jnp.asarray(new_emb)
                self.params['context_embeddings'] = \
                    old_params['context_embeddings']
                self.params['lstm'] = old_params['lstm']
                self._params_changed()
            else:
                self.params = None
                self.configure()

    def _params_changed(self):
        """Invalidate device-resident weight caches after any change
        to ``self.params`` (load, vocab growth/pruning, training)."""
        self._params_epoch += 1
        self._decode_cache.clear()

    def remove_from_mapping(self, char=None, idx=None) -> bool:
        """Remove one char from the mapping, deleting its embedding row
        (reference rating.py:416-460)."""
        assert self.status > 1
        assert self.voc_size > 0
        removed = None
        if char is not None and char in self.vocab.c2i:
            removed = self.vocab.c2i[char]
        elif idx is not None and idx in self.vocab.i2c:
            removed = idx
        emb = np.asarray(self.params['char_embedding'])
        if removed is None:
            self.vocab.remove(char, idx)  # logs the unmapped error
            return False
        norm = float(np.linalg.norm(emb[removed]))
        self.logger.warning('pruning character "%s" [%d] with norm %f',
                            char or self.vocab.i2c.get(removed), removed,
                            norm)
        self.vocab.remove(char, idx)
        self.voc_size -= 1
        self.params['char_embedding'] = jnp.asarray(
            np.delete(emb, removed, axis=0))
        self.cfg = self.cfg.replace(voc_size=self.voc_size)
        self._params_changed()
        return True

    # -- persistence ---------------------------------------------------

    def save(self, filename):
        """Save weights + config: h5 (reference-schema interop) or
        Orbax-native directory format when the path is a directory /
        ends in ``.orbax`` (SURVEY.md §5.4)."""
        assert self.status > 1
        from .utils import orbaxio
        if orbaxio.is_orbax_path(filename):
            orbaxio.save_model(filename, self.params, self.cfg,
                               self.vocab, self.history)
        else:
            h5io.save_model(filename, self.params, self.cfg,
                            self.vocab, self.history)

    def load_config(self, filename):
        assert self.status == 0
        from .utils import orbaxio
        if orbaxio.is_orbax_path(filename):
            cfg, vocab, history = orbaxio.load_config(filename)
        else:
            cfg, vocab, history = h5io.load_config(filename)
        self.width = cfg.width
        self.depth = cfg.depth
        self.length = cfg.length
        self.stateful = cfg.stateful
        self.variable_length = cfg.variable_length
        self.contexts = cfg.contexts
        self.vocab = vocab
        self.voc_size = vocab.size
        self.history = history

    def load_weights(self, filename):
        assert self.status > 0
        from .utils import orbaxio
        if orbaxio.is_orbax_path(filename):
            self.params = orbaxio.load_weights(filename, self.cfg)
        else:
            self.params = h5io.load_weights(filename, self.cfg)
            # model-file fingerprint: lets a NEW Rater over the same
            # (unchanged) h5 reuse the process-wide device-resident
            # decode weights instead of re-staging ~MBs per instance
            # (serving loops re-instantiate the processor per run);
            # only consulted while params are untouched since load
            # (_fp_epoch match), so any API mutation disables it
            try:
                st = os.stat(filename)
                self._weights_fp = (os.path.abspath(filename),
                                    st.st_size, st.st_mtime_ns)
                self._fp_epoch = self._params_epoch + 1
            except OSError:
                self._weights_fp = None
        self.voc_size = self.params['char_embedding'].shape[0]
        self._params_changed()
        self.cfg = self.cfg.replace(voc_size=self.voc_size)
        self.status = 2

    def print_history(self):
        for k, v in self.history.items():
            print(f"{k}: {v}")

    def print_charset(self):
        self.vocab.print_charset()

    # -- whole-text scoring -------------------------------------------

    def _context_arrays(self, context: Optional[Sequence[int]], batch: int
                        ) -> Tuple[np.ndarray, ...]:
        if not context:
            context = self.underspecify_contexts()
        zs = []
        for i in range(len(self.contexts)):
            val = context[i] if i < len(context) else 0
            zs.append(np.full((batch,), val, np.int32))
        return tuple(zs)

    def _score_batch(self, ids_list: List[np.ndarray],
                     contexts: List[Any], *, carry=None,
                     want_probs: bool = True
                     ) -> Tuple[List[np.ndarray], List[float], Any]:
        """Score a batch of encoded texts in ONE device dispatch.

        Each text is reshaped into sequential chunks; all texts run as
        parallel batch streams; the (h, c) carry threads across chunks
        inside a single jitted lax.scan (device round-trips dominate
        small calls in tunneled/remote setups, so one dispatch per
        batch is the design point).

        Returns (per-text probs (N_i-1,), per-text NLL sums, carry).
        """
        B = len(ids_list)
        # unbounded: capping at the largest bucket would make the fill
        # loops below index out of range for >512 texts (e.g. a
        # 513-page document through the stateless wrapper)
        Bp = _bucket_unbounded(B, STEP_BUCKETS)
        lens = [max(len(ids) - 1, 0) for ids in ids_list]
        Nmax = max(lens + [1])
        BLOCK = SCORE_CHUNK * CHUNK_COUNT_BUCKETS[-1]
        if Nmax > BLOCK:
            # book-length texts: chain fixed-size super-blocks through
            # the carry (each block slice overlaps one char so targets
            # line up across the boundary)
            parts: List[List[np.ndarray]] = [[] for _ in range(B)]
            nll_tot = [0.0] * B
            cur = carry
            for o in range(0, Nmax, BLOCK):
                sub = [ids[o:o + BLOCK + 1] for ids in ids_list]
                p, n_, cur = self._score_batch(
                    sub, contexts, carry=cur, want_probs=want_probs)
                for i in range(B):
                    nll_tot[i] += n_[i]
                    if want_probs:
                        parts[i].append(p[i])
            return ([np.concatenate(parts[i]) if want_probs else None
                     for i in range(B)], nll_tot, cur)
        C = _bucket((Nmax + SCORE_CHUNK - 1) // SCORE_CHUNK,
                    CHUNK_COUNT_BUCKETS)
        if B > 1 and C * Bp * SCORE_CHUNK > SCORE_SPLIT_LIMIT:
            # bound activation/fetch memory: halve the batch (each
            # half gets its carry rows and hands its final rows back)
            mid = B // 2

            def _rows(lo, hi):
                if carry is None:
                    return None
                return (np.asarray(carry[0])[:, lo:hi],
                        np.asarray(carry[1])[:, lo:hi])

            p1, n1, c1 = self._score_batch(
                ids_list[:mid], contexts[:mid], carry=_rows(0, mid),
                want_probs=want_probs)
            p2, n2, c2 = self._score_batch(
                ids_list[mid:], contexts[mid:], carry=_rows(mid, B),
                want_probs=want_probs)
            # ALWAYS reassemble the final carry (even when the caller
            # passed none): superblock chaining starts with carry=None
            # and threads the returned states into the next block —
            # returning None there would silently reset the LSTM state
            # at every split boundary
            h = np.concatenate([np.asarray(c1[0])[:, :mid],
                                np.asarray(c2[0])[:, :B - mid]],
                               axis=1)
            c = np.concatenate([np.asarray(c1[1])[:, :mid],
                                np.asarray(c2[1])[:, :B - mid]],
                               axis=1)
            return p1 + p2, n1 + n2, (h, c)
        T = SCORE_CHUNK
        # compact transfer layout: char ids only (uint16 when the vocab
        # allows), plus per-stream lengths and final targets; shifted
        # targets/mask are derived on device (_score_stream_jit)
        xdt = np.uint16 if self.cfg.voc_size < (1 << 16) else np.int32
        x = np.zeros((Bp, C * T), xdt)
        lens_a = np.zeros((Bp,), np.int32)
        last = np.zeros((Bp,), np.int32)
        for i, ids in enumerate(ids_list):
            n = lens[i]
            if n <= 0:
                continue
            x[i, :n] = ids[:-1]
            lens_a[i] = n
            last[i] = ids[n]
        zs = []
        under = None
        for k in range(len(self.contexts)):
            zrow = np.zeros((Bp,), np.int32)
            for i, ctx in enumerate(contexts):
                if not ctx:
                    if under is None:  # hoisted: one log line, one list
                        under = self.underspecify_contexts()
                    ctx = under
                zrow[i] = ctx[k] if k < len(ctx) else 0
            zs.append(zrow)
        if carry is None:
            carry = zero_carry(self.cfg, Bp)
        elif carry[0].shape[1] != Bp:
            # batch-row normalization (splitting/chaining callers)
            ch, cc = np.asarray(carry[0]), np.asarray(carry[1])
            if ch.shape[1] > Bp:
                carry = (ch[:, :Bp], cc[:, :Bp])
            else:
                padn = Bp - ch.shape[1]
                carry = (np.pad(ch, ((0, 0), (0, padn), (0, 0))),
                         np.pad(cc, ((0, 0), (0, padn), (0, 0))))
        # f32-only; at large widths the layered path wins (the hoisted
        # whole-chunk matmuls dominate and per-step MXU latency grows:
        # w512 measured 140ms fused vs 128ms layered per 64k chars)
        fused = (self.fused_score
                 and self.cfg.compute_dtype == 'float32'
                 and self.cfg.width <= 384)
        # multi-chip: data-parallel scoring over the mesh (stream rows
        # sharded on the data axis, params replicated) — the inference
        # side of SURVEY §5.8
        score_fn = _score_stream_jit
        mesh = self.mesh
        if mesh is not None and mesh.shape.get('data', 1) > 1 \
                and Bp % mesh.shape['data'] == 0:
            cached = self._sharded_score
            if cached is None or cached[0] is not mesh:
                from .parallel.score import make_sharded_score_step
                cached = (mesh, make_sharded_score_step(mesh))
                self._sharded_score = cached
            score_fn = cached[1]
        # ONE dispatch covers the whole batch.  (Segmenting the C axis
        # to pipeline probs fetches against later segments' compute was
        # measured NET-NEGATIVE over the tunneled PJRT link: 4
        # dispatches cost more than the hidden fetch.)
        probs_d, nll_d, carry = score_fn(
            self.params, self.cfg, x, tuple(zs), lens_a, last,
            carry, C, self.use_pallas, fused)
        out_probs: List[Any] = [None] * B
        if want_probs:  # device->host transfer dominates; skip if unused
            probs, nlls = jax.device_get((probs_d, nll_d))
            probs = probs.astype(np.float32)               # (C, Bp, T)
            for i in range(B):
                flat = probs[:, i, :].reshape(-1)
                out_probs[i] = flat[:lens[i]]
        else:
            nlls = np.asarray(nll_d)
        return out_probs, [float(nlls[i]) for i in range(B)], carry

    def _score_text(self, ids: np.ndarray, context, *,
                    carry=None) -> Tuple[np.ndarray, float, Any]:
        """Score one encoded text: per-position probability of the true
        next char and total NLL (nats).  One device dispatch."""
        if len(ids) < 2:
            return np.zeros((0,), np.float32), 0.0, carry
        probs, nlls, carry = self._score_batch([ids], [context],
                                               carry=carry)
        return probs[0], nlls[0], carry

    def test(self, test_data) -> float:
        """Evaluate perplexity = exp(mean NLL) over text files
        (reference rating.py:462-491).  All files are scored as parallel
        batch streams in one device dispatch; unlike the reference, the
        carry IS reset between files — the fix for its acknowledged
        wart at rating.py:476-481."""
        assert self.status > 1
        from .data import context_from_filename
        ids_list, contexts = [], []
        for file in test_data:
            text = read_normalized(file)
            name = getattr(file, 'name', file if isinstance(file, str)
                           else '')
            ids_list.append(self.vocab.encode(text))
            contexts.append(context_from_filename(name or ''))
        if not ids_list:
            return 1.0
        if not self.stateful and not self.variable_length:
            # stateless fixed-window semantics: every char (including
            # position 0, from an all-padding window) is a window
            # target, like the reference's steps=1 evaluation stream
            # (rating.py:483-491, 1030)
            nll = 0.0
            count = 0
            for ids, ctx in zip(ids_list, contexts):
                if not len(ids):
                    continue
                probs = self._rolling_window_probs(
                    ids, ctx, include_first=True)
                nll -= float(np.sum(np.log(np.maximum(probs, 1e-30))))
                count += len(probs)
            return exp(nll / max(count, 1))
        # score in batches to bound padded batch size
        nll = 0.0
        count = 0
        for s in range(0, len(ids_list), self.batch_size):
            chunk = ids_list[s:s + self.batch_size]
            _, nlls, _ = self._score_batch(
                chunk, contexts[s:s + self.batch_size],
                want_probs=False)
            nll += sum(nlls)
            count += sum(max(len(i) - 1, 0) for i in chunk)
        return exp(nll / max(count, 1))

    def rate_batch(self, texts: List[str], contexts=None
                   ) -> List[List[float]]:
        """Batched ``rate``: per-character probabilities for several
        texts in one device dispatch (new TPU-native API — e.g. one
        call per document instead of one per page)."""
        assert self.status > 1
        if contexts is None:
            contexts = [None] * len(texts)
        ids_list = [self.vocab.encode(nfc(t), log_unmapped=True)
                    for t in texts]
        if not self.stateful and not self.variable_length:
            # stateless fixed-window semantics (see ``rate``); each
            # text already batches its windows internally
            return [([1.0] + [float(p) for p in
                              self._rolling_window_probs(ids, ctx)])
                    if len(ids) else []
                    for ids, ctx in zip(ids_list, contexts)]
        probs, _, _ = self._score_batch(ids_list, list(contexts))
        # an empty text rates to [] (like ``rate``), not [1.0]
        return [([1.0] + [float(p) for p in pr]) if len(ids) else []
                for pr, ids in zip(probs, ids_list)]

    def rate(self, text: str, context=None) -> List[float]:
        """Probability of each character given its predecessors, one
        scan pass (reference rating.py:493-529: the fast path).

        Stateless fixed-length models score each character from its
        (at most) ``length``-char zero-run-in window — the population
        the model was trained on and the same semantics as ``rate2``
        (the reference's stateless predict_generator stream,
        rating.py:512-517); stateful and variable-length models use
        the exact full-context scan."""
        assert self.status > 1
        text = nfc(text)
        if not text:
            return []
        ids = self.vocab.encode(text, log_unmapped=True)
        if not self.stateful and not self.variable_length:
            probs = self._rolling_window_probs(ids, context)
            return [1.0] + [float(p) for p in probs]
        probs, _, _ = self._score_text(ids, context)
        return [1.0] + [float(p) for p in probs]

    def rate2(self, text: str, context=None
              ) -> Tuple[List[Tuple[str, float]], float]:
        """Per-character probabilities + base-2 perplexity (reference
        rating.py:531-576: the slow/debug path, here vectorized).

        For stateless fixed-window models the reference's rolling
        zero-padded window semantics are reproduced; stateful and
        variable-length models use the exact full-context scan."""
        assert self.status > 1
        text = nfc(text)
        if not text:
            return [], 1.0
        ids = self.vocab.encode(text, log_unmapped=True)
        if self.stateful or self.variable_length:
            probs, nll, _ = self._score_text(ids, context)
            # exact f32 entropy from the device NLL sum (probs travel
            # as f16 and only feed the reported per-char values)
            entropy = nll * 1.4426950408889634
            result = [(text[0], 1.0)]
            for i in range(1, len(text)):
                result.append((text[i], float(probs[i - 1])))
            return result, pow(2.0, entropy / len(text))
        probs = self._rolling_window_probs(ids, context)
        result = [(text[0], 1.0)]
        entropy = 0.0
        for i in range(1, len(text)):
            p = float(probs[i - 1])
            entropy -= log(max(p, 1e-99), 2)
            result.append((text[i], p))
        return result, pow(2.0, entropy / len(text))

    def _rolling_window_probs(self, ids: np.ndarray, context, *,
                              include_first: bool = False
                              ) -> np.ndarray:
        """Zero-left-padded rolling-window next-char probs for the
        stateless fixed-length model (parity with rate2's windowing,
        reference rating.py:550-576).

        Context variables are ZERO at the padded positions, exactly
        like the reference's z arrays (rolled from an all-zero init
        alongside x, rating.py:551,572-576): the run-in of the first
        length-1 predictions is fully underspecified, not
        context-conditioned.

        ``include_first`` additionally scores position 0 from an
        all-padding window (the reference's ``test``/``rate`` window
        stream starts at i=0, rating.py:1030; ``rate2`` hardcodes the
        first probability to 1.0 instead)."""
        N = len(ids)
        L = self.length
        first = 0 if include_first else 1
        M = N - first
        windows = np.zeros((M, L), np.int32)
        valid = np.zeros((M, L), np.int32)
        for i in range(first, N):
            lo = max(0, i - L)
            windows[i - first, L - (i - lo):] = ids[lo:i]
            valid[i - first, L - (i - lo):] = 1
        if not context:
            context = self.underspecify_contexts()
        out = np.zeros((M,), np.float32)
        B = self.batch_size
        for s in range(0, M, B):
            n = min(B, M - s)
            nb = _bucket(n, STEP_BUCKETS)
            x = np.zeros((nb, L), np.int32)
            x[:n] = windows[s:s + n]
            v = np.zeros((nb, L), np.int32)
            v[:n] = valid[s:s + n]
            zs = tuple(
                v * (int(context[k]) if k < len(context) else 0)
                for k in range(len(self.contexts)))
            probs = np.asarray(_window_probs(self.params, self.cfg, x, zs))
            out[s:s + n] = probs[np.arange(n),
                                 ids[first + s:first + s + n]]
        return out

    # -- incremental engine -------------------------------------------

    def predict(self, candidates, initial_states, context=None
                ) -> Tuple[List[np.ndarray], List[List[np.ndarray]]]:
        """One-character step for N parallel hypotheses with explicit
        per-layer (h1,c1,h2,c2,...) state in/out (reference
        rating.py:578-639).  All hypotheses run as ONE device step,
        batch padded to a power-of-two bucket."""
        assert self.status > 1
        assert len(candidates) == len(initial_states), \
            'number of inputs (%d) and number of states (%d) inconsistent' \
            % (len(candidates), len(initial_states))
        if not context:
            context = self.underspecify_contexts()
        n = len(candidates)
        # unbounded: >512 parallel hypotheses must not truncate (the
        # reference's predict_on_batch has no such limit)
        nb = _bucket_unbounded(n, STEP_BUCKETS)
        D, W = self.depth, self.width
        x = np.zeros((nb,), np.int32)
        for i, char in enumerate(candidates):
            x[i] = self.vocab.get(char)
        h = np.zeros((D, nb, W), np.float32)
        c = np.zeros((D, nb, W), np.float32)
        for i, state in enumerate(initial_states):
            if not state:
                continue
            for layer in range(D):
                h[layer, i] = np.asarray(state[2 * layer]).reshape(W)
                c[layer, i] = np.asarray(state[2 * layer + 1]).reshape(W)
        zs = self._context_arrays(context, nb)
        probs, h2, c2 = _predict_step(self.params, self.cfg, x, zs, h, c)
        probs = np.asarray(probs)
        h2 = np.asarray(h2)
        c2 = np.asarray(c2)
        preds = [probs[i] for i in range(n)]
        final_states = [
            [h2[layer, i:i + 1] if kind == 0 else c2[layer, i:i + 1]
             for layer in range(D) for kind in (0, 1)]
            for i in range(n)]
        return preds, final_states

    # -- generation ----------------------------------------------------

    def generate(self, prefix: str, length: int, context=None,
                 variants: int = 1) -> List[str]:
        """Beam-search sampling after a prefix (reference
        rating.py:642-709): per-step top-10 candidates, absolute
        probability threshold 0.004, fringe capped at 256.

        Runs entirely on device as ONE dispatch (lax.scan beam with
        top-k pruning and backpointer records) unless
        ``self.device_beam`` is False (host/parity path)."""
        assert self.status > 1
        if self.device_beam and prefix:
            from .ops.beam_device import generate_beam
            result = generate_beam(self, prefix, length, context,
                                   variants)
            if result:
                return result
        return self._generate_host(prefix, length, context, variants)

    def generate_begin(self, prefix: str, length: int, context=None,
                       variants: int = 1):
        """DISPATCH a generation; ``generate_finish`` later fetches
        and builds the strings.  A serving loop can dispatch prompt
        N+1 before finishing prompt N, so the fixed dispatch/fetch
        round-trip (25-46 ms on tunneled links — the whole budget of
        a 1k-char request) overlaps the device beam search of the
        other prompts in flight; results are identical to the
        synchronous ``generate`` (which is begin + finish)."""
        assert self.status > 1
        if self.device_beam and prefix:
            from .ops.beam_device import generate_beam_begin
            return generate_beam_begin(self, prefix, length, context,
                                       variants)
        return ('gen-host', (self, prefix, length, context, variants))

    def generate_finish(self, pending) -> List[str]:
        """Fetch + string emission for a ``generate_begin`` dispatch."""
        if pending[0] != 'gen-host':
            from .ops.beam_device import generate_beam_finish
            result = generate_beam_finish(pending)
            if result:
                return result
            _, prefix, length, variants, ctx = pending[-1]
            return self._generate_host(prefix, length, ctx, variants)
        _, (_, prefix, length, context, variants) = pending
        return self._generate_host(prefix, length, context, variants)

    def generate_batch(self, prefixes: List[str], length: int,
                       context=None) -> List[str]:
        """Generate continuations for many prefixes in ONE device
        dispatch (vmapped beam over a stream axis) — a serving-oriented
        API with no reference counterpart (its ``generate``,
        rating.py:642-709, is one prefix per call with a device
        round-trip per character).  Each stream returns the same string
        as ``generate(prefix, length)``."""
        assert self.status > 1
        result = None
        if self.device_beam and all(prefixes):
            from .ops.beam_device import generate_streams
            result = generate_streams(self, prefixes, length, context)
            if result and all(result):
                return result
        # host fallback ONLY for the streams that came back empty (a
        # dead fringe is legitimate — all candidates under the 0.004
        # threshold — and usually stays empty on the host too; the
        # successful streams' device results are kept)
        out = []
        for s, p in enumerate(prefixes):
            if result and s < len(result) and result[s]:
                out.append(result[s])
                continue
            r = self._generate_host(p, length, context, 1)
            out.append(r[0] if r else '')
        return out

    def generate_batch_begin(self, prefixes: List[str], length: int,
                             context=None):
        """DISPATCH a prompt batch; ``generate_batch_finish`` later
        fetches and emits — the batched sibling of
        ``generate_begin``/``generate_finish`` (double-buffered
        serving for multi-prompt tiers)."""
        assert self.status > 1
        if self.device_beam and all(prefixes):
            from .ops.beam_device import generate_streams_begin
            return generate_streams_begin(self, prefixes, length,
                                          context)
        return ('gen-host-batch', (prefixes, length, context))

    def generate_batch_finish(self, pending) -> List[str]:
        """Fetch + emission for a ``generate_batch_begin`` dispatch;
        streams that came back empty take the host fallback, exactly
        like the synchronous ``generate_batch``."""
        if pending[0] == 'gen-host-batch':
            _, (prefixes, length, context) = pending
            result = None
        else:
            from .ops.beam_device import generate_streams_finish
            result = generate_streams_finish(pending)
            # (rater, prefixes, length, resolved context)
            _rater, prefixes, length, context = pending[-1]
            if result and all(result):
                return result
        out = []
        for s, p in enumerate(prefixes):
            if result and s < len(result) and result[s]:
                out.append(result[s])
                continue
            r = self._generate_host(p, length, context, 1)
            out.append(r[0] if r else '')
        return out

    def _generate_host(self, prefix: str, length: int, context=None,
                       variants: int = 1) -> List[str]:
        """Host/array generation fallback (see host_beam.generate_host)."""
        assert self.status > 1
        from .host_beam import generate_host
        return generate_host(self, prefix, length, context, variants)

    # -- lattice decoding ---------------------------------------------

    @_gc_paused
    def rate_best(self, graph, start_node, end_node,
                  start_traceback=None, context=None, lm_weight=0.5,
                  beam_width=10, beam_clustering_dist=0):
        """Best-path beam decode over a lattice of string alternatives
        on the host (capability of reference rating.py:712-858; see
        host_beam.decode_lattice_host for the redesigned engine).
        Hypothesis batches run as single jitted device steps; beam
        bookkeeping stays on host (PAGE graph traversal is inherently
        host-side).

        Returns ([(element, textequiv, score), ...], entropy, traceback).
        """
        from .host_beam import decode_lattice_host
        return decode_lattice_host(
            self, graph, start_node, end_node,
            start_traceback=start_traceback, context=context,
            lm_weight=lm_weight, beam_width=beam_width,
            clustering_dist=beam_clustering_dist)

    def next_path(self, beam, traceback):
        """Lock into the previous page's best path and advance the
        traceback (capability of reference rating.py:860-885; see
        host_beam.advance_traceback)."""
        from .host_beam import advance_traceback
        return advance_traceback(beam, traceback)

    # -- device lattice decoding --------------------------------------

    def rate_best_device(self, graph, start_node, end_node,
                         device_traceback=None, context=None,
                         lm_weight=0.5, beam_width=10):
        """Synchronous device decode: dispatch + fetch + emit.

        See ``rate_best_device_begin``/``rate_best_device_finish`` for
        the split form that lets a document loop pipeline pages."""
        pending, tb = self.rate_best_device_begin(
            graph, start_node, end_node,
            device_traceback=device_traceback, context=context,
            lm_weight=lm_weight, beam_width=beam_width)
        path, entropy = self.rate_best_device_finish(pending)
        return path, entropy, tb

    @staticmethod
    def concat_graphs(graphs):
        """Concatenate linear lattice graphs (e.g. one per page of a
        document) into ONE lattice whose decode chains the beam across
        the former boundaries — the batched analogue of the per-page
        ``device_traceback`` carry.  Use with :meth:`rate_best_batch`
        to decode N independent MULTI-PAGE documents in batched
        dispatches; path entries keep their ``element`` identity, so
        callers split results back into pages by element membership.
        Insert separator edges (e.g. a newline TextEquiv) beforehand if
        the model should see an explicit page break."""
        import networkx as nx
        out = nx.DiGraph()
        out.add_node(0)
        node = 0
        for g in graphs:
            # _linear_edges walks the successor map, so chain order is
            # label-independent (a label sort would silently reorder
            # lattices with non-monotonic node labels)
            for data in _linear_edges(g):
                out.add_edge(node, node + 1, **data)
                node += 1
        return out

    @_gc_paused
    def rate_best_batch(self, graphs, context=None, lm_weight=0.5,
                        beam_width=10):
        """Beam-decode N INDEPENDENT documents in ONE dispatch.

        Serving-oriented batch decoding with no reference counterpart
        (its ``rate_best`` handles one lattice per call): all lattices
        pad to shared buckets and run through a vmapped
        ``decode_lattice_device``; when ``self.mesh`` is set the
        document axis is sharded over the mesh ``data`` axis, so each
        chip decodes its own documents (multi-chip inference,
        SURVEY §5.8).  Every document starts from a fresh beam (use
        ``rate_best_device_begin`` for cross-page carry *within* a
        document).

        Returns a list of (path, entropy) like
        ``rate_best_device_finish``.
        """
        return self.rate_best_batch_finish(self.rate_best_batch_begin(
            graphs, context=context, lm_weight=lm_weight,
            beam_width=beam_width))

    @_gc_paused
    def rate_best_batch_finish(self, pending):
        """Fetch + path emission for a ``rate_best_batch_begin``
        dispatch; returns the results list.  See begin() for the
        double-buffered serving pattern."""
        kind = pending[0]
        if kind == 'done':
            return pending[1]
        if kind == 'fusedb':
            _, gpending, prepared, results = pending
            self._rate_best_batch_fused_finish(gpending, prepared,
                                               results)
            return results
        _, edges_list, live, packed_dev, K, results = pending
        packed = np.asarray(packed_dev)
        for row, i in enumerate(live):
            results[i] = self.rate_best_device_finish(
                ('single', edges_list[i], [packed[row]], K))
        return results

    @_gc_paused
    def rate_best_batch_begin(self, graphs, context=None,
                              lm_weight=0.5, beam_width=10):
        """DISPATCH a document batch; ``rate_best_batch_finish`` later
        fetches and emits.  A serving loop can dispatch batch N+1
        before finishing batch N, so batch N+1's host prep and batch
        N's fetch round-trip overlap the device decode (double
        buffering); results are identical to the synchronous
        ``rate_best_batch`` (which is begin+finish).  Special shapes
        (oversized pages, 0/1 live documents) resolve synchronously
        inside begin."""
        assert self.status > 1
        from . import native
        from .parallel.decode import make_batch_decode
        mesh = getattr(self, 'mesh', None)
        # _linear_edges yields the data dicts in its single O(E) walk —
        # a per-edge g.edges[e] view lookup alone cost ~1.2ms per
        # 1000-edge page (profiled)
        raw_list = [_linear_edges(g) for g in graphs]
        # sizes/maxlen via the native C++ scan when available: the
        # fused path can then skip the Python edge prep entirely
        # (native decode_fill does merge + vectorize + fill in C++)
        prepared: List[Any] = [None] * len(graphs)
        sizes = []
        maxlens = []
        for i, raw in enumerate(raw_list):
            if not raw:
                sizes.append(0)
                maxlens.append(0)
                continue
            scan = native.decode_scan(raw, self.merge_runs,
                                      DECODE_MERGE_MAX)
            if scan is None:
                prepared[i] = self._prepare_decode_edges(raw)
                sizes.append(len(prepared[i]))
                maxlens.append(max(
                    (len(ids) for pe in prepared[i]
                     for ids in pe['alt_ids']), default=1))
            else:
                sizes.append(scan[0])
                maxlens.append(scan[1])
        # unmerged-L1 preference: when every REAL alternative is a
        # single char (glyph lattices — run-merging is the only source
        # of L > 1), prepping WITHOUT run-merging puts every edge on
        # the batch kernel's L == 1 parent-row fast path (LSTM/softmax
        # at NK rows instead of NKA candidate rows) — measured 25-30%
        # faster than the merged L=8 slow path on realistic mixed
        # lattices, identical paths.  Decided only when every doc has
        # a native scan (the probe is one cheap C++ pass per doc).
        merge_flag = self.merge_runs
        K_f = _bucket(min(beam_width, FUSED_MAX_BEAM), (8, 16, 32))
        NA_f = (128 // K_f) * 4
        if merge_flag and self.fused_decode and \
                beam_width <= FUSED_MAX_BEAM and \
                max(maxlens, default=1) > 1 and \
                self._fused_decode_fits(512, NA_f, 1, 64) and \
                all(prepared[i] is None for i, raw in
                    enumerate(raw_list) if raw):
            scans_u = [native.decode_scan(raw, False, 1) if raw
                       else (0, 0) for raw in raw_list]
            if all(s is not None for s in scans_u) and \
                    max((s[1] for s in scans_u if s[0]),
                        default=1) <= 1:
                merge_flag = False
                sizes = [s[0] for s in scans_u]
                maxlens = [min(s[1], 1) for s in scans_u]
        live = [i for i, n in enumerate(sizes) if n]
        results: List[Any] = [([], 0.0)] * len(graphs)
        if not live:
            return ('done', results)
        L_max = _bucket(max(max(maxlens[i] for i in live), 1),
                        (1, 2, 4, 8, 16, 32, 64))
        fused_ok = (self.fused_decode and
                    beam_width <= FUSED_MAX_BEAM and
                    max(maxlens[i] for i in live) <= FUSED_MAX_ALT_LEN
                    and self._fused_decode_fits(512, NA_f, L_max, 64))
        if max(sizes, default=0) > self._E_BUCKETS[-1] and \
                not fused_ok:
            # the XLA batch path needs single-block documents; huge
            # pages decode via the single-document pipeline (passing
            # the already-extracted edge lists — begin() accepts them
            # directly, so the O(E) successor walk is not repeated).
            # The FUSED path is exempt: it chains E_blk blocks, so
            # oversized documents stay batched.
            out = []
            for raw in raw_list:
                path, ent, _ = self.rate_best_device(
                    raw, 0, 0, context=context,
                    lm_weight=lm_weight, beam_width=beam_width)
                out.append((path, ent))
            return ('done', out)
        if len(live) == 1:
            # a single live document decodes fastest through the
            # single-document engine (fused kernel when eligible);
            # the extracted edge list is reused, not re-walked
            i = live[0]
            path, ent, _ = self.rate_best_device(
                raw_list[i], 0, 0, context=context,
                lm_weight=lm_weight, beam_width=beam_width)
            results[i] = (path, ent)
            return ('done', results)
        if fused_ok:
            gpending = self._rate_best_batch_fused_begin(
                raw_list, prepared, sizes, maxlens, live, results,
                context, lm_weight, beam_width, mesh,
                merge=merge_flag)
            return ('fusedb', gpending, prepared, results)
        edges_list = [prepared[i] if prepared[i] is not None
                      else (self._prepare_decode_edges(raw_list[i])
                            if raw_list[i] else [])
                      for i in range(len(graphs))]
        D, W = self.depth, self.width
        K = _bucket(beam_width, STEP_BUCKETS)
        A = 4
        E = _bucket(max(sizes[i] for i in live), self._E_BUCKETS)
        maxlen = max(max((len(ids) for ids in pe['alt_ids']),
                         default=1)
                     for i in live for pe in edges_list[i])
        L = _bucket_unbounded(max(maxlen, 1),
                              (1, 2, 4, 8, 16, 32, 64))
        # pad the doc axis to the mesh data-parallel width (dummy
        # repeats of the first live doc, discarded after)
        n_live = len(live)
        N = n_live
        if mesh is not None:
            n_data = mesh.shape.get('data', 1)
            N = -(-n_live // n_data) * n_data
        fill_idx = [live[i % n_live] for i in range(N)]
        chars = np.zeros((N, E, A, L), np.int32)
        mask = np.zeros((N, E, A, L), np.float32)
        conf = np.zeros((N, E, A, L), np.float32)
        valid = np.zeros((N, E, A), np.float32)
        filled = {}  # mesh-padding repeats reuse the filled arrays
        for i, src in enumerate(fill_idx):
            if src not in filled:
                filled[src] = self._fill_decode_arrays(
                    edges_list[src], E, A, L)
            (chars[i], mask[i], conf[i], valid[i]) = filled[src]
        h0, c0, x0, cost0 = self._xla_traceback(None, K)
        h0 = np.broadcast_to(h0, (N,) + h0.shape).copy()
        c0 = np.broadcast_to(c0, (N,) + c0.shape).copy()
        x0 = np.broadcast_to(x0, (N,) + x0.shape).copy()
        cost0 = np.broadcast_to(cost0, (N,) + cost0.shape).copy()
        zs = tuple(self._context_arrays(context, 1))
        fn = make_batch_decode(self.cfg, E, A, L, K,
                               float(lm_weight), mesh)
        packed_dev = fn(self.params, chars, mask, conf, valid,
                        zs, h0, c0, x0, cost0)
        copy_async = getattr(packed_dev, 'copy_to_host_async', None)
        if copy_async is not None:
            copy_async()
        return ('xlab', edges_list, live, packed_dev, K, results)

    @_gc_paused
    def rate_best_device_begin(self, graph, start_node, end_node,
                               device_traceback=None, context=None,
                               lm_weight=0.5, beam_width=10,
                               defer_walk=False):
        """Beam-decode a linear lattice in ONE device dispatch.

        TPU-native alternative to ``rate_best``: the whole edge chain
        (padded to buckets) runs inside a jitted lax.scan with on-device
        top-k pruning; the host only builds the input arrays and walks
        the fetched (E, K) backpointer matrix.  Cross-page state is the
        final beam (states + costs + last chars) passed back in as
        ``device_traceback``.

        Differences vs the host/parity path (flag-gated, documented):
        decisions for a page are final when the page is decoded (no
        one-page lookahead lock-in), and the incremental 2.5/15-bit
        pruning thresholds and history clustering are subsumed by exact
        per-edge top-k.

        Returns (path [(element, textequiv, score)], entropy,
        new device_traceback).
        """
        from .ops.beam_device import decode_lattice_device

        # a plain list is already the linear chain (the wrapper's
        # page_get_linear_lattice_at output); DiGraphs are validated
        # and ordered by the successor walk
        edges_raw = graph if isinstance(graph, list) \
            else _linear_edges(graph)
        if not edges_raw:
            return ('done', [], 0.0), device_traceback
        if self.fused_decode:
            # fused Pallas kernel path (same deferred-fetch protocol);
            # edge prep runs natively (C++) when available.  The fused
            # kernel's 128-lane layout bounds K*A <= 128 and it fully
            # unrolls the char steps, so it only serves
            # beam_width <= 32 and alternatives <= 64 chars; wide
            # models / huge charsets must also fit the VMEM-resident
            # weight + intermediate budget — anything larger decodes
            # through the (exact, unbounded) XLA path.
            from . import native
            scan = native.decode_scan(edges_raw, self.merge_runs,
                                      DECODE_MERGE_MAX)
            if scan is not None and scan[0] > 0:
                # native scan: POST-merge (n_prep, maxlen).  Merged
                # runs cap at DECODE_MERGE_MAX (8) << the 64-char
                # kernel bound, so gating on the post-merge maxlen is
                # equivalent to the raw gate — and it replaces a
                # per-TextEquiv Python pass (~1 ms per 1000-edge page,
                # profiled) while sizing the VMEM probe to the ACTUAL
                # post-merge L/E buckets the fill will use.
                maxlen_gate = scan[1]
                L_fit = _bucket(max(maxlen_gate, 1),
                                (1, 2, 4, 8, 16, 32, 64))
                E_fit = _bucket(max(scan[0], 1), self._E_BUCKETS)
            else:
                maxlen_gate = max(
                    (len(te.Unicode) for pe in edges_raw
                     for te in pe['alternatives'][:4]), default=1)
                # post-merge L bound: runs merge up to
                # DECODE_MERGE_MAX chars, single long alternatives
                # keep their raw length
                L_fit = _bucket(
                    max(maxlen_gate,
                        DECODE_MERGE_MAX if self.merge_runs else 1, 1),
                    (1, 2, 4, 8, 16, 32, 64))
                E_fit = _bucket(len(edges_raw), self._E_BUCKETS)
            if beam_width <= FUSED_MAX_BEAM and \
                    maxlen_gate <= FUSED_MAX_ALT_LEN and \
                    self._fused_decode_fits(128, 4, L_fit, E_fit):
                return self._rate_best_pallas(edges_raw,
                                              device_traceback,
                                              context, lm_weight,
                                              beam_width,
                                              defer_walk=defer_walk,
                                              scan=scan)
            self.logger.info(
                'fused decode unavailable (beam_width %d > %d, '
                'alternative length %d > %d chars, or width/vocab '
                'beyond the VMEM budget): using XLA path',
                beam_width, FUSED_MAX_BEAM, maxlen_gate,
                FUSED_MAX_ALT_LEN)
        edges = self._prepare_decode_edges(edges_raw)
        D, W = self.depth, self.width
        K = _bucket(beam_width, STEP_BUCKETS)
        A = 4
        # fixed block buckets: long pages chain blocks of <= 1024 edges
        # through the device-resident beam carry, so ONE compiled shape
        # serves any page length (tunnel compiles cost minutes)
        E_BUCKETS = self._E_BUCKETS
        E_MAX = E_BUCKETS[-1]
        maxlen = max(max((len(ids) for ids in pe['alt_ids']),
                         default=1) for pe in edges)
        # unbounded: line/region-level alternatives can run to
        # thousands of chars; truncation would silently corrupt scores
        L = _bucket_unbounded(max(maxlen, 1), (1, 2, 4, 8, 16, 32, 64))
        h0, c0, x0, cost0 = self._xla_traceback(device_traceback, K)
        zs = self._context_arrays(context, 1)
        nE = len(edges)
        h, c, x_prev, cost = h0, c0, x0, cost0
        if nE <= E_MAX and not defer_walk:
            # single block: walk the traceback ON DEVICE and fetch only
            # (E+1, 2) — fetch bandwidth dominates small pages
            E = _bucket(nE, E_BUCKETS)
            alt_chars, alt_mask, alt_conf, alt_valid = \
                self._fill_decode_arrays(edges, E, A, L)
            packed, h, c, x_prev, cost = decode_lattice_device(
                self.params, self.cfg, alt_chars, alt_mask,
                alt_conf, alt_valid, tuple(zs), h, c, x_prev, cost,
                float(lm_weight), E, A, L, K, device_walk=True)
            pending = ('single', edges, [packed], K)
            return pending, (h, c, x_prev, cost)
        # dispatch ALL blocks first (the carry chains on device, so the
        # dispatches pipeline without host sync), fetch afterwards
        packed_blocks = []
        for lo in range(0, nE, E_MAX):
            block = edges[lo:lo + E_MAX]
            E = _bucket(len(block), E_BUCKETS)
            alt_chars, alt_mask, alt_conf, alt_valid = \
                self._fill_decode_arrays(block, E, A, L)
            packed, h, c, x_prev, cost = decode_lattice_device(
                self.params, self.cfg, alt_chars, alt_mask,
                alt_conf, alt_valid, tuple(zs), h, c, x_prev, cost,
                float(lm_weight), E, A, L, K)
            packed_blocks.append(packed)
        pending = ('blocks', edges, packed_blocks, K)
        return pending, (h, c, x_prev, cost)

    # block buckets shared by begin/finish
    # capped at 1024: a 2048 bucket FITS the conservative VMEM
    # estimate (~12.6MB at W=128/L=8) and halves the page-group
    # dispatch count, but measured 10x SLOWER end-to-end on v5e
    # (2.05s vs 0.19s for the 16-page workflow) — past ~1024
    # whole-resident edges the Mosaic kernel loses the VMEM headroom
    # it needs and thrashes; dispatch-count savings cannot pay for
    # that (tried and reverted in round 5)
    _E_BUCKETS = (64, 256, 1024)

    # -- cross-page device traceback normalization --------------------
    # The two device decode engines carry different beam-state layouts
    # across pages: the XLA scan uses (h (D,K,W), c, x_prev ids (K,),
    # cost (K,) with 3e38 empties); the fused kernel uses a packed
    # (K, (2D+1)W) state [xemb | h.. | c..] plus a (1, 128) cost lane
    # with 1e30 empties.  A document can legitimately mix engines (a
    # page with a long alternative or wide beam falls back to XLA), so
    # each path normalizes whatever traceback it receives.  The no-op
    # case (same format, same K) returns the arrays untouched so the
    # carry stays device-resident.

    def _xla_traceback(self, tb, K):
        """Normalize a device traceback to the XLA-path format with
        beam dimension ``K``."""
        D, W = self.depth, self.width
        if tb is None:
            h = np.zeros((D, K, W), np.float32)
            c = np.zeros((D, K, W), np.float32)
            x = np.full((K,), self.vocab.get('\n'), np.int32)
            cost = np.full((K,), 3.0e38, np.float32)
            cost[0] = 0.0
            return h, c, x, cost
        if len(tb) == 2:  # fused packed format -> unpack (host-side)
            state = np.asarray(tb[0])
            cost_l = np.asarray(tb[1])
            K0 = state.shape[0]
            h = np.stack([state[:, (1 + d) * W:(2 + d) * W]
                          for d in range(D)])
            c = np.stack([state[:, (1 + D + d) * W:(2 + D + d) * W]
                          for d in range(D)])
            # xemb rows are exact embedding rows (written by one-hot
            # matmuls), so nearest-neighbour recovery of the char id
            # is exact — PROVIDED the comparison table matches the one
            # the kernel wrote from: under the bf16 decode mode those
            # rows are bf16-rounded, so round the table identically
            # (distance is then exactly 0 at the true row)
            xemb = state[:, :W]
            emb = np.asarray(self.params['char_embedding'])
            if self._decode_bf16():
                emb = np.asarray(
                    jnp.asarray(emb).astype(jnp.bfloat16), np.float32)
            d2 = np.sum(emb * emb, axis=1)[None, :] - 2.0 * (xemb @ emb.T)
            x = np.argmin(d2, axis=1).astype(np.int32)
            cost = cost_l[0, :K0].astype(np.float32)
            cost = np.where(cost >= 1.0e29, 3.0e38, cost)
            tb = (h, c, x, cost)
        h0, c0, x0, cost0 = tb
        K0 = h0.shape[1]
        if K0 == K:
            return h0, c0, x0, cost0
        if K0 > K:  # beam narrowed between pages: keep the best slots
            return h0[:, :K], c0[:, :K], x0[:K], cost0[:K]
        padn = K - K0
        return (jnp.pad(h0, ((0, 0), (0, padn), (0, 0))),
                jnp.pad(c0, ((0, 0), (0, padn), (0, 0))),
                jnp.pad(x0, (0, padn)),
                jnp.pad(cost0, (0, padn), constant_values=3.0e38))

    def _fused_traceback(self, tb, K, emb):
        """Normalize a device traceback to the fused-kernel format
        (packed state (K, S), cost lane (1, 128)) given the padded
        embedding matrix ``emb``."""
        D, W = self.depth, self.width
        from .ops.decode_kernel import BIG, LANE
        # the packed state is always f32 (under decode_bf16 only the
        # MATMUL weights are bf16); bf16 embedding values pass through
        # the cast unchanged
        emb = jnp.asarray(emb, jnp.float32)
        if tb is None:
            state = jnp.zeros((K, (2 * D + 1) * W), jnp.float32)
            state = state.at[:, :W].set(jnp.broadcast_to(
                emb[self.vocab.get('\n')], (K, W)))
            cost = jnp.where(jnp.arange(LANE) == 0, 0.0,
                             BIG)[None, :].astype(jnp.float32)
            return state, cost
        if len(tb) == 4:  # XLA format -> pack (host-side)
            h, c, x, cost4 = (np.asarray(a) for a in tb)
            if h.shape[1] > LANE:
                # a wide-beam XLA page feeding a fused page: keep the
                # best LANE slots (XLA beams are rank-ordered, so a
                # prefix IS the best subset — same rule as K0 > K)
                h, c = h[:, :LANE], c[:, :LANE]
                x, cost4 = x[:LANE], cost4[:LANE]
            K0 = h.shape[1]
            state = np.concatenate(
                [np.asarray(emb)[x]]
                + [h[d] for d in range(D)] + [c[d] for d in range(D)],
                axis=1).astype(np.float32)
            cost = np.full((1, LANE), BIG, np.float32)
            cost[0, :K0] = np.where(cost4 >= 1.0e37, BIG, cost4)
            tb = (state, cost)
        state, cost = tb
        K0 = state.shape[0]
        if K0 == K:
            return state, cost
        if K0 > K:
            cost = jnp.asarray(cost)
            lane = jnp.arange(LANE)
            return state[:K], jnp.where(lane[None, :] < K, cost, BIG)
        return (jnp.pad(state, ((0, K - K0), (0, 0))),
                jnp.asarray(cost))

    @_gc_paused
    def fetch_pendings(self, pendings, prefetched=False):
        """Fetch the device arrays of MANY pending decodes in as few
        transfers as possible (same-shape packed arrays are stacked on
        device and fetched once — each separate fetch costs a full
        round-trip).  Returns pendings with numpy arrays.

        ``prefetched=True``: the caller already started per-array
        ``copy_to_host_async`` during its dispatch loop, so the bytes
        are on the host (or in flight) — converting each array
        directly beats re-staging a stacked copy on device."""
        new = [list(p) for p in pendings]
        items = []
        for pi, p in enumerate(pendings):
            if p[0] == 'done':
                continue
            new[pi][2] = list(p[2])
            for bi, arr in enumerate(p[2]):
                if isinstance(arr, np.ndarray):
                    continue
                if prefetched:
                    new[pi][2][bi] = np.asarray(arr)
                else:
                    items.append(((pi, bi), arr))
        for (pi, bi), val in _stacked_fetch(items).items():
            new[pi][2][bi] = val
        return [tuple(p) for p in new]

    @_gc_paused
    def rate_best_device_finish(self, pending, start_slot=0,
                                return_entry=False):
        """Fetch + traceback + path emission for a pending device
        decode (see ``rate_best_device``, which dispatches).  Separated
        so a document loop can dispatch ALL pages (carry chains on
        device) before paying any fetch round-trip.

        ``start_slot``/``return_entry`` serve the lookahead write-back
        mode (pages walked in reverse with chained entry slots); they
        require the records protocol (``defer_walk=True`` at begin)."""
        if pending[0] == 'done':
            out = pending[1], pending[2]
            return (out, int(start_slot)) if return_entry else out
        kind, edges, packed_blocks, K = pending
        nE = len(edges)
        if kind == 'single':
            if start_slot != 0 or return_entry:
                raise ValueError(
                    'device-walked pending has no per-slot records: '
                    'dispatch with defer_walk=True for lookahead')
            packed = np.asarray(packed_blocks[0])
            start_cost = float(packed[0, 0])
            choices = packed[1:nE + 1, 0].astype(np.int32)
            path_costs = packed[1:nE + 1, 1]
            return self._emit_path(edges, choices, path_costs,
                                   start_cost)
        all_rows = []
        start_cost = None
        start_costs = None
        for packed in packed_blocks:
            packed = np.asarray(packed)
            if start_cost is None:
                start_cost = float(packed[0, 0])
                # per-slot initial-beam costs (header cost third): the
                # walker anchors at its computed entry slot
                start_costs = np.asarray(packed[0, 2 * K:3 * K],
                                         np.float64)
            all_rows.append(packed[1:])
        # host traceback (exact across blocks): top_k sorts ascending,
        # so the best final hypothesis is slot 0
        return self._walk_traceback(edges, all_rows, K,
                                    self._E_BUCKETS[-1], start_cost,
                                    start_slot=start_slot,
                                    return_entry=return_entry,
                                    start_costs=start_costs)

    def _fused_decode_fits(self, rows: int, na: int, L: int,
                           E_blk: int) -> bool:
        """Conservative VMEM estimate for the fused decode kernels:
        VMEM-resident weights, per-edge intermediates (expanded state +
        logits over ``rows`` candidate rows; 128 single-doc, 512
        batched), the (E_blk, 8, 128) record buffer, and the
        whole-resident alt arrays (3 x E_blk x na x L x 4 bytes; ``na``
        = alternative rows per edge: A single-doc, N*A batched) must
        fit ~13 MB together.  Wide models (w >= ~384), huge charsets
        (several thousand codepoints), or long-alternative batches
        exceed it and decode through the XLA path (or a smaller E_blk)
        instead of crashing Mosaic allocation."""
        D, W = self.depth, self.width
        Vp = max(128, -(-self.voc_size // 128) * 128)
        S = (2 * D + 1) * W
        b = 32 * D * W * W             # fused [input|recurrent] kernels
        b += 8 * Vp * W                # emb + embT
        b += rows * (3 * S + Vp) * 4   # stateE / new state + logits
        b += E_blk * 8 * 128 * 4       # record buffer
        b += 3 * E_blk * na * L * 4    # alt chars/mask/conf
        b += 1 << 20                   # slack (iota matrices etc.)
        return b <= (13 << 20)

    def _decode_bf16(self) -> bool:
        """bf16 matmul weights for the fused DECODE kernels: default on
        for the compiled TPU path, off elsewhere.

        On TPU this is BIT-IDENTICAL to the f32 weights (verified:
        zero char and zero cost difference over 32 trained-model
        documents) because Mosaic's default precision for f32 matmul
        inputs is already a single bf16 pass — every consumer of a
        weight value either feeds such a matmul (quantizing it anyway)
        or a one-hot selection whose output only feeds one.  Shipping
        the weights AS bf16 skips the per-step input casts and halves
        their VMEM footprint: measured +18% on the uniform L=1 batch
        decode and +7% on realistic mixed lattices.  In interpret mode
        (CPU tests) f32 arithmetic is real f32, so bf16 would CHANGE
        results there — hence backend-gated.  Override with
        ``rater.decode_bf16 = True/False``."""
        flag = getattr(self, 'decode_bf16', None)
        if flag is None:
            return jax.default_backend() == 'tpu'
        return bool(flag)

    def _decode_weights(self, context, lm_weight, bf16=False):
        """Device-resident decode weight set for the fused Pallas
        kernel: vocab-padded (transposed) embedding, per-layer input/
        recurrent kernels, and biases with the page-constant context
        embedding folded into layer 0.  Cached per (params, context).

        ``bf16=True`` (the opt-in ``rater.decode_bf16`` decode mode)
        casts the matmul weights — emb/embT/wcat — to bfloat16 so the
        kernels' gate/logits matmuls run ONE MXU pass instead of the
        multi-pass f32 decomposition; biases, carried state, and all
        cost arithmetic stay f32.  Generation always requests f32
        (its parity contract is bit-level against the XLA engine)."""
        # lm_weight is NOT part of the key: no produced weight depends
        # on it (it scales costs inside the kernels), and keying on it
        # would thrash the single-entry cache when generation (fixed
        # 0.5) alternates with decoding at another weight
        ctx = tuple(context or self.underspecify_contexts())
        key = (self._params_epoch, ctx, bool(bf16))
        cached = self._decode_cache.get(key)
        if cached is not None:
            return cached
        # process-wide cache keyed by the loaded h5's fingerprint:
        # serving loops re-instantiate the processor (and its Rater)
        # per run over the same model file — re-staging ~MBs of device
        # weights cost ~45 ms/run (measured).  Only consulted while
        # params are UNTOUCHED since load (epoch match): any API
        # mutation (training, vocab growth/pruning) disables it.
        mkey = None
        if self._weights_fp is not None and \
                self._params_epoch == self._fp_epoch:
            mkey = (self._weights_fp, ctx, bool(bf16))
            with _DECODE_WCACHE_LOCK:
                hit = _DECODE_WCACHE.get(mkey)
                if hit is not None:
                    _DECODE_WCACHE.move_to_end(mkey)
            if hit is not None:
                # same size-4 eviction as the miss path: process-cache
                # hits must not grow the per-Rater cache unboundedly
                while len(self._decode_cache) >= 4:
                    del self._decode_cache[
                        next(iter(self._decode_cache))]
                self._decode_cache[key] = hit
                return hit
        W, D, V = self.width, self.depth, self.voc_size
        V_pad = max(128, -(-V // 128) * 128)
        emb = jnp.zeros((V_pad, W), jnp.float32)
        emb = emb.at[:V].set(jnp.asarray(self.params['char_embedding']))
        embT = emb.T
        ctx_vec = jnp.concatenate(
            [jnp.asarray(self.params['context_embeddings'][i])[
                ctx[i] if i < len(ctx) else 0]
             for i in range(len(self.contexts))]) \
            if self.contexts else jnp.zeros((0,))
        wcats, biases = [], []
        for d in range(D):
            lp = self.params['lstm'][d]
            kernel = jnp.asarray(lp['kernel'])
            bias = jnp.asarray(lp['bias'])
            if d == 0 and kernel.shape[0] > W:
                bias = bias + ctx_vec @ kernel[W:]
                kernel = kernel[:W]
            # fused [input-kernel; recurrent-kernel] -> one matmul/step
            wcats.append(jnp.concatenate(
                [kernel, jnp.asarray(lp['recurrent'])], axis=0))
            biases.append(bias)
        wcat = jnp.stack(wcats)
        if bf16:
            emb = emb.astype(jnp.bfloat16)
            embT = embT.astype(jnp.bfloat16)
            wcat = wcat.astype(jnp.bfloat16)
        weights = dict(
            emb=emb, embT=embT,
            wcat=wcat,
            bias=jnp.stack(biases)[:, None, :],
            v_pad=V_pad, v_real=V)
        # evict stale-params entries outright; otherwise keep a few
        # entries (evicting the OLDEST one at the cap, not clearing —
        # a wholesale clear would thrash the hot f32-generation /
        # bf16-decode pair this multi-entry cache exists to protect)
        stale = [k for k in self._decode_cache
                 if k[0] != self._params_epoch]
        for k in stale:
            del self._decode_cache[k]
        while len(self._decode_cache) >= 4:
            del self._decode_cache[next(iter(self._decode_cache))]
        self._decode_cache[key] = weights
        if mkey is not None:
            with _DECODE_WCACHE_LOCK:
                _DECODE_WCACHE[mkey] = weights
                _DECODE_WCACHE.move_to_end(mkey)
                while len(_DECODE_WCACHE) > 4:
                    _DECODE_WCACHE.popitem(last=False)
        return weights

    def fused_gate_arrays(self, n_prep, maxlen, beam_width):
        """(E, L) buckets when the fused single-document kernel can
        serve an array-lattice of this size in one block, else None
        (the native page lane then falls back to the lxml path)."""
        if not self.fused_decode or n_prep <= 0 or \
                beam_width > FUSED_MAX_BEAM or \
                maxlen > FUSED_MAX_ALT_LEN or \
                n_prep > self._E_BUCKETS[-1]:
            return None
        L = _bucket(max(maxlen, 1), (1, 2, 4, 8, 16, 32, 64))
        E = _bucket(n_prep, self._E_BUCKETS)
        if not self._fused_decode_fits(128, 4, L, E):
            return None
        return E, L

    @_gc_paused
    def rate_best_device_begin_arrays(self, n_prep, E, L, alt_chars,
                                      alt_mask, alt_conf, alt_valid,
                                      device_traceback=None,
                                      context=None, lm_weight=0.5,
                                      beam_width=10):
        """Fused decode dispatch for a PRE-FILLED array lattice (the
        native page lane, wrapper/page_native.py): same kernel,
        deferred-fetch protocol, and cross-page carry as
        ``_rate_best_pallas``, minus all Python edge objects.  The
        caller interprets choices/costs itself
        (``rate_best_device_finish_arrays``)."""
        from .ops.decode_kernel import decode_lattice_pallas

        D, W = self.depth, self.width
        K = _bucket(min(beam_width, FUSED_MAX_BEAM), (8, 16, 32))
        A = 4
        wts = self._decode_weights(context, lm_weight,
                                   bf16=self._decode_bf16())
        state, cost = self._fused_traceback(device_traceback, K,
                                            wts['emb'])
        steps = _alt_steps(alt_mask) if L > 1 else None
        packed, state, cost = decode_lattice_pallas(
            wts['emb'], wts['embT'], wts['wcat'], wts['bias'],
            alt_chars, alt_mask, alt_conf, alt_valid[:, :, None],
            state, cost, n_edges=E, n_alts=A, alt_len=L, beam=K,
            depth=D, width=W, v_pad=wts['v_pad'],
            v_real=wts['v_real'], lm_weight=float(lm_weight),
            device_walk=True, alt_steps=steps,
            n_real=np.int32(n_prep))
        return ('arrays', n_prep, [packed], K), (state, cost)

    @staticmethod
    def rate_best_device_finish_arrays(pending):
        """(choices, costs, start_cost) of a fetched 'arrays'
        pending."""
        _, n_prep, packed_blocks, _ = pending
        packed = np.asarray(packed_blocks[0])
        start_cost = float(packed[0, 0])
        return (packed[1:n_prep + 1, 0].astype(np.int64),
                np.asarray(packed[1:n_prep + 1, 1], np.float64),
                start_cost)

    @_gc_paused
    def rate_best_device_begin_arrays_group(self, segs,
                                            device_traceback=None,
                                            context=None,
                                            lm_weight=0.5,
                                            beam_width=10):
        """Fused decode of MULTIPLE consecutive pages in ONE kernel
        dispatch: the pages of a document form one linear lattice, so
        per-page dispatches only pay per-dispatch overhead (measured
        ~6 ms/page over tunneled links vs ~9 us/edge of kernel time).

        ``segs``: list of per-page ``(n_prep, chars, mask, conf,
        valid)`` with arrays of shape ``(n_prep_i, A, L)`` at a COMMON
        A/L (unpadded real edges only; the caller sizes the group so
        the concatenation fits one kernel block, see
        ``fused_group_fits``).  Returns ``(group_pending,
        traceback)``; per-page results come from
        ``rate_best_device_finish_group(group_pending, i)``.

        Bit-identical to per-page dispatches: the kernel's per-edge
        math does not depend on the E bucket (pad edges are skipped in
        closed form), the beam carry flows through the concatenated
        edges exactly as it would across per-page kernel boundaries,
        and each page's traceback starts at its own final edge's
        rank-0 slot, anchored at its entry slot's carried cost (the
        reference's cross-page prev_anchor semantics,
        reference lib/rating.py:736-741, 876)."""
        from .ops.decode_kernel import decode_lattice_pallas

        D, W = self.depth, self.width
        K = _bucket(min(beam_width, FUSED_MAX_BEAM), (8, 16, 32))
        A = 4
        bounds = np.cumsum([0] + [s[0] for s in segs])
        n_group = int(bounds[-1])
        L = segs[0][1].shape[2]
        E = _bucket(n_group, self._E_BUCKETS)
        chars = np.zeros((E, A, L), np.int32)
        mask = np.zeros((E, A, L), np.float32)
        conf = np.zeros((E, A, L), np.float32)
        valid = np.zeros((E, A), np.float32)
        for (n_i, ch_i, m_i, cf_i, v_i), lo in zip(segs, bounds):
            chars[lo:lo + n_i] = ch_i[:n_i]
            mask[lo:lo + n_i] = m_i[:n_i]
            conf[lo:lo + n_i] = cf_i[:n_i]
            valid[lo:lo + n_i] = v_i[:n_i]
        wts = self._decode_weights(context, lm_weight,
                                   bf16=self._decode_bf16())
        state, cost = self._fused_traceback(device_traceback, K,
                                            wts['emb'])
        steps = _alt_steps(mask) if L > 1 else None
        packed, state, cost = decode_lattice_pallas(
            wts['emb'], wts['embT'], wts['wcat'], wts['bias'],
            chars, mask, conf, valid[:, :, None],
            state, cost, n_edges=E, n_alts=A, alt_len=L, beam=K,
            depth=D, width=W, v_pad=wts['v_pad'],
            v_real=wts['v_real'], lm_weight=float(lm_weight),
            device_walk=False, alt_steps=steps,
            n_real=np.int32(n_group))
        return ('group', bounds, [packed], K, {}), (state, cost)

    def fused_group_fits(self, n_group, maxlen, beam_width):
        """Whether a page group totalling ``n_group`` prep edges with
        alternative length ``maxlen`` still fits ONE fused-kernel
        block (same gates as ``fused_gate_arrays``)."""
        return self.fused_gate_arrays(n_group, maxlen,
                                      beam_width) is not None

    @staticmethod
    def rate_best_device_finish_group(pending, i):
        """(choices, costs, start_cost) for page segment ``i`` of a
        group pending.  The fetched records are converted once per
        group (cached in the pending); each page is walked back from
        its own final edge's rank-0 slot through its own edge range,
        and anchored at the entry slot's carried cost — identical to
        what the per-page device walk would have produced."""
        _, bounds, packed_blocks, K, cache = pending
        if 'bp' not in cache:
            packed = np.asarray(packed_blocks[0])
            rows = packed[1:]
            # list conversion once per group: per-walk numpy scalar
            # indexing costs ~us/edge and the walks are host-sequential
            cache['bp'] = rows[:, :K].astype(np.int32).tolist()
            cache['alt'] = rows[:, K:2 * K].astype(np.int64).tolist()
            cache['cost'] = np.asarray(rows[:, 2 * K:3 * K],
                                       np.float64).tolist()
            cache['cost0'] = np.asarray(packed[0, 2 * K:3 * K],
                                        np.float64)
        bp, alt, co = cache['bp'], cache['alt'], cache['cost']
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        n = hi - lo
        choices = np.empty(n, np.int64)
        costs = np.empty(n, np.float64)
        k = 0
        for j in range(hi - 1, lo - 1, -1):
            choices[j - lo] = alt[j][k]
            costs[j - lo] = co[j][k]
            k = bp[j][k]
        if lo == 0:
            start_cost = float(cache['cost0'][k])
        else:
            start_cost = co[lo - 1][k]
        return choices, costs, start_cost

    def _rate_best_pallas(self, edges, device_traceback, context,
                          lm_weight, beam_width, defer_walk=False,
                          scan=None):
        """Fused-kernel decode dispatch (see ops/decode_kernel.py):
        same block chaining, pending format, and host traceback as the
        XLA path (finish happens in ``rate_best_device_finish``); the
        cross-page carry holds previous-char EMBEDDINGS instead of
        char ids.  ``edges`` are the RAW graph edge dicts; preparation
        (run merging + array fill) runs in the native C++ builder when
        available (ocrd_keraslm_tpu/native_src/decode_prep.cpp), else in Python.  Returns
        (pending, traceback)."""
        from .ops.decode_kernel import decode_lattice_pallas

        D, W = self.depth, self.width
        # K*A <= 128 lanes (callers gate beam_width <= FUSED_MAX_BEAM)
        K = _bucket(min(beam_width, FUSED_MAX_BEAM), (8, 16, 32))
        A = 4
        # instance attribute so tests can force multi-block chaining
        # at small scale (the blocks path otherwise needs >1024 edges)
        E_BUCKETS = self._E_BUCKETS
        E_MAX = E_BUCKETS[-1]
        arrays = None
        if edges and isinstance(edges[0], dict) and \
                'alternatives' in edges[0]:
            from . import native
            if scan is None:  # not pre-scanned by the dispatch gate
                scan = native.decode_scan(edges, self.merge_runs,
                                          DECODE_MERGE_MAX)
            if scan is not None and scan[0] > 0:
                n_prep, maxlen = scan
                L = _bucket(max(maxlen, 1), (1, 2, 4, 8, 16, 32, 64))
                # whole-doc fill, sliced per block below: multi-block
                # documents pad to an E_MAX multiple so every block
                # slices to exactly E_MAX rows (tail padding = native
                # free edges)
                E_full = (_bucket(n_prep, E_BUCKETS)
                          if n_prep <= E_MAX
                          else -(-n_prep // E_MAX) * E_MAX)
                filled = native.decode_fill(
                    edges, self.merge_runs, DECODE_MERGE_MAX, E_full,
                    A, L, self.vocab._table())
                if filled is not None:
                    edges, f_chars, f_mask, f_conf, f_valid = filled
                    arrays = (E_full, f_chars, f_mask, f_conf,
                              f_valid)
            if arrays is None:  # native unavailable
                edges = self._prepare_decode_edges(edges)
        if arrays is None:
            maxlen = max(max((len(ids) for ids in pe['alt_ids']),
                             default=1) for pe in edges)
            L = _bucket(max(maxlen, 1), (1, 2, 4, 8, 16, 32, 64))
        wts = self._decode_weights(context, lm_weight,
                                   bf16=self._decode_bf16())
        state, cost = self._fused_traceback(device_traceback, K,
                                            wts['emb'])
        nE = len(edges)
        # defer_walk: lookahead write-back needs the raw per-slot
        # records (walked later in reverse page order with chained
        # entry slots) instead of the on-device rank-0 walk
        single = nE <= E_MAX and not defer_walk
        packed_blocks = []
        for lo in range(0, nE, E_MAX):
            block = edges[lo:lo + E_MAX]
            if arrays is not None:
                E_full, f_chars, f_mask, f_conf, f_valid = arrays
                E = E_full if nE <= E_MAX else E_MAX
                alt_chars = f_chars[lo:lo + E]
                alt_mask = f_mask[lo:lo + E]
                alt_conf = f_conf[lo:lo + E]
                alt_valid = f_valid[lo:lo + E]
            else:
                E = _bucket(len(block), E_BUCKETS)
                alt_chars, alt_mask, alt_conf, alt_valid = \
                    self._fill_decode_arrays(block, E, A, L)
            # per-edge char-step bounds: short edges in a mixed-length
            # block stop paying for the L bucket
            steps = _alt_steps(alt_mask) if L > 1 else None
            packed, state, cost = decode_lattice_pallas(
                wts['emb'], wts['embT'], wts['wcat'], wts['bias'],
                alt_chars, alt_mask, alt_conf,
                alt_valid[:, :, None],
                state, cost,
                n_edges=E, n_alts=A, alt_len=L, beam=K, depth=D,
                width=W, v_pad=wts['v_pad'], v_real=wts['v_real'],
                lm_weight=float(lm_weight), device_walk=single,
                alt_steps=steps, n_real=np.int32(len(block)))
            packed_blocks.append(packed)
        return (('single' if single else 'blocks'), edges,
                packed_blocks, K), (state, cost)

    def _rate_best_batch_fused_begin(self, raw_list, prepared, sizes,
                               maxlens, live, results, context,
                               lm_weight, beam_width, mesh=None,
                               merge=None):
        """Document-batched fused decode (ops/decode_kernel.py
        ``decode_lattice_pallas_batch``): N = 128/K independent
        documents stack in the MXU row dimension of ONE kernel, so a
        serving batch decodes at a fraction of N sequential kernel
        runs.  With a mesh, the kernel is additionally ``shard_map``-ed
        over the ``data`` axis (S chips x N documents per dispatch,
        weights replicated, no collectives — multi-chip inference,
        SURVEY §5.8).  Per-doc semantics identical to the
        single-document fused path; every document starts from a fresh
        beam.

        Edge prep runs in the native C++ builder when available
        (merge + vectorize + array fill, ocrd_keraslm_tpu/native_src/decode_prep.cpp);
        ``prepared[i]`` caches the Python fallback / native metadata.
        Pass 1 only: dispatches every group's kernels + device walks
        and returns the pending group list;
        ``_rate_best_batch_fused_finish`` fetches once and fills
        ``results[i] = (path, entropy)`` for each ``i`` in ``live``.
        """
        from . import native
        from .ops.decode_kernel import (BIG, LANE,
                                        decode_lattice_pallas_batch,
                                        walk_records_batch)
        D, W = self.depth, self.width
        K = _bucket(min(beam_width, FUSED_MAX_BEAM), (8, 16, 32))
        A = 4
        N = LANE // K  # documents per kernel call (N*K = 128)
        S_sh = mesh.shape.get('data', 1) if mesh is not None else 1
        G = N * S_sh   # documents per dispatch
        wts = self._decode_weights(context, lm_weight,
                                   bf16=self._decode_bf16())
        emb = wts['emb']

        if merge is None:
            merge = self.merge_runs

        def doc_prepared(i):
            if prepared[i] is None:
                prepared[i] = self._prepare_decode_edges(
                    raw_list[i], merge=merge)
            return prepared[i]

        # whole-doc arrays filled ONCE (natively when available) and
        # sliced per block: the native fill previously only served
        # single-block docs, so multi-block groups (E_blk < doc size,
        # e.g. L=8 mixed-length lattices under the VMEM gate) fell
        # back to the ~10x slower Python edge prep (profiled)
        full_arrays: Dict[int, Any] = {}

        def doc_full(i, L):
            fa = full_arrays.get(i)
            if fa is None:
                # _bucket_unbounded: oversized (multi-block) documents
                # keep FULL host arrays — blocks slice+pad from them,
                # so only block shapes need to be bucketed for compile
                # reuse, not the whole-document array
                E_doc = _bucket_unbounded(max(sizes[i], 1),
                                          self._E_BUCKETS)
                if prepared[i] is None:
                    filled = native.decode_fill(
                        raw_list[i], merge,
                        DECODE_MERGE_MAX, E_doc, A, L,
                        self.vocab._table())
                    if filled is not None:
                        prepared[i] = filled[0]
                        fa = filled[1:]
                if fa is None:
                    fa = self._fill_decode_arrays(
                        doc_prepared(i), E_doc, A, L)
                full_arrays[i] = fa
            return fa

        def doc_arrays(i, lo, E, L, cache):
            arrays = cache.get(i)
            if arrays is None:
                fa = doc_full(i, L)
                if lo == 0 and E_blk >= fa[0].shape[0] == E:
                    arrays = fa
                else:
                    # a block covers at most E_blk REAL edges (the
                    # chaining stride), padded to the E bucket with
                    # free edges
                    out = []
                    for ai, a in enumerate(fa):
                        blk = a[lo:lo + min(E, E_blk)]
                        if blk.shape[0] < E:
                            pad = np.zeros(
                                (E - blk.shape[0],) + a.shape[1:],
                                a.dtype)
                            if ai == 3:  # valid: free alternative 0
                                pad[:, 0] = 1.0
                            blk = np.concatenate([blk, pad], axis=0)
                        out.append(blk)
                    arrays = tuple(out)
                cache[i] = arrays
            return arrays

        # fresh per-group beam init built ON DEVICE from the resident
        # embedding row and reused by every group: the previous
        # host-built (N*K, S) numpy init cost a ~320KB blocking upload
        # per group over tunneled links (measured ~10ms/group)
        state0, cost0 = _fused_batch_beam_init(
            emb[self.vocab.get('\n')], S_sh, N, K,
            (2 * D + 1) * W, W)
        if S_sh == 1:
            state0, cost0 = state0[0], cost0[0]

        # pass 1: dispatch every group's kernels + device walks (no
        # host sync anywhere — fetches happen once, in pass 2)
        pending = []  # (group, E_blk, [device walk per block])
        for glo in range(0, len(live), G):
            group = live[glo:glo + G]
            n_live = len(group)
            # pad the doc axis by repeating group docs (discarded)
            fill = [group[i % n_live] for i in range(G)]
            maxlen = max(maxlens[i] for i in group)
            L = _bucket(max(maxlen, 1), (1, 2, 4, 8, 16, 32, 64))
            # block size: the largest bucket whose whole-resident alt
            # arrays (3 * E_blk * N*A * L * 4 bytes) still fit the
            # kernel's VMEM budget alongside weights/intermediates
            # (the caller's gate guarantees at least E_blk=64 fits);
            # fused_batch_E_blk overrides (tests force small blocks)
            E_blk = getattr(self, 'fused_batch_E_blk', None)
            if not E_blk:
                for E_blk in (1024, 256, 64):
                    if self._fused_decode_fits(N * K * A, N * A, L,
                                               E_blk):
                        break
            nE = max(sizes[i] for i in group)
            state, cost = state0, cost0
            recs = []          # device records per block
            for lo in range(0, nE, E_blk):
                n_real_blk = max(min(max(sizes[i] - lo, 0), E_blk)
                                 for i in group)
                E = _bucket(n_real_blk, self._E_BUCKETS)
                cache: Dict[int, Any] = {}
                per = [doc_arrays(i, lo, E, L, cache) for i in fill]
                chars = np.stack([p[0] for p in per],
                                 axis=1).reshape(E, G * A, L)
                mask = np.stack([p[1] for p in per],
                                axis=1).reshape(E, G * A, L)
                conf = np.stack([p[2] for p in per],
                                axis=1).reshape(E, G * A, L)
                valid = np.stack([p[3] for p in per],
                                 axis=1).reshape(E, G * A)[..., None]
                if S_sh == 1:
                    # per-edge char-step bounds (see decode_kernel):
                    # short edges in a mixed-length group stop paying
                    # for the L bucket
                    steps = _alt_steps(mask) if L > 1 else None
                    rec, state, cost = decode_lattice_pallas_batch(
                        emb, wts['embT'], wts['wcat'], wts['bias'],
                        chars, mask, conf, valid, state, cost,
                        n_docs=N, n_edges=E, n_alts=A, alt_len=L,
                        beam=K, depth=D, width=W, v_pad=wts['v_pad'],
                        v_real=wts['v_real'],
                        lm_weight=float(lm_weight), alt_steps=steps,
                        n_real=np.int32(n_real_blk))
                else:
                    # docs doc-major: shard s takes docs [s*N, (s+1)*N)
                    from .parallel.decode import make_fused_batch_decode
                    fn = make_fused_batch_decode(
                        mesh, N, E, A, L, K, D, W, wts['v_pad'],
                        wts['v_real'], float(lm_weight))
                    mask_sh = mask.reshape(E, S_sh, N * A, L) \
                        .transpose(1, 0, 2, 3).copy()
                    if L > 1:
                        # per-SHARD step bounds: each chip's fori_loop
                        # runs to its own docs' max alternative length,
                        # not the group-wide one
                        steps = np.stack([_alt_steps(m)
                                          for m in mask_sh])
                    else:
                        steps = np.full((S_sh, E, 1), L, np.int32)
                    rec, state, cost = fn(
                        emb, wts['embT'], wts['wcat'], wts['bias'],
                        chars.reshape(E, S_sh, N * A, L)
                             .transpose(1, 0, 2, 3).copy(),
                        mask_sh,
                        conf.reshape(E, S_sh, N * A, L)
                            .transpose(1, 0, 2, 3).copy(),
                        valid.reshape(E, S_sh, N * A, 1)
                             .transpose(1, 0, 2, 3).copy(),
                        steps, state, cost)
                recs.append(rec)
            # walk the backpointers ON DEVICE (blocks in reverse,
            # starting slot chained between them); the fetch is then
            # (N, E, 2) per block instead of multi-MB record arrays
            walks_rev = []
            if S_sh == 1:
                k_in = jnp.zeros((N,), jnp.int32)  # rank 0 = best
                for rec in reversed(recs):
                    k_in, walk = walk_records_batch(rec, k_in,
                                                    n_docs=N, beam=K)
                    walks_rev.append(walk)
            else:
                from .parallel.decode import make_fused_batch_walk
                k_in = jnp.zeros((S_sh, N), jnp.int32)
                for rec in reversed(recs):
                    wfn = make_fused_batch_walk(mesh, N, K)
                    k_in, walk = wfn(rec, k_in)
                    # (S, N, E, 2) -> (G, E, 2) doc-major
                    walks_rev.append(walk.reshape(
                        G, walk.shape[2], 2))
            pending.append((group, E_blk, list(reversed(walks_rev))))
        # start the host copies now: with the split begin/finish API a
        # serving loop dispatches the NEXT batch while these complete
        for _, _, ws in pending:
            for w in ws:
                copy_async = getattr(w, 'copy_to_host_async', None)
                if copy_async is not None:
                    copy_async()
        return pending

    def _rate_best_batch_fused_finish(self, pending, prepared,
                                      results):
        # pass 2: ONE stacked fetch per distinct walk shape — each
        # host<->device sync costs a full RTT (~25ms over tunneled
        # setups, measured; per-group fetches regressed the batch
        # bench), so everything crosses in as few syncs as possible
        fetched = _stacked_fetch(
            [((gi, bi), w) for gi, (_, _, ws) in enumerate(pending)
             for bi, w in enumerate(ws)])
        for gi, (group, E_blk, ws) in enumerate(pending):
            for di, i in enumerate(group):
                edges = prepared[i]
                nE_d = len(edges)
                choices: List[int] = []
                pcosts: List[float] = []
                for bi in range(len(ws)):
                    walk = fetched[(gi, bi)]
                    real = min(max(nE_d - bi * E_blk, 0), E_blk)
                    choices.extend(
                        walk[di, :real, 0].astype(np.int64))
                    pcosts.extend(walk[di, :real, 1])
                results[i] = self._emit_path(edges, choices, pcosts,
                                             0.0)

    def _prepare_decode_edges(self, edges, merge=None):
        """Convert graph edges into decode-edge dicts, merging runs of
        consecutive single-alternative edges into one long edge.

        Merging is EXACT for the search: all hypotheses extend by the
        same string, so per-edge top-k between merged boundaries is a
        no-op; per-char confidences are preserved.  Only the score
        attribution within a merged run becomes uniform per char
        (competitive multi-alternative elements are never merged).
        Char steps are nearly free on device; per-edge overhead
        dominates (measured), so merging directly multiplies decode
        throughput on realistic lattices.
        """
        MERGE_MAX = DECODE_MERGE_MAX
        prepared = []
        run = None  # accumulating merged run

        def flush():
            nonlocal run
            if run is not None:
                prepared.append(run)
                run = None

        encode = self.vocab.encode_cached
        bits_cache: Dict[float, float] = {}
        bits_get = bits_cache.get
        if merge is None:
            merge = self.merge_runs
        pappend = prepared.append

        def conf_bits(te):
            conf = te.conf if te.conf is not None else 1.0
            bits = bits_get(conf)
            if bits is None:
                bits = -log(max(conf, 1e-99), 2)
                bits_cache[conf] = bits
            return bits

        for edge in edges:
            alternatives = edge['alternatives']
            if merge and len(alternatives) == 1:
                te = alternatives[0]
                ids = encode(te.Unicode)
                bits = conf_bits(te)
                part = (edge['element'], te, max(len(ids), 1))
                if run is not None and \
                        run['n_chars'] + len(ids) <= MERGE_MAX:
                    run['pieces'].append((ids, bits))
                    run['n_chars'] += len(ids)
                    run['parts'].append(part)
                else:
                    flush()
                    run = {
                        'pieces': [(ids, bits)],
                        'n_chars': len(ids),
                        'alts': alternatives,
                        'parts': [part],
                    }
            else:
                flush()
                # alt_conf as per-alternative scalars (no tiny arrays)
                alt_ids, alt_conf = [], []
                for te in alternatives[:4]:
                    alt_ids.append(encode(te.Unicode))
                    conf = te.conf if te.conf is not None else 1.0
                    bits = bits_get(conf)
                    if bits is None:
                        bits = -log(max(conf, 1e-99), 2)
                        bits_cache[conf] = bits
                    alt_conf.append(bits)
                pappend({'alt_ids': alt_ids, 'alt_conf': alt_conf,
                         'alts': alternatives, 'parts': None,
                         'element': edge['element']})
        flush()
        # materialize merged runs
        for pe in prepared:
            if 'pieces' in pe:
                pe['alt_ids'] = [np.concatenate(
                    [ids for ids, _ in pe['pieces']])
                    if len(pe['pieces']) > 1 else pe['pieces'][0][0]]
                pe['alt_conf'] = [np.concatenate(
                    [np.full(len(ids), b, np.float32)
                     for ids, b in pe['pieces']])]
                del pe['pieces']
                del pe['n_chars']
        return prepared

    @staticmethod
    def _fill_decode_arrays(block, E, A, L):
        """(E, A, L) char/mask/conf + (E, A) valid arrays for a block
        of prepared decode edges (padding edges = identity)."""
        alt_chars = np.zeros((E, A, L), np.int32)
        alt_mask = np.zeros((E, A, L), np.float32)
        alt_conf = np.zeros((E, A, L), np.float32)
        alt_valid = np.zeros((E, A), np.float32)
        # single-char alternatives fill via ONE fancy-index write each
        # (list appends beat 28k tiny numpy slice assignments per page)
        f_ei, f_ai, f_ch, f_cf = [], [], [], []
        for ei, pe in enumerate(block):
            confs = pe['alt_conf']
            for ai, ids in enumerate(pe['alt_ids'][:A]):
                cb = confs[ai]
                if len(ids) == 1 and not isinstance(cb, np.ndarray):
                    f_ei.append(ei)
                    f_ai.append(ai)
                    f_ch.append(ids[0])
                    f_cf.append(cb)
                    continue
                n = min(len(ids), L)
                alt_chars[ei, ai, :n] = ids[:n]
                alt_mask[ei, ai, :n] = 1.0
                # scalar (per-alternative) or per-char array (merged)
                alt_conf[ei, ai, :n] = cb[:n] \
                    if isinstance(cb, np.ndarray) else cb
                alt_valid[ei, ai] = 1.0
        if f_ei:
            alt_chars[f_ei, f_ai, 0] = f_ch
            alt_mask[f_ei, f_ai, 0] = 1.0
            alt_conf[f_ei, f_ai, 0] = f_cf
            alt_valid[f_ei, f_ai] = 1.0
        for ei in range(len(block), E):
            alt_valid[ei, 0] = 1.0  # zero-length free alternative
        return alt_chars, alt_mask, alt_conf, alt_valid

    def _walk_traceback(self, edges, all_rows, K, E_MAX,
                        start_cost, start_slot=0, return_entry=False,
                        start_costs=None):
        """Host backpointer walk over fetched [bp|alt|cost] rows (exact
        across chained blocks; slot 0 is the best final hypothesis),
        then path emission with merged-run score attribution.

        ``start_slot`` selects which final-beam hypothesis to walk
        (rank order; 0 = best) — the lookahead write-back mode walks
        page N at the slot page N+1's own walk entered through.  With
        ``return_entry`` the result carries the entry slot at the
        page's FIRST edge (= the slot in the previous page's final
        beam, since the carry preserves slot order)."""
        nE = len(edges)
        rows = np.concatenate(all_rows, axis=0)
        bp = rows[:, :K].astype(np.int32)
        alts_m = rows[:, K:2 * K].astype(np.int32)
        costs_m = rows[:, 2 * K:]
        k = int(start_slot)
        rev_choices = []
        rev_costs = []
        for ei in range(len(rows) - 1, -1, -1):
            rev_choices.append(alts_m[ei, k])
            rev_costs.append(costs_m[ei, k])
            k = int(bp[ei, k])
        rev_choices.reverse()
        rev_costs.reverse()
        choices = []
        path_costs = []
        # per-block row counts come from the fetched blocks themselves:
        # the Python fill emits _bucket(block_len) rows but the native
        # multi-block fill emits E_MAX rows for every block, so
        # re-deriving the stride from a bucketing formula would have
        # two divergent producers
        pos = 0
        for rows_blk, lo in zip(all_rows, range(0, nE, E_MAX)):
            block_len = min(E_MAX, nE - lo)
            choices.extend(rev_choices[pos:pos + block_len])
            path_costs.extend(rev_costs[pos:pos + block_len])
            pos += len(rows_blk)
        if start_costs is not None and len(start_costs) > k:
            # anchor at the ENTRY slot's initial cost, like the host
            # engine's prev_anchor.cost_after: the walked path may
            # continue from a non-best previous-page hypothesis
            start_cost = float(start_costs[k])
        out = self._emit_path(edges, choices, path_costs, start_cost)
        return (out, k) if return_entry else out

    def _emit_path(self, edges, choices, path_costs, start_cost):
        """Build the (element, textequiv, score) path from per-edge
        choices + cumulative costs, expanding merged runs (uniform
        per-char score within a run).

        Bulk-converts the fetched cost/choice arrays once (.tolist());
        per-element numpy scalar indexing cost ~8.6 us/edge and
        dominated whole-document decode (measured).  The hot loop runs
        natively (native_src/decode_prep.cpp decode_emit) when the C++
        library is available; this Python body is the parity-tested
        fallback."""
        from . import native
        out = native.decode_emit(edges, choices, path_costs, 0.0
                                 if start_cost is None else start_cost)
        if out is not None:
            return out
        nE = len(edges)
        costs = np.asarray(path_costs[:nE], np.float64).tolist()
        chs = np.asarray(choices[:nE], np.int64).tolist()
        path = []
        append = path.append
        prev = start_cost
        for pe, cum, ai in zip(edges, costs, chs):
            diff = cum - prev
            parts = pe['parts']
            if parts is not None:
                total_chars = sum(n for _, _, n in parts)
                score = 2.0 ** (-diff / (total_chars or 1))
                if score > 1.0:
                    score = 1.0
                for element, te, _n in parts:
                    append((element, te, score))
            else:
                alts = pe['alts']
                te = alts[ai] if ai < len(alts) else alts[-1]
                score = 2.0 ** (-diff / (len(te.Unicode) or 1))
                append((pe.get('element'), te,
                        score if score < 1.0 else 1.0))
            prev = cum
        entropy = costs[-1] - start_cost
        return path, entropy

    # -- training (delegates to trainer module) -----------------------

    def train(self, data, val_data=None):
        from .training import train_rater
        train_rater(self, data, val_data=val_data)

    # -- embedding analysis/plots -------------------------------------

    def plot_char_embeddings_similarity(self, filename):
        """Autocorrelation heatmap of char embeddings (reference
        rating.py:1186-1204)."""
        logging.getLogger('matplotlib').setLevel(logging.WARNING)
        from matplotlib import cm
        from matplotlib import pyplot as plt
        assert self.status == 2
        wgt = np.asarray(self.params['char_embedding'])
        cor = np.dot(wgt, wgt.T)
        plt.imsave(filename, np.abs(cor), cmap=cm.gray)

    def plot_context_embeddings_similarity(self, filename, n=1):
        logging.getLogger('matplotlib').setLevel(logging.WARNING)
        from matplotlib import cm
        from matplotlib import pyplot as plt
        assert self.status == 2
        wgt = np.asarray(self.params['context_embeddings'][n - 1])
        cor = np.dot(wgt, wgt.T)
        plt.imsave(filename, np.abs(cor), cmap=cm.gray)

    def plot_context_embeddings_projection(self, filename, n=1):
        logging.getLogger('matplotlib').setLevel(logging.WARNING)
        from matplotlib import pyplot as plt
        from sklearn.decomposition import PCA
        assert self.status == 2
        wgt = np.asarray(self.params['context_embeddings'][n - 1])
        prj = PCA(n_components=2).fit_transform(wgt)
        plt.figure(figsize=(11.7, 8.3))
        plt.plot(prj[:, 0], prj[:, 1], 'bo', markersize=2)
        for year, xy in enumerate(_spread_labels(prj)):
            plt.text(xy[0], xy[1], str(year) + 'x', c='b', size='xx-small')
        plt.tick_params(left=False, right=False, bottom=False,
                        labelleft=False, labelbottom=False)
        plt.savefig(filename)
