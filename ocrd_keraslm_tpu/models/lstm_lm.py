"""Character-level stacked-LSTM language model — pure-functional JAX core.

Capability-equivalent to the reference Keras model built in
``Rater.configure`` (/root/reference/ocrd_keraslm/lib/rating.py:61-179):
char embedding (voc_size x width) concatenated with per-variable context
embeddings, ``depth`` LSTM layers with variational (time-constant)
dropout between hidden layers, and a weight-tied softmax output
(softmax(h @ E^T), no extra projection/bias).

TPU-first redesign: instead of three separately compiled Keras graphs
(stateful / stateless-windowed / incremental), there is ONE pure cell
function.  "Stateful" mode is the caller threading the explicit
``(h, c)`` carry across successive calls; "incremental" mode is the same
function invoked for a single step over a batch of hypotheses; windowed
scoring is ``lax.scan`` over time with a zero carry.  The input
projection ``x @ W + b`` for the whole sequence is hoisted out of the
scan into one large MXU matmul per layer (the same trick cuDNN uses),
so the recurrent scan only contains the ``h @ U`` matmul and the gate
elementwise ops.

Weight layout matches Keras 2.3 LSTM convention: ``kernel`` (in, 4W),
``recurrent`` (W, 4W), ``bias`` (4W,), gate order i, f, g(c~), o;
activation tanh, recurrent activation sigmoid (the reference forces
sigmoid for CPU/GPU parity, rating.py:133-134).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Default context-variable table sizes mirror the reference's hardcoded
# year-decade embedding: vocab 200 (decades 0..2000 AD), dim 10
# (rating.py:110-114).  Unlike the reference, context variables are a
# first-class configurable list (the fix requested at rating.py:118-122).
DEFAULT_CONTEXTS: Tuple[Tuple[int, int], ...] = ((200, 10),)

Params = Dict[str, Any]
Carry = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each (depth, B, W)


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Hyperparameters of the LM (travel inside checkpoints)."""
    width: int = 128
    depth: int = 2
    length: int = 256
    voc_size: int = 0
    # list of (table_size, embed_dim) per context variable:
    contexts: Tuple[Tuple[int, int], ...] = DEFAULT_CONTEXTS
    stateful: bool = True
    variable_length: bool = False
    # dropout rate between hidden layers (variational / time-constant):
    dropout: float = 0.1
    # compute dtype for the recurrent core ('float32' or 'bfloat16'):
    compute_dtype: str = 'float32'

    @property
    def n_contexts(self) -> int:
        return len(self.contexts)

    @property
    def input_dim(self) -> int:
        return self.width + sum(d for _, d in self.contexts)

    def replace(self, **kw) -> 'LMConfig':
        return dataclasses.replace(self, **kw)


# ----------------------------------------------------------------------
# parameter init
# ----------------------------------------------------------------------

def init_params(cfg: LMConfig, rng: jax.Array) -> Params:
    """Initialise parameters matching reference initialisers:
    embeddings ~ N(0, 0.001) (rating.py:105,112), LSTM kernel
    glorot-uniform, recurrent orthogonal, bias zeros with forget-gate
    bias 1 (Keras ``unit_forget_bias`` default)."""
    keys = jax.random.split(rng, 2 + cfg.depth * 2 + cfg.n_contexts)
    ki = iter(range(len(keys)))
    W = cfg.width
    params: Params = {
        'char_embedding': 0.001 * jax.random.normal(
            keys[next(ki)], (cfg.voc_size, W), jnp.float32),
        'context_embeddings': [
            0.001 * jax.random.normal(keys[next(ki)], (n, d), jnp.float32)
            for n, d in cfg.contexts],
        'lstm': [],
    }
    for layer in range(cfg.depth):
        in_dim = cfg.input_dim if layer == 0 else W
        limit = np.sqrt(6.0 / (in_dim + 4 * W))
        kernel = jax.random.uniform(
            keys[next(ki)], (in_dim, 4 * W), jnp.float32, -limit, limit)
        # orthogonal init for the recurrent kernel (per gate block):
        rec = _orthogonal(keys[next(ki)], (W, 4 * W))
        bias = np.zeros((4 * W,), np.float32)
        bias[W:2 * W] = 1.0  # unit forget bias
        params['lstm'].append({
            'kernel': kernel,
            'recurrent': rec,
            'bias': jnp.asarray(bias),
        })
    return params


def _orthogonal(key: jax.Array, shape: Tuple[int, int]) -> jnp.ndarray:
    """Orthogonal initialisation (rows x cols, like Keras Orthogonal)."""
    n_rows, n_cols = shape
    big = max(n_rows, n_cols)
    a = jax.random.normal(key, (big, big), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    return q[:n_rows, :n_cols]


def zero_carry(cfg: LMConfig, batch: int) -> Carry:
    h = jnp.zeros((cfg.depth, batch, cfg.width), jnp.float32)
    c = jnp.zeros((cfg.depth, batch, cfg.width), jnp.float32)
    return h, c


# ----------------------------------------------------------------------
# cell math (shared by jnp scan and as reference for the Pallas kernel)
# ----------------------------------------------------------------------

def lstm_gates(x_proj: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
               recurrent: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused LSTM step given the precomputed input projection.

    x_proj: (B, 4W) = x @ kernel + bias;  h, c: (B, W);
    recurrent: (W, 4W).  Gate order i, f, g, o (Keras).
    Returns (h', c').
    """
    W = h.shape[-1]
    z = x_proj + jnp.dot(h, recurrent, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[..., 0 * W:1 * W])
    f = jax.nn.sigmoid(z[..., 1 * W:2 * W])
    g = jnp.tanh(z[..., 2 * W:3 * W])
    o = jax.nn.sigmoid(z[..., 3 * W:4 * W])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _layer_scan_jnp(x_proj: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray,
                    recurrent: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scan one LSTM layer over time.

    x_proj: (B, T, 4W); h0, c0: (B, W).
    Returns (h_all (B, T, W), hT, cT).

    If ``recurrent`` is bfloat16 the h operand of the recurrent matmul
    is cast to bfloat16 (halved bandwidth); gates, cell state and
    outputs stay float32.
    """
    cdt = recurrent.dtype

    def step(carry, xp_t):
        h, c = carry
        h2, c2 = lstm_gates(xp_t, h.astype(cdt), c, recurrent)
        return (h2, c2), h2
    (hT, cT), h_all = jax.lax.scan(
        step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(h_all, 0, 1), hT, cT


def _layer_scan(x_proj, h0, c0, recurrent, *, use_pallas: bool):
    if use_pallas:
        from ..ops.lstm_cell import lstm_scan_pallas
        return lstm_scan_pallas(x_proj, h0, c0, recurrent)
    return _layer_scan_jnp(x_proj, h0, c0, recurrent)


def _layer_scan_masked(x_proj, h0, c0, recurrent, mask):
    """Like ``_layer_scan_jnp`` but with a per-position validity mask
    (B, T): masked positions pass the carry through unchanged, so a
    left-padded window behaves exactly like the shorter window — the
    static-shape equivalent of the reference's variable-length windows
    (rating.py:95-99, 1082-1087)."""
    def step(carry, inp):
        xp_t, m_t = inp
        h, c = carry
        h2, c2 = lstm_gates(xp_t, h, c, recurrent)
        h2 = jnp.where(m_t > 0, h2, h)
        c2 = jnp.where(m_t > 0, c2, c)
        return (h2, c2), h2
    (hT, cT), h_all = jax.lax.scan(
        step, (h0, c0),
        (jnp.swapaxes(x_proj, 0, 1),
         jnp.swapaxes(mask[..., None], 0, 1)))
    return jnp.swapaxes(h_all, 0, 1), hT, cT


# ----------------------------------------------------------------------
# forward passes
# ----------------------------------------------------------------------

def embed_inputs(params: Params, cfg: LMConfig, x: jnp.ndarray,
                 zs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Embed char indices x (B, T) and context indices zs[i] (B, T) or
    (B,) broadcast; concatenate along features -> (B, T, input_dim)."""
    emb = params['char_embedding'][x]          # (B, T, W)
    feats = [emb]
    for z, table in zip(zs, params['context_embeddings']):
        if z.ndim == 1:                         # time-constant context
            z = jnp.broadcast_to(z[:, None], x.shape)
        feats.append(table[z])                  # (B, T, d)
    return jnp.concatenate(feats, axis=-1)


def forward_seq(params: Params, cfg: LMConfig, x: jnp.ndarray,
                zs: Sequence[jnp.ndarray], carry: Optional[Carry] = None,
                *, train: bool = False, rng: Optional[jax.Array] = None,
                use_pallas: bool = False,
                x_mask: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, Carry]:
    """Full-sequence forward.

    x: (B, T) int32 char indices; zs: context index arrays (B,) or (B,T).
    carry: explicit (h, c) or None for zeros.
    x_mask: optional (B, T) validity mask — masked positions leave the
    recurrent state untouched, making a left-padded window equivalent
    to the shorter window (variable-length mode).
    Returns (logits (B, T, V), final carry).

    Covers reference "stateful contiguous" mode (carry threaded by
    caller across windows) and, with ``logits[:, -1]``, the stateless
    windowed mode.
    """
    B, T = x.shape
    cdt = jnp.dtype(cfg.compute_dtype)
    if carry is None:
        carry = zero_carry(cfg, B)
    h0, c0 = carry
    inp = embed_inputs(params, cfg, x, zs).astype(cdt)
    hs, cs = [], []
    for layer in range(cfg.depth):
        lp = params['lstm'][layer]
        # hoisted input projection: one big MXU matmul over all T steps
        x_proj = (jnp.einsum('btd,df->btf', inp, lp['kernel'].astype(cdt),
                             preferred_element_type=jnp.float32)
                  + lp['bias'])
        rec = lp['recurrent']
        if cdt != jnp.float32:
            rec = rec.astype(cdt)
        if x_mask is not None:
            # the masked scan runs in FULL f32: pass the original
            # weights, not a bf16 round-trip of them (rec.astype(f32)
            # would keep only the bf16 mantissa under compute_dtype
            # bfloat16, silently quantizing variable-length scoring)
            h_all, hT, cT = _layer_scan_masked(
                x_proj, h0[layer], c0[layer],
                lp['recurrent'].astype(jnp.float32), x_mask)
        else:
            h_all, hT, cT = _layer_scan(
                x_proj, h0[layer], c0[layer], rec,
                use_pallas=use_pallas and cdt in (jnp.float32,
                                                 jnp.bfloat16))
        hs.append(hT)
        cs.append(cT)
        inp = h_all
        if layer > 0 and train and cfg.dropout > 0 and rng is not None:
            # variational (time-constant) dropout on hidden-to-hidden
            # outputs, matching reference noise_shape (rating.py:146-152)
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(
                sub, 1.0 - cfg.dropout, (B, 1, cfg.width))
            inp = inp * keep / (1.0 - cfg.dropout)
        inp = inp.astype(cdt)
    logits = jnp.einsum(
        'btw,vw->btv', inp.astype(jnp.float32), params['char_embedding'],
        preferred_element_type=jnp.float32)
    return logits, (jnp.stack(hs), jnp.stack(cs))


def forward_step(params: Params, cfg: LMConfig, x: jnp.ndarray,
                 zs: Sequence[jnp.ndarray], carry: Carry
                 ) -> Tuple[jnp.ndarray, Carry]:
    """Single-step incremental forward for a batch of hypotheses.

    x: (B,) int32; zs: (B,) each; carry: explicit (h, c).
    Returns (probs (B, V) float32 softmax, new carry).

    This is the engine under beam search — the reference's
    "incremental" compile mode with explicit per-layer state in/out
    (rating.py:135-142, 578-639) collapsed into a pure function.
    """
    h0, c0 = carry
    emb = params['char_embedding'][x]           # (B, W)
    feats = [emb]
    for z, table in zip(zs, params['context_embeddings']):
        feats.append(table[z])
    inp = jnp.concatenate(feats, axis=-1)
    hs, cs = [], []
    for layer in range(cfg.depth):
        lp = params['lstm'][layer]
        x_proj = jnp.dot(inp, lp['kernel'],
                         preferred_element_type=jnp.float32) + lp['bias']
        h2, c2 = lstm_gates(x_proj, h0[layer], c0[layer], lp['recurrent'])
        hs.append(h2)
        cs.append(c2)
        inp = h2
    logits = jnp.dot(inp, params['char_embedding'].T,
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return probs, (jnp.stack(hs), jnp.stack(cs))


# ----------------------------------------------------------------------
# losses / regularizers
# ----------------------------------------------------------------------

def char_embedding_regularizer(emb: jnp.ndarray) -> jnp.ndarray:
    """Underspecification + lowrank loss on the char embedding matrix,
    train-phase only (reference ``_regularise_chars``, rating.py:222-246):
    index-0 vector pulled to the mean of all others (stop-grad), and all
    row norms pulled toward 1."""
    if emb.shape[0] <= 1:
        # with only the reserved index-0 row, emb[1:] is empty and its
        # mean is NaN (Rater.configure clamps voc_size to >= 1, so the
        # reachable degenerate state is 1, not 0)
        return jnp.float32(0)
    vec0 = emb[0:1]
    mean_rest = jax.lax.stop_gradient(jnp.mean(emb[1:], axis=0))
    underspec = 1.0 * jnp.sum(jnp.square(vec0 - mean_rest))
    norms = jnp.sum(jnp.square(emb), axis=1)
    lowrank = 0.01 * jnp.sum(jnp.square(1.0 - norms))
    return lowrank + underspec


def context_embedding_regularizer(emb: jnp.ndarray) -> jnp.ndarray:
    """Lowrank + adjacency smoothness + weighted-mean underspecification
    on a context embedding matrix (reference ``_regularise_contexts``,
    rating.py:186-220)."""
    n = emb.shape[0]
    norms = jnp.sum(jnp.square(emb), axis=1)
    lowrank = 0.02 * jnp.sum(jnp.square(1.0 - norms))
    vecs1 = jax.lax.stop_gradient(emb[1:n - 1])
    vecs2 = emb[2:n]
    smooth = 0.2 * jnp.sum(jnp.dot(vecs1, vecs2.T))
    vec0 = emb[0:1]
    vecs = emb[1:]
    wgts = jax.lax.stop_gradient(jnp.sum(vecs * vecs, axis=1))
    mean_rest = jax.lax.stop_gradient(jnp.mean(vecs, axis=0))
    underspec = 2.0 * jnp.sum(jnp.square(vec0 - wgts[:, None] * mean_rest))
    return lowrank + smooth + underspec


def regularization_loss(params: Params) -> jnp.ndarray:
    loss = char_embedding_regularizer(params['char_embedding'])
    for emb in params['context_embeddings']:
        loss = loss + context_embedding_regularizer(emb)
    return loss


def sequence_xent(logits: jnp.ndarray, targets: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean categorical cross-entropy (natural log) + accuracy.

    logits: (..., V); targets int indices (...); mask optional (...)
    float/bool.  Returns (mean NLL, mean accuracy) over masked items.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    if mask is None:
        return jnp.mean(nll), jnp.mean(correct)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return (jnp.sum(nll * mask) / denom,
            jnp.sum(correct * mask) / denom)
