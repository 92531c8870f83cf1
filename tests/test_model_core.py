"""Unit tests of the functional LSTM LM core against an independent
NumPy implementation of Keras LSTM semantics (gate order i,f,g,o,
sigmoid recurrent activation, tied softmax output)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocrd_keraslm_tpu.models.lstm_lm import (
    LMConfig, forward_seq, forward_step, init_params, zero_carry,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_lstm_lm(params, cfg, x, zs, h0, c0):
    """Independent NumPy forward: returns (logits (B,T,V), hT, cT)."""
    emb = np.asarray(params['char_embedding'])
    inp = emb[x]  # (B, T, W)
    feats = [inp]
    for z, table in zip(zs, params['context_embeddings']):
        table = np.asarray(table)
        feats.append(table[np.broadcast_to(z[:, None], x.shape)])
    inp = np.concatenate(feats, axis=-1)
    B, T, _ = inp.shape
    W = cfg.width
    hT, cT = [], []
    for layer in range(cfg.depth):
        lp = params['lstm'][layer]
        K = np.asarray(lp['kernel'])
        U = np.asarray(lp['recurrent'])
        b = np.asarray(lp['bias'])
        h = np.array(h0[layer])
        c = np.array(c0[layer])
        outs = np.zeros((B, T, W), np.float32)
        for t in range(T):
            z = inp[:, t] @ K + h @ U + b
            i = sigmoid(z[:, 0 * W:1 * W])
            f = sigmoid(z[:, 1 * W:2 * W])
            g = np.tanh(z[:, 2 * W:3 * W])
            o = sigmoid(z[:, 3 * W:4 * W])
            c = f * c + i * g
            h = o * np.tanh(c)
            outs[:, t] = h
        hT.append(h)
        cT.append(c)
        inp = outs
    logits = inp @ emb.T
    return logits, np.stack(hT), np.stack(cT)


@pytest.fixture(scope='module')
def setup():
    cfg = LMConfig(width=32, depth=2, length=16, voc_size=40,
                   contexts=((20, 4),))
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_seq_matches_numpy(setup, rng):
    cfg, params = setup
    B, T = 3, 11
    x = rng.integers(0, cfg.voc_size, (B, T)).astype(np.int32)
    z = rng.integers(0, 20, (B,)).astype(np.int32)
    h0, c0 = zero_carry(cfg, B)
    logits, (hT, cT) = forward_seq(params, cfg, jnp.asarray(x), [z],
                                   (h0, c0))
    ref_logits, ref_h, ref_c = numpy_lstm_lm(params, cfg, x, [z], h0, c0)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), ref_h, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), ref_c, rtol=1e-4,
                               atol=1e-5)


def test_carry_equivalence(setup, rng):
    """Splitting a sequence into two windows with carry must equal one
    full-length pass (functional statefulness)."""
    cfg, params = setup
    B, T = 2, 12
    x = rng.integers(0, cfg.voc_size, (B, T)).astype(np.int32)
    z = np.zeros((B,), np.int32)
    full, _ = forward_seq(params, cfg, jnp.asarray(x), [z], None)
    first, carry = forward_seq(params, cfg, jnp.asarray(x[:, :7]), [z],
                               None)
    second, _ = forward_seq(params, cfg, jnp.asarray(x[:, 7:]), [z],
                            carry)
    np.testing.assert_allclose(np.asarray(full[:, :7]),
                               np.asarray(first), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full[:, 7:]),
                               np.asarray(second), rtol=1e-4, atol=1e-5)


def test_step_equals_seq(setup, rng):
    """The incremental single step must equal one scan step."""
    cfg, params = setup
    B = 4
    x = rng.integers(0, cfg.voc_size, (B, 1)).astype(np.int32)
    z = np.zeros((B,), np.int32)
    carry = zero_carry(cfg, B)
    logits, carry_seq = forward_seq(params, cfg, jnp.asarray(x), [z],
                                    carry)
    probs_seq = jax.nn.softmax(logits[:, 0, :], axis=-1)
    probs_step, carry_step = forward_step(
        params, cfg, jnp.asarray(x[:, 0]), [z], zero_carry(cfg, B))
    np.testing.assert_allclose(np.asarray(probs_seq),
                               np.asarray(probs_step), rtol=1e-4,
                               atol=1e-6)
    for a, b in zip(carry_seq, carry_step):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_scan_matches_jnp(setup, rng):
    """The Pallas fused kernel (interpret mode on CPU) must match the
    jnp scan path."""
    cfg, params = setup
    B, T = 2, 9
    x = rng.integers(0, cfg.voc_size, (B, T)).astype(np.int32)
    z = np.zeros((B,), np.int32)
    ref, (rh, rc) = forward_seq(params, cfg, jnp.asarray(x), [z], None,
                                use_pallas=False)
    out, (oh, oc) = forward_seq(params, cfg, jnp.asarray(x), [z], None,
                                use_pallas=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh), np.asarray(oh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(oc),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('depth', [1, 2, 3])
def test_fused_score_kernel_matches_layered(rng, depth):
    """The fused whole-chunk scoring kernel (interpret mode on CPU)
    must match the layered forward_seq + log_softmax path, including
    carry threading across chunks and NLL sums."""
    from ocrd_keraslm_tpu.rater import _score_text_jit
    cfg = LMConfig(width=32, depth=depth, length=16, voc_size=40,
                   contexts=((20, 4),))
    params = init_params(cfg, jax.random.PRNGKey(depth))
    C, B, T = 3, 2, 10
    xc = jnp.asarray(rng.integers(0, cfg.voc_size, (C, B, T)), jnp.int32)
    yc = jnp.asarray(rng.integers(0, cfg.voc_size, (C, B, T)), jnp.int32)
    mc = jnp.asarray(rng.random((C, B, T)) < 0.8, jnp.float32)
    zs = (jnp.asarray(rng.integers(0, 20, (B,)), jnp.int32),)
    carry = zero_carry(cfg, B)
    p_ref, n_ref, c_ref = _score_text_jit(params, cfg, xc, zs, yc, mc,
                                          carry, False, False)
    p_out, n_out, c_out = _score_text_jit(params, cfg, xc, zs, yc, mc,
                                          carry, False, True)
    np.testing.assert_allclose(np.asarray(p_ref, np.float32),
                               np.asarray(p_out, np.float32),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(n_ref), np.asarray(n_out),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(c_ref, c_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gradients_flow(setup, rng):
    cfg, params = setup
    B, T = 2, 8
    x = jnp.asarray(rng.integers(0, cfg.voc_size, (B, T)), jnp.int32)
    y = jnp.asarray(rng.integers(0, cfg.voc_size, (B, T)), jnp.int32)
    z = jnp.zeros((B,), jnp.int32)

    def loss(p):
        logits, _ = forward_seq(p, cfg, x, [z], None)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None],
                                             axis=-1))

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_bfloat16_compute_close_to_f32(setup, rng):
    """bf16 recurrent-core mode stays close to f32 (cell state and
    softmax remain f32)."""
    cfg, params = setup
    cfg16 = cfg.replace(compute_dtype='bfloat16')
    B, T = 2, 12
    x = jnp.asarray(rng.integers(0, cfg.voc_size, (B, T)), jnp.int32)
    z = jnp.zeros((B,), jnp.int32)
    ref, _ = forward_seq(params, cfg, x, [z], None)
    out, _ = forward_seq(params, cfg16, x, [z], None)
    p_ref = jax.nn.softmax(ref, axis=-1)
    p_out = jax.nn.softmax(out, axis=-1)
    assert float(jnp.max(jnp.abs(p_ref - p_out))) < 0.03


def test_pallas_scan_gradients_match_jnp(rng):
    """The Pallas BACKWARD kernel (reverse-time grid, recomputed
    gates, VMEM-accumulated dU) must reproduce the jnp scan's
    gradients for every input: x_proj, h0, c0, recurrent — including
    cotangents on h_all AND the final carry."""
    from ocrd_keraslm_tpu.models.lstm_lm import _layer_scan_jnp
    from ocrd_keraslm_tpu.ops.lstm_cell import lstm_scan_pallas
    B, T, W = 3, 7, 8
    x_proj = jnp.asarray(rng.standard_normal((B, T, 4 * W)),
                         jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    rec = jnp.asarray(rng.standard_normal((W, 4 * W)) * 0.3,
                      jnp.float32)
    wh = jnp.asarray(rng.standard_normal((B, T, W)), jnp.float32)
    whT = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    wcT = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)

    def loss(fn, xp, h, c, r):
        h_all, hT, cT = fn(xp, h, c, r)
        return (jnp.sum(h_all * wh) + jnp.sum(hT * whT)
                + jnp.sum(cT * wcT))

    g_ref = jax.grad(lambda *a: loss(_layer_scan_jnp, *a),
                     argnums=(0, 1, 2, 3))(x_proj, h0, c0, rec)
    g_pal = jax.grad(lambda *a: loss(lstm_scan_pallas, *a),
                     argnums=(0, 1, 2, 3))(x_proj, h0, c0, rec)
    for name, a, b in zip(('dx_proj', 'dh0', 'dc0', 'drecurrent'),
                          g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg='gradient mismatch for %s' % name)


def test_embedding_plots_smoke(tmp_path):
    """The three embedding-analysis plots (reference
    rating.py:1169-1238) render non-empty image files from a bare
    param set: char/context autocorrelation heatmaps + 2-D PCA
    projection with de-overlapped decade labels."""
    import pytest
    pytest.importorskip('sklearn')
    matplotlib = pytest.importorskip('matplotlib')
    matplotlib.use('Agg')
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.rater import Rater

    r = Rater()
    r.vocab.grow(list('abcdefgh '))
    r.width, r.depth, r.length = 16, 1, 16
    r.voc_size = len(r.vocab)
    r.cfg = LMConfig(width=16, depth=1, length=16,
                     voc_size=r.voc_size, stateful=True,
                     variable_length=False)
    r.params = init_params(r.cfg, jax.random.PRNGKey(3))
    r.status = 2

    paths = [tmp_path / name for name in
             ('char.png', 'ctx.png', 'proj.png')]
    r.plot_char_embeddings_similarity(str(paths[0]))
    r.plot_context_embeddings_similarity(str(paths[1]))
    r.plot_context_embeddings_projection(str(paths[2]))
    for p in paths:
        assert p.exists() and p.stat().st_size > 100, p


def test_spread_labels_deoverlap():
    """The projection plot's label de-overlap (the capability of the
    reference's optional adjustText extra, lib/rating.py:1222-1234):
    clustered labels are pushed apart to >= ~2% of the plot span,
    isolated labels stay where they are."""
    from ocrd_keraslm_tpu.rater import _spread_labels

    pts = np.array([[0.0, 0.0], [0.001, 0.0], [0.0, 0.001],  # cluster
                    [1.0, 1.0]],                              # isolated
                   np.float64)
    out = _spread_labels(pts)
    span = max(np.ptp(out[:, 0]), np.ptp(out[:, 1]))
    # every pair separated to at least ~the repulsion radius
    for i in range(len(out)):
        for j in range(i + 1, len(out)):
            assert np.linalg.norm(out[i] - out[j]) >= 0.015 * span, \
                (i, j, out)
    # the isolated label does not move
    np.testing.assert_allclose(out[3], [1.0, 1.0])
    # exactly coincident labels must also separate (fallback dirs)
    out2 = _spread_labels(np.zeros((3, 2)))
    d = [np.linalg.norm(out2[i] - out2[j])
         for i in range(3) for j in range(i + 1, 3)]
    assert min(d) > 0


def test_pallas_scan_bf16_and_batch_blocks(rng):
    """bf16 weights + a batch split over multiple grid blocks: the
    forward must be bit-exact vs the jnp scan (same bf16 gate matmul,
    f32 carry), and gradients must agree within bf16 resolution (the
    kernel accumulates dU in f32 before the final bf16 quantization
    the jnp path also applies, so diffs are bounded by one bf16 ULP
    of the operands)."""
    from ocrd_keraslm_tpu.models.lstm_lm import _layer_scan_jnp
    from ocrd_keraslm_tpu.ops import lstm_cell as LC
    B, T, W = 12, 9, 16
    x_proj = jnp.asarray(rng.standard_normal((B, T, 4 * W)),
                         jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((B, W)), jnp.float32)
    rec = jnp.asarray(rng.standard_normal((W, 4 * W)) * 0.3,
                      jnp.float32).astype(jnp.bfloat16)
    orig = LC._batch_block
    LC._batch_block = lambda B, F, budget=0: 4  # force 3 blocks
    try:
        ha_ref, hT_ref, cT_ref = _layer_scan_jnp(x_proj, h0, c0, rec)
        ha, hT, cT = LC.lstm_scan_pallas(x_proj, h0, c0, rec)
        np.testing.assert_array_equal(np.asarray(ha),
                                      np.asarray(ha_ref))
        np.testing.assert_array_equal(np.asarray(cT),
                                      np.asarray(cT_ref))

        def loss(fn):
            def go(xp, h, c, r):
                h_all, hT_, cT_ = fn(xp, h, c, r)
                return jnp.sum(h_all ** 2) + jnp.sum(hT_ * cT_)
            return go
        g_ref = jax.grad(loss(_layer_scan_jnp),
                         argnums=(0, 1, 2, 3))(x_proj, h0, c0, rec)
        g_pal = jax.grad(loss(LC.lstm_scan_pallas),
                         argnums=(0, 1, 2, 3))(x_proj, h0, c0, rec)
        for name, a, b in zip(('dx_proj', 'dh0', 'dc0', 'drec'),
                              g_ref, g_pal):
            assert a.dtype == b.dtype, name
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                rtol=0.02, atol=0.02,
                err_msg='bf16 gradient mismatch for %s' % name)
    finally:
        LC._batch_block = orig
