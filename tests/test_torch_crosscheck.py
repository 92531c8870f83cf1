"""Independent cross-check of the model math against PyTorch.

The h5 fixture (tests/test_keras23_interop.py) pins the FILE format;
this pins the MATH: the JAX model's forward pass, loss gradients, and
a short Adam trajectory are compared against a replica built on
``torch.nn.LSTM`` — an independently implemented LSTM kernel with the
same published semantics (gate order i,f,g,o; sigmoid gates, tanh
activations) as the Keras 2.3 model the reference uses
(/root/reference/ocrd_keraslm/lib/rating.py:133-134).  Agreement here
means the training stack computes the same function the reference's
backend computes, without needing TF 1.15 installed.

torch is CPU-only in this environment, which is all these need.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from ocrd_keraslm_tpu.models.lstm_lm import (LMConfig, forward_seq,
                                             forward_step, init_params,
                                             regularization_loss,
                                             sequence_xent)

CFG = LMConfig(width=16, depth=2, length=17, voc_size=13,
               contexts=((20, 4),), stateful=True, dropout=0.0)


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class TorchReplica(torch.nn.Module):
    """The same LM built on torch primitives: embeddings concatenated,
    ``torch.nn.LSTM`` stack, weight-tied softmax head."""

    def __init__(self, params, cfg):
        super().__init__()
        p = _np(params)
        t = lambda a: torch.nn.Parameter(torch.tensor(np.array(a)))
        self.emb = t(p['char_embedding'])
        self.ctx = torch.nn.ParameterList(
            [t(e) for e in p['context_embeddings']])
        self.lstm = torch.nn.LSTM(cfg.input_dim, cfg.width,
                                  num_layers=cfg.depth, batch_first=True)
        sd = {}
        for layer, lp in enumerate(p['lstm']):
            sd['weight_ih_l%d' % layer] = torch.tensor(lp['kernel'].T)
            sd['weight_hh_l%d' % layer] = torch.tensor(lp['recurrent'].T)
            sd['bias_ih_l%d' % layer] = torch.tensor(lp['bias'])
            sd['bias_hh_l%d' % layer] = torch.zeros(len(lp['bias']))
        self.lstm.load_state_dict(sd)
        # torch's LSTM adds TWO bias vectors (b_ih + b_hh); the model
        # has one.  b_hh stays zero and frozen so gradients and
        # optimizer steps act on a single bias, like the JAX params
        # (each torch bias would otherwise receive the full bias
        # gradient and move independently — a 2x effective bias step)
        for layer in range(cfg.depth):
            getattr(self.lstm,
                    'bias_hh_l%d' % layer).requires_grad_(False)

    def forward(self, x, zs, carry=None):
        feats = [self.emb[x]]
        for z, table in zip(zs, self.ctx):
            if z.dim() == 1:
                z = z[:, None].expand(-1, x.shape[1])
            feats.append(table[z])
        inp = torch.cat(feats, dim=-1)
        h, carry = self.lstm(inp, carry)
        return h @ self.emb.T, carry

    def jax_grads_layout(self):
        """Gradients re-packed into the JAX param-tree layout."""
        g = {'char_embedding': self.emb.grad.numpy().copy(),
             'context_embeddings': [e.grad.numpy().copy()
                                    for e in self.ctx],
             'lstm': []}
        sd = dict(self.lstm.named_parameters())
        for layer in range(self.lstm.num_layers):
            g['lstm'].append({
                'kernel': sd['weight_ih_l%d' % layer].grad.numpy().T.copy(),
                'recurrent':
                    sd['weight_hh_l%d' % layer].grad.numpy().T.copy(),
                'bias': sd['bias_ih_l%d' % layer].grad.numpy().copy(),
            })
        return g


def _torch_regularization(model):
    """The train-phase regularizers re-derived in torch from the
    documented formulas (reference rating.py:186-246): char embedding
    index-0 pulled to the detached mean of the rest + row-norm-1
    lowrank; context embeddings additionally get adjacency smoothness
    and a weighted-mean underspecification."""
    emb = model.emb
    mean_rest = emb[1:].mean(dim=0).detach()
    loss = 1.0 * ((emb[0:1] - mean_rest) ** 2).sum()
    loss = loss + 0.01 * ((1.0 - (emb ** 2).sum(dim=1)) ** 2).sum()
    for ce in model.ctx:
        n = ce.shape[0]
        loss = loss + 0.02 * ((1.0 - (ce ** 2).sum(dim=1)) ** 2).sum()
        loss = loss + 0.2 * (ce[1:n - 1].detach() @ ce[2:].T).sum()
        vecs = ce[1:]
        wgts = (vecs * vecs).sum(dim=1).detach()
        mean_rest = vecs.mean(dim=0).detach()
        loss = loss + 2.0 * ((ce[0:1] - wgts[:, None] * mean_rest)
                             ** 2).sum()
    return loss


@pytest.fixture(scope='module')
def setup():
    params = init_params(CFG, jax.random.PRNGKey(42))
    model = TorchReplica(params, CFG)
    rng = np.random.default_rng(7)
    B, T = 3, CFG.length
    x = rng.integers(1, CFG.voc_size, (B, T)).astype(np.int32)
    y = rng.integers(1, CFG.voc_size, (B, T)).astype(np.int32)
    z = rng.integers(0, 20, (B,)).astype(np.int32)
    h0 = rng.normal(0, 0.5, (CFG.depth, B, CFG.width)).astype(np.float32)
    c0 = rng.normal(0, 0.5, (CFG.depth, B, CFG.width)).astype(np.float32)
    return params, model, x, y, z, h0, c0


def test_forward_matches_torch(setup):
    params, model, x, y, z, h0, c0 = setup
    logits, (hT, cT) = forward_seq(
        params, CFG, jnp.asarray(x), [jnp.asarray(z)],
        (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        tl, (th, tc) = model(torch.tensor(x, dtype=torch.long),
                             [torch.tensor(z, dtype=torch.long)],
                             (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hT), th.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cT), tc.numpy(), atol=2e-5)


def test_step_matches_torch(setup):
    params, model, x, y, z, h0, c0 = setup
    probs, _ = forward_step(params, CFG, jnp.asarray(x[:, 0]),
                            [jnp.asarray(z)],
                            (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        tl, _ = model(torch.tensor(x[:, :1], dtype=torch.long),
                      [torch.tensor(z, dtype=torch.long)],
                      (torch.tensor(h0), torch.tensor(c0)))
        tp = torch.softmax(tl[:, 0], dim=-1)
    np.testing.assert_allclose(np.asarray(probs), tp.numpy(), atol=2e-6)


def _jax_loss(params, x, z, y):
    logits, _ = forward_seq(params, CFG, jnp.asarray(x),
                            [jnp.asarray(z)], None)
    nll, _ = sequence_xent(logits, jnp.asarray(y))
    return nll + regularization_loss(params), nll


def _torch_loss(model, x, z, y):
    tl, _ = model(torch.tensor(x, dtype=torch.long),
                  [torch.tensor(z, dtype=torch.long)])
    nll = torch.nn.functional.cross_entropy(
        tl.reshape(-1, CFG.voc_size),
        torch.tensor(y, dtype=torch.long).reshape(-1))
    return nll + _torch_regularization(model), nll


def test_gradients_match_torch(setup):
    params, model, x, y, z, h0, c0 = setup
    (_, _), jg = jax.value_and_grad(
        lambda p: _jax_loss(p, x, z, y), has_aux=True)(params)
    model.zero_grad()
    loss, _ = _torch_loss(model, x, z, y)
    loss.backward()
    tg = model.jax_grads_layout()
    jg = _np(jg)
    np.testing.assert_allclose(jg['char_embedding'],
                               tg['char_embedding'], atol=3e-6)
    for a, b in zip(jg['context_embeddings'], tg['context_embeddings']):
        np.testing.assert_allclose(a, b, atol=3e-6)
    for a, b in zip(jg['lstm'], tg['lstm']):
        for k in ('kernel', 'recurrent', 'bias'):
            np.testing.assert_allclose(a[k], b[k], atol=3e-6,
                                       err_msg=k)


def test_adam_trajectory_matches_torch(setup):
    # 30 steps of clip(1.0)+Adam(1e-3, eps 1e-7) on a shared synthetic
    # batch stream: per-step losses must track torch's own optimizer to
    # float accumulation tolerance (the reference trains with exactly
    # these hyperparameters, rating.py:178)
    from ocrd_keraslm_tpu.training import make_optimizer
    import optax

    params, _, _, _, _, _, _ = setup
    model = TorchReplica(params, CFG)  # fresh copy (fixture is shared)
    opt = make_optimizer()
    opt_state = opt.init(params)
    topt = torch.optim.Adam(model.parameters(), lr=1e-3,
                            betas=(0.9, 0.999), eps=1e-7)
    rng = np.random.default_rng(11)
    B, T = 4, CFG.length

    @jax.jit
    def step(params, opt_state, x, z, y):
        (loss, nll), grads = jax.value_and_grad(
            lambda p: _jax_loss(p, x, z, y), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, nll

    jl, tl_hist = [], []
    for _ in range(30):
        x = rng.integers(1, CFG.voc_size, (B, T)).astype(np.int32)
        y = rng.integers(1, CFG.voc_size, (B, T)).astype(np.int32)
        z = rng.integers(0, 20, (B,)).astype(np.int32)
        params, opt_state, nll = step(params, opt_state, x, z, y)
        jl.append(float(nll))
        topt.zero_grad()
        loss, tnll = _torch_loss(model, x, z, y)
        loss.backward()
        torch.nn.utils.clip_grad_value_(model.parameters(), 1.0)
        topt.step()
        tl_hist.append(float(tnll.detach()))
    np.testing.assert_allclose(jl, tl_hist, rtol=1e-4, atol=1e-4)
    # and the final weights still agree elementwise
    np.testing.assert_allclose(
        np.asarray(params['char_embedding']),
        model.emb.detach().numpy(), atol=5e-5)
