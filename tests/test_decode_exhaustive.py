"""Golden correctness: both device decoders vs exhaustive search.

For small random lattices the globally optimal path is computed by
enumerating every alternative combination with the exact per-char cost
(lm_weight * -log2 p_LM + (1 - lm_weight) * -log2 conf); a beam of
width >= the full expansion must find exactly that path and cost."""
import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import networkx as nx

from ocrd_keraslm_tpu.models.lstm_lm import (LMConfig, forward_step,
                                             init_params, zero_carry)
from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.wrapper.page import TextEquivType


def make_rater(seed):
    voc = 12
    r = Rater()
    r.width, r.depth, r.length = 16, 2, 16
    r.contexts = ((20, 4),)
    r.stateful = True
    r.vocab.assign('abcdefghijk')
    r.voc_size = r.vocab.size
    r.configure()
    params = init_params(r.cfg, jax.random.PRNGKey(seed))
    # scale embeddings so probabilities differ meaningfully
    params['char_embedding'] = params['char_embedding'] * 200
    r.params = params
    r.status = 2
    return r


def random_lattice(rng, n_edges, n_alts):
    graph = nx.DiGraph()
    graph.add_node(0)
    alts = []
    for e in range(n_edges):
        tes = [TextEquivType(
            Unicode='abcdefghijk'[rng.integers(11)],
            conf=float(rng.uniform(0.5, 1.0)), index=i)
            for i in range(n_alts)]
        alts.append(tes)
        graph.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)
    return graph, alts


def brute_force(rater, alts, lm_weight):
    cfg = rater.cfg

    def path_cost(choice):
        h, c = zero_carry(cfg, 1)
        x = np.array([rater.vocab.get('\n')], np.int32)
        zs = [np.zeros((1,), np.int32)]
        cost = 0.0
        for e, ai in enumerate(choice):
            te = alts[e][ai]
            for ch in te.Unicode:
                probs, (h, c) = forward_step(
                    rater.params, cfg, jnp.asarray(x), zs, (h, c))
                idx = rater.vocab.get(ch)
                cost += (lm_weight *
                         -math.log2(max(float(probs[0, idx]), 1e-99)) +
                         (1 - lm_weight) * -math.log2(te.conf))
                x = np.array([idx], np.int32)
        return cost
    best = min(itertools.product(*[range(len(a)) for a in alts]),
               key=path_cost)
    return best, path_cost(best)


@pytest.mark.parametrize('seed', [1, 2, 3])
@pytest.mark.parametrize('fused', [False, True])
def test_decoders_match_exhaustive(seed, fused):
    rng = np.random.default_rng(seed)
    rater = make_rater(seed)
    rater.fused_decode = fused
    lm_weight = 0.7
    n_edges, n_alts = 5, 3
    graph, alts = random_lattice(rng, n_edges, n_alts)
    want_choice, want_cost = brute_force(rater, alts, lm_weight)
    # beam 32 > 3^5/"per-edge expansion" keeps all - exact search
    path, entropy, _ = rater.rate_best_device(
        graph, 0, n_edges, lm_weight=lm_weight, beam_width=27)
    got_choice = tuple(alts[e].index(te)
                       for e, (_, te, _) in enumerate(path))
    assert got_choice == want_choice
    assert abs(entropy - want_cost) < 1e-2, (entropy, want_cost)


@pytest.mark.parametrize('fused', [False, True])
def test_batch_decode_matches_exhaustive(fused):
    """rate_best_batch (vmapped XLA / document-batched fused kernel)
    must find the globally optimal path of EVERY document in the
    batch."""
    rater = make_rater(5)
    rater.fused_decode = fused
    lm_weight = 0.6
    docs = []
    for seed in (11, 12, 13):
        rng = np.random.default_rng(seed)
        n_edges = 3 + seed % 3
        graph, alts = random_lattice(rng, n_edges, 3)
        want_choice, want_cost = brute_force(rater, alts, lm_weight)
        docs.append((graph, alts, want_choice, want_cost, n_edges))
    batch = rater.rate_best_batch([d[0] for d in docs],
                                  lm_weight=lm_weight, beam_width=27)
    for (graph, alts, want_choice, want_cost, n_edges), \
            (path, entropy) in zip(docs, batch):
        got_choice = tuple(alts[e].index(te)
                           for e, (_, te, _) in enumerate(path))
        assert got_choice == want_choice
        assert abs(entropy - want_cost) < 1e-2, (entropy, want_cost)


def random_multichar_lattice(rng, n_edges, n_alts, max_len=3):
    """Lattice whose alternatives have MIXED lengths (1..max_len
    chars): the fused kernels' per-edge dynamic char-step bounds
    (ops/decode_kernel.py alt_steps) and run merging both engage."""
    graph = nx.DiGraph()
    graph.add_node(0)
    alts = []
    for e in range(n_edges):
        if e % 3 == 2:
            # single-alternative edge: triggers run merging
            tes = [TextEquivType(
                Unicode='abcdefghijk'[rng.integers(11)], conf=0.95,
                index=0)]
        else:
            tes = [TextEquivType(
                Unicode=''.join('abcdefghijk'[rng.integers(11)]
                                for _ in range(rng.integers(1,
                                                            max_len + 1))),
                conf=float(rng.uniform(0.5, 1.0)), index=i)
                for i in range(n_alts)]
        alts.append(tes)
        graph.add_edge(e, e + 1, element='g%d' % e, alternatives=tes)
    return graph, alts


@pytest.mark.parametrize('seed', [21, 22])
@pytest.mark.parametrize('fused', [False, True])
def test_decoders_match_exhaustive_multichar(seed, fused):
    """Mixed-length alternatives (1-3 chars) + merged runs: the device
    decoders must still find the exhaustive-search optimum with its
    exact cost (per-char LM cost + whole-alternative conf cost)."""
    rng = np.random.default_rng(seed)
    rater = make_rater(seed)
    rater.fused_decode = fused
    lm_weight = 0.7
    n_edges, n_alts = 5, 2
    graph, alts = random_multichar_lattice(rng, n_edges, n_alts)
    want_choice, want_cost = brute_force(rater, alts, lm_weight)
    path, entropy, _ = rater.rate_best_device(
        graph, 0, n_edges, lm_weight=lm_weight, beam_width=27)
    got_choice = tuple(alts[e].index(te)
                       for e, (_, te, _) in enumerate(path))
    assert got_choice == want_choice
    assert abs(entropy - want_cost) < 1e-2, (entropy, want_cost)


@pytest.mark.parametrize('fused', [False, True])
def test_batch_decode_matches_exhaustive_multichar(fused):
    """Document-batched decode over mixed-length-alternative lattices
    (per-edge dynamic step bounds in the fused kernel) must find every
    document's exhaustive optimum."""
    rater = make_rater(7)
    rater.fused_decode = fused
    lm_weight = 0.6
    docs = []
    for seed in (31, 32, 33):
        rng = np.random.default_rng(seed)
        n_edges = 3 + seed % 3
        graph, alts = random_multichar_lattice(rng, n_edges, 2)
        want_choice, want_cost = brute_force(rater, alts, lm_weight)
        docs.append((graph, alts, want_choice, want_cost))
    batch = rater.rate_best_batch([d[0] for d in docs],
                                  lm_weight=lm_weight, beam_width=27)
    for (graph, alts, want_choice, want_cost), (path, entropy) in \
            zip(docs, batch):
        got_choice = tuple(alts[e].index(te)
                           for e, (_, te, _) in enumerate(path))
        assert got_choice == want_choice
        assert abs(entropy - want_cost) < 1e-2, (entropy, want_cost)


@pytest.mark.parametrize('fused', [False, True])
def test_decode_context_variable_consistent(fused):
    """Decoding with a non-zero metadata context: the fused kernel
    folds the context embedding into the layer-0 bias
    (rater._decode_weights), the XLA engine feeds explicit context
    arrays, the host engine embeds per step — all three must agree,
    and the context must actually change the result costs."""
    rater = make_rater(9)
    # context embeddings init tiny (std 0.001, reference parity);
    # scale them so the folded bias is consequential in this test
    rater.params['context_embeddings'] = [
        e * 2000 for e in rater.params['context_embeddings']]
    rng = np.random.default_rng(41)
    graph, alts = random_lattice(rng, 5, 3)

    def run_device(ctx):
        rater.fused_decode = fused
        try:
            g = nx.DiGraph()
            g.add_node(0)
            for e in range(5):
                g.add_edge(e, e + 1, element='g%d' % e,
                           alternatives=alts[e])
            path, ent, _ = rater.rate_best_device(
                g, 0, 5, context=ctx, lm_weight=0.7, beam_width=27)
        finally:
            rater.fused_decode = False
        return [te.Unicode for _, te, _ in path], ent

    def run_host(ctx):
        p, ent, tb = rater.rate_best(graph, 0, 5, context=ctx,
                                     lm_weight=0.7, beam_width=27)
        pf, entf, _ = rater.next_path(tb[0], ([], tb[1]))
        return [te.Unicode for _, te, _ in p + pf], ent + entf

    for ctx in ([3], [17]):
        text_d, ent_d = run_device(ctx)
        text_h, ent_h = run_host(ctx)
        assert text_d == text_h, (ctx, text_d, text_h)
        assert abs(ent_d - ent_h) < 1e-2, (ctx, ent_d, ent_h)
    # the context variable must be live: different contexts ->
    # different path costs (random context embeddings)
    _, e3 = run_device([3])
    _, e17 = run_device([17])
    assert abs(e3 - e17) > 1e-4, (e3, e17)
