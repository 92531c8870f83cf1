#!/usr/bin/env python
"""Benchmark: chars/sec of whole-text rating on one TPU chip vs a
faithful NumPy reimplementation of the reference's per-window CPU path.

The reference publishes no absolute throughput numbers (BASELINE.md),
so the baseline is measured here: a NumPy stacked-LSTM running the same
stateful scoring computation (batch 1, window-by-window, per-timestep
matmuls) — the same work Keras-on-CPU does in ``Rater.rate``
(/root/reference/ocrd_keraslm/lib/rating.py:493-529).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "chars/s", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def numpy_baseline_chars_per_sec(params_np, width, depth, n_chars=4096):
    """Reference-equivalent stateful scoring loop in NumPy (batch 1)."""
    rng = np.random.default_rng(0)
    voc = params_np['char_embedding'].shape[0]
    ids = rng.integers(1, voc, n_chars)
    emb = params_np['char_embedding']
    ctx = params_np['context_embeddings'][0]

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = [np.zeros((1, width), np.float32) for _ in range(depth)]
    c = [np.zeros((1, width), np.float32) for _ in range(depth)]
    t0 = time.perf_counter()
    nll = 0.0
    for t in range(n_chars - 1):
        x = np.concatenate([emb[ids[t]][None, :], ctx[0][None, :]],
                           axis=1)
        for l in range(depth):
            lp = params_np['lstm'][l]
            z = x @ lp['kernel'] + h[l] @ lp['recurrent'] + lp['bias']
            W = width
            i = sigmoid(z[:, :W])
            f = sigmoid(z[:, W:2 * W])
            g = np.tanh(z[:, 2 * W:3 * W])
            o = sigmoid(z[:, 3 * W:])
            c[l] = f * c[l] + i * g
            h[l] = o * np.tanh(c[l])
            x = h[l]
        logits = x @ emb.T
        logits -= logits.max()
        p = np.exp(logits)
        p /= p.sum()
        nll -= np.log(max(p[0, ids[t + 1]], 1e-99))
    dt = time.perf_counter() - t0
    return (n_chars - 1) / dt


def numpy_baseline_decode_chars_per_sec(params_np, width, depth,
                                        n_edges=256, beam=16, alts=4):
    """Reference-equivalent beam decode loop in NumPy: one batched
    LSTM step per char round over beam*alts hypotheses (the reference
    batches hypotheses through Keras predict_on_batch per round,
    rating.py:821-826)."""
    rng = np.random.default_rng(2)
    voc = params_np['char_embedding'].shape[0]
    emb = params_np['char_embedding']
    ctx = params_np['context_embeddings'][0]
    B = beam * alts

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = [np.zeros((B, width), np.float32) for _ in range(depth)]
    c = [np.zeros((B, width), np.float32) for _ in range(depth)]
    ids = rng.integers(1, voc, (n_edges, B))
    t0 = time.perf_counter()
    for e in range(n_edges):
        x = np.concatenate([emb[ids[e]], np.tile(ctx[0], (B, 1))],
                           axis=1)
        for l in range(depth):
            lp = params_np['lstm'][l]
            z = x @ lp['kernel'] + h[l] @ lp['recurrent'] + lp['bias']
            W = width
            i = sigmoid(z[:, :W])
            f = sigmoid(z[:, W:2 * W])
            g = np.tanh(z[:, 2 * W:3 * W])
            o = sigmoid(z[:, 3 * W:])
            c[l] = f * c[l] + i * g
            h[l] = o * np.tanh(c[l])
            x = h[l]
        logits = x @ emb.T
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        # beam bookkeeping surrogate: top-k partition per round
        np.argpartition(p[0], -beam)
    dt = time.perf_counter() - t0
    return n_edges / dt  # decoded chars (1 char per edge) per second


def numpy_baseline_generate_chars_per_sec(params_np, width, depth,
                                          n_chars=64, fringe=256,
                                          topk=10):
    """Reference-equivalent generation loop in NumPy: per output char,
    one batched LSTM step over the live fringe (the reference batches
    hypotheses through predict_on_batch, rating.py:687-704; fringe
    capped at 256) plus host top-k bookkeeping.  Generous to the
    reference: it actually splits the fringe into batch_size=128
    predict calls and maintains a Python insort queue."""
    rng = np.random.default_rng(4)
    voc = params_np['char_embedding'].shape[0]
    emb = params_np['char_embedding']
    ctx = params_np['context_embeddings'][0]
    B = fringe

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = [np.zeros((B, width), np.float32) for _ in range(depth)]
    c = [np.zeros((B, width), np.float32) for _ in range(depth)]
    ids = rng.integers(1, voc, B)
    t0 = time.perf_counter()
    for _ in range(n_chars):
        x = np.concatenate([emb[ids], np.tile(ctx[0], (B, 1))], axis=1)
        for l in range(depth):
            lp = params_np['lstm'][l]
            z = x @ lp['kernel'] + h[l] @ lp['recurrent'] + lp['bias']
            W = width
            i = sigmoid(z[:, :W])
            f = sigmoid(z[:, W:2 * W])
            g = np.tanh(z[:, 2 * W:3 * W])
            o = sigmoid(z[:, 3 * W:])
            c[l] = f * c[l] + i * g
            h[l] = o * np.tanh(c[l])
            x = h[l]
        logits = x @ emb.T
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        # per-hypothesis top-k + global fringe re-selection
        cand = np.argpartition(p, -topk, axis=1)[:, -topk:]
        flat = np.take_along_axis(p, cand, axis=1).reshape(-1)
        sel = np.argpartition(flat, -B)[-B:]
        ids = cand.reshape(-1)[sel] % voc
        for l in range(depth):
            h[l] = h[l][sel // topk]
            c[l] = c[l][sel // topk]
    dt = time.perf_counter() - t0
    return n_chars / dt


def torch_baseline_train_chars_per_sec(params_np, width, depth,
                                       B=128, T=256, reps=3):
    """MEASURED CPU training baseline (VERDICT r3 #1): the same model
    built on ``torch.nn.LSTM`` (the independent same-semantics replica
    validated against this stack in tests/test_torch_crosscheck.py),
    trained with the reference's exact hyperparameters — CE loss,
    grad-clip 1.0, Adam(1e-3, eps 1e-7) (reference rating.py:178) — on
    the SAME (B, T) batch shape the TPU train step is measured at.
    Favours the baseline: B=128 batching is the reference's stateless
    regime (its stateful path trains batch_size=1, far slower per
    char), torch-CPU is faster than the TF-1.15 session it stands in
    for, and the embedding regularizers are omitted.  Returns
    chars/sec or None if torch is unavailable."""
    try:
        import torch
    except Exception:
        return None
    voc = params_np['char_embedding'].shape[0]
    ctx_dim = params_np['context_embeddings'][0].shape[1]

    class Replica(torch.nn.Module):
        def __init__(self):
            super().__init__()
            t = lambda a: torch.nn.Parameter(torch.tensor(np.array(a)))
            self.emb = t(params_np['char_embedding'])
            self.ctx = t(params_np['context_embeddings'][0])
            self.lstm = torch.nn.LSTM(width + ctx_dim, width,
                                      num_layers=depth,
                                      batch_first=True)

        def forward(self, x, z):
            feats = torch.cat(
                [self.emb[x],
                 self.ctx[z][:, None, :].expand(-1, x.shape[1], -1)],
                dim=-1)
            h, _ = self.lstm(feats)
            return h @ self.emb.T

    model = Replica()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, eps=1e-7)
    rng = np.random.default_rng(6)
    x = torch.tensor(rng.integers(1, voc, (B, T)), dtype=torch.long)
    y = torch.tensor(rng.integers(1, voc, (B, T)), dtype=torch.long)
    z = torch.tensor(rng.integers(0, 200, (B,)), dtype=torch.long)

    def step():
        opt.zero_grad()
        logits = model(x, z)
        loss = torch.nn.functional.cross_entropy(
            logits.reshape(-1, voc), y.reshape(-1))
        loss.backward()
        torch.nn.utils.clip_grad_value_(model.parameters(), 1.0)
        opt.step()

    step()  # warmup (allocator, thread pool)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return B * T / best


def main():
    import jax
    import jax.numpy as _jnp

    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.rater import Rater, SCORE_CHUNK

    # absorb the remote-compile service cold start (observed up to
    # ~350s for the FIRST compile of a process, seconds afterwards)
    t0 = time.perf_counter()
    float(jax.jit(lambda v: (v @ v).sum())(_jnp.ones((129, 129))))
    print('compile-service warmup: %.1fs' % (time.perf_counter() - t0),
          file=sys.stderr)

    width, depth, voc = 128, 2, 200
    cfg = LMConfig(width=width, depth=depth, length=256, voc_size=voc)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params_np = {
        'char_embedding': np.asarray(params['char_embedding']),
        'context_embeddings': [np.asarray(e) for e in
                               params['context_embeddings']],
        'lstm': [{k: np.asarray(v) for k, v in lp.items()}
                 for lp in params['lstm']],
    }

    # ---- baseline (NumPy, reference-equivalent CPU loop) ----
    # best of 5: the shared-host CPU is noisy and a slow baseline run
    # would flatter vs_baseline
    base = max(numpy_baseline_chars_per_sec(params_np, width, depth)
               for _ in range(5))
    print('numpy baseline: %.0f chars/s' % base, file=sys.stderr)

    # ---- TPU path: Rater._score_text on synthetic text ----
    rater = Rater()
    rater.width, rater.depth, rater.length = width, depth, 256
    rater.stateful = True
    rater.voc_size = voc
    import string
    rater.vocab.assign(string.printable[:voc - 1])
    rater.configure()
    rater.params = params
    rater.status = 2

    rng = np.random.default_rng(1)
    # single text, one device dispatch (rate() path): 64 chunks
    n_chars = 64 * SCORE_CHUNK + 1
    ids = rng.integers(1, voc, n_chars).astype(np.int32)
    # warmup (compile)
    t0 = time.perf_counter()
    rater._score_text(ids, [0])
    print('compile+warmup: %.1fs' % (time.perf_counter() - t0),
          file=sys.stderr)
    # timed (best + median: the tunneled service stalls ~120ms every
    # few calls; medians keep the numbers honest under contention)
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        _, nll, _ = rater._score_text(ids, [0])
        times.append(time.perf_counter() - t0)
    tpu = (n_chars - 1) / min(times)
    tpu_med = (n_chars - 1) / sorted(times)[len(times) // 2]
    print('tpu rating (single stream): %.0f chars/s best, %.0f median '
          '(%.3fs best for %d chars)'
          % (tpu, tpu_med, min(times), n_chars), file=sys.stderr)

    # batched corpus scoring (test()/rate_batch path): 32 files
    files = [rng.integers(1, voc, 8 * SCORE_CHUNK + 1).astype(np.int32)
             for _ in range(32)]
    rater._score_batch(files, [[0]] * 32)  # warmup/compile
    total = sum(len(f) - 1 for f in files)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, nlls, _ = rater._score_batch(files, [[0]] * 32)
        times.append(time.perf_counter() - t0)
    batched = total / min(times)
    batched_med = total / sorted(times)[len(times) // 2]
    print('tpu rating (batched x32): %.0f chars/s best, %.0f median '
          '(%.3fs best for %d chars)'
          % (batched, batched_med, min(times), total), file=sys.stderr)

    # ---- lattice beam decoding (device beam, one dispatch/page) ----
    decode = base_dec = None
    pages = None
    try:
        base_dec = max(numpy_baseline_decode_chars_per_sec(
            params_np, width, depth) for _ in range(5))
        print('numpy decode baseline: %.0f chars/s' % base_dec,
              file=sys.stderr)
        import networkx as nx

        from ocrd_keraslm_tpu.wrapper.page import TextEquivType
        rng2 = np.random.default_rng(3)
        chars = list(rater.vocab.c2i.keys())
        n_edges = 1000
        n_pages = 16

        def make_page():
            g = nx.DiGraph()
            g.add_node(0)
            for e in range(n_edges):
                tes = [TextEquivType(
                    Unicode=chars[rng2.integers(len(chars))],
                    conf=0.9, index=i) for i in range(4)]
                g.add_edge(e, e + 1, element='g%d' % e,
                           alternatives=tes)
            return g
        pages = [make_page() for _ in range(n_pages)]

        def decode_document():
            # the processor's pipelined shape: dispatch all pages
            # (cross-page beam carry chains on device), batch-fetch
            tb = None
            pendings = []
            for g in pages:
                pending, tb = rater.rate_best_device_begin(
                    g, 0, n_edges, device_traceback=tb, beam_width=16)
                pendings.append(pending)
            pendings = rater.fetch_pendings(pendings)
            outs = [rater.rate_best_device_finish(p) for p in pendings]
            return outs
        t0 = time.perf_counter()
        decode_document()
        print('decode compile+warmup: %.1fs'
              % (time.perf_counter() - t0), file=sys.stderr)
    except Exception as err:
        print('decode bench failed: %r' % err, file=sys.stderr)

    # ---- document-batched decode (serving shape) ----
    # N INDEPENDENT documents through the doc-batched fused kernel
    # (rate_best_batch): documents stack in the MXU row dimension —
    # a serving batch decodes faster than the same documents through
    # the pipelined single-document (latency) path.
    # The reps of the two paths INTERLEAVE so the tunneled service's
    # drifting contention (stalls of ~120 ms every few calls) hits
    # both comparably; best + median are reported for each.
    decode_batch = decode_batch_med = decode_batch32 = None
    decode_batch_sus = decode_batch_sus_med = None
    decode_batch_db = decode_batch_db_med = None
    decode_sess = {}
    try:
        if pages:
            rater.rate_best_batch(pages, beam_width=16)  # warm/compile
            # quick RTT probe HERE (not only at the end of the run):
            # the per-dispatch round-trip measured adjacent to the
            # decode timings feeds the RTT-corrected median below
            tiny_probe = jax.jit(lambda v: v + 1.0)
            float(tiny_probe(_jnp.zeros((8,)))[0])  # compile
            probe_rtts = []
            for _ in range(10):
                t0 = time.perf_counter()
                float(tiny_probe(_jnp.zeros((8,)))[0])
                probe_rtts.append(time.perf_counter() - t0)
            probe_rtts.sort()
            rtt_min_s = probe_rtts[0]
            rtt_med_s = probe_rtts[len(probe_rtts) // 2]
            # 3 interleaved SESSIONS x 6 reps, 2s apart (VERDICT r3
            # #5): the tunnel's contention drifts on a seconds scale,
            # so one contiguous rep series can sit inside a congested
            # window and inflate the median vs the best (8.6% in r3).
            # Separated sessions distinguish transient link jitter
            # from real tail cost: a session median within 5% of the
            # overall best means the tail is jitter, not work.
            # each batch rep is BRACKETED by tiny-dispatch probes: a
            # rep whose adjacent probes exceed the link floor has
            # independent evidence the LINK (8-float round-trip, zero
            # compute) stalled during it — the clean-median below
            # excludes exactly those reps, separating tunnel
            # transients from real kernel tail cost
            times_single = []
            times_batch = []
            probes_batch = []
            sess_meds_single = []
            sess_meds_batch = []
            for sess in range(3):
                if sess:
                    time.sleep(2.0)
                ts_s, ts_b = [], []
                for _ in range(6):
                    t0 = time.perf_counter()
                    decode_document()
                    ts_s.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(tiny_probe(_jnp.zeros((8,)))[0])
                    probe_pre = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    rater.rate_best_batch(pages, beam_width=16)
                    ts_b.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(tiny_probe(_jnp.zeros((8,)))[0])
                    probes_batch.append(
                        max(probe_pre, time.perf_counter() - t0))
                times_single += ts_s
                times_batch += ts_b
                sess_meds_single.append(sorted(ts_s)[len(ts_s) // 2])
                sess_meds_batch.append(sorted(ts_b)[len(ts_b) // 2])
            decode_sess = {
                'single_meds': sess_meds_single,
                'batch_meds': sess_meds_batch,
                'batch_times': times_batch,
                'batch_probes': probes_batch,
                'rtt_min_ms': rtt_min_s * 1e3,
                'rtt_med_ms': rtt_med_s * 1e3,
            }
            best = min(times_single)
            med = sorted(times_single)[len(times_single) // 2]
            decode = n_pages * n_edges / best
            decode_med = n_pages * n_edges / med
            print('tpu decode (%d-page doc, beam 16, 4 alts): '
                  '%.0f chars/s (best %.3fs, median %.3fs for %d edges)'
                  % (n_pages, decode, best, med, n_pages * n_edges),
                  file=sys.stderr)
            best = min(times_batch)
            med = sorted(times_batch)[len(times_batch) // 2]
            decode_batch = n_pages * n_edges / best
            decode_batch_med = n_pages * n_edges / med
            print('tpu decode (%d-doc batch, beam 16, 4 alts): '
                  '%.0f chars/s (best %.3fs, median %.3fs)'
                  % (n_pages, decode_batch, best, med), file=sys.stderr)
            # sustained serving throughput: 4 back-to-back batch
            # calls timed as one window, per-call time = window/4.
            # A single ~0.1s call through the tunnel measures one
            # blocking result fetch (RTT 25-47 ms, drifting) as much
            # as the work; a serving loop issues calls back-to-back,
            # where that jitter averages out.  Reported alongside the
            # single-call best/median, not instead of them.
            K = 4
            times_sus = []
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(K):
                    rater.rate_best_batch(pages, beam_width=16)
                times_sus.append((time.perf_counter() - t0) / K)
            times_sus.sort()
            decode_batch_sus = n_pages * n_edges / times_sus[0]
            decode_batch_sus_med = \
                n_pages * n_edges / times_sus[len(times_sus) // 2]
            print('tpu decode (16-doc batch, sustained x%d windows): '
                  '%.0f chars/s (best %.3fs/call, median %.3fs/call)'
                  % (K, decode_batch_sus, times_sus[0],
                     times_sus[len(times_sus) // 2]), file=sys.stderr)
            # double-buffered serving loop (round 4): batch i+1 is
            # DISPATCHED before batch i is finished, so host prep +
            # the fetch RTT overlap device decode
            # (rate_best_batch_begin/finish)
            pend = rater.rate_best_batch_begin(pages, beam_width=16)
            rater.rate_best_batch_finish(pend)  # warm the split path
            times_db = []
            for _ in range(4):
                pend = rater.rate_best_batch_begin(pages,
                                                   beam_width=16)
                t0 = time.perf_counter()
                for _ in range(K):
                    nxt = rater.rate_best_batch_begin(pages,
                                                      beam_width=16)
                    rater.rate_best_batch_finish(pend)
                    pend = nxt
                times_db.append((time.perf_counter() - t0) / K)
                rater.rate_best_batch_finish(pend)
            times_db.sort()
            decode_batch_db = n_pages * n_edges / times_db[0]
            decode_batch_db_med = \
                n_pages * n_edges / times_db[len(times_db) // 2]
            print('tpu decode (16-doc batch, double-buffered x%d): '
                  '%.0f chars/s (best %.3fs/call, median %.3fs/call)'
                  % (K, decode_batch_db, times_db[0],
                     times_db[len(times_db) // 2]), file=sys.stderr)
            # scaling point: 32 docs = 4 kernel groups, same compiled
            # shapes (more host prep overlaps more device compute)
            pages32 = pages + pages
            rater.rate_best_batch(pages32, beam_width=16)
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                rater.rate_best_batch(pages32, beam_width=16)
                times.append(time.perf_counter() - t0)
            best32 = min(times)
            decode_batch32 = len(pages32) * n_edges / best32
            print('tpu decode (32-doc batch): %.0f chars/s '
                  '(best %.3fs, median %.3fs)'
                  % (decode_batch32, best32,
                     sorted(times)[len(times) // 2]), file=sys.stderr)
    except Exception as err:
        print('batch decode bench failed: %r' % err, file=sys.stderr)

    # ---- realistic-lattice serving decode ----
    # OCR-shaped content: words of high-confidence single-alternative
    # chars (merged into runs by the prep) with 1-2 ambiguous
    # multi-alternative glyphs per word — the mixed-length regime the
    # per-edge dynamic char-step bounds serve (synthetic all-4-alt
    # pages above are the uniform L=1 regime).
    decode_real = decode_real_med = None
    decode_real_single = decode_real_single_med = None
    try:
        if pages:
            def make_realistic(n_words, seed):
                rngr = np.random.default_rng(seed)
                g = nx.DiGraph()
                g.add_node(0)
                node = 0
                for _ in range(n_words):
                    wlen = int(rngr.integers(3, 9))
                    amb = set(rngr.integers(0, wlen, size=2))
                    for j in range(wlen):
                        if j in amb:
                            tes = [TextEquivType(
                                Unicode=chars[rngr.integers(len(chars))],
                                conf=float(rngr.uniform(0.6, 0.95)),
                                index=i)
                                for i in range(int(rngr.integers(2, 5)))]
                        else:
                            tes = [TextEquivType(
                                Unicode=chars[rngr.integers(len(chars))],
                                conf=0.95, index=0)]
                        g.add_edge(node, node + 1, element='c%d' % node,
                                   alternatives=tes)
                        node += 1
                    g.add_edge(node, node + 1, element='s%d' % node,
                               alternatives=[TextEquivType(
                                   Unicode=' ', conf=1.0, index=0)])
                    node += 1
                return g, node
            rdocs = []
            rchars = 0
            for s in range(16):
                g, n = make_realistic(160, s)
                rdocs.append(g)
                rchars += n
            rater.rate_best_batch(rdocs, beam_width=16)  # warm/compile
            times = []
            for _ in range(8):
                t0 = time.perf_counter()
                rater.rate_best_batch(rdocs, beam_width=16)
                times.append(time.perf_counter() - t0)
            times.sort()
            decode_real_single = rchars / times[0]
            decode_real_single_med = rchars / times[len(times) // 2]
            print('tpu decode (16 realistic docs, %d chars, single '
                  'calls): %.0f chars/s (best %.3fs, median %.3fs)'
                  % (rchars, decode_real_single, times[0],
                     times[len(times) // 2]), file=sys.stderr)
            # headline realistic figure = SERVING windows: 5 windows
            # of 4 back-to-back double-buffered batches each
            # (begin/finish split, 2 in flight), per-call time =
            # window wall / 4, median over windows — nothing
            # excluded.  A deployment decodes batches back-to-back,
            # where per-call link stalls amortize instead of each
            # hitting a lone blocking fetch; the single-call figures
            # above are kept alongside.
            KW = 4
            wtimes = []
            pend = rater.rate_best_batch_begin(rdocs, beam_width=16)
            for _ in range(5):  # median-of-5 rides out 2 stalled windows
                t0 = time.perf_counter()
                for _ in range(KW):
                    nxt = rater.rate_best_batch_begin(rdocs,
                                                      beam_width=16)
                    rater.rate_best_batch_finish(pend)
                    pend = nxt
                wtimes.append((time.perf_counter() - t0) / KW)
            rater.rate_best_batch_finish(pend)
            wtimes.sort()
            decode_real = rchars / wtimes[0]
            decode_real_med = rchars / wtimes[len(wtimes) // 2]
            print('tpu decode (16 realistic docs, serving windows '
                  'x%d): %.0f chars/s best, %.0f median '
                  '(%.3fs/call best)'
                  % (KW, decode_real, decode_real_med, wtimes[0]),
                  file=sys.stderr)
    except Exception as err:
        print('realistic decode bench failed: %r' % err,
              file=sys.stderr)

    # ---- full METS workflow (BASELINE.md measurement plan #5) ----
    # End-to-end pages/sec of the context-conditioned OCR-D processor:
    # PAGE-XML parse -> lattice build -> device beam decode -> result
    # write-back, over a 16-page synthetic workspace with ambiguous
    # glyphs (the year context comes from the METS identifier).  This
    # includes every host cost the serving deployment pays.
    workflow_pps = workflow_cps = workflow_cps_med = None
    try:
        import os as _os
        import tempfile

        from ocrd_keraslm_tpu.wrapper import KerasRate
        from ocrd_keraslm_tpu.wrapper.mets import (Mets, MetsFile,
                                                   Workspace,
                                                   mets_to_xml)
        from ocrd_keraslm_tpu.wrapper.page import (Glyph, PcGts,
                                                   TextEquivType,
                                                   TextLine, TextRegion,
                                                   Word, to_xml)
        rngw = np.random.default_rng(17)
        letters = 'abcdefghijklmnopqrstuvwxyz'
        n_wpages, n_lines, n_words = 16, 12, 14

        def bench_pcgts(page_id):
            pcgts = PcGts()
            pcgts.pcGtsId = page_id
            region = TextRegion('%s_r1' % page_id)
            chars_on_page = 0
            for li in range(n_lines):
                line = TextLine('%s_r1_l%d' % (page_id, li))
                for wi in range(n_words):
                    text = ''.join(letters[rngw.integers(26)]
                                   for _ in range(rngw.integers(3, 9)))
                    word = Word('%s_r1_l%d_w%d' % (page_id, li, wi))
                    word.add_TextEquiv(TextEquivType(Unicode=text,
                                                     conf=0.9))
                    for gi, ch in enumerate(text):
                        glyph = Glyph('%s_r1_l%d_w%d_g%d'
                                      % (page_id, li, wi, gi))
                        if gi == 0:  # ~1 ambiguous glyph per word
                            for idx, alt in enumerate(
                                    (ch, letters[rngw.integers(26)],
                                     letters[rngw.integers(26)])):
                                glyph.add_TextEquiv(TextEquivType(
                                    Unicode=alt,
                                    conf=0.95 - 0.02 * idx, index=idx))
                        else:
                            glyph.add_TextEquiv(TextEquivType(
                                Unicode=ch, conf=0.95, index=0))
                        word.add_Glyph(glyph)
                    chars_on_page += len(text) + 1
                    line.add_Word(word)
                region.add_TextLine(line)
            for line in region.lines:
                line.add_TextEquiv(TextEquivType(Unicode=' '.join(
                    w.text_equivs[0].Unicode for w in line.words),
                    conf=0.9))
            region.add_TextEquiv(TextEquivType(Unicode='\n'.join(
                l.text_equivs[0].Unicode for l in region.lines),
                conf=0.9))
            pcgts.page.add_TextRegion(region)
            return pcgts, chars_on_page

        wdir = tempfile.mkdtemp(prefix='bench_ws_')
        _os.makedirs(_os.path.join(wdir, 'OCR-D-OCR'), exist_ok=True)
        mets = Mets(unique_identifier='urn:bench/corpus_1800')
        mets.file_groups['OCR-D-OCR'] = []
        total_ws_chars = 0
        for p in range(n_wpages):
            page_id = 'phys_%04d' % (p + 1)
            pcgts, n = bench_pcgts(page_id)
            total_ws_chars += n
            fid = 'OCR-D-OCR_%s' % page_id
            fname = _os.path.join('OCR-D-OCR', fid + '.xml')
            with open(_os.path.join(wdir, fname), 'w',
                      encoding='utf-8') as fh:
                fh.write(to_xml(pcgts))
            mets.file_groups['OCR-D-OCR'].append(MetsFile(
                ID=fid, fileGrp='OCR-D-OCR', local_filename=fname,
                pageId=page_id))
            mets.page_ids.append(page_id)
        with open(_os.path.join(wdir, 'mets.xml'), 'w',
                  encoding='utf-8') as fh:
            fh.write(mets_to_xml(mets))
        model_path = _os.path.join(wdir, 'model.h5')
        rater.history = getattr(rater, 'history', {}) or {}
        rater.save(model_path)
        prior_existing = _os.environ.get('OCRD_EXISTING_OUTPUT')
        _os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'  # re-run reps

        def run_workflow():
            ws = Workspace(wdir)
            proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                             output_file_grp='OCR-D-LM',
                             parameter={'model_file': model_path,
                                        'textequiv_level': 'glyph',
                                        'alternative_decoding': True,
                                        'beam_width': 16})
            proc.setup()
            proc.process_workspace(ws)

        try:
            run_workflow()  # warmup/compile
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                run_workflow()
                times.append(time.perf_counter() - t0)
        finally:
            # restore the error-policy env (later sections must not
            # inherit OVERWRITE semantics)
            if prior_existing is None:
                _os.environ.pop('OCRD_EXISTING_OUTPUT', None)
            else:
                _os.environ['OCRD_EXISTING_OUTPUT'] = prior_existing
        best = min(times)
        med = sorted(times)[len(times) // 2]
        workflow_pps = n_wpages / best
        workflow_cps = total_ws_chars / best
        workflow_cps_med = total_ws_chars / med
        print('tpu METS workflow (%d pages, %d chars e2e): '
              '%.1f pages/s, %.0f chars/s (best %.3fs, median %.3fs)'
              % (n_wpages, total_ws_chars, workflow_pps, workflow_cps,
                 best, med), file=sys.stderr)
    except Exception as err:
        print('workflow bench failed: %r' % err, file=sys.stderr)

    # ---- native fast-lane bail rate on a realistic page mix ----
    # The C++ byte-lane scanner deliberately bails to the lxml lane on
    # shapes it does not provably handle (native_src/page_scan.cpp:
    # DOCTYPE, CDATA, nested TextRegion, ...).  This section measures
    # what that costs on a REALISTIC mix (VERDICT r4 #7): 16 pages =
    # 12 plain (the dominant flat OCR page), 2 nested-TextRegion
    # (complex layouts: newspapers, footnote regions), 1 DOCTYPE,
    # 1 CDATA-in-Unicode — and reports the fast-lane hit rate, the
    # per-reason bail counts, and the blended e2e workflow speed over
    # exactly this mix (nothing excluded).
    native_hit_pct = native_blend_pps = None
    native_bails: dict = {}
    try:
        from collections import Counter

        from ocrd_keraslm_tpu.wrapper.page_native import (
            NativePageDoc, available as native_available)
        if workflow_pps is not None and native_available():
            mdir = tempfile.mkdtemp(prefix='bench_mix_')
            _os.makedirs(_os.path.join(mdir, 'OCR-D-OCR'),
                         exist_ok=True)
            mmets = Mets(unique_identifier='urn:bench/mix_1800')
            mmets.file_groups['OCR-D-OCR'] = []
            mix_chars = 0

            def mutate(xml, kind, page_id):
                if kind == 'doctype':
                    # plain DOCTYPE (no internal subset): a valid
                    # prolog some generators emit
                    i = xml.find('?>')
                    return (xml[:i + 2] + '\n<!DOCTYPE PcGts>'
                            + xml[i + 2:])
                if kind == 'cdata':
                    i = xml.find('<Unicode>')
                    j = xml.find('</Unicode>', i)
                    inner = xml[i + len('<Unicode>'):j]
                    return (xml[:i] + '<Unicode><![CDATA[' + inner
                            + ']]></Unicode>' + xml[j + 10:])
                if kind == 'nested':
                    # wrap the page's TextRegion in an outer region
                    # (drop-capital/paragraph-in-region layouts)
                    i = xml.find('<TextRegion')
                    j = xml.rfind('</TextRegion>')
                    return (xml[:i]
                            + '<TextRegion id="%s_outer">' % page_id
                            + xml[i:j + len('</TextRegion>')]
                            + '</TextRegion>' + xml[j + 13:])
                return xml

            kinds = (['plain'] * 12 + ['nested'] * 2
                     + ['doctype'] + ['cdata'])
            for p, kind in enumerate(kinds):
                page_id = 'phys_%04d' % (p + 1)
                pcgts, n = bench_pcgts(page_id)
                mix_chars += n
                xml = to_xml(pcgts)
                xml = mutate(xml, kind, page_id)
                fid = 'OCR-D-OCR_%s' % page_id
                fname = _os.path.join('OCR-D-OCR', fid + '.xml')
                with open(_os.path.join(mdir, fname), 'w',
                          encoding='utf-8') as fh:
                    fh.write(xml)
                mmets.file_groups['OCR-D-OCR'].append(MetsFile(
                    ID=fid, fileGrp='OCR-D-OCR',
                    local_filename=fname, pageId=page_id))
                mmets.page_ids.append(page_id)
            with open(_os.path.join(mdir, 'mets.xml'), 'w',
                      encoding='utf-8') as fh:
                fh.write(mets_to_xml(mmets))
            # (a) scanner verdict per page
            bails = Counter()
            hits = 0
            for mf in mmets.file_groups['OCR-D-OCR']:
                doc = NativePageDoc(
                    _os.path.join(mdir, mf.local_filename))
                if doc.bail is None:
                    hits += 1
                else:
                    bails[doc.bail] += 1
            native_hit_pct = 100.0 * hits / len(kinds)
            native_bails = dict(bails)
            # (b) blended e2e speed over the mix (same processor
            # config as the workflow section; bailed pages take the
            # lxml lane + host-graph route inside the same run)
            prior_mix = _os.environ.get('OCRD_EXISTING_OUTPUT')
            _os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'

            def run_mix():
                ws = Workspace(mdir)
                proc = KerasRate(
                    workspace=ws, input_file_grp='OCR-D-OCR',
                    output_file_grp='OCR-D-LM',
                    parameter={'model_file': model_path,
                               'textequiv_level': 'glyph',
                               'alternative_decoding': True,
                               'beam_width': 16})
                proc.setup()
                proc.process_workspace(ws)

            try:
                run_mix()  # warmup/compile
                mtimes = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_mix()
                    mtimes.append(time.perf_counter() - t0)
            finally:
                if prior_mix is None:
                    _os.environ.pop('OCRD_EXISTING_OUTPUT', None)
                else:
                    _os.environ['OCRD_EXISTING_OUTPUT'] = prior_mix
            native_blend_pps = len(kinds) / min(mtimes)
            print('native-lane mix (%d pages: %s): hit rate %.0f%%, '
                  'bails %s, blended %.1f pages/s (%.0f chars/s)'
                  % (len(kinds), dict(Counter(kinds)), native_hit_pct,
                     native_bails, native_blend_pps,
                     mix_chars / min(mtimes)), file=sys.stderr)
    except Exception as err:
        print('native-lane mix bench failed: %r' % err,
              file=sys.stderr)

    # ---- incremental generation (explicit-state beam sampling) ----
    gen_cps = gen_stream_cps = base_gen = gen_dev_cps = None
    gen_cps_med = gen_stream_med = gen_long_cps = None
    gen_1k_pipe_cps = None
    try:
        base_gen = max(numpy_baseline_generate_chars_per_sec(
            params_np, width, depth) for _ in range(5))
        print('numpy generate baseline: %.0f chars/s' % base_gen,
              file=sys.stderr)
        GEN_N = 1024  # long enough to amortize the fixed dispatch RTT
        # probe the dispatch RTT adjacent to the 1k point: on a LOCAL
        # PJRT deployment (sub-ms RTT) the 1024-char measurement is
        # kernel-bound and representative; through the axon tunnel
        # (~25 ms RTT) the fixed dispatch alone caps it at ~38k
        # chars/s whatever the kernel does (VERDICT r3 #8)
        tiny_gen_probe = jax.jit(lambda v: v * 2.0)
        float(tiny_gen_probe(_jnp.zeros((8,)))[0])  # compile
        gen_rtts = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(tiny_gen_probe(_jnp.zeros((8,)))[0])
            gen_rtts.append(time.perf_counter() - t0)
        gen_rtt_min_ms = min(gen_rtts) * 1e3
        gen_local_pjrt = gen_rtt_min_ms < 2.0
        rater.generate('abc', 16)  # warmup/compile (length bucket 16)
        rater.generate('abc', GEN_N)  # warmup bucket 1024
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = rater.generate('abc', GEN_N)
            times.append(time.perf_counter() - t0)
        best = min(times)
        gen_cps = GEN_N / best
        gen_cps_med = GEN_N / sorted(times)[len(times) // 2]
        print('tpu generation (fringe 256): %.0f chars/s best, '
              '%.0f median (%.3fs best for %d chars)'
              % (gen_cps, gen_cps_med, best, GEN_N), file=sys.stderr)
        # pipelined serving at the 1k point (generate_begin/finish):
        # 2 requests in flight, so the fixed dispatch/fetch RTT —
        # the whole budget of a 1k-char request through a tunnel —
        # overlaps the other request's device beam search.  Measured
        # as ONE window of 8 back-to-back requests (total wall /
        # count, nothing excluded): the deployment shape for
        # short-prompt serving.
        gen_1k_pipe_cps = None
        try:
            pend = rater.generate_begin('abc', GEN_N)
            rater.generate_finish(pend)  # warm the split path
            REQS = 8
            pipe_dts = []
            pend = rater.generate_begin('abc', GEN_N)
            for _ in range(3):  # median-of-3 windows rides out a stall
                t0 = time.perf_counter()
                for _ in range(REQS):
                    nxt = rater.generate_begin('abc', GEN_N)
                    rater.generate_finish(pend)
                    pend = nxt
                pipe_dts.append((time.perf_counter() - t0) / REQS)
            rater.generate_finish(pend)
            pipe_dts.sort()
            dt_pipe = pipe_dts[len(pipe_dts) // 2]
            gen_1k_pipe_cps = GEN_N / dt_pipe
            print('tpu generation (1k, pipelined depth 2, %d reqs '
                  'x%d windows): %.0f chars/s (median %.3fs/request, '
                  'best %.3fs)'
                  % (REQS, len(pipe_dts), gen_1k_pipe_cps, dt_pipe,
                     pipe_dts[0]), file=sys.stderr)
        except Exception as err:
            print('pipelined 1k generation failed: %r' % err,
                  file=sys.stderr)
        # long-form serving point: 16384 chars amortize the fixed
        # ~27 ms dispatch RTT ~12x (at 1024 chars the RTT alone caps
        # e2e at ~38k chars/s whatever the kernel does).  The scan
        # program is length-independent (unroll 2), so this bucket
        # compiles as fast as the 4096 one (~11 s measured).
        GEN_LONG = 16384
        rater.generate('abc', GEN_LONG)  # warmup bucket 4096
        best_l = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            rater.generate('abc', GEN_LONG)
            best_l = min(best_l, time.perf_counter() - t0)
        gen_long_cps = GEN_LONG / best_l
        # device-side marginal cost (separating the tunneled dispatch
        # RTT, ~30-110 ms/call here, from the ~10-20 us/char the chip
        # actually spends): slope between the 256- and 16384-char scan
        # lengths.  The far end must be the LONG point: ~16k extra
        # chars are hundreds of ms of device time, far above RTT
        # jitter, whereas a 1024-char far end (768 x ~11 us = 8 ms)
        # drowned in a ~5 ms RTT swing and once measured a bogus
        # 0.0 us/char marginal.
        t_short = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            rater.generate('abc', 256)
            t_short = min(t_short, time.perf_counter() - t0)
        slope = max((best_l - t_short) / (GEN_LONG - 256), 1e-7)
        gen_dev_cps = 1.0 / slope
        print('tpu generation device-side: %.0f chars/s '
              '(%.1f us/char marginal)' % (gen_dev_cps, slope * 1e6),
              file=sys.stderr)
        print('tpu generation (%d chars e2e): %.0f chars/s (%.3fs)'
              % (GEN_LONG, gen_long_cps, best_l), file=sys.stderr)
        # serving-style: 32 prompts generated in ONE vmapped dispatch
        S = 32
        prompts = ['abc%d' % s for s in range(S)]
        rater.generate_batch(prompts, GEN_N)  # warmup/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = rater.generate_batch(prompts, GEN_N)
            times.append(time.perf_counter() - t0)
        best = min(times)
        gen_stream_cps = S * GEN_N / best
        gen_stream_med = S * GEN_N / sorted(times)[len(times) // 2]
        print('tpu generation (%d streams x %d): %.0f chars/s best, '
              '%.0f median (%.3fs best)'
              % (S, GEN_N, gen_stream_cps, gen_stream_med, best),
              file=sys.stderr)
    except Exception as err:
        print('generation bench failed: %r' % err, file=sys.stderr)

    # ---- training step throughput (parallel-streams stateful) ----
    train_cps = None
    # measured CPU baseline (see torch_baseline_train_chars_per_sec);
    # numpy-estimate fallback only if torch is absent
    base_train_measured = None
    try:
        base_train_measured = torch_baseline_train_chars_per_sec(
            params_np, width, depth)
    except Exception as err:
        print('torch train baseline failed: %r' % err, file=sys.stderr)
    if base_train_measured:
        base_train = base_train_measured
        print('torch train baseline (B=128, T=256): %.0f chars/s'
              % base_train, file=sys.stderr)
    else:
        base_train = base / 3.0  # estimate: fwd numpy loop / 3
    try:
        import jax.numpy as jnp

        from ocrd_keraslm_tpu.models.lstm_lm import zero_carry
        from ocrd_keraslm_tpu.training import _OPT, train_step
        B, T = 128, 256
        x = jnp.asarray(rng.integers(1, voc, (B, T)), jnp.int32)
        y = jnp.asarray(rng.integers(1, voc, (B, T)), jnp.int32)
        mask = jnp.ones((B, T), jnp.float32)
        zs = (jnp.zeros((B,), jnp.int32),)
        carry = zero_carry(cfg, B)
        opt_state = _OPT.init(params)
        p = params
        rngk = jax.random.PRNGKey(0)
        up = jax.default_backend() == 'tpu'  # Pallas fwd+bwd kernels
        p, opt_state, carry, loss, nll, acc = train_step(
            p, opt_state, cfg, x, zs, y, mask, carry, rngk,
            use_pallas=up)  # compile
        float(loss)
        # 2 windows of 8 async-dispatched steps, ONE blocking fetch
        # per window; keep the better window (a link stall during
        # dispatch submission inflates a whole window — nothing
        # within a window is excluded)
        reps, dt = 8, 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                p, opt_state, carry, loss, nll, acc = train_step(
                    p, opt_state, cfg, x, zs, y, mask, carry, rngk,
                    use_pallas=up)
            float(loss)
            dt = min(dt, (time.perf_counter() - t0) / reps)
        train_cps = B * T / dt
        print('tpu train step: %.0f chars/s (%.1f ms/step of %d chars)'
              % (train_cps, dt * 1e3, B * T), file=sys.stderr)
    except Exception as err:
        print('train bench failed: %r' % err, file=sys.stderr)

    # ---- scale-regime probe: large-model train-step MFU ----
    # The flagship w128-d2 model is latency-bound BY CONSTRUCTION
    # (see roofline note below), so its MFU says nothing about the
    # framework.  This probe measures the same train_step at a
    # production-LM size (w512 x d4, bf16 recurrent core, 256
    # streams): per time step the recurrence is a (512,512)@(512,2048)
    # matmul per layer — real MXU tiles — so the measured MFU shows
    # what the training stack reaches once the model is big enough to
    # fill the hardware.
    scale_mfu = None
    try:
        import jax.numpy as jnp

        from ocrd_keraslm_tpu.models.lstm_lm import (LMConfig,
                                                     init_params,
                                                     zero_carry)
        from ocrd_keraslm_tpu.training import _OPT, train_step
        SW, SD, SV = 512, 4, 512
        scfg = LMConfig(width=SW, depth=SD, length=256, voc_size=SV,
                        compute_dtype='bfloat16')
        sparams = init_params(scfg, jax.random.PRNGKey(7))
        B, T = 512, 256  # B=1024 exceeds the remote-compile helper
        x = jnp.asarray(rng.integers(1, SV, (B, T)), jnp.int32)
        y = jnp.asarray(rng.integers(1, SV, (B, T)), jnp.int32)
        mask = jnp.ones((B, T), jnp.float32)
        zs = (jnp.zeros((B,), jnp.int32),)
        carry = zero_carry(scfg, B)
        opt_state = _OPT.init(sparams)
        rngk = jax.random.PRNGKey(0)
        p = sparams
        # the Pallas fused recurrence (fwd+bwd kernels, bf16 gate
        # matmuls with f32 carry, batch-blocked grid) measured 32%
        # MFU vs 17% for the XLA scan at this shape (round 5) — the
        # same kernels train_rater selects with rater.use_pallas
        p, opt_state, carry, loss, nll, acc = train_step(
            p, opt_state, scfg, x, zs, y, mask, carry, rngk,
            use_pallas=True)  # compile
        float(loss)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            p, opt_state, carry, loss, nll, acc = train_step(
                p, opt_state, scfg, x, zs, y, mask, carry, rngk,
                use_pallas=True)
        float(loss)
        dt = (time.perf_counter() - t0) / reps
        scale_cps = B * T / dt
        # fwd FLOPs/char: x-proj + h-proj (width -> 4*width) per layer
        # + tied softmax; train ~= 3x fwd (fwd + 2x bwd matmuls)
        fwd_fpc = 2 * (2 * SW * 4 * SW * SD + SW * SV)
        train_flops = 3.0 * fwd_fpc * scale_cps
        peak = 197e12  # v5e bf16 peak FLOP/s (single chip)
        if jax.default_backend() != 'tpu':
            peak = None
        scale_mfu = (train_flops / peak * 100.0) if peak else None
        print('scale probe (w%d d%d bf16, %dx%d): %.0f chars/s, '
              '%.1f ms/step, %.1f TFLOP/s%s'
              % (SW, SD, B, T, scale_cps, dt * 1e3, train_flops / 1e12,
                 (', MFU %.1f%% of v5e' % scale_mfu) if scale_mfu
                 else ''), file=sys.stderr)
    except Exception as err:
        print('scale probe failed: %r' % err, file=sys.stderr)

    # recurrence roofline for the scale probe: the same 4-layer chain
    # of sequential (B, W) @ (W, 4W) bf16 matmuls with NO gate math —
    # the upper bound any LSTM implementation at this shape can reach
    # under the scan's sequential dependency (measured 35% on v5e in
    # round 5; the Pallas step above reaches ~32%, i.e. ~90% of bound)
    scale_bound_mfu = None
    try:
        if scale_mfu is not None:
            import jax.numpy as jnp
            SW, SD = 512, 4
            B, T = 512, 256

            @jax.jit
            def pure_chain(key):
                ks = jax.random.split(key, SD + 1)
                U = [(jax.random.normal(ks[l], (SW, 4 * SW)) * 0.01)
                     .astype(jnp.bfloat16) for l in range(SD)]
                xt0 = (jax.random.normal(ks[SD], (B, 4 * SW)) * 0.01
                       ).astype(jnp.bfloat16)

                def step(h, _):
                    hs = []
                    for l in range(SD):
                        z = (h[l] @ U[l]) + xt0
                        hn = jnp.tanh(z[:, :SW]) + 1e-6 * jnp.sum(
                            z[:, SW:], axis=1, keepdims=True)
                        hs.append(hn.astype(jnp.bfloat16))
                    return hs, None
                h0 = [jnp.zeros((B, SW), jnp.bfloat16)] * SD
                hT, _ = jax.lax.scan(step, h0, None, length=T)
                return sum(jnp.sum(h.astype(jnp.float32)) for h in hT)

            kk = jax.random.PRNGKey(0)
            float(pure_chain(kk))
            # the chain is only ~16 ms of device time, so a per-call
            # timing drowns in the 24-47 ms dispatch jitter (observed
            # "bounds" BELOW the kernel's own MFU).  Amortize: 6
            # back-to-back calls per window (device queues them,
            # one final sync), best window of 3.
            dtb = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(6):
                    out = pure_chain(kk)
                float(out)
                dtb = min(dtb, (time.perf_counter() - t0) / 6)
            bound_flops = 2 * B * SW * 4 * SW * SD * T
            scale_bound_mfu = bound_flops / dtb / 197e12 * 100.0
            print('scale probe recurrence bound: %.1f ms, %.1f%% MFU '
                  '(pure sequential matmul chain, no gates)'
                  % (dtb * 1e3, scale_bound_mfu), file=sys.stderr)
    except Exception as err:
        print('recurrence bound probe failed: %r' % err,
              file=sys.stderr)

    # roofline context for every number above: this model is ~230 KB
    # of weights (w128 d2) with a strictly sequential recurrence —
    # per char the chip does ~0.8 MFLOP over ~0.9 MB of VMEM-resident
    # operands, so even the batched paths run at single-digit GFLOP/s;
    # MFU is <1% of a v5e BY CONSTRUCTION (latency-bound recurrence,
    # not a kernel deficiency).  The meaningful metric is chars/sec vs
    # the CPU reference loop at identical perplexity (BASELINE.json).
    flops_per_char = 2 * (2 * width * 4 * width * depth   # LSTM
                          + width * voc)                  # tied softmax
    print('roofline: %.2f MFLOP/char, voc=%d, width=%d, depth=%d'
          % (flops_per_char / 1e6, voc, width, depth), file=sys.stderr)
    extra = {'rating_chars_per_sec_median': round(tpu_med, 1),
             'batched_chars_per_sec': round(batched, 1),
             'batched_chars_per_sec_median': round(batched_med, 1),
             'batched_vs_baseline': round(batched / base, 2),
             'numpy_baseline_chars_per_sec': round(base, 1),
             'voc_size': voc,
             'flops_per_char': flops_per_char,
             'roofline_note':
                 'w128-d2 LSTM = %.2f MFLOP/char sequential; MFU <1%% '
                 'by construction, compare chars/s vs CPU baseline at '
                 'equal ppl' % (flops_per_char / 1e6)}
    if decode is not None:
        extra.update({
            'decode_chars_per_sec': round(decode, 1),
            'decode_chars_per_sec_median': round(decode_med, 1),
            'decode_vs_baseline': round(decode / base_dec, 2),
            'numpy_baseline_decode_chars_per_sec': round(base_dec, 1)})
        if decode_sess:
            # device-side analogue of generate_device_chars_per_sec:
            # the pipelined document path dispatches all pages then
            # blocks on ONE batched fetch, so the best wall time minus
            # the measured link floor is the device-resident decode
            # time of the whole document
            best_t_doc = (n_pages * n_edges) / decode
            dev_t = max(best_t_doc - decode_sess['rtt_min_ms'] / 1e3,
                        1e-9)
            extra['decode_device_chars_per_sec'] = \
                round(n_pages * n_edges / dev_t, 1)
    if decode_batch is not None and base_dec is not None:
        extra.update({
            'decode_batch_chars_per_sec': round(decode_batch, 1),
            'decode_batch_chars_per_sec_median':
                round(decode_batch_med, 1),
            'decode_batch_vs_baseline':
                round(decode_batch / base_dec, 2)})
        if decode_sess:
            work = n_pages * n_edges
            best_t = work / decode_batch  # overall best call time
            med_sess = min(decode_sess['batch_meds'])
            extra['decode_batch_session_medians_chars_per_sec'] = \
                [round(work / m, 1) for m in decode_sess['batch_meds']]
            extra['decode_batch_best_session_median_gap_pct'] = \
                round((med_sess / best_t - 1.0) * 100.0, 1)
            extra['decode_session_medians_chars_per_sec'] = \
                [round(work / m, 1)
                 for m in decode_sess['single_meds']]
            # link-clean median: reps whose BRACKETING tiny-dispatch
            # probes stayed at the link floor (< 1.5x min RTT) ran on
            # an uncontended link; their median is the kernel's real
            # tail.  Reps excluded here carry independent evidence (a
            # zero-compute 8-float round-trip stalling) that the
            # TUNNEL, not the decode, was slow.
            floor = decode_sess['rtt_min_ms'] / 1e3
            clean = [t for t, p in zip(decode_sess['batch_times'],
                                       decode_sess['batch_probes'])
                     if p < 1.5 * floor]
            if clean:
                clean.sort()
                med_clean = clean[len(clean) // 2]
                extra['decode_batch_chars_per_sec_median_clean'] = \
                    round(work / med_clean, 1)
                extra['decode_batch_clean_gap_pct'] = \
                    round((med_clean / best_t - 1.0) * 100.0, 1)
            extra['decode_batch_reps_link_stalled'] = \
                len(decode_sess['batch_times']) - len(clean)
            extra['decode_batch_clean_median_method'] = (
                'median over reps whose bracketing 8-float probe '
                'dispatches stayed < 1.5x the %.1fms link floor '
                '(%d of %d reps excluded with direct evidence of a '
                'link stall)'
                % (decode_sess['rtt_min_ms'],
                   len(decode_sess['batch_times']) - len(clean),
                   len(decode_sess['batch_times'])))
        if decode_batch_sus is not None:
            extra['decode_batch_sustained_chars_per_sec'] = \
                round(decode_batch_sus, 1)
            extra['decode_batch_sustained_chars_per_sec_median'] = \
                round(decode_batch_sus_med, 1)
        if decode_batch_db is not None:
            extra['decode_batch_double_buffered_chars_per_sec'] = \
                round(decode_batch_db, 1)
            extra['decode_batch_double_buffered_chars_per_sec_median'] \
                = round(decode_batch_db_med, 1)
        if decode_batch32 is not None:
            extra['decode_batch32_chars_per_sec'] = \
                round(decode_batch32, 1)
    # headline = better of the TWO measured serving strategies by
    # MEDIAN (same policy as the 1k-generation point): the double-
    # buffered window wins on a stalling link (per-call stalls
    # amortize), the single blocking call can win on a clean one (no
    # begin/finish overhead).  Best AND median come from the SAME
    # winning strategy; both strategies stay reported in full, no rep
    # exclusions within either; a strategy whose measurement failed
    # simply drops out instead of dropping the headline.
    real_strats = []
    if decode_real is not None:
        real_strats.append(('window', decode_real, decode_real_med))
        extra['decode_realistic_window_chars_per_sec'] = \
            round(decode_real, 1)
        extra['decode_realistic_window_chars_per_sec_median'] = \
            round(decode_real_med, 1)
    if decode_real_single is not None:
        real_strats.append(('single blocking call',
                            decode_real_single,
                            decode_real_single_med))
    if real_strats:
        win_name, win_best, win_med = max(real_strats,
                                          key=lambda s: s[2])
        extra['decode_realistic_chars_per_sec'] = round(win_best, 1)
        extra['decode_realistic_chars_per_sec_median'] = \
            round(win_med, 1)
        extra['decode_realistic_method'] = (
            'better median of two measured serving strategies (best '
            'and median quoted from the winning strategy), no rep '
            'exclusions — this run: %s (window = 5 windows of 4 '
            'back-to-back double-buffered rate_best_batch calls, '
            'begin/finish 2 in flight, per-call = window wall / 4, '
            'median over windows; single = 8 blocking calls, '
            'median over calls)' % win_name)
    if decode_real_single is not None:
        extra['decode_realistic_single_call_chars_per_sec'] = \
            round(decode_real_single, 1)
        extra['decode_realistic_single_call_chars_per_sec_median'] = \
            round(decode_real_single_med, 1)
    if workflow_pps is not None:
        # BASELINE.md measurement plan #5: context-conditioned model in
        # a full METS workflow, end-to-end pages/sec.  The baseline
        # ratio uses the numpy DECODE loop (LM cost only), so it
        # UNDERSTATES the true e2e speedup — the reference pays PAGE
        # parse/write on top of its per-char beam loop.
        extra['workflow_pages_per_sec'] = round(workflow_pps, 2)
        extra['workflow_chars_per_sec'] = round(workflow_cps, 1)
        extra['workflow_chars_per_sec_median'] = \
            round(workflow_cps_med, 1)
        if base_dec:
            extra['workflow_vs_decode_baseline'] = \
                round(workflow_cps / base_dec, 2)
    if native_hit_pct is not None:
        extra['native_lane_hit_pct'] = round(native_hit_pct, 1)
        extra['native_lane_bails'] = native_bails
        if native_blend_pps is not None:
            extra['native_lane_blended_pages_per_sec'] = \
                round(native_blend_pps, 2)
        extra['native_lane_mix_method'] = (
            '16 pages: 12 plain, 2 nested-TextRegion, 1 DOCTYPE, '
            '1 CDATA-in-Unicode; hit = C++ byte-lane scan accepted. '
            'DOCTYPE/CDATA were extended into the scanner in round 5 '
            '(lxml-parity, fuzz-tested); decision on the remaining '
            'top bail, nested TextRegion: stays on the lxml lane — '
            'its reading-order subregion projection is exactly the '
            'semantics the byte-splice write-back cannot reproduce '
            'without duplicating the projection engine, and the '
            'blended cost is bounded (~12%% of pages x the ~25ms '
            'lxml lane)')
    if train_cps is not None:
        extra['train_chars_per_sec'] = round(train_cps, 1)
        if base_train_measured:
            # all five BASELINE.md axes now carry MEASURED baselines
            extra.update({
                'train_vs_baseline': round(train_cps / base_train, 2),
                'torch_baseline_train_chars_per_sec':
                    round(base_train, 1),
                'train_baseline_method':
                    'measured: torch-CPU same-semantics LSTM replica '
                    '(tests/test_torch_crosscheck.py), CE + clip(1.0) '
                    '+ Adam(1e-3, eps 1e-7) at the same B=128 T=256 '
                    'batch shape; regularizers omitted and stateless '
                    'batching granted, both favouring the baseline'})
        else:
            extra['train_vs_baseline_est'] = \
                round(train_cps / base_train, 2)
    if scale_mfu is not None:
        extra['train_w512d4_bf16_mfu_pct'] = round(scale_mfu, 1)
    if scale_bound_mfu is not None:
        # measured upper bound at the same shape (sequential matmul
        # chain without gate math): MFU/bound is the kernel quality
        extra['train_w512d4_recurrence_bound_mfu_pct'] = \
            round(scale_bound_mfu, 1)
    if gen_cps is not None:
        # headline generate ratio = the 16384-char serving point (the
        # 1024-char point is bounded by the tunneled ~30 ms dispatch
        # RTT alone, whatever the kernel does; both are reported)
        extra['generate_chars_per_sec'] = round(gen_cps, 1)
        if gen_cps_med is not None:
            extra['generate_chars_per_sec_median'] = \
                round(gen_cps_med, 1)
        if gen_dev_cps is not None:
            extra['generate_device_chars_per_sec'] = \
                round(gen_dev_cps, 1)
        if gen_long_cps is not None:
            extra['generate_long_chars_per_sec'] = \
                round(gen_long_cps, 1)
            if base_gen:
                extra['generate_long_vs_baseline'] = \
                    round(gen_long_cps / base_gen, 2)
        if base_gen:
            extra['numpy_baseline_generate_chars_per_sec'] = \
                round(base_gen, 1)
            if gen_1k_pipe_cps is not None:
                # headline 1k point = the better of the TWO measured
                # serving strategies, each reported in full under its
                # own key with no rep exclusions: (a) the pipelined
                # begin/finish loop (depth 2 in flight — hides the
                # RTT behind device work on a healthy link, but its
                # 2 dispatches/request double the stall exposure on a
                # flaky one) and (b) the single blocking call.  A
                # deployment picks whichever its link favours.
                extra['generate_1k_pipelined_chars_per_sec'] = \
                    round(gen_1k_pipe_cps, 1)
                # median-vs-median: comparing the pipelined median
                # against the single-call BEST would let one lucky
                # clean rep on a stalling link set the headline
                gen_1k_best_strategy = max(gen_1k_pipe_cps,
                                           gen_cps_med)
                extra['generate_1k_vs_baseline'] = \
                    round(gen_1k_best_strategy / base_gen, 2)
                extra['generate_1k_method'] = (
                    'better median of two measured serving '
                    'strategies, no rep exclusions — this run: %s '
                    '(pipelined = generate_begin/finish split, depth '
                    '2 in flight, median over 3 windows of 8 '
                    'requests; single = median of 5 blocking calls)'
                    % ('pipelined' if gen_1k_pipe_cps >= gen_cps_med
                       else 'single blocking call'))
            else:
                extra['generate_1k_vs_baseline'] = \
                    round(gen_cps / base_gen, 2)
            extra['generate_1k_single_call_vs_baseline'] = \
                round(gen_cps / base_gen, 2)
            try:
                extra['generate_1k_dispatch_rtt_ms'] = \
                    round(gen_rtt_min_ms, 2)
                if gen_local_pjrt:
                    # chip is local: the 1024-char point is
                    # kernel-bound and stands as the headline
                    # single-stream claim
                    extra['generate_1k_vs_baseline_local'] = \
                        round(gen_cps / base_gen, 2)
                else:
                    extra['generate_1k_note'] = (
                        'tunneled run (dispatch RTT %.1f ms): a '
                        'SINGLE blocking 1024-char call is RTT-'
                        'bound; the headline generate_1k_vs_baseline '
                        'takes the better measured serving strategy '
                        '(see generate_1k_method)'
                        % gen_rtt_min_ms)
            except NameError:
                pass
            extra['generate_vs_baseline'] = round(
                (gen_long_cps if gen_long_cps else gen_cps) / base_gen,
                2)
            extra['generate_vs_baseline_point'] = (
                '16384-char serving point (= generate_long; the '
                '1024-char point is RTT-bound, see '
                'generate_1k_vs_baseline; r02 and earlier reported '
                'the 1024-char point under this key)'
                if gen_long_cps else
                '1024-char point (16384-char measurement failed '
                'this run)')
    if gen_stream_cps is not None and base_gen:
        extra['generate_streams_chars_per_sec'] = round(gen_stream_cps, 1)
        if gen_stream_med is not None:
            extra['generate_streams_chars_per_sec_median'] = \
                round(gen_stream_med, 1)
        extra['generate_streams_vs_baseline'] = \
            round(gen_stream_cps / base_gen, 2)
    # machine-of-the-day probe: per-dispatch round-trip of a trivial
    # device op.  The tunneled service stalls intermittently; min =
    # the link floor, median-vs-min spread explains best-vs-median
    # spread in the metrics above (documented in docs/ROADMAP.md).
    try:
        tiny = jax.jit(lambda v: v + 1.0)
        x = _jnp.zeros((8,))
        float(tiny(x)[0])  # compile
        rtts = []
        for _ in range(20):
            t0 = time.perf_counter()
            float(tiny(x)[0])
            rtts.append((time.perf_counter() - t0) * 1e3)
        rtts.sort()
        extra['rtt_ms_min'] = round(rtts[0], 2)
        extra['rtt_ms_median'] = round(rtts[len(rtts) // 2], 2)
        print('device round-trip: %.1f ms min, %.1f ms median'
              % (rtts[0], rtts[len(rtts) // 2]), file=sys.stderr)
    except Exception as err:
        print('rtt probe failed: %r' % err, file=sys.stderr)

    # compact per-axis summary as the LAST key: capture harnesses
    # that keep only the output TAIL (the driver records 2000 chars)
    # would otherwise truncate the early keys of this (long) JSON
    # line — everything needed to judge the run lands here
    def _r(v, nd=1):
        return None if v is None else round(v, nd)
    try:
        headline = {
            'rating_x': _r(tpu / base, 1),
            'rating_median': _r(tpu_med),
            'decode_realistic_x_median': _r(
                extra['decode_realistic_chars_per_sec_median'] / base_dec
                if 'decode_realistic_chars_per_sec_median' in extra
                and base_dec else None, 1),
            'workflow_x_median': _r(
                workflow_cps_med / base_dec
                if workflow_cps_med and base_dec else None, 1),
            'workflow_pages_per_sec': _r(workflow_pps, 1),
            'train_x': _r(train_cps / base_train
                          if train_cps and base_train else None, 1),
            'gen_1k_x': extra.get('generate_1k_vs_baseline'),
            'gen_long_x': extra.get('generate_long_vs_baseline'),
            'gen_streams_x': extra.get('generate_streams_vs_baseline'),
            'mfu_pct': extra.get('train_w512d4_bf16_mfu_pct'),
            'mfu_bound_pct': extra.get(
                'train_w512d4_recurrence_bound_mfu_pct'),
            'native_hit_pct': extra.get('native_lane_hit_pct'),
            'baseline_decode_cps': _r(base_dec) if base_dec else None,
        }
        extra['headline'] = {k: v for k, v in headline.items()
                             if v is not None}
    except Exception as err:  # the summary must never kill the line
        print('headline summary failed: %r' % err, file=sys.stderr)

    detail_line, final_line = final_json_lines(tpu, base, extra)
    print('detail: %s' % detail_line, file=sys.stderr)
    sys.stderr.flush()
    print(final_line)
    sys.stdout.flush()


def final_json_lines(tpu, base, extra, limit=1800):
    """Build the (stderr detail, stdout final) JSON lines.

    The capture harness keeps only a ~2000-char TAIL of the combined
    output and json-parses its LAST LINE.  The single detailed JSON
    line outgrew that tail in r04 (4.9k chars -> front-truncated ->
    parse failed, BENCH_r04.json "parsed": null), so stdout now
    carries a COMPACT final line — the same metric/value/vs_baseline
    schema with only the headline ratios in ``extra``, bounded under
    ``limit`` chars — while every detailed key still lands on stderr.
    """
    def wrap(e):
        return json.dumps({
            'metric': 'rating_chars_per_sec',
            'value': round(tpu, 1),
            'unit': 'chars/s',
            'vs_baseline': round(tpu / base, 2),
            'extra': e,
        })

    compact = dict(extra.get('headline') or {})
    for key in ('decode_realistic_chars_per_sec_median',
                'workflow_chars_per_sec_median',
                'train_chars_per_sec',
                'generate_1k_vs_baseline_local',
                'rtt_ms_median'):
        if key in extra:
            compact[key] = extra[key]
    compact['detail'] = 'full metrics on stderr (detail: ...)'
    line = wrap(compact)
    while len(line) > limit and compact:
        # never outgrow the capture tail: drop the BULKIEST entry
        # first so one oversized value cannot evict every small
        # headline ratio behind it
        bulkiest = max(compact, key=lambda k: len(json.dumps(
            {k: compact[k]})))
        compact.pop(bulkiest)
        line = wrap(compact)
    return wrap(extra), line


if __name__ == '__main__':
    main()
