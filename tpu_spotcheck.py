"""Real-chip parity spot checks for the compiled Pallas kernels.

The pytest suite runs every kernel in interpret mode on the CPU
backend (tests/conftest.py forces it); this script is the repeatable
counterpart ON the TPU, where Mosaic compiles the kernels for real.
It trains a tiny model (random-init models emit exactly-uniform
logits, where tie order between engines legitimately differs — see
ops/gen_kernel.py), then asserts:

* fused-kernel generation == XLA-scan generation, string for string,
  at 1024 chars and for ordered multi-variant output;
* single-document device decode == document-batched decode, text and
  entropy (the two fused kernels share semantics, not code);
* device decode entropy within documented tolerance of the host
  engine (host-vs-device may differ at genuine f32 near-ties).

Run: ``python tpu_spotcheck.py`` (or ``make spotcheck``).  Exits
non-zero on any mismatch and prints one summary line per check.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), 'tests'))


def _near_tie_lattice(seed):
    import networkx as nx

    from ocrd_keraslm_tpu.wrapper.page import TextEquivType
    g = nx.DiGraph()
    g.add_node(0)
    # seed marker stays within the training charset (an unmapped char
    # would exercise engine-specific unknown handling, not parity)
    marker = 'dog cat fox hen'.split()[seed % 4]
    text = ('the quick brown fox jumps over %s ' % marker) * 3
    node = 0
    for i, ch in enumerate(text):
        alt = 'e' if ch != 'e' else 'a'
        tes = [TextEquivType(Unicode=ch, conf=0.55, index=0),
               TextEquivType(Unicode=alt, conf=0.45, index=1)]
        g.add_edge(node, node + 1, element='c%d' % i,
                   alternatives=tes)
        node += 1
    return g, 0, node


def _text(path):
    return ''.join(te.Unicode for _, te, _ in path)


def main():
    import jax
    backend = jax.default_backend()
    print('backend: %s' % backend, file=sys.stderr)
    if backend != 'tpu':
        print('SKIP: no TPU backend (compiled-kernel parity needs '
              'the real chip; the pytest suite covers interpret mode)',
              file=sys.stderr)
        return 0

    from helpers import train_tiny_model
    from ocrd_keraslm_tpu.rater import Rater

    failures = 0

    with tempfile.TemporaryDirectory() as tmp:
        model = os.path.join(tmp, 'lm.h5')
        train_tiny_model(model,
                         'the quick brown fox jumps over the lazy '
                         'dog ' * 200, depth=2, steps=400)
        rater = Rater()
        rater.load_config(model)
        rater.stateful = False
        rater.incremental = True
        rater.configure()
        rater.load_weights(model)

        # --- generation: fused Pallas kernel vs XLA scan engine ---
        rater.fused_generate = False
        xla_1k = rater.generate('th', 1024)
        xla_v = rater.generate('th', 64, variants=3)
        rater.fused_generate = True
        fused_1k = rater.generate('th', 1024)
        fused_v = rater.generate('th', 64, variants=3)
        ok = xla_1k == fused_1k
        print('generation 1024-char strings: %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok
        ok = xla_v == fused_v
        print('generation 3-variant order:   %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok

        # --- decode: single-document device engine vs batched fused
        # kernel vs host engine on near-tie lattices ---
        docs = [_near_tie_lattice(s) for s in range(4)]
        single = [rater.rate_best_device(*d, beam_width=16)
                  for d in docs]
        batched = rater.rate_best_batch([d[0] for d in docs],
                                        beam_width=16)
        ok = all(_text(s[0]) == _text(b[0])
                 and abs(s[1] - b[1]) < 1e-3
                 for s, b in zip(single, batched))
        print('decode single vs batched:     %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok

        # split begin/finish API (serving double buffering) on the
        # FUSED path: two batches in flight, finished out of order,
        # must equal the synchronous results exactly
        pa = rater.rate_best_batch_begin([d[0] for d in docs[:2]],
                                         beam_width=16)
        pb = rater.rate_best_batch_begin([d[0] for d in docs[2:]],
                                         beam_width=16)
        got = rater.rate_best_batch_finish(pb) + \
            rater.rate_best_batch_finish(pa)
        want = batched[2:] + batched[:2]
        ok = all(_text(g[0]) == _text(w[0]) and g[1] == w[1]
                 for g, w in zip(got, want))
        print('decode begin/finish fused:    %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok

        # bf16 decode weights (the TPU default) must be BIT-IDENTICAL
        # to f32 weights on the compiled path: Mosaic's default f32
        # matmul precision is already one bf16 pass, so pre-cast
        # weights change nothing but speed (see Rater._decode_bf16)
        rater.decode_bf16 = False
        f32 = [rater.rate_best_device(*d, beam_width=16)
               for d in docs]
        rater.decode_bf16 = None
        ok = all(_text(a[0]) == _text(b[0]) and a[1] == b[1]
                 for a, b in zip(single, f32))
        print('decode bf16 == f32 weights:   %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok

        # host engine emulates the reference's lookahead lock-in: the
        # single-page path must be flushed through next_path; both
        # paths are then scored by the SHARED exact objective
        # (test_device_beam._path_cost), the same invariant the
        # wide-beam diversity test pins in interpret mode: the device
        # decoder finds paths at least as good as the host's
        from test_device_beam import _path_cost
        ok = True
        for d, s in zip(docs, single):
            _, _, tb = rater.rate_best(*d, beam_width=16)
            host_path, _, _ = rater.next_path(tb[0], ([], tb[1]))
            if _path_cost(rater, s[0]) > \
                    _path_cost(rater, host_path) + 1e-3:
                ok = False
        print('decode device <= host cost:   %s'
              % ('OK' if ok else 'MISMATCH'), file=sys.stderr)
        failures += not ok

    print('tpu_spotcheck: %s'
          % ('ALL OK' if not failures else '%d FAILURE(S)' % failures),
          file=sys.stderr)
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
