"""Behavioral/metric tests in the reference's style (ppl thresholds)
plus incremental-engine equivalence chains."""
import numpy as np
import pytest

from ocrd_keraslm_tpu.rater import Rater

from helpers import build_workspace, train_tiny_model


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    path = tmp_path_factory.mktemp('m') / 'lm.h5'
    model, nll = train_tiny_model(str(path), 'abcd ' * 400, steps=400)
    return model


def test_ppl_discriminates(trained):
    """A trained model must assign much lower perplexity to in-domain
    text than to scrambled text (metric-thresholded, like the
    reference's <6.0 / <3.5 bounds)."""
    r = Rater()
    r.load_config(trained)
    r.configure()
    r.load_weights(trained)
    _, ppl_good = r.rate2('abcd abcd abcd abcd')
    _, ppl_bad = r.rate2('ddac bacb dcba abdc')
    assert ppl_good < 2.5, ppl_good
    assert ppl_bad > 2 * ppl_good, (ppl_good, ppl_bad)


def test_predict_chain_matches_rate2(trained):
    """Chaining the incremental engine char-by-char must reproduce the
    whole-sequence probabilities (beam-step equivalence)."""
    r = Rater()
    r.load_config(trained)
    r.stateful = False
    r.incremental = True
    r.configure()
    r.load_weights(trained)
    text = 'abcd ab'
    # incremental chain
    states = [None]
    probs_inc = [1.0]
    for i, char in enumerate(text[:-1]):
        preds, states = r.predict([char], states)
        nxt = r.vocab.get(text[i + 1])
        probs_inc.append(float(preds[0][nxt]))
    # whole-sequence scan
    r2 = Rater()
    r2.load_config(trained)
    r2.configure()
    r2.load_weights(trained)
    probs_seq = r2.rate(text)
    # rate() ships per-char probs as float16 (bandwidth), so compare at
    # fp16 resolution
    np.testing.assert_allclose(probs_inc, probs_seq, rtol=2e-3,
                               atol=1e-4)


def test_predict_batch_independence(trained):
    """Hypotheses in one predict batch must not interact."""
    r = Rater()
    r.load_config(trained)
    r.stateful = False
    r.incremental = True
    r.configure()
    r.load_weights(trained)
    single, st_single = r.predict(['a'], [None])
    batch, st_batch = r.predict(['a', 'b', 'c'], [None, None, None])
    np.testing.assert_allclose(single[0], batch[0], rtol=1e-5)
    for layer in range(len(st_single[0])):
        np.testing.assert_allclose(st_single[0][layer],
                                   st_batch[0][layer], rtol=1e-5)


@pytest.mark.parametrize('level', ['region', 'line', 'word', 'glyph'])
def test_decoding_all_levels(tmp_path, level):
    """The processor decodes at every textequiv level."""
    from ocrd_keraslm_tpu.wrapper import KerasRate
    from ocrd_keraslm_tpu.wrapper.page import parse_page
    import os

    from helpers import make_tiny_model
    pages = {'p1': [['ab', 'cd'], ['ef', 'gh']]}
    ws = build_workspace(str(tmp_path), pages)
    model = make_tiny_model(tmp_path / 'model.h5', chars='abcdefgh \n')
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': model,
                                'textequiv_level': level,
                                'alternative_decoding': True,
                                'beam_width': 3})
    proc.setup()
    proc.process_workspace(ws)
    outputs = list(ws.mets.find_files(fileGrp='OCR-D-LM'))
    assert len(outputs) == 1
    pcgts = parse_page(os.path.join(ws.directory,
                                    outputs[0].local_filename))
    region = pcgts.get_Page().get_TextRegion()[0]
    assert region.get_TextEquiv()[0].Unicode  # non-empty projection
