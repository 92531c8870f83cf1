"""Property-based tests (hypothesis): PAGE-XML parse/serialize
round-trip, vocabulary encode/decode invariants, h5 checkpoint
round-trip — coverage the reference lacks entirely (its tests are two
end-to-end integration runs, SURVEY.md §4)."""
import unicodedata

import numpy as np
import pytest

hyp = pytest.importorskip('hypothesis')
from hypothesis import given, settings, strategies as st

from ocrd_keraslm_tpu.utils.vocab import Vocab, nfc
from ocrd_keraslm_tpu.wrapper.page import parse_page, to_xml

from helpers import build_pcgts

# printable unicode (no surrogates/control chars; XML 1.0-safe)
_CHAR = st.characters(
    codec='utf-8',
    categories=('Lu', 'Ll', 'Lt', 'Lo', 'Nd', 'No', 'Pc', 'Pd',
                'Ps', 'Pe', 'Po', 'Sm', 'Sc', 'So'))
_WORD = st.text(_CHAR, min_size=1, max_size=8)


# ----------------------------------------------------------------------
# vocabulary
# ----------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.text(_CHAR, max_size=200))
def test_vocab_encode_decode_roundtrip(text):
    text = nfc(text)
    vocab = Vocab(sorted(set(text)))
    ids = vocab.encode(text)
    assert len(ids) == len(text)
    # every char was mapped (index 0 is reserved for unknown)
    assert (ids > 0).all() or not text
    assert vocab.decode(ids) == text


@settings(max_examples=60, deadline=None)
@given(st.text(_CHAR, min_size=1, max_size=100),
       st.text(_CHAR, min_size=1, max_size=100))
def test_vocab_unknown_maps_to_zero(known, probe):
    vocab = Vocab(sorted(set(nfc(known))))
    ids = vocab.encode(nfc(probe))
    for ch, idx in zip(nfc(probe), ids):
        if ch in vocab:
            assert idx > 0 and vocab.char(int(idx)) == ch
        else:
            assert idx == 0


@settings(max_examples=40, deadline=None)
@given(st.text(_CHAR, min_size=1, max_size=80),
       st.text(_CHAR, min_size=1, max_size=80))
def test_vocab_grow_preserves_existing_ids(base, extra):
    vocab = Vocab(sorted(set(nfc(base))))
    before = dict(vocab.c2i)
    vocab.grow(sorted(set(nfc(extra))))
    for ch, idx in before.items():
        assert vocab.c2i[ch] == idx  # growth never reassigns
    for ch in set(nfc(extra)):
        assert ch in vocab
    # codepoint round-trip (the h5 mapping serialisation format)
    back = Vocab.from_codepoints(vocab.to_codepoints())
    assert back.c2i == vocab.c2i


# ----------------------------------------------------------------------
# PAGE-XML round-trip
# ----------------------------------------------------------------------

_PAGE_WORDS = st.lists(
    st.lists(_WORD, min_size=1, max_size=4),  # words per line
    min_size=1, max_size=4)                   # lines per page


@settings(max_examples=40, deadline=None)
@given(_PAGE_WORDS, st.floats(0.05, 1.0))
def test_page_xml_roundtrip(page_words, conf):
    pcgts = build_pcgts(page_words, page_id='prop')
    # spread a non-default conf on the first glyph for the conf check
    g0 = (pcgts.get_Page().get_TextRegion()[0].get_TextLine()[0]
          .get_Word()[0].get_Glyph()[0])
    g0.get_TextEquiv()[0].set_conf(conf)
    back = parse_page(to_xml(pcgts))
    r_in = pcgts.get_Page().get_TextRegion()[0]
    r_out = back.get_Page().get_TextRegion()[0]
    assert len(r_out.get_TextLine()) == len(r_in.get_TextLine())
    for l_in, l_out in zip(r_in.get_TextLine(), r_out.get_TextLine()):
        assert len(l_out.get_Word()) == len(l_in.get_Word())
        for w_in, w_out in zip(l_in.get_Word(), l_out.get_Word()):
            assert (w_out.get_TextEquiv()[0].Unicode ==
                    w_in.get_TextEquiv()[0].Unicode)
            assert w_out.id == w_in.id
            gs_in, gs_out = w_in.get_Glyph(), w_out.get_Glyph()
            assert ([g.get_TextEquiv()[0].Unicode for g in gs_out] ==
                    [g.get_TextEquiv()[0].Unicode for g in gs_in])
    g0b = (r_out.get_TextLine()[0].get_Word()[0].get_Glyph()[0])
    assert abs(g0b.get_TextEquiv()[0].conf - conf) < 1e-6


@settings(max_examples=30, deadline=None)
@given(_PAGE_WORDS)
def test_page_projection_matches_manual_concat(page_words):
    """Projecting glyph-level text upward must reproduce the manual
    word/line/region concatenation with space/newline separators."""
    from ocrd_keraslm_tpu.wrapper.rate import (
        page_update_higher_textequiv_levels)
    pcgts = build_pcgts(page_words)
    region = pcgts.get_Page().get_TextRegion()[0]
    for line in region.get_TextLine():
        for word in line.get_Word():
            word.set_TextEquiv([])
        line.set_TextEquiv([])
    region.set_TextEquiv([])
    page_update_higher_textequiv_levels('glyph', pcgts)
    expect = '\n'.join(' '.join(w for w in line)
                       for line in page_words)
    assert region.get_TextEquiv()[0].Unicode == expect


# ----------------------------------------------------------------------
# h5 checkpoint round-trip
# ----------------------------------------------------------------------

@settings(max_examples=10, deadline=None)
@given(st.integers(1, 3), st.integers(8, 24),
       st.text(_CHAR, min_size=1, max_size=40),
       st.booleans())
def test_h5_model_roundtrip(depth, width, charset, stateful):
    import jax
    import tempfile, os
    from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
    from ocrd_keraslm_tpu.utils import h5io
    vocab = Vocab(sorted(set(nfc(charset))))
    cfg = LMConfig(width=width, depth=depth, length=16,
                   voc_size=vocab.size, stateful=stateful,
                   variable_length=not stateful)
    params = init_params(cfg, jax.random.PRNGKey(width * depth))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'm.h5')
        h5io.save_model(path, params, cfg, vocab, history={'loss': [1.0]})
        params2, cfg2, vocab2, history = h5io.load_model(path)
    assert cfg2.width == cfg.width and cfg2.depth == cfg.depth
    assert cfg2.stateful == cfg.stateful
    assert vocab2.c2i == vocab.c2i
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert history == {'loss': [1.0]}
