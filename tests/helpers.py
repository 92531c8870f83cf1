"""Shared test fixtures: synthetic PAGE-XML workspaces and tiny models."""
import os

import numpy as np

import jax

from ocrd_keraslm_tpu.models.lstm_lm import LMConfig, init_params
from ocrd_keraslm_tpu.rater import Rater
from ocrd_keraslm_tpu.utils import h5io
from ocrd_keraslm_tpu.utils.vocab import Vocab
from ocrd_keraslm_tpu.wrapper.mets import Mets, MetsFile, Workspace, \
    mets_to_xml
from ocrd_keraslm_tpu.wrapper.page import (Glyph, PcGts, TextEquivType,
                                           TextLine, TextRegion, Word,
                                           to_xml)


def build_pcgts(page_words, page_id='page1', glyph_alternatives=None):
    """Build a PcGts with one region, lines of words (list of list of
    str).  ``glyph_alternatives``: dict mapping (line_i, word_i,
    glyph_i) -> list of (char, conf) alternatives."""
    pcgts = PcGts()
    pcgts.pcGtsId = page_id
    region = TextRegion('%s_r1' % page_id)
    for li, line_words in enumerate(page_words):
        line = TextLine('%s_r1_l%d' % (page_id, li))
        for wi, word_text in enumerate(line_words):
            word = Word('%s_r1_l%d_w%d' % (page_id, li, wi))
            word.add_TextEquiv(TextEquivType(Unicode=word_text,
                                             conf=0.9))
            for gi, char in enumerate(word_text):
                glyph = Glyph('%s_r1_l%d_w%d_g%d'
                              % (page_id, li, wi, gi))
                alts = None
                if glyph_alternatives:
                    alts = glyph_alternatives.get((li, wi, gi))
                if alts:
                    for idx, (c, conf) in enumerate(alts):
                        glyph.add_TextEquiv(TextEquivType(
                            Unicode=c, conf=conf, index=idx))
                else:
                    glyph.add_TextEquiv(TextEquivType(Unicode=char,
                                                      conf=0.95,
                                                      index=0))
                word.add_Glyph(glyph)
            line.add_Word(word)
        region.add_TextLine(line)
    # line- and region-level annotations for consistency
    for line in region.lines:
        line.add_TextEquiv(TextEquivType(
            Unicode=' '.join(w.text_equivs[0].Unicode
                             for w in line.words), conf=0.9))
    region.add_TextEquiv(TextEquivType(
        Unicode='\n'.join(l.text_equivs[0].Unicode
                          for l in region.lines), conf=0.9))
    pcgts.page.add_TextRegion(region)
    return pcgts


def build_workspace(tmpdir, pages, identifier='urn:test/kant_1784',
                    file_grp='OCR-D-OCR', **kwargs):
    """Create a directory workspace with mets.xml + PAGE files.

    ``pages``: dict page_id -> page_words (list of list of str).
    """
    os.makedirs(os.path.join(tmpdir, file_grp), exist_ok=True)
    mets = Mets(unique_identifier=identifier)
    mets.file_groups[file_grp] = []
    for page_id, page_words in pages.items():
        pcgts = build_pcgts(page_words, page_id=page_id, **kwargs)
        fid = '%s_%s' % (file_grp, page_id)
        fname = os.path.join(file_grp, fid + '.xml')
        with open(os.path.join(tmpdir, fname), 'w',
                  encoding='utf-8') as fh:
            fh.write(to_xml(pcgts))
        mets.file_groups[file_grp].append(MetsFile(
            ID=fid, fileGrp=file_grp, local_filename=fname,
            pageId=page_id))
        mets.page_ids.append(page_id)
    with open(os.path.join(tmpdir, 'mets.xml'), 'w',
              encoding='utf-8') as fh:
        fh.write(mets_to_xml(mets))
    return Workspace(str(tmpdir))


def make_tiny_model(path, chars='abcdefghijklmnopqrstuvwxyz '
                    'ABCDEFGHIJKLMNOPQRSTUVWXYZ.,\n', width=16,
                    depth=2, length=32, seed=0):
    """Write an untrained tiny model file."""
    vocab = Vocab(chars)
    cfg = LMConfig(width=width, depth=depth, length=length,
                   voc_size=vocab.size)
    params = init_params(cfg, jax.random.PRNGKey(seed))
    h5io.save_model(str(path), params, cfg, vocab, {})
    return str(path)


def train_tiny_model(path, text, width=16, depth=1, length=16,
                     steps=300):
    """Train a tiny model to (over)fit ``text`` quickly; save to path."""
    from ocrd_keraslm_tpu.models.lstm_lm import zero_carry
    from ocrd_keraslm_tpu.training import _OPT, train_step

    rater = Rater()
    rater.width, rater.depth, rater.length = width, depth, length
    rater.stateful = True
    rater.vocab = Vocab(sorted(set(text)))
    rater.voc_size = rater.vocab.size
    rater.configure()
    ids = rater.vocab.encode(text)
    # one big repeated batch
    B = 8
    T = length
    n = (len(ids) - 1) // (B * T) * (B * T)
    if n == 0:
        reps = (B * T) // (len(ids) - 1) + 1
        ids = np.tile(ids, reps + 1)
        n = B * T
    x = ids[:n].reshape(B, -1)[:, :T].astype(np.int32)
    y = ids[1:n + 1].reshape(B, -1)[:, :T].astype(np.int32)
    mask = np.ones_like(x, np.float32)
    zs = (np.zeros((B,), np.int32),)
    params = rater.params
    opt_state = _OPT.init(params)
    rng = jax.random.PRNGKey(0)
    for _ in range(steps):
        params, opt_state, _, loss, nll, acc = train_step(
            params, opt_state, rater.cfg, x, zs, y, mask,
            zero_carry(rater.cfg, B), rng)
    rater.params = params
    rater.status = 2
    rater.history = {'loss': [float(nll)]}
    rater.save(str(path))
    return str(path), float(nll)
