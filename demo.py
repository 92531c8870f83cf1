#!/usr/bin/env python
"""End-to-end demo: OCR post-correction with the TPU-native LM.

Builds a synthetic METS/PAGE-XML workspace whose glyphs carry OCR-style
confusions (the WRONG alternative has the HIGHER confidence), decodes
it with the pretrained synthetic model (`pretrained/model_synthetic.h5`,
char ppl 2.29 on its corpus), and reports how many words the language
model reconstructs exactly.

Run:  python demo.py [--pages N] [--platform cpu|tpu]
"""
import argparse
import os
import random
import shutil
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pages', type=int, default=4)
    ap.add_argument('--platform', default=None,
                    help="e.g. 'cpu' to force the CPU backend")
    ap.add_argument('--model', default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'pretrained', 'model_synthetic.h5'))
    ap.add_argument('--workdir', default='/tmp/keraslm_demo')
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from ocrd_keraslm_tpu.wrapper import KerasRate
    from ocrd_keraslm_tpu.wrapper.mets import (Mets, MetsFile,
                                               Workspace, mets_to_xml)
    from ocrd_keraslm_tpu.wrapper.page import (Glyph, PcGts,
                                               TextEquivType, TextLine,
                                               TextRegion, Word,
                                               parse_page, to_xml)

    random.seed(7)
    words_pool = ['die', 'der', 'vernunft', 'aufklärung', 'mensch',
                  'kant', 'welt', 'freiheit', 'wahrheit', 'verstand']
    confus = {'e': 'c', 'n': 'u', 'i': 'l', 'r': 't', 'a': 'o'}

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(os.path.join(args.workdir, 'OCR-D-OCR'))
    mets = Mets(unique_identifier='urn:demo/korpus_1784')
    mets.file_groups['OCR-D-OCR'] = []
    truth = {}
    n_corrupt = 0
    for p in range(args.pages):
        page_id = 'phys_%04d' % p
        lines = [[random.choice(words_pool) for _ in range(6)]
                 for _ in range(8)]
        truth[page_id] = lines
        pcgts = PcGts()
        pcgts.pcGtsId = page_id
        region = TextRegion('%s_r1' % page_id)
        for li, lw in enumerate(lines):
            line = TextLine('%s_l%d' % (page_id, li))
            for wi, w in enumerate(lw):
                word = Word('%s_l%d_w%d' % (page_id, li, wi))
                word.add_TextEquiv(TextEquivType(Unicode=w, conf=0.9))
                for gi, ch in enumerate(w):
                    glyph = Glyph('%s_l%d_w%d_g%d'
                                  % (page_id, li, wi, gi))
                    if ch in confus and random.random() < 0.4:
                        # adversarial: wrong char at HIGHER confidence
                        glyph.add_TextEquiv(TextEquivType(
                            Unicode=confus[ch], conf=0.93, index=0))
                        glyph.add_TextEquiv(TextEquivType(
                            Unicode=ch, conf=0.90, index=1))
                        n_corrupt += 1
                    else:
                        glyph.add_TextEquiv(TextEquivType(
                            Unicode=ch, conf=0.95, index=0))
                    word.add_Glyph(glyph)
                line.add_Word(word)
            line.add_TextEquiv(TextEquivType(
                Unicode=' '.join(lw), conf=0.9))
            region.add_TextLine(line)
        region.add_TextEquiv(TextEquivType(
            Unicode='\n'.join(' '.join(lw) for lw in lines), conf=0.9))
        pcgts.page.add_TextRegion(region)
        fid = 'OCR-D-OCR_%s' % page_id
        fname = 'OCR-D-OCR/%s.xml' % fid
        with open(os.path.join(args.workdir, fname), 'w',
                  encoding='utf-8') as fh:
            fh.write(to_xml(pcgts))
        mets.file_groups['OCR-D-OCR'].append(MetsFile(
            ID=fid, fileGrp='OCR-D-OCR', local_filename=fname,
            pageId=page_id))
        mets.page_ids.append(page_id)
    with open(os.path.join(args.workdir, 'mets.xml'), 'w',
              encoding='utf-8') as fh:
        fh.write(mets_to_xml(mets))

    ws = Workspace(args.workdir)
    proc = KerasRate(workspace=ws, input_file_grp='OCR-D-OCR',
                     output_file_grp='OCR-D-LM',
                     parameter={'model_file': args.model,
                                'textequiv_level': 'glyph',
                                'alternative_decoding': True,
                                'beam_width': 10,
                                'lm_weight': 0.7})
    proc.setup()
    print('decoding %d pages (%d adversarially corrupted glyphs)...'
          % (args.pages, n_corrupt))
    t0 = time.perf_counter()
    proc.process_workspace(ws)
    dt = time.perf_counter() - t0

    correct = wrong = 0
    fixed_examples = []
    for f in ws.mets.find_files(fileGrp='OCR-D-LM'):
        pcgts = parse_page(os.path.join(ws.directory,
                                        f.local_filename))
        lines = truth[f.pageId]
        for li, rl in enumerate(
                pcgts.get_Page().get_TextRegion()[0].get_TextLine()):
            for wi, word in enumerate(rl.get_Word()):
                got = ''.join(g.get_TextEquiv()[0].Unicode
                              for g in word.get_Glyph())
                want = lines[li][wi]
                if got == want:
                    correct += 1
                else:
                    wrong += 1
                    if len(fixed_examples) < 3:
                        fixed_examples.append((want, got))
    total = correct + wrong
    print('decoded in %.2fs -> %d/%d words reconstructed exactly'
          % (dt, correct, total))
    if wrong:
        print('examples still wrong:', fixed_examples)
    print('output workspace: %s (fileGrp OCR-D-LM)' % args.workdir)
    return 0 if correct / max(total, 1) > 0.9 else 1


if __name__ == '__main__':
    sys.exit(main())
