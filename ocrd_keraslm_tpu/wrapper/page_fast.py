"""Etree-direct PAGE pipeline — the document-serving fast path.

The object-model pipeline (``page.parse_page`` -> lattice -> write-back
-> ``page.to_xml`` re-emit) spends ~28 ms/page constructing and
re-serializing ~20k Python objects for a 200 KB glyph-level page
(profiled); after the fused decode kernels, that host cost bounds
whole-workflow throughput.  This module runs the same phases directly
on the lxml tree:

- :func:`parse_page_fast` parses into light ``__slots__`` records
  holding lxml nodes.  The records duck-type the generateDS-style PAGE
  API that the lattice builder
  (``rate.page_get_linear_lattice_at``), the tokenisation check, the
  projection (``rate.page_update_higher_textequiv_levels``) and the
  processor (``set_TextEquiv`` / ``set_conf`` / ``add_metadata_item``)
  consume — all traversal/repair/projection SEMANTICS stay in the one
  shared implementation and cannot drift between paths.
- Write-back mutates the tree in place: losing TextEquiv nodes are
  removed, the winner's ``conf`` is updated, higher-level texts are
  recomputed into existing/new TextEquiv nodes.
- ``fast_tostring`` (dispatched by ``page.to_xml``) serializes the
  retained tree with ``etree.tostring``.

Because the original tree is retained, content the object model does
not represent (Border, PrintSpace, coordinates, foreign namespaces,
unknown attributes) is PRESERVED verbatim — strictly better round-trip
fidelity than the re-emitting object path, and the same in-place
behavior as the reference processor, which mutates the parsed
ocrd_models tree (reference wrapper/rate.py:426-477).

Reference semantics: lattice wrapper/rate.py:343-424; write-back and
projection wrapper/rate.py:426-590.
"""
from __future__ import annotations

import datetime
from typing import List

from lxml import etree

from .page import (MetadataItem, emit_metadata_item, parse_page_root,
                   parse_reading_order, parse_relations, _P, _q)

_Q_TEXTEQUIV = _P + 'TextEquiv'
_Q_UNICODE = _P + 'Unicode'
# PAGE schema: TextStyle is the ONLY child that may follow TextEquiv
# (in every type: ..., TextEquiv*, TextStyle?).  UserDefined/Labels
# are LEADING children — anchoring on them would misplace a
# region-level TextEquiv before the region's TextLines.
_Q_AFTER_TEXTEQUIV = (_P + 'TextStyle',)
_Q_TEXTREGION = _P + 'TextRegion'
_Q_TEXTLINE = _P + 'TextLine'
_Q_WORD = _P + 'Word'
_Q_GLYPH = _P + 'Glyph'


class FastTextEquiv:
    """One textual alternative bound to its source etree node.

    ``set_conf`` writes through to the node so the decoded winner's
    score lands in the serialized XML without a separate emit pass
    (``%.6g``, the object path's format).
    """

    __slots__ = ('Unicode', 'conf', 'index', 'node')

    def __init__(self, unicode_='', conf=None, index=None, node=None):
        self.Unicode = unicode_
        self.conf = conf
        self.index = index
        self.node = node

    def get_conf(self):
        return self.conf

    def set_conf(self, conf):
        self.conf = conf
        if self.node is not None:
            self.node.set('conf', '%.6g' % float(conf))

    def get_index(self):
        return self.index

    def __repr__(self):
        return 'FastTextEquiv(%r, conf=%s)' % (self.Unicode, self.conf)


def _parse_tes(el) -> List[FastTextEquiv]:
    tes = []
    q_te, q_uni, make = _Q_TEXTEQUIV, _Q_UNICODE, FastTextEquiv
    indexed = True
    for te in el:
        if te.tag != q_te:
            continue
        uni = ''
        for sub in te:
            if sub.tag == q_uni:
                uni = sub.text or ''
                break
        conf = te.get('conf')
        index = te.get('index')
        if index is None:
            indexed = False
        else:
            index = int(index)
        tes.append(make(
            uni, float(conf) if conf is not None else None, index, te))
    # PAGE semantics: index = rank (same rule as page._parse_textequivs)
    if indexed and len(tes) > 1:
        tes.sort(key=lambda te: te.index)
    return tes


def _append_textequiv(parent_node, te) -> etree._Element:
    """Materialize a TextEquiv object as a node under ``parent_node``
    (projection-made plain TextEquivType instances and synthetic
    winners have no source node).  Inserted BEFORE any
    TextStyle/UserDefined child: the PAGE schema orders TextEquiv
    ahead of them, and a trailing append would break XSD validation
    of styled elements."""
    te_el = etree.Element(_Q_TEXTEQUIV)
    index = getattr(te, 'index', None)
    if index is not None:
        te_el.set('index', str(index))
    if te.conf is not None:
        te_el.set('conf', '%.6g' % float(te.conf))
    uni = etree.SubElement(te_el, _Q_UNICODE)
    uni.text = te.Unicode
    for pos, child in enumerate(parent_node):
        if child.tag in _Q_AFTER_TEXTEQUIV:
            parent_node.insert(pos, te_el)
            break
    else:
        parent_node.append(te_el)
    return te_el


class _FastText:
    """Shared base of the per-element records: TextEquiv accessors with
    in-place node mutation, layout attributes read from the node."""

    __slots__ = ('node', 'text_equivs')

    def __init__(self, node):
        self.node = node
        self.text_equivs = _parse_tes(node)

    @property
    def id(self):
        return self.node.get('id', '')

    def get_TextEquiv(self):
        return self.text_equivs

    def set_TextEquiv(self, tes):
        """Replace the element's text results IN PLACE: nodes of
        dropped alternatives are removed from the tree, alternatives
        without a source node (projection-made) are appended."""
        old = self.text_equivs
        # fast path: the usual decode write-back keeps the element's
        # single existing alternative (most glyphs are unambiguous)
        if len(tes) == 1 and len(old) == 1 and tes[0] is old[0]:
            return
        keep = set(map(id, tes))
        node = self.node
        for te in old:
            # projection-made plain TextEquivType objects may have no
            # node attribute at all — getattr, not te.node
            te_node = getattr(te, 'node', None)
            if id(te) not in keep and te_node is not None:
                node.remove(te_node)
        for te in tes:
            if getattr(te, 'node', None) is None:
                # back-link EVERY materialized node (plain
                # TextEquivType included) so a later set_TextEquiv on
                # the same element can remove it again
                te.node = _append_textequiv(node, te)
        self.text_equivs = list(tes)

    def add_TextEquiv(self, te):
        if getattr(te, 'node', None) is None:
            te.node = _append_textequiv(self.node, te)
        self.text_equivs.append(te)

    def get_readingDirection(self):
        return self.node.get('readingDirection')

    def get_textLineOrder(self):
        return self.node.get('textLineOrder')


class FastGlyph(_FastText):
    __slots__ = ()


class FastWord(_FastText):
    __slots__ = ('glyphs',)

    def __init__(self, node):
        super().__init__(node)
        self.glyphs = [FastGlyph(g) for g in node.iterchildren(_Q_GLYPH)]

    def get_Glyph(self):
        return self.glyphs


class FastLine(_FastText):
    __slots__ = ('words',)

    def __init__(self, node):
        super().__init__(node)
        self.words = [FastWord(w) for w in node.iterchildren(_Q_WORD)]

    def get_Word(self):
        return self.words


class FastRegion(_FastText):
    __slots__ = ('lines', 'text_regions')

    def __init__(self, node):
        super().__init__(node)
        self.lines = [FastLine(x)
                      for x in node.iterchildren(_Q_TEXTLINE)]
        self.text_regions = [FastRegion(x)
                             for x in node.iterchildren(_Q_TEXTREGION)]

    def get_TextLine(self):
        return self.lines

    def get_TextRegion(self):
        return self.text_regions


class FastPage:
    __slots__ = ('node', 'regions', 'reading_order', 'relations')

    def __init__(self, node):
        self.node = node
        self.regions = ([FastRegion(x)
                         for x in node.iterchildren(_Q_TEXTREGION)]
                        if node is not None else [])
        # ReadingOrder / Relations use the object-model records (they
        # are isinstance-dispatched in rate.page_get_reading_order and
        # are tiny compared to the text hierarchy)
        self.reading_order = (parse_reading_order(node)
                              if node is not None else None)
        self.relations = (parse_relations(node)
                          if node is not None else None)

    def get_TextRegion(self):
        return self.regions

    def get_AllRegions(self, classes=None, order='document'):
        """All (text) regions, depth-first (same contract as
        page.Page.get_AllRegions)."""
        out = []

        def walk(region):
            out.append(region)
            for sub in region.text_regions:
                walk(sub)
        for r in self.regions:
            walk(r)
        return out

    def get_ReadingOrder(self):
        return self.reading_order

    def get_Relations(self):
        return self.relations

    def get_readingDirection(self):
        return self.node.get('readingDirection') \
            if self.node is not None else None

    def get_textLineOrder(self):
        return self.node.get('textLineOrder') \
            if self.node is not None else None


class FastPcGts:
    """PAGE document over a retained lxml tree.

    Exposes the PcGts surface the processor uses (``get_Page``,
    ``get_pcGtsId`` / ``set_pcGtsId``, ``add_metadata_item``) plus
    ``fast_tostring`` which ``page.to_xml`` dispatches to."""

    __slots__ = ('root', 'page', '_metadata_items')

    def __init__(self, root):
        self.root = root
        self.page = FastPage(root.find(_q('Page')))
        self._metadata_items: List[MetadataItem] = []

    @property
    def pcGtsId(self):
        return self.root.get('pcGtsId')

    def get_pcGtsId(self):
        return self.root.get('pcGtsId')

    def set_pcGtsId(self, value):
        self.root.set('pcGtsId', value)

    def get_Page(self):
        return self.page

    def add_metadata_item(self, item: MetadataItem):
        self._metadata_items.append(item)

    def fast_tostring(self) -> str:
        """Serialize the retained tree; Metadata is completed in place
        (Creator/Created if missing, LastChange refreshed, queued
        processing-step agents appended) exactly as the object path's
        to_xml re-emits it."""
        root = self.root
        meta = root.find(_q('Metadata'))
        if meta is None:
            meta = etree.Element(_q('Metadata'))
            root.insert(0, meta)
        now = datetime.datetime.now().isoformat()
        if meta.find(_q('Creator')) is None:
            creator = etree.Element(_q('Creator'))
            creator.text = 'ocrd_keraslm_tpu'
            meta.insert(0, creator)
        created = meta.find(_q('Created'))
        if created is None:
            created = etree.Element(_q('Created'))
            created.text = now
            meta.insert(1, created)
        change = meta.find(_q('LastChange'))
        if change is None:
            change = etree.Element(_q('LastChange'))
            # schema order: Creator, Created, LastChange, ...
            created.addnext(change)
        change.text = now
        for item in self._metadata_items:
            emit_metadata_item(meta, item)
        self._metadata_items = []
        return etree.tostring(root, pretty_print=True,
                              xml_declaration=True,
                              encoding='UTF-8').decode('utf-8')


def parse_page_fast(source) -> FastPcGts:
    """Parse PAGE-XML from a path / bytes / file-like into a
    :class:`FastPcGts` (retained-tree fast path)."""
    return FastPcGts(parse_page_root(source))
