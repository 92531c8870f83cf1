"""OCR-D-style processor: rate/decode text in PAGE-XML workspaces.

Capability-equivalent to the reference ``KerasRate``
(/root/reference/ocrd_keraslm/wrapper/rate.py): PAGE-XML parsing down
to the configured ``textequiv_level``, linear lattice-graph
construction with artificial whitespace/newline edges and
tokenisation-repair, either (a) plain scoring of the page text with
confidence blending, or (b) best-path beam decoding over all TextEquiv
alternatives with cross-page traceback (page N-1 is written once page N
is decoded), result write-back, and recomputation of all higher
hierarchy levels honoring ReadingOrder, ``textLineOrder``
(bottom-to-top), ``readingDirection`` (right-to-left) and
``Relation type=join``.

This implementation is standalone (lxml-based page/mets modules in this
package) since no ocrd distribution is present; the processor surface
(parameters, error policy env vars, metadata agents) mirrors the OCR-D
contract (wrapper/ocrd-tool.json).
"""
from __future__ import annotations

import logging
import os
from collections import defaultdict
from dataclasses import dataclass
from math import ceil, log
from typing import Any, Dict, List, Optional, Tuple

import networkx as nx

from .. import lib
from ..rater import NonLinearLatticeError, _gc_paused
from .mets import MIMETYPE_PAGE, Mets, Workspace
from .page import (BOTTOM_TO_TOP, RIGHT_TO_LEFT, OrderedGroupIndexedType,
                   OrderedGroupType, PcGts,
                   TextEquivType, MetadataItem, parse_page,
                   to_xml)
from .page_fast import parse_page_fast
from . import page_native
from .page_native import NativePageDoc

LOG = logging.getLogger(__name__)

CHOICE_THRESHOLD_NUM = 4     # maximum number of choices per element
CHOICE_THRESHOLD_CONF = 0.1  # maximum conf drop from best choice
BEAM_CLUSTERING_ENABLE = True
BEAM_CLUSTERING_DIST = 5

# child level per hierarchy tag (for tokenisation-problem filtering)
_HIERARCHY = {
    'Page': 'region',
    'TextRegion': 'line',
    'TextLine': 'word',
    'Word': 'glyph',
    'Glyph': '',
}

OCRD_TOOL = {
    'executable': 'ocrd-keraslm-rate',
    'categories': ['Text recognition and optimization'],
    'steps': ['recognition/text-recognition'],
    'description': 'Rate elements of the text with a character-level '
                   'LSTM language model (TPU-native)',
    'parameters': {
        'model_file': {'type': 'string', 'required': True},
        'textequiv_level': {
            'type': 'string',
            'enum': ['region', 'line', 'word', 'glyph'],
            'default': 'glyph'},
        'alternative_decoding': {'type': 'boolean', 'default': True},
        'beam_width': {'type': 'number', 'default': 10},
        'lm_weight': {'type': 'number', 'default': 0.5},
        # TPU-native extension: run the whole lattice beam search as a
        # single on-device dispatch per page (exact per-edge top-k
        # pruning, pages written immediately) instead of the
        # host-driven reference algorithm (per-char-round device calls,
        # one-page lookahead lock-in)
        'device_decoding': {'type': 'boolean', 'default': True},
        # opt-in reference workflow emulation for device decoding:
        # page N's path is only finalized through page N+1's decode
        # (the walk of page N starts at the beam slot page N+1 entered
        # through, exactly the reference's lookahead lock-in,
        # reference rating.py:736-741) — for users who diff outputs
        # against the original tool
        'lookahead_writeback': {'type': 'boolean', 'default': False},
    },
}


def _config_env(name, default):
    return os.environ.get(name, default)


def _pending_ready(pending) -> bool:
    """Whether every device array of a dispatched page's pending is
    already host-available (``jax.Array.is_ready``) — i.e. finishing
    it cannot block.  Host-resolved pendings ('done') are ready by
    definition; anything without an ``is_ready`` probe (numpy, host
    objects) counts as ready."""
    kind = pending[0]
    if kind == 'done':
        return True
    if kind == 'gseg':
        pending = pending[1]
    arrs = pending[2]
    if not isinstance(arrs, (list, tuple)):
        arrs = [arrs]
    for a in arrs:
        probe = getattr(a, 'is_ready', None)
        if probe is not None and not probe():
            return False
    return True


@dataclass
class RateState:
    """Cross-page decoder state: the traceback is one page ahead of the
    written output (decisions for page N lock in at page N+1).
    ``traceback`` is ``(hypotheses, anchor)`` as produced by
    ``host_beam.advance_traceback``."""
    traceback: Tuple[List[Any], Any]
    pcgts: PcGts
    file_id: str
    page_id: str


class KerasRate:
    """The ``ocrd-keraslm-rate`` processor."""

    max_workers = 1  # decoding shares LM state across pages (sequential)

    def __init__(self, workspace: Optional[Workspace] = None,
                 input_file_grp: str = 'OCR-D-OCR',
                 output_file_grp: str = 'OCR-D-LM',
                 parameter: Optional[Dict[str, Any]] = None,
                 logger: Optional[logging.Logger] = None,
                 download: bool = False):
        import threading
        self.workspace = workspace
        self.input_file_grp = input_file_grp
        self.output_file_grp = output_file_grp
        self.logger = logger or LOG
        self._base_logger = self.logger
        self._ws_lock = threading.Lock()
        self.download = download
        self.parameter = dict(parameter or {})
        # deferred-METS-save state (see process_workspace): explicit
        # lifecycle instead of getattr guards in the write helpers
        self._defer_mets = False
        self._mets_dirty = False
        self._mets_unsaved = 0
        for name, schema in OCRD_TOOL['parameters'].items():
            if name not in self.parameter:
                if schema.get('required'):
                    raise ValueError('parameter %s is required' % name)
                self.parameter[name] = schema.get('default')
            if 'enum' in schema and \
                    self.parameter[name] not in schema['enum']:
                raise ValueError('invalid value %r for parameter %s'
                                 % (self.parameter[name], name))
        self.rater: Optional[lib.Rater] = None

    @property
    def executable(self):
        return OCRD_TOOL['executable']

    @property
    def input_files(self):
        return sorted(self.workspace.mets.find_files(
            fileGrp=self.input_file_grp),
            key=lambda f: self.workspace.mets.page_ids.index(f.pageId)
            if f.pageId in self.workspace.mets.page_ids else 1 << 30)

    # -- setup ---------------------------------------------------------

    def resolve_resource(self, name):
        if os.path.isfile(name):
            return name
        for base in (os.getcwd(),
                     os.path.expanduser('~/.local/share/ocrd-resources/'
                                        'ocrd-keraslm-rate')):
            cand = os.path.join(base, name)
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError('cannot resolve model resource %r' % name)

    # frequently-consulted parameters/context, in one place
    @property
    def _level(self) -> str:
        return self.parameter['textequiv_level']

    @property
    def _beam_width(self) -> int:
        return self.parameter['beam_width']

    @property
    def _lm_weight(self) -> float:
        return self.parameter['lm_weight']

    def _page_context(self):
        """Year-decade context from the METS unique identifier."""
        return mets_get_context(self.workspace.mets)

    def setup(self):
        model = self.resolve_resource(self.parameter['model_file'])
        self.rater = lib.Rater(logger=self.logger)
        self.rater.load_config(model)
        if self.parameter['alternative_decoding']:
            self.rater.stateful = False   # no implicit state transfer
            self.rater.incremental = True  # explicit state transfer
        elif self.rater.stateful:
            self.rater.batch_size = 1
        self.rater.configure()
        self.rater.load_weights(model)
        self.logger.debug("Loaded model_file '%s'", model)

    def add_metadata(self, pcgts: PcGts):
        pcgts.add_metadata_item(MetadataItem(
            type='processingStep',
            name=OCRD_TOOL['steps'][0],
            value=OCRD_TOOL['executable'],
            labels={'parameters': {
                k: str(v) for k, v in self.parameter.items()}}))

    def verify(self):
        assert self.workspace is not None, 'no workspace set'
        return True

    # -- dispatch ------------------------------------------------------

    @_gc_paused
    def process_workspace(self, workspace: Workspace) -> None:
        """Score (``alternative_decoding=false``) or beam-decode
        (``=true``) all pages of the workspace.

        Runs with the cyclic GC paused (see rater._gc_paused): PAGE-XML
        parsing and lattice build allocate ~20k containers per page,
        and gen-0 collections rescan every live page object."""
        if self.rater is None:
            self.workspace = workspace
            self.setup()
        # defer the METS save to end-of-run (ocrd core semantics: the
        # workspace METS is saved after processing, not per page — and
        # per-page saves re-serialize the whole file section,
        # O(pages^2) on long documents).  Durability: a Python-level
        # abort persists everything via the except arm below; hard
        # kills (SIGKILL/OOM) lose at most one flush window of
        # registrations (_mets_mark_dirty_locked flushes every
        # KERASLM_METS_FLUSH_PAGES pages, default 64).
        self._defer_mets = True
        self._mets_dirty = False
        self._mets_unsaved = 0
        try:
            if not self.parameter['alternative_decoding']:
                result = self.process_workspace_stateless(workspace)
            else:
                result = self.process_workspace_stateful(workspace)
        except BaseException:
            # persist what was registered so far, but never mask the
            # in-flight error with a failing save (the root cause may
            # already have killed the METS server or the filesystem)
            self._defer_mets = False
            try:
                if self._mets_dirty:
                    with self._ws_lock:
                        self.workspace.save_mets()
            except Exception as save_err:
                self._base_logger.error(
                    'deferred METS save failed during abort: %s',
                    save_err)
            raise
        self._defer_mets = False
        if self._mets_dirty:
            with self._ws_lock:
                self.workspace.save_mets()
        return result

    def process_workspace_stateless(self, workspace: Workspace) -> None:
        """Plain scoring: pages are independent (the OCR-D default
        page-parallel contract).  TPU-native twist: all pages of the
        document are scored as parallel batch streams in ONE device
        dispatch (``Rater.rate_batch``) instead of one call per page —
        the equivalent of the reference's page-parallel METS-server
        mode, realized as batching instead of multiprocessing."""
        self.workspace = workspace
        self.verify()
        # OCRD_MAX_PARALLEL_PAGES (OCR-D core env contract, exercised
        # by the reference's pageparallel test config,
        # /root/reference/test/conftest.py:49-65): parallelize the
        # host-side page work (PAGE-XML parse, graph build, write-back)
        # across threads.  The device work stays ONE batched dispatch
        # regardless — on TPU that is the page-parallel execution.
        n_par = int(os.environ.get('OCRD_MAX_PARALLEL_PAGES', '1') or 1)
        level = self._level
        context = self._page_context()

        def prep(input_file):
            # per-page error policy (OCRD_MISSING_OUTPUT), like the
            # stateful loop: a bad page skips/copies/aborts instead of
            # killing the whole document
            page_id = input_file.pageId
            try:
                pcgts = self._load_page(input_file, page_id)
                if pcgts is None:
                    return None
                file_id = self._make_file_id(input_file)
                if self._output_exists(file_id):
                    return None
                edges = _require_edge_list(
                    page_get_linear_lattice_at(
                        level, pcgts, logger=self.logger),
                    'stateless scoring')
                text = [(edge['element'], edge['alternatives'])
                        for edge in edges]
                return (pcgts, file_id, page_id, text,
                        ''.join(tes[0].Unicode for _, tes in text),
                        input_file)
            except KeyboardInterrupt:
                raise
            except Exception as err:
                self._handle_page_error(err, page_id, input_file)
                return 'failed'

        inputs = self.input_files
        if n_par > 1 and len(inputs) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=n_par) as pool:
                prepped = list(pool.map(prep, inputs))
        else:
            prepped = [prep(f) for f in inputs]
        nr_failed = sum(1 for p in prepped if p == 'failed')
        pages = [p for p in prepped
                 if p is not None and not isinstance(p, str)]
        self._check_missing_ratio(nr_failed, nr_failed + len(pages))
        if not pages:
            return
        all_confidences = self.rater.rate_batch(
            [p[4] for p in pages], [context] * len(pages))

        def finish(args):
            (pcgts, file_id, page_id, text, _,
             input_file), confidences = args
            try:
                self._apply_confidences(pcgts, text, confidences, level)
                self._write_page(pcgts, file_id, page_id)
                return True
            except KeyboardInterrupt:
                raise
            except Exception as err:
                self._handle_page_error(err, page_id, input_file)
                return False

        work = list(zip(pages, all_confidences))
        if n_par > 1 and len(work) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=n_par) as pool:
                done = list(pool.map(finish, work))
        else:
            done = [finish(item) for item in work]
        nr_failed += sum(1 for ok in done if not ok)
        self._check_missing_ratio(nr_failed, nr_failed +
                                  sum(1 for ok in done if ok))

    def _apply_confidences(self, pcgts, text, confidences, level):
        apply_confidences(text, confidences, level,
                          self.parameter['lm_weight'], self.logger)

    def process_workspace_stateful(self, workspace: Workspace) -> None:
        """Sequential page loop with cross-page LM traceback and OCR-D
        error policy (OCRD_MISSING_OUTPUT / OCRD_EXISTING_OUTPUT /
        OCRD_MAX_MISSING_OUTPUTS)."""
        level = self._level
        self.workspace = workspace
        self.verify()
        nr_succeeded = 0
        nr_failed = 0
        nr_errors: Dict[str, int] = defaultdict(int)
        missing_policy = _config_env('OCRD_MISSING_OUTPUT', 'SKIP')
        reason = {'SKIP': 'skipped', 'COPY': 'fallback-copied'}.get(
            missing_policy, 'failed')
        prev: Optional[RateState] = None
        device_tb = None
        device_mode = self.parameter.get('device_decoding', True)
        device_pending = []  # dispatched pages awaiting fetch/write

        def page_failure(input_file, page_id, err):
            """OCRD_MISSING_OUTPUT policy for ONE failed page: ABORT
            raises, COPY emits the input as fallback, every failure is
            logged and counted toward the ratio abort.  Shared by the
            dispatch loop's exception handler and the group-flush
            per-page fallback (so a failure inside a buffered group is
            attributed to ITS page, not the page being processed)."""
            nonlocal nr_failed
            if missing_policy == 'ABORT':
                self._base_logger.error(
                    'Failure on page %s: %s', page_id,
                    str(err) or err.__class__.__name__)
                raise err
            self._base_logger.exception(
                'Failure on page %s: %s', page_id,
                str(err) or err.__class__.__name__)
            if missing_policy == 'COPY':
                self._copy_page_file(input_file)
            nr_errors[err.__class__.__name__] += 1
            nr_failed += 1
            # early abort only when the ratio is ALREADY hopeless
            # (even if every remaining page succeeds) — the
            # processed-pages ratio is enforced at end-of-run.
            # Dividing by successes-so-far here would spuriously
            # abort device mode, where successes are only counted
            # in the finish loop below.
            max_missing = self._max_missing_ratio()
            if 0 < max_missing < \
                    nr_failed / max(len(self.input_files), 1):
                raise RuntimeError(
                    'too many failures with %s output (%d of %d, %s)'
                    % (reason, nr_failed, len(self.input_files),
                       dict(nr_errors)))
        def finish_one(rec, result=None):
            """Fetch + write-back of ONE dispatched page with the
            standard error policy; shared by the end-of-run loop and
            the opportunistic in-loop drain."""
            nonlocal nr_succeeded, nr_failed
            page_id = rec[3]
            input_file = rec[4]
            try:
                self._finish_device_page(rec[:4], result=result)
                nr_succeeded += 1
            except KeyboardInterrupt:
                raise
            except FileExistsError as err:
                existing_policy = _config_env('OCRD_EXISTING_OUTPUT',
                                              'SKIP')
                if existing_policy == 'ABORT':
                    raise
                if existing_policy == 'OVERWRITE':
                    raise RuntimeError(
                        'got %r despite OCRD_EXISTING_OUTPUT==OVERWRITE'
                        % err)
            except Exception as err:
                if missing_policy == 'ABORT':
                    self._base_logger.error(
                        'Failure on page %s: %s', page_id,
                        str(err) or err.__class__.__name__)
                    raise
                self._base_logger.exception('Failure on page %s',
                                            page_id)
                if missing_policy == 'COPY':
                    self._copy_page_file(input_file)
                nr_errors[err.__class__.__name__] += 1
                nr_failed += 1

        def drain_ready():
            """Overlap write-back with dispatch: finish head pages
            whose device results are ALREADY on the host (is_ready —
            never blocks the dispatch pipeline).  Write order stays
            dispatch order; the lookahead mode needs every page's
            records up front, so it never drains early."""
            if self.parameter.get('lookahead_writeback'):
                return
            while device_pending and \
                    _pending_ready(device_pending[0][0]):
                finish_one(device_pending.pop(0))

        # page-group fusion: consecutive native-lane pages accumulate
        # here and dispatch as ONE fused kernel call (bit-identical
        # results, ~4x fewer dispatches; KERASLM_FUSE_PAGES=0 forces
        # the per-page dispatch path)
        gbuf: List[tuple] = []
        fuse_pages = os.environ.get('KERASLM_FUSE_PAGES', '1') != '0'
        # one-ahead page-load prefetch: file read + native scan of page
        # i+1 overlap page i's lattice/dispatch work (~2.7 ms/page of
        # the serving wall, measured).  One worker thread, one page
        # ahead; exceptions surface at .result() INSIDE the consuming
        # page's try, so the error policy attribution is unchanged.
        # Gated off when inputs are downloaded (download_file mutates
        # the workspace; keep that serial).
        prefetcher = None
        input_files = list(self.input_files)
        futures: List[Any] = [None] * len(input_files)
        if device_mode and not self.download and len(input_files) > 1:
            from concurrent.futures import ThreadPoolExecutor
            prefetcher = ThreadPoolExecutor(max_workers=1)

        def load_page_at(i):
            if prefetcher is None:
                return self._load_page(input_files[i],
                                       input_files[i].pageId)
            if futures[i] is None:
                futures[i] = prefetcher.submit(
                    self._load_page, input_files[i],
                    input_files[i].pageId)
            if i + 1 < len(input_files) and futures[i + 1] is None:
                futures[i + 1] = prefetcher.submit(
                    self._load_page, input_files[i + 1],
                    input_files[i + 1].pageId)
            return futures[i].result()

        try:
            for page_i, input_file in enumerate(input_files):
                drain_ready()
                page_id = input_file.pageId
                self._base_logger.info('preparing page %s', page_id)
                try:
                    # inside the policy guard: a non-PAGE input is a page
                    # failure (SKIP/COPY/ABORT), not a silent skip
                    pcgts = load_page_at(page_i)
                    if pcgts is None:
                        continue
                    file_id = self._make_file_id(input_file)
                    if self._output_exists(file_id):
                        continue
                    if device_mode:
                        if fuse_pages and isinstance(pcgts, NativePageDoc):
                            scan = self._native_scan_for_group(pcgts)
                            if scan is not None:
                                n_raw, n_prep, maxlen = scan
                                beam_width = self._beam_width
                                if gbuf and not self.rater.fused_group_fits(
                                        sum(g[3] for g in gbuf) + n_prep,
                                        max(max(g[4] for g in gbuf),
                                            maxlen), beam_width):
                                    device_tb = self._flush_page_group(
                                        gbuf, device_tb, device_pending,
                                        on_failure=page_failure)
                                # per-page log lines stay format-identical
                                # to the per-page dispatch path
                                level = self._level
                                self.rater.logger.info(
                                    "Scoring text in page '%s' at the %s "
                                    'level (device beam)',
                                    pcgts.get_pcGtsId(), level)
                                self.rater.logger.info(
                                    'Rating %d elements including its '
                                    'alternatives', n_raw)
                                gbuf.append((pcgts, file_id, page_id,
                                             n_prep, maxlen, n_raw,
                                             input_file))
                                continue
                        # ineligible for fusion: flush the group first so
                        # the beam carry stays in page order
                        device_tb = self._flush_page_group(
                            gbuf, device_tb, device_pending,
                            on_failure=page_failure)
                        try:
                            rec, device_tb = \
                                self.process_page_pcgts_device_begin(
                                    pcgts, device_tb, file_id, page_id)
                        except NonLinearLatticeError as nle:
                            # documented bail chain: a branching
                            # lattice (customized builder emitted a
                            # genuine DAG) decodes THIS page via the
                            # host DAG engine.  The cross-page beam
                            # carry RESETS at the engine switch in
                            # both directions — device and host
                            # tracebacks are not interchangeable — so
                            # a mixed document decodes every page
                            # correctly but without carry across the
                            # switch boundaries.
                            self._base_logger.info(
                                'page %s: %s — decoding via the host '
                                'DAG engine (beam carry resets at the '
                                'engine switch)', page_id, nle)
                            if isinstance(pcgts, NativePageDoc):
                                # the host engine needs the generateDS
                                # PAGE API; the native byte-lane doc
                                # converts through the lxml lane
                                pcgts = pcgts.to_fast()
                            state = self.process_page_pcgts_stateful(
                                pcgts, None, file_id, page_id)
                            # lock in immediately (the carry reset
                            # means no later page extends this beam)
                            path, entropy, _ = self.rater.next_path(
                                state.traceback[0],
                                ([], state.traceback[1]))
                            _page_update_from_path(
                                level, path, entropy,
                                logger=self.logger)
                            page_update_higher_textequiv_levels(
                                level, state.pcgts)
                            self._write_page(state.pcgts,
                                             state.file_id,
                                             state.page_id)
                            nr_succeeded += 1
                            device_tb = None
                            continue
                        # success is only counted when the page is
                        # fetched AND written (finish loop below).  Start
                        # the host copy of this page's packed result now —
                        # it completes while later pages dispatch, so the
                        # batch fetch below finds the bytes already on the
                        # host instead of paying a round-trip at the end
                        for arr in rec[0][2] if rec[0][0] != 'done' else ():
                            copy_async = getattr(arr, 'copy_to_host_async',
                                                 None)
                            if copy_async is not None:
                                copy_async()
                        device_pending.append(rec + (input_file,))
                    else:
                        prev = self.process_page_pcgts_stateful(
                            pcgts, prev, file_id, page_id)
                        nr_succeeded += 1
                except FileExistsError as err:
                    existing_policy = _config_env('OCRD_EXISTING_OUTPUT',
                                                  'SKIP')
                    if existing_policy == 'ABORT':
                        raise
                    if existing_policy == 'OVERWRITE':
                        raise RuntimeError(
                            'got %r despite OCRD_EXISTING_OUTPUT==OVERWRITE'
                            % err)
                except KeyboardInterrupt:
                    raise
                except Exception as err:
                    page_failure(input_file, page_id, err)
        finally:
            # the prefetch thread must not outlive the run
            # (long-lived worker/server processes would leak
            # one idle thread per aborted document)
            if prefetcher is not None:
                prefetcher.shutdown(wait=False,
                                    cancel_futures=True)
        # trailing group: dispatch whatever is still buffered — its
        # fallback failures route through the same per-page policy
        device_tb = self._flush_page_group(gbuf, device_tb,
                                           device_pending,
                                           on_failure=page_failure)
        # device mode: all pages were dispatched (the beam carry chains
        # on device with no host sync); now write each page — with the
        # SAME error policy as the dispatch loop (existing-output
        # routing, COPY fallback, failure accounting).  The default
        # finish loop takes pages in dispatch order WITHOUT a
        # fetch-all barrier: each page's finish blocks only on its own
        # (already async-copying) result arrays, so the host
        # write-back of page i overlaps the device decode of pages
        # > i (measured ~20% off the e2e workflow wall).  Only the
        # lookahead mode needs every page's records up front (the
        # reverse chained walk starts at the LAST page).
        results = [None] * len(device_pending)
        if device_pending and \
                self.parameter.get('lookahead_writeback'):
            fetched = self.rater.fetch_pendings(
                [rec[0] for rec in device_pending], prefetched=True)
            device_pending = [(p,) + rec[1:] for p, rec in
                              zip(fetched, device_pending)]
            # reference lock-in emulation: walk pages in REVERSE,
            # chaining the entry slot — page N's path is the one the
            # globally best final path traverses (rating.py:736-741),
            # not page N's own local rank-0 hypothesis.  Output files
            # are then still written in forward page order below.
            slot = 0
            for pi in range(len(device_pending) - 1, -1, -1):
                try:
                    (results[pi], slot) = \
                        self.rater.rate_best_device_finish(
                            device_pending[pi][0], start_slot=slot,
                            return_entry=True)
                except KeyboardInterrupt:
                    raise
                except Exception:
                    if missing_policy == 'ABORT':
                        raise
                    # leave results[pi] = None: the forward write loop
                    # re-attempts the finish and applies the page
                    # error policy (SKIP/COPY + failure accounting)
                    # there; restart the lookahead chain at rank 0
                    self._base_logger.exception(
                        'lookahead walk failed on page %s',
                        device_pending[pi][3])
                    slot = 0
        for pi, rec in enumerate(device_pending):
            finish_one(rec, results[pi])
        if prev:
            # final flush: lock the last page into its own best path
            path, entropy, _ = self.rater.next_path(
                prev.traceback[0], ([], prev.traceback[1]))
            _page_update_from_path(level, path, entropy,
                                   logger=self.logger)
            page_update_higher_textequiv_levels(level, prev.pcgts)
            self._write_page(prev.pcgts, prev.file_id, prev.page_id)
        if nr_failed > 0:
            self._base_logger.warning('%s %d of %d pages due to %s',
                                      reason, nr_failed,
                                      nr_failed + nr_succeeded,
                                      dict(nr_errors))
            # end-of-run enforcement over PROCESSED pages (reference
            # ocrd core semantics: failures/(failures+successes))
            max_missing = self._max_missing_ratio()
            if 0 < max_missing < \
                    nr_failed / max(nr_failed + nr_succeeded, 1):
                raise RuntimeError(
                    'too many failures with %s output (%d of %d, %s)'
                    % (reason, nr_failed, nr_failed + nr_succeeded,
                       dict(nr_errors)))

    # -- per-page processing ------------------------------------------

    def _native_page_eligible(self) -> bool:
        """The native byte lane only serves device decoding without
        lookahead (the array finish protocol applies there)."""
        return (self.parameter.get('alternative_decoding', True)
                and self.parameter.get('device_decoding', True)
                and not self.parameter.get('lookahead_writeback')
                and self.parameter.get('textequiv_level') in ('word',
                                                              'glyph')
                and self.rater is not None and self.rater.fused_decode
                and os.environ.get('KERASLM_NATIVE_PAGE', '1') != '0'
                and page_native.available())

    def _native_scan_for_group(self, doc: NativePageDoc):
        """Lattice-scan a native doc for page-group fusion; returns
        (n_raw, n_prep, maxlen) when the fused kernel can serve the
        page, else None (the caller flushes the group and takes the
        per-page path, which re-checks its own gates)."""
        from ..rater import DECODE_MERGE_MAX
        level = self._level
        lat = doc.lattice(level, self.rater.merge_runs,
                          DECODE_MERGE_MAX)
        if lat is None:
            return None
        n_raw, n_prep, maxlen = lat
        if self.rater.fused_gate_arrays(
                n_prep, maxlen, self.parameter['beam_width']) is None:
            return None
        return n_raw, n_prep, maxlen

    def _flush_page_group(self, gbuf, device_tb, device_pending,
                          on_failure=None):
        """Dispatch the buffered native pages as ONE fused kernel
        call: consecutive pages of a document form one linear lattice,
        so fusing them cuts the per-dispatch overhead (~6 ms/page over
        tunneled links) without changing any result — the beam carry
        flows through the concatenated edges exactly as it would
        across per-page kernel boundaries, and each page is walked
        from its own final edge's rank-0 slot (see
        ``Rater.rate_best_device_begin_arrays_group``).  Falls back to
        per-page dispatches if the group call fails; a page that ALSO
        fails its per-page dispatch routes through ``on_failure``
        (the caller's OCRD_MISSING_OUTPUT policy) attributed to ITS
        page id, and the remaining pages still dispatch."""
        if not gbuf:
            return device_tb
        beam_width = self._beam_width
        lm_weight = self._lm_weight
        context = self._page_context()
        maxlen = max(g[4] for g in gbuf)
        n_group = sum(g[3] for g in gbuf)
        table = self.rater.vocab._table()
        try:
            gate = self.rater.fused_gate_arrays(n_group, maxlen,
                                                beam_width)
            if gate is None:
                raise RuntimeError(
                    'page group no longer fits one fused block')
            _, L = gate
            segs = []
            for doc, _fid, _pid, n_prep, _ml, _nr, _inf in gbuf:
                segs.append((n_prep,)
                            + doc.fill(table, n_prep, 4, L))
            pending, device_tb = \
                self.rater.rate_best_device_begin_arrays_group(
                    segs, device_traceback=device_tb, context=context,
                    lm_weight=lm_weight, beam_width=beam_width)
            # start the host copy of the group's packed records now —
            # it completes while later groups dispatch (same protocol
            # as the per-page loop)
            for arr in pending[2]:
                copy_async = getattr(arr, 'copy_to_host_async', None)
                if copy_async is not None:
                    copy_async()
            for i, (doc, fid, pid, _n, _ml, _nr, inf) in \
                    enumerate(gbuf):
                device_pending.append((('gseg', pending, i), doc,
                                       fid, pid, inf))
        except KeyboardInterrupt:
            raise
        except Exception:
            # systemic dispatch failure: retry each page through the
            # regular per-page begin (native lane with lxml fallback);
            # a failure THERE is a genuine page/document failure and
            # propagates to the caller's policy handling
            self._base_logger.exception(
                'page-group dispatch failed; falling back to '
                'per-page dispatches')
            for doc, fid, pid, _n, _ml, _nr, inf in gbuf:
                try:
                    rec, device_tb = \
                        self.process_page_pcgts_device_begin(
                            doc, device_tb, fid, pid)
                except KeyboardInterrupt:
                    raise
                except Exception as err:
                    if on_failure is None:
                        raise
                    # ABORT/ratio raise from the handler; otherwise
                    # the failure is logged+counted for THIS page and
                    # the rest of the group still dispatches
                    on_failure(inf, pid, err)
                    continue
                for arr in rec[0][2] if rec[0][0] != 'done' else ():
                    copy_async = getattr(arr, 'copy_to_host_async',
                                         None)
                    if copy_async is not None:
                        copy_async()
                device_pending.append(rec + (inf,))
        finally:
            gbuf.clear()
        return device_tb

    def _device_begin_native(self, doc: NativePageDoc, device_tb,
                             file_id: str, page_id: str):
        """Native-lane begin: array lattice straight into the fused
        kernel.  Returns None when a gate fails (caller re-enters the
        lxml lane via ``doc.to_fast()``)."""
        from ..rater import DECODE_MERGE_MAX
        level = self._level
        beam_width = self._beam_width
        lm_weight = self._lm_weight
        lat = doc.lattice(level, self.rater.merge_runs,
                          DECODE_MERGE_MAX)
        if lat is None:
            return None
        n_raw, n_prep, maxlen = lat
        gate = self.rater.fused_gate_arrays(n_prep, maxlen, beam_width)
        if gate is None:
            return None
        E, L = gate
        self.rater.logger.info("Scoring text in page '%s' at the %s "
                               'level (device beam)',
                               doc.get_pcGtsId(), level)
        context = self._page_context()
        chars, mask, conf, valid = doc.fill(self.rater.vocab._table(),
                                            E, 4, L)
        self.rater.logger.info('Rating %d elements including its '
                               'alternatives', n_raw)
        pending, device_tb = self.rater.rate_best_device_begin_arrays(
            n_prep, E, L, chars, mask, conf, valid,
            device_traceback=device_tb, context=context,
            lm_weight=lm_weight, beam_width=beam_width)
        return (pending, doc, file_id, page_id), device_tb

    def process_page_pcgts_device_begin(self, pcgts: PcGts, device_tb,
                                        file_id: str, page_id: str):
        """Build the page lattice and DISPATCH its on-device decode;
        returns (pending record, new device traceback).  Fetching and
        write-back happen later (``_finish_device_page``), so a whole
        document pipelines through the device without per-page
        round-trips."""
        if isinstance(pcgts, NativePageDoc):
            rec = self._device_begin_native(pcgts, device_tb, file_id,
                                            page_id)
            if rec is not None:
                return rec
            self._base_logger.debug(
                'native page lane ineligible (%s): lxml lane',
                pcgts.bail or 'kernel gate')
            pcgts = pcgts.to_fast()
        level = self._level
        beam_width = self._beam_width
        lm_weight = self._lm_weight
        self.rater.logger.info("Scoring text in page '%s' at the %s "
                               'level (device beam)',
                               pcgts.get_pcGtsId(), level)
        context = self._page_context()
        # device engines take the edge LIST (no DiGraph build): the
        # chain is linear by construction here
        edges = page_get_linear_lattice_at(level, pcgts,
                                           logger=self.logger)
        self.rater.logger.info('Rating %d elements including its '
                               'alternatives', len(edges))
        pending, device_tb = self.rater.rate_best_device_begin(
            edges, 0, len(edges),
            device_traceback=device_tb,
            context=context,
            lm_weight=lm_weight,
            beam_width=beam_width,
            defer_walk=bool(self.parameter.get('lookahead_writeback')))
        return (pending, pcgts, file_id, page_id), device_tb

    def _finish_device_page(self, rec, result=None):
        pending, pcgts, file_id, page_id = rec
        level = self._level
        if pending[0] == 'gseg':
            # page segment of a fused page-group dispatch: walk this
            # page's edge range of the shared group records
            _, group_pending, seg_i = pending
            choices, costs, start_cost = \
                self.rater.rate_best_device_finish_group(
                    group_pending, seg_i)
            pcgts.apply_decode(level, choices, costs, start_cost,
                               logger=self.logger)
            self._write_page(pcgts, file_id, page_id)
            return
        if isinstance(pcgts, NativePageDoc):
            # array protocol: winners/projection/serialization happen
            # as byte-splice edits inside the doc
            choices, costs, start_cost = \
                self.rater.rate_best_device_finish_arrays(pending)
            pcgts.apply_decode(level, choices, costs, start_cost,
                               logger=self.logger)
            self._write_page(pcgts, file_id, page_id)
            return
        path, entropy = (result if result is not None
                         else self.rater.rate_best_device_finish(pending))
        _page_update_from_path(level, path, entropy, logger=self.logger)
        page_update_higher_textequiv_levels(level, pcgts)
        self._write_page(pcgts, file_id, page_id)

    def process_page_pcgts_device(self, pcgts: PcGts, device_tb,
                                  file_id: str, page_id: str):
        """Single-page synchronous variant (begin + finish)."""
        rec, device_tb = self.process_page_pcgts_device_begin(
            pcgts, device_tb, file_id, page_id)
        self._finish_device_page(rec)
        return device_tb

    def process_page_pcgts_stateful(self, pcgts: PcGts,
                                    prev: Optional[RateState],
                                    file_id: str, page_id: str
                                    ) -> RateState:
        level = self._level
        beam_width = self._beam_width
        lm_weight = self._lm_weight
        self.rater.logger.info("Scoring text in page '%s' at the %s level",
                               pcgts.get_pcGtsId(), level)
        context = self._page_context()
        graph, start_node, end_node = page_get_linear_graph_at(
            level, pcgts, logger=self.logger)
        # edge count, not node arithmetic: a customized builder's DAG
        # may use non-integer node labels
        self.rater.logger.info('Rating %d elements including its '
                               'alternatives',
                               graph.number_of_edges())
        path, entropy, traceback = self.rater.rate_best(
            graph, start_node, end_node,
            start_traceback=prev and prev.traceback,
            context=context,
            lm_weight=lm_weight,
            beam_width=beam_width,
            beam_clustering_dist=(BEAM_CLUSTERING_DIST
                                  if BEAM_CLUSTERING_ENABLE else 0))
        if prev:
            _page_update_from_path(level, path, entropy,
                                   logger=self.logger)
            page_update_higher_textequiv_levels(level, prev.pcgts)
            try:
                self._write_page(prev.pcgts, prev.file_id,
                                 prev.page_id)
            except FileExistsError:
                # the CURRENT page's state must still advance —
                # re-raising here would freeze `prev` and silently
                # drop every following page's output (the old page
                # would be re-written and re-fail forever)
                if _config_env('OCRD_EXISTING_OUTPUT',
                               'SKIP') == 'ABORT':
                    raise
                self._base_logger.warning(
                    'output for page %s already exists: skipped',
                    prev.page_id)
        return RateState(traceback=traceback, pcgts=pcgts,
                         file_id=file_id, page_id=page_id)

    def process_page_pcgts(self, pcgts: PcGts) -> PcGts:
        """Plain scoring without alternatives: whole-page text in one
        batched device call, confidence blending by lm_weight."""
        level = self._level
        self.rater.logger.info("Scoring text in page '%s' at the %s level",
                               pcgts.get_pcGtsId(), level)
        context = self._page_context()
        score_page_pcgts(self.rater, pcgts, level, context,
                         self.parameter['lm_weight'],
                         logger=self.logger)
        self.add_metadata(pcgts)
        return pcgts

    # -- helpers -------------------------------------------------------

    def _load_page(self, input_file, page_id) -> Optional[PcGts]:
        if self.download:
            input_file = self.workspace.download_file(input_file)
        if input_file.local_filename is None:
            self._base_logger.debug('ignoring missing file for page %s',
                                    page_id)
            return None
        path = os.path.join(self.workspace.directory,
                            input_file.local_filename)
        self._base_logger.info('processing page %s', page_id)
        try:
            # three lanes, fastest first (each falls back to the next):
            # 1. native byte lane (C++ scan + splice write-back) — only
            #    for device decoding, where the array protocol applies;
            # 2. etree-direct records (page_fast) — ~3x less host time
            #    than the object model, identical semantics;
            # 3. object model (KERASLM_FAST_PAGE=0).
            if os.environ.get('KERASLM_FAST_PAGE', '1') != '0':
                if self._native_page_eligible():
                    doc = NativePageDoc(path)
                    if doc.bail is None:
                        return doc
                    self._base_logger.debug(
                        'native page lane bailed (%s): lxml lane',
                        doc.bail)
                return parse_page_fast(path)
            return parse_page(path)
        except Exception as err:
            # surface as a page FAILURE so the caller's
            # OCRD_MISSING_OUTPUT policy applies (ABORT raises, COPY
            # copies the input file, the failure ratio counts it) —
            # only an absent file is a silent skip (above)
            raise ValueError('non-PAGE input for page %s: %s'
                             % (page_id, err)) from err

    def _make_file_id(self, input_file) -> str:
        if input_file.fileGrp == self.output_file_grp:
            return input_file.ID
        return input_file.ID.replace(input_file.fileGrp,
                                     self.output_file_grp) \
            if input_file.fileGrp in input_file.ID \
            else '%s_%s' % (self.output_file_grp, input_file.ID)

    def _output_exists(self, file_id) -> bool:
        existing = next(self.workspace.mets.find_files(ID=file_id), None)
        if existing and _config_env('OCRD_EXISTING_OUTPUT',
                                    'SKIP') != 'OVERWRITE':
            self._base_logger.error(
                'A file with ID==%s already exists %s and neither force '
                'nor ignore are set', file_id, existing)
            return True
        return False

    def _write_page(self, pcgts: PcGts, file_id: str, page_id: str):
        pcgts.set_pcGtsId(file_id)
        self.add_metadata(pcgts)
        # page-parallel finishers share the workspace: serialize METS
        # mutation (a RemoteWorkspace additionally serializes at the
        # METS server across *processes*)
        with self._ws_lock:
            self._write_page_locked(pcgts, file_id, page_id)

    def _write_page_locked(self, pcgts, file_id, page_id):
        self.workspace.add_file(
            file_grp=self.output_file_grp,
            ID=file_id,
            pageId=page_id,
            local_filename=os.path.join(self.output_file_grp,
                                        file_id + '.xml'),
            mimetype=MIMETYPE_PAGE,
            content=to_xml(pcgts),
            force=_config_env('OCRD_EXISTING_OUTPUT',
                              'SKIP') == 'OVERWRITE')
        if self._defer_mets:
            self._mets_mark_dirty_locked()
        else:
            self.workspace.save_mets()

    def _mets_mark_dirty_locked(self):
        """Under ``_ws_lock``: record a deferred METS mutation; flush
        every ``KERASLM_METS_FLUSH_PAGES`` pages (default 64, 0 =
        end-of-run only) so a hard kill loses at most one window of
        registrations while the save stays O(pages/window) instead of
        the per-page O(pages^2)."""
        self._mets_dirty = True
        self._mets_unsaved += 1
        window = int(os.environ.get('KERASLM_METS_FLUSH_PAGES',
                                    '64') or 0)
        if window > 0 and self._mets_unsaved >= window:
            self.workspace.save_mets()
            self._mets_unsaved = 0
            self._mets_dirty = False

    def _copy_page_file(self, input_file):
        path = os.path.join(self.workspace.directory,
                            input_file.local_filename)
        with open(path, encoding='utf-8') as fh:
            content = fh.read()
        file_id = self._make_file_id(input_file)
        with self._ws_lock:
            self.workspace.add_file(
                file_grp=self.output_file_grp, ID=file_id,
                pageId=input_file.pageId,
                local_filename=os.path.join(self.output_file_grp,
                                            file_id + '.xml'),
                mimetype=MIMETYPE_PAGE, content=content, force=True)
            if self._defer_mets:
                self._mets_mark_dirty_locked()
            else:
                self.workspace.save_mets()

    def _handle_page_error(self, err, page_id, input_file=None):
        """Apply OCRD_MISSING_OUTPUT to one page failure: ABORT
        re-raises, COPY falls back to the input file (when given),
        anything else skips with a log."""
        policy = _config_env('OCRD_MISSING_OUTPUT', 'SKIP')
        if policy == 'ABORT':
            self._base_logger.error('Failure on page %s: %s', page_id,
                                    err)
            raise err
        self._base_logger.exception('Failure on page %s', page_id)
        if policy == 'COPY' and input_file is not None:
            try:
                self._copy_page_file(input_file)
            except Exception:  # noqa: BLE001 — fallback of a fallback
                self._base_logger.exception(
                    'COPY fallback failed for page %s', page_id)

    def _check_missing_ratio(self, nr_failed: int, total: int) -> None:
        """Raise once the failed-page share exceeds
        OCRD_MAX_MISSING_OUTPUTS (disabled at <= 0), mirroring the
        stateful loops' inline accounting."""
        max_missing = self._max_missing_ratio()
        if nr_failed and 0 < max_missing < nr_failed / max(total, 1):
            raise RuntimeError(
                'too many failures with missing output (%d of %d)'
                % (nr_failed, total))

    @staticmethod
    def _max_missing_ratio() -> float:
        """OCRD_MAX_MISSING_OUTPUTS as a float; empty/invalid values
        disable the threshold instead of crashing the error handler."""
        raw = (_config_env('OCRD_MAX_MISSING_OUTPUTS', '-1')
               or '').strip()
        try:
            return float(raw)
        except ValueError:
            return -1.0


# ---------------------------------------------------------------------
# context extraction
# ---------------------------------------------------------------------

def mets_get_context(mets: Mets, limit: int = 200) -> List[int]:
    """Year context from the METS unique identifier suffix, bucketed as
    ceil(year/10) (reference wrapper/rate.py:328-341).  Buckets beyond
    the context table (years >= 2000 at the default 200 rows) map to
    the underspecified 0 instead of silently clamping on device."""
    ident = mets.unique_identifier
    context = [0]
    if ident:
        name = ident.split('/')[-1]
        year = name.split('_')[-1]
        if year.isnumeric():
            bucket = ceil(int(year) / 10)
            context = [bucket] if bucket < limit else [0]
    return context


# ---------------------------------------------------------------------
# page scoring (module-level: shared by the standalone processor and
# the genuine-OCR-D adapter, wrapper/ocrd_adapter.py)
# ---------------------------------------------------------------------

def apply_confidences(text, confidences, level, lm_weight,
                      logger=None) -> None:
    """Blend LM char probabilities into the first TextEquiv of every
    element (conf = lm*w + ocr*(1-w)), delete other alternatives, and
    log the avg/char-ppl/segment-ppl line the tests parse (reference
    wrapper/rate.py:309-325)."""
    logger = logger or LOG
    if not confidences:
        logger.warning('page has no text to rate')
        return
    i = 0
    for element, textequivs in text:
        textequiv = textequivs[0]
        if element:
            element.set_TextEquiv([textequiv])
        n = len(textequiv.Unicode)
        conf = sum(confidences[i:i + n]) / max(n, 1)
        conf2 = textequiv.conf if textequiv.conf is not None else 1.0
        textequiv.set_conf(conf * lm_weight +
                           conf2 * (1. - lm_weight))
        i += n
    if i != len(confidences):
        logger.critical('Input text length and output scores '
                        'length are off by %d characters',
                        i - len(confidences))
    avg = sum(confidences) / len(confidences)
    ent = sum(-log(max(p, 1e-99), 2)
              for p in confidences) / len(confidences)
    ppl = pow(2.0, ent)
    ppll = pow(2.0, ent * len(confidences) / max(len(text), 1))
    logger.info('avg: %.3f, char ppl: %.3f, %s ppl: %.3f',
                avg, ppl, level, ppll)


def score_page_pcgts(rater, pcgts, level, context, lm_weight,
                     logger=None) -> None:
    """Plain scoring of one page (no alternatives): whole-page text in
    one batched device call, confidence blending by ``lm_weight``.
    Works on standalone AND genuine ``ocrd_models`` PAGE trees (both
    expose the generateDS API)."""
    logger = logger or LOG
    edges = _require_edge_list(
        page_get_linear_lattice_at(level, pcgts, logger=logger),
        'plain page scoring')
    text = [(edge['element'], edge['alternatives'])
            for edge in edges]
    textstring = ''.join(tes[0].Unicode for _, tes in text)
    logger.info('Rating %d elements with a total of %d characters',
                len(text), len(textstring))
    confidences = rater.rate(textstring, context)
    apply_confidences(text, confidences, level, lm_weight, logger)


# ---------------------------------------------------------------------
# lattice construction
# ---------------------------------------------------------------------

def page_get_linear_graph_at(level: str, pcgts: PcGts, logger=None
                             ) -> Tuple[nx.DiGraph, int, int]:
    """Walk the Page hierarchy down to ``level`` and build a linear
    DiGraph with one edge per element (carrying ``element`` +
    ``alternatives``), inserting artificial whitespace/newline edges
    between siblings except where tokenisation-repair applies
    (reference wrapper/rate.py:343-424).

    The DiGraph form serves the general-DAG host engine (``rate_best``)
    and API compatibility; the device engines take the underlying edge
    LIST (``page_get_linear_lattice_at``) directly — a linear chain
    needs no graph library, and ``nx.add_edge`` alone cost ~4 ms per
    1000-edge page (profiled)."""
    edges = page_get_linear_lattice_at(level, pcgts, logger=logger)
    if hasattr(edges, 'add_edge'):
        # a customized builder returned a general-DAG DiGraph
        # directly: pass it through to the host engine (rate_best
        # accepts any single-source/single-sink DAG, like the
        # reference traversal, rating.py:763-773)
        graph = edges
        if graph.number_of_edges() == 0:
            # a blank page is not an error (the chain path yields an
            # empty edge list); normalize to the empty-chain form
            graph = nx.DiGraph(level=level)
            graph.add_node(0)
            return graph, 0, 0
        starts = [n for n in graph if graph.in_degree(n) == 0]
        ends = [n for n in graph if graph.out_degree(n) == 0]
        if len(starts) != 1 or len(ends) != 1:
            raise ValueError(
                'lattice DAG needs exactly one source and one sink '
                '(got %d/%d)' % (len(starts), len(ends)))
        if not nx.is_directed_acyclic_graph(graph):
            # catch cycles here (a cyclic graph can still have one
            # source/sink) instead of dying per page inside the host
            # engine's topological sort with a bare NetworkXUnfeasible
            raise ValueError(
                'lattice graph contains a cycle: the decoder requires '
                'a directed acyclic lattice (one edge per text '
                'alternative in reading order)')
        return graph, starts[0], ends[0]
    graph = nx.DiGraph(level=level)
    graph.add_node(0)
    for i, edge in enumerate(edges):
        graph.add_edge(i, i + 1, **edge)
    return graph, 0, len(edges)


def _require_edge_list(edges, where: str) -> list:
    """Reject a customized builder's DiGraph on chain-only paths with
    an actionable message (instead of an obscure per-page TypeError
    when the caller iterates node labels as edge dicts)."""
    if hasattr(edges, 'add_edge'):
        raise ValueError(
            'a customized lattice builder returned a DAG, but %s '
            'scores the single best chain; DAG lattices are only '
            'supported with alternative_decoding=true (the host DAG '
            'engine)' % where)
    return edges


def page_get_linear_lattice_at(level: str, pcgts, logger=None) -> list:
    """Linear lattice of a page as a list of edge dicts
    (``{'element', 'alternatives'}``) in chain order — edge ``i`` spans
    nodes ``(i, i+1)`` of the equivalent DiGraph.  Same traversal,
    space/newline, tokenisation-repair, and choice-filter semantics as
    the reference graph builder (wrapper/rate.py:343-424); works on any
    tree exposing the generateDS-style PAGE API (the standalone object
    model, ``page_fast`` records, or genuine ``ocrd_models``)."""
    if logger is None:
        logger = LOG
    problems = _page_get_tokenisation_problems(level, pcgts,
                                               logger=logger)
    edges: list = []

    def add_element(element, textequivs):
        edges.append({'element': element,
                      'alternatives': _filter_choices(textequivs)})

    def add_space(space, last_start, problem, textequivs):
        """Whitespace pseudo-edge, skipped where a tokenisation problem
        shows the parent text already concatenates."""
        if (textequivs and textequivs[0].Unicode and problem and
                _repair_tokenisation(
                    problem.actual,
                    ''.join(edge['alternatives'][0].Unicode
                            for edge in edges[last_start:]),
                    textequivs[0].Unicode, logger=logger)):
            return  # skip space (concatenation join)
        add_element(None, [TextEquivType(Unicode=space, conf=1.0)])

    regions = pcgts.get_Page().get_TextRegion()
    if not regions:
        logger.warning('Page contains no text regions')
    first_region = True
    for region in regions:
        if level == 'region':
            textequivs = region.get_TextEquiv()
            if not first_region:
                # no page-level tokenisation check exists (the Page
                # element has no own TextEquiv to compare against), so
                # newline edges between regions are never repaired
                add_space('\n', 0, None, textequivs)
            if textequivs:
                add_element(region, textequivs)
            else:
                logger.warning("Region '%s' contains no text results",
                               region.id)
            first_region = False
            continue
        lines = region.get_TextLine()
        if not lines:
            logger.warning("Region '%s' contains no text lines",
                           region.id)
        region_start = len(edges)
        first_line = True
        for line in lines:
            if level == 'line':
                textequivs = line.get_TextEquiv()
                if not first_line or not first_region:
                    add_space('\n', region_start,
                              not first_line and problems.get(region.id),
                              textequivs)
                if textequivs:
                    add_element(line, textequivs)
                else:
                    logger.warning("Line '%s' contains no text results",
                                   line.id)
                first_line = False
                continue
            words = line.get_Word()
            if not words:
                logger.warning("Line '%s' contains no words", line.id)
            line_start = len(edges)
            first_word = True
            for word in words:
                textequivs = word.get_TextEquiv()
                if not first_word or not first_line or not first_region:
                    add_space('\n' if first_word else ' ', line_start,
                              not first_word and problems.get(line.id),
                              textequivs)
                if level == 'word':
                    if textequivs:
                        add_element(word, textequivs)
                    else:
                        logger.warning(
                            "Word '%s' contains no text results",
                            word.id)
                    first_word = False
                    continue
                glyphs = word.get_Glyph()
                if not glyphs:
                    logger.warning("Word '%s' contains no glyphs",
                                   word.id)
                for glyph in glyphs:
                    textequivs = glyph.get_TextEquiv()
                    if textequivs:
                        add_element(glyph, textequivs)
                    else:
                        logger.warning(
                            "Glyph '%s' contains no text results",
                            glyph.id)
                first_word = False
            first_line = False
        first_region = False
    return edges


def _repair_tokenisation(tokenisation, concatenation, next_token,
                         logger=None):
    """Decide whether the artificial joining space must be SKIPPED at
    this junction: the parent's own text annotation is authoritative —
    if the text emitted so far (``concatenation``) lines up with a
    prefix of it and the annotation continues IMMEDIATELY (no white
    space) with ``next_token``, the two elements are glued in the
    original and inserting a space would corrupt the tokenisation.
    (Junction rule of the reference, wrapper/rate.py:641-653.)"""
    if logger is None:
        logger = LOG
    # longest suffix of the emitted text that the annotation starts
    # with (the two strings overlap there); 0 = no alignment found
    limit = min(len(tokenisation), len(concatenation))
    overlap = next((n for n in range(limit, 0, -1)
                    if tokenisation.startswith(concatenation[-n:])), 0)
    if overlap and tokenisation[overlap:].startswith(next_token):
        logger.warning('Repairing tokenisation between "%s" and "%s"',
                       concatenation[-overlap:], next_token)
        return True
    return False


def _filter_choices(textequivs):
    """Cap alternatives at CHOICE_THRESHOLD_NUM and within
    CHOICE_THRESHOLD_CONF of the best; default conf 1.0.

    Direct attribute assignment, not ``set_conf``: this normalization
    is search-internal (the winner's conf is overwritten with the
    decoded score at write-back) and must not trigger the fast path's
    XML write-through on every parsed alternative."""
    if not textequivs:
        return []
    if len(textequivs) == 1:
        te = textequivs[0]
        if te.conf is None:
            te.conf = 1.0
        return textequivs
    textequivs = textequivs[:CHOICE_THRESHOLD_NUM]
    for te in textequivs:
        # None/missing -> 1.0; an EXPLICIT conf=0.0 is preserved
        # (deviation from the reference, which falsy-coerces 0.0 to
        # fully-confident 1.0 — inverting the least confident
        # alternative into the most confident one)
        if te.conf is None:
            te.conf = 1.0
    conf0 = textequivs[0].conf
    return [te for te in textequivs
            if conf0 - te.conf < CHOICE_THRESHOLD_CONF]


# ---------------------------------------------------------------------
# tokenisation consistency (validator-equivalent)
# ---------------------------------------------------------------------

@dataclass
class ConsistencyError:
    tag: str
    ID: str
    actual: str
    expected: str


def _page_get_tokenisation_problems(level, pcgts, logger=None
                                    ) -> Dict[str, ConsistencyError]:
    """Detect elements whose own text annotation deviates from the
    concatenation of their children only w.r.t. white space (then the
    artificial joining space must be skipped).  Standalone equivalent
    of the reference's PageValidator-based check
    (wrapper/rate.py:592-610)."""
    if logger is None:
        logger = LOG
    problems: Dict[str, ConsistencyError] = {}

    def check(tag, elem_id, own, joined):
        if not own or own == joined:
            return
        if len(own.split()) != len(joined.split()):
            if _HIERARCHY.get(tag) == level:
                problems[elem_id] = ConsistencyError(
                    tag=tag, ID=elem_id, actual=own, expected=joined)
                logger.warning(
                    'Tokenisation inconsistency in %s "%s": "%s" vs '
                    'joined "%s"', tag, elem_id, own, joined)

    page = pcgts.get_Page()
    for region in page.get_AllRegions(classes=['Text']):
        own = region.text_equivs[0].Unicode if region.text_equivs else ''
        joined = '\n'.join(
            (line.text_equivs[0].Unicode if line.text_equivs else '')
            for line in region.get_TextLine())
        check('TextRegion', region.id, own, joined)
        for line in region.get_TextLine():
            own = line.text_equivs[0].Unicode if line.text_equivs else ''
            joined = ' '.join(
                (w.text_equivs[0].Unicode if w.text_equivs else '')
                for w in line.get_Word())
            check('TextLine', line.id, own, joined)
            for word in line.get_Word():
                own = (word.text_equivs[0].Unicode
                       if word.text_equivs else '')
                joined = ''.join(
                    (g.text_equivs[0].Unicode if g.text_equivs else '')
                    for g in word.get_Glyph())
                check('Word', word.id, own, joined)
    return problems


# ---------------------------------------------------------------------
# result write-back / text projection
# ---------------------------------------------------------------------

def _page_update_from_path(level, path, entropy, logger=None):
    """Apply the decoded best path: keep the winning TextEquiv per
    element, conf = 2^(-cost/len); log ppl summary (the line format is
    API — tests parse it; reference wrapper/rate.py:426-440)."""
    if logger is None:
        logger = LOG
    strlen = 0
    for element, textequiv, score in path:
        if element:
            element.set_TextEquiv([textequiv])
            strlen += len(textequiv.Unicode)
            textequiv.set_conf(score)
        else:
            strlen += 1
    if not strlen:
        return
    ent = entropy / strlen
    avg = pow(2.0, -ent)
    ppl = pow(2.0, ent)
    ppll = pow(2.0, ent * strlen / max(len(path), 1))
    logger.info('avg: %.3f, char ppl: %.3f, %s ppl: %.3f',
                avg, ppl, level, ppll)


def page_element_unicode0(element):
    """Unicode string of the first text result."""
    if element.get_TextEquiv():
        return element.get_TextEquiv()[0].Unicode or ''
    return ''


def page_element_conf0(element):
    """Confidence of the first text result."""
    if element.get_TextEquiv():
        conf = element.get_TextEquiv()[0].conf
        return float(conf) if conf is not None else 1.0
    return 1.0


def page_get_reading_order(ro, rogroup):
    """Flatten a ReadingOrder group tree into ``ro``: one entry per
    member, keyed by the region it orders (``regionRef``; groups
    without one — e.g. the top-level group — key by their own id).
    Iterative worklist over nested groups; members of an Ordered group
    are the ``*Indexed`` variants, of an Unordered group the plain
    ones (reference wrapper/rate.py:457-476)."""
    worklist = [] if rogroup is None else [rogroup]
    while worklist:
        group = worklist.pop()
        ordered = isinstance(group,
                             (OrderedGroupType, OrderedGroupIndexedType))
        leaves, subgroups = ((group.get_RegionRefIndexed(),
                              group.get_OrderedGroupIndexed() +
                              group.get_UnorderedGroupIndexed())
                             if ordered else
                             (group.get_RegionRef(),
                              group.get_OrderedGroup() +
                              group.get_UnorderedGroup()))
        for member in leaves + subgroups:
            getref = getattr(member, 'get_regionRef', None)
            ro[(getref() if getref else '') or member.id] = member
        worklist.extend(subgroups)


def _rtl(*scopes) -> bool:
    """Resolve ``readingDirection`` by scope inheritance (innermost
    wins); True = right-to-left traversal."""
    for scope in scopes:
        direction = scope.get_readingDirection()
        if direction:
            return direction == RIGHT_TO_LEFT
    return False


def _aggregate(children, separator):
    """(joined text, mean conf) over already-projected children.

    ``separator`` is a string, or a callable ``(prev, next) -> str``
    for junction-dependent joining (the Relation type=join rules).
    Empty children aggregate to ``('', 0)`` — the value the write-back
    stores for childless elements."""
    if not children:
        return '', 0
    pieces = [page_element_unicode0(children[0])]
    for prev, nxt in zip(children, children[1:]):
        pieces.append(separator if isinstance(separator, str)
                      else separator(prev, nxt))
        pieces.append(page_element_unicode0(nxt))
    conf = sum(page_element_conf0(c) for c in children) / len(children)
    return ''.join(pieces), conf


def _store_joined(element, text_conf, overwrite):
    """Write the aggregated (text, conf) as the element's single
    TextEquiv; with ``overwrite=False`` existing text is kept."""
    if not element.get_TextEquiv() or overwrite:
        text, conf = text_conf
        element.set_TextEquiv([TextEquivType(Unicode=text, conf=conf)])


def page_update_higher_textequiv_levels(level, pcgts, overwrite=True):
    """Project text up the hierarchy: join first TextEquivs by the rules
    of each level (words by space, lines/regions by newline, glyphs by
    concatenation), traversing ReadingOrder OrderedGroups,
    ``textLineOrder=bottom-to-top`` and
    ``readingDirection=right-to-left`` in reverse, and joining directly
    (no whitespace) across ``Relation type=join`` pairs; average confs
    (reference wrapper/rate.py:478-590).

    Structure: each level is "order the children, aggregate their
    (text, conf), store" with a per-level separator rule — a constant
    for words/glyphs, a junction function consulting the join-relation
    pairs for lines/subregions."""
    if level == 'region':
        return
    page = pcgts.get_Page()
    relations = page.get_Relations()
    joins = {(rel.get_SourceRegionRef().get_regionRef(),
              rel.get_TargetRegionRef().get_regionRef())
             for rel in (relations.get_Relation() if relations else [])
             if rel.get_type() == 'join'}
    reading_order: Dict[str, Any] = {}
    ro = page.get_ReadingOrder()
    if ro:
        page_get_reading_order(reading_order,
                               ro.get_OrderedGroup() or
                               ro.get_UnorderedGroup())

    def newline_unless_joined(prev, nxt):
        # subregion junction: the regions themselves are related
        return '' if (prev.id, nxt.id) in joins else '\n'

    def newline_unless_word_joined(prev_line, next_line):
        # line junction: the join relation names the EDGE words
        last = prev_line.get_Word()
        first = next_line.get_Word()
        if last and first and (last[-1].id, first[0].id) in joins:
            return ''
        return '\n'

    def by_reading_order(subs):
        # sort whenever ALL subregions have indexed entries
        # (RegionRefIndexed or indexed groups) — resolves the
        # reference's open TODO at wrapper/rate.py:489, which only
        # sorted when the entries were OrderedGroup instances
        entries = [reading_order.get(sub.id) for sub in subs]
        if all(hasattr(e, 'index') for e in entries):
            return [sub for _, sub in sorted(
                zip(entries, subs), key=lambda es: es[0].index)]
        return subs

    # CHILDREN BEFORE PARENTS: a nested region's text must be joined
    # from its subregions' FRESHLY projected texts (the reference's
    # stated traversal contract, wrapper/rate.py:517-519 "already
    # visited in earlier iterations").  get_AllRegions returns
    # pre-order (parents first), so reverse it — in reversed pre-order
    # every region precedes its ancestors.  (Until round 5 the parent
    # joined the PRE-decode subregion texts — caught by the
    # nested-projection staleness test.)
    for region in reversed(page.get_AllRegions(classes=['Text'])):
        subregions = region.get_TextRegion()
        if subregions:
            # nested region: its subregions were projected in their
            # own (earlier) iterations — only join
            _store_joined(region,
                          _aggregate(by_reading_order(subregions),
                                     newline_unless_joined),
                          overwrite)
            continue
        lines = region.get_TextLine()
        if ((region.get_textLineOrder() or
             page.get_textLineOrder()) == BOTTOM_TO_TOP):
            lines = lines[::-1]
        if level != 'line':
            for line in lines:
                words = line.get_Word()
                if _rtl(line, region, page):
                    words = words[::-1]
                if level != 'word':
                    for word in words:
                        glyphs = word.get_Glyph()
                        if _rtl(word, line, region, page):
                            glyphs = glyphs[::-1]
                        _store_joined(word, _aggregate(glyphs, ''),
                                      overwrite)
                _store_joined(line, _aggregate(words, ' '), overwrite)
        _store_joined(region,
                      _aggregate(lines, newline_unless_word_joined),
                      overwrite)
