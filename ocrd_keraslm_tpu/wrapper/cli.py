"""CLI for the ``ocrd-keraslm-rate`` processor.

Standalone click group carrying the standard OCR-D processor options
(-m/-I/-O/-p/-P/--overwrite, --mets-server-url) plus the network
service subcommands the reference inherits from ``ocrd.decorators``
(reference wrapper/cli.py:6-9 wraps ``ocrd_cli_wrap_processor``; ocrd
core adds ``worker`` and ``server`` subcommands and the METS server
plumbing).  ocrd core is unavailable here, so the processing-server,
queue-worker, and METS-server roles are implemented standalone:

* ``ocrd-keraslm-rate`` (no subcommand) — process one workspace.
* ``ocrd-keraslm-rate server ADDRESS`` — long-lived HTTP processing
  server: the model loads (and the TPU program compiles) ONCE, then
  POST /process jobs reuse the warm rater.  GET / returns ocrd-tool
  JSON.
* ``ocrd-keraslm-rate worker --queue DIR`` — spool-directory job
  worker: picks up ``*.json`` job files ({"mets": ..., "input_file_grp":
  ..., ...}), processes, writes ``<job>.result.json`` (a broker-less
  stand-in for ocrd's RabbitMQ worker: same job payload shape, same
  warm-model amortization).
* ``ocrd-keraslm-rate mets-server --mets DIR URL`` — serve one
  workspace's METS over a unix socket for page-parallel multi-process
  runs (reference test/conftest.py:39-69).
"""
from __future__ import annotations

import json
import logging
import os
import sys

import click

from .mets import Workspace
from .rate import OCRD_TOOL, KerasRate

PROCESS_OPTIONS = [
    click.option('-m', '--mets', default='mets.xml', show_default=True,
                 help='METS file or workspace directory'),
    click.option('-I', '--input-file-grp', default='OCR-D-OCR',
                 show_default=True),
    click.option('-O', '--output-file-grp', default='OCR-D-LM',
                 show_default=True),
    click.option('-p', '--parameter', default=None,
                 help='JSON file or string of processor parameters'),
    click.option('-P', '--parameter-override', nargs=2, multiple=True,
                 help='single parameter override (repeatable)'),
    click.option('-U', '--mets-server-url', default=None,
                 help='connect to a METS server at this unix socket '
                      'path instead of reading mets.xml directly'),
    click.option('--overwrite', is_flag=True,
                 help='overwrite existing output files'),
    click.option('-J', '--dump-json', is_flag=True,
                 help='print tool description and exit'),
    click.option('-l', '--log-level', default='INFO',
                 show_default=True),
    click.option('--profile', is_flag=True,
                 help='enable host profiling (cProfile)'),
    click.option('--profile-file', default=None,
                 type=click.Path(dir_okay=False, writable=True),
                 help='write host profile stats to this file'),
    click.option('--jax-trace', default=None,
                 type=click.Path(file_okay=False, writable=True),
                 help='capture a device trace (jax.profiler) into '
                      'this directory'),
]


def _setup_runtime(log_level, profile, profile_file, jax_trace):
    logging.basicConfig(level=getattr(logging, log_level.upper(),
                                      logging.INFO))
    platform = os.environ.get('KERASLM_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    if profile or profile_file:
        import atexit
        import cProfile
        import pstats
        prof = cProfile.Profile()
        prof.enable()

        def _dump():
            prof.disable()
            if profile_file:
                prof.dump_stats(profile_file)
            else:
                pstats.Stats(prof).sort_stats('cumulative') \
                    .print_stats(30)
        atexit.register(_dump)
    if jax_trace:
        import atexit

        import jax
        jax.profiler.start_trace(jax_trace)
        atexit.register(jax.profiler.stop_trace)


def _parse_params(parameter, parameter_override):
    params = {}
    if parameter:
        if os.path.isfile(parameter):
            with open(parameter, encoding='utf-8') as fh:
                params = json.load(fh)
        else:
            params = json.loads(parameter)
    for key, value in parameter_override or ():
        schema = OCRD_TOOL['parameters'].get(key, {})
        if schema.get('type') == 'boolean':
            value = value.lower() in ('1', 'true', 'yes')
        elif schema.get('type') == 'number':
            # ints stay ints (beam_width); anything else (decimals,
            # scientific notation like 1e-1) parses as float
            try:
                value = int(value)
            except ValueError:
                value = float(value)
        params[key] = value
    return params


def _open_workspace(mets, mets_server_url):
    if mets_server_url:
        from .mets_server import RemoteWorkspace
        return RemoteWorkspace(mets_server_url)
    directory = mets if os.path.isdir(mets) else os.path.dirname(mets) \
        or '.'
    return Workspace(directory)


def _run_processor(workspace, input_file_grp, output_file_grp, params,
                   rater=None):
    processor = KerasRate(workspace=workspace,
                          input_file_grp=input_file_grp,
                          output_file_grp=output_file_grp,
                          parameter=params)
    if rater is not None:
        processor.rater = rater
    else:
        processor.setup()
    processor.process_workspace(workspace)
    return processor


@click.group(invoke_without_command=True)
@click.pass_context
def ocrd_keraslm_rate(ctx, **kwargs):
    """Rate elements of the text with a character-level LSTM language
    model (TPU-native)."""
    if ctx.invoked_subcommand is not None:
        return
    mets = kwargs['mets']
    dump_json = kwargs['dump_json']
    _setup_runtime(kwargs['log_level'], kwargs['profile'],
                   kwargs['profile_file'], kwargs['jax_trace'])
    if dump_json:
        click.echo(json.dumps(OCRD_TOOL, indent=2))
        return
    params = _parse_params(kwargs['parameter'],
                           kwargs['parameter_override'])
    if kwargs['overwrite']:
        os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'
    workspace = _open_workspace(mets, kwargs['mets_server_url'])
    _run_processor(workspace, kwargs['input_file_grp'],
                   kwargs['output_file_grp'], params)


for _opt in reversed(PROCESS_OPTIONS):
    ocrd_keraslm_rate = _opt(ocrd_keraslm_rate)


def main():
    """Console entry point: prefer the GENUINE OCR-D core when it is
    installed (drop-in participation in real workflows, reference
    wrapper/cli.py:6-9), fall back to the standalone CLI otherwise.
    Force the standalone stack with KERASLM_STANDALONE=1."""
    from .ocrd_adapter import genuine_ocrd_available
    # the standalone subcommands (worker / server / mets-server) have
    # no genuine-CLI equivalent — route them to the standalone group
    # even when the real core is installed, so they stay reachable
    if len(sys.argv) > 1 and \
            sys.argv[1] in ocrd_keraslm_rate.commands:
        return ocrd_keraslm_rate()
    if genuine_ocrd_available():
        from ocrd.decorators import (ocrd_cli_options,
                                     ocrd_cli_wrap_processor)

        from .ocrd_adapter import make_processor_class

        @click.command()
        @ocrd_cli_options
        def genuine_cli(*args, **kwargs):
            return ocrd_cli_wrap_processor(make_processor_class(),
                                           *args, **kwargs)
        return genuine_cli()
    return ocrd_keraslm_rate()


@ocrd_keraslm_rate.command('mets-server')
@click.option('-m', '--mets', default='.', show_default=True,
              help='METS file or workspace directory to serve')
@click.option('-l', '--log-level', default='INFO', show_default=True)
@click.argument('url')
def mets_server_cmd(mets, log_level, url):
    """Serve one workspace's METS on the unix socket URL (page-parallel
    multi-process runs connect with --mets-server-url URL)."""
    logging.basicConfig(level=getattr(logging, log_level.upper(),
                                      logging.INFO))
    from .mets_server import MetsServer
    directory = mets if os.path.isdir(mets) else os.path.dirname(mets) \
        or '.'
    server = MetsServer(Workspace(directory), url)
    server.serve_forever()


@ocrd_keraslm_rate.command('server')
@click.argument('address', default='127.0.0.1:8080')
@click.option('-p', '--parameter', default=None,
              help='JSON file or string of processor parameters '
                   '(the model loads once at startup)')
@click.option('-P', '--parameter-override', nargs=2, multiple=True)
@click.option('-l', '--log-level', default='INFO', show_default=True)
def server_cmd(address, parameter, parameter_override, log_level):
    """Long-lived HTTP processing server on ADDRESS (host:port).

    The model is loaded and device programs compile once; each
    POST /process {"mets": ..., "input_file_grp": ...,
    "output_file_grp": ..., "parameter": {...}} then runs against the
    warm rater.  GET / (or /info) returns the ocrd-tool description;
    GET /health returns 200 once the model is ready.
    """
    _setup_runtime(log_level, False, None, None)
    params0 = _parse_params(parameter, parameter_override)
    httpd = make_processing_server(address, params0)
    log = logging.getLogger('ocrd_keraslm_tpu.server')
    log.info('processing server listening on %s', address)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def _run_job(job: dict, params0: dict, seed):
    """Execute one serving job against the warm ``seed`` processor.

    Shared by the HTTP processing server and the spool-queue worker so
    both roles keep identical semantics — in particular the warm-rater
    reuse gate: jobs reuse the already-loaded model only when they
    override neither the model file nor the decode mode (both affect
    ``setup()``)."""
    params = dict(params0)
    params.update(job.get('parameter') or {})
    workspace = _open_workspace(job.get('mets', 'mets.xml'),
                                job.get('mets_server_url'))
    # compare DEFAULT-FILLED values: a job that explicitly passes the
    # default (e.g. alternative_decoding=true) must still reuse the
    # warm rater instead of forcing a model reload

    def _filled(p, key):
        if key in p:
            return p[key]
        return OCRD_TOOL['parameters'][key].get('default')

    rater = seed.rater if (
        _filled(params, 'model_file') == _filled(params0, 'model_file')
        and _filled(params, 'alternative_decoding') ==
        _filled(params0, 'alternative_decoding')) else None
    _run_processor(workspace,
                   job.get('input_file_grp', 'OCR-D-OCR'),
                   job.get('output_file_grp', 'OCR-D-LM'),
                   params, rater=rater)


def make_processing_server(address: str, params0: dict):
    """Build (but don't run) the processing HTTP server: loads the
    model once, returns a ``ThreadingHTTPServer`` whose /process jobs
    reuse the warm rater.  Split from the CLI so tests can run it in a
    thread on an ephemeral port."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import threading

    seed = KerasRate(parameter=params0)
    seed.setup()   # load model + compile ONCE
    log = logging.getLogger('ocrd_keraslm_tpu.server')
    host, _, port = address.rpartition(':')
    # jobs share ONE warm rater whose caches are not thread-safe
    # (decode-weight eviction, gc pause/resume): serialize them.  The
    # threaded server still answers /health //info concurrently.
    job_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ('/', '/info'):
                self._send(200, OCRD_TOOL)
            elif self.path == '/health':
                self._send(200, {'status': 'ok'})
            else:
                self._send(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/process':
                self._send(404, {'error': 'not found'})
                return
            try:
                n = int(self.headers.get('Content-Length', '0'))
                job = json.loads(self.rfile.read(n) or b'{}')
                with job_lock:
                    _run_job(job, params0, seed)
                self._send(200, {'state': 'SUCCESS'})
            except Exception as err:  # noqa: BLE001 — report any job error
                log.exception('job failed')
                self._send(500, {'state': 'FAILED', 'error': str(err)})

        def log_message(self, fmt, *args):
            log.info(fmt, *args)

    return ThreadingHTTPServer((host or '127.0.0.1', int(port)),
                               Handler)


@ocrd_keraslm_rate.command('worker')
@click.option('-q', '--queue', required=True,
              type=click.Path(file_okay=False),
              help='spool directory to poll for *.json job files')
@click.option('--poll-interval', default=0.5, show_default=True)
@click.option('--once', is_flag=True,
              help='process the jobs present now, then exit '
                   '(for tests/batch)')
@click.option('-p', '--parameter', default=None)
@click.option('-P', '--parameter-override', nargs=2, multiple=True)
@click.option('-l', '--log-level', default='INFO', show_default=True)
def worker_cmd(queue, poll_interval, once, parameter,
               parameter_override, log_level):
    """Queue worker: poll QUEUE for job files and process them.

    Each job is a JSON file {"mets": ..., "input_file_grp": ...,
    "output_file_grp": ..., "parameter": {...}}; on completion the
    worker renames it to ``<name>.done`` and writes
    ``<name>.result.json`` with {"state": "SUCCESS"|"FAILED", ...}.
    The model loads once; all jobs share the warm rater.
    """
    import time
    _setup_runtime(log_level, False, None, None)
    log = logging.getLogger('ocrd_keraslm_tpu.worker')
    params0 = _parse_params(parameter, parameter_override)
    seed = KerasRate(parameter=params0)
    seed.setup()
    os.makedirs(queue, exist_ok=True)
    log.info('worker polling %s', queue)
    while True:
        jobs = sorted(f for f in os.listdir(queue)
                      if f.endswith('.json')
                      and not f.endswith('.result.json'))
        if not jobs:
            if once:
                return
            time.sleep(poll_interval)
            continue
        for name in jobs:
            path = os.path.join(queue, name)
            claimed = path + '.claimed'
            try:
                os.rename(path, claimed)  # atomic claim
            except OSError:
                continue  # another worker took it
            result = {'state': 'SUCCESS'}
            try:
                with open(claimed, encoding='utf-8') as fh:
                    job = json.load(fh)
                _run_job(job, params0, seed)
            except Exception as err:  # noqa: BLE001 — job isolation
                log.exception('job %s failed', name)
                result = {'state': 'FAILED', 'error': str(err)}
            os.rename(claimed, path + '.done')
            with open(os.path.join(
                    queue, name[:-5] + '.result.json'), 'w',
                    encoding='utf-8') as fh:
                json.dump(result, fh)
            log.info('job %s: %s', name, result['state'])


if __name__ == '__main__':
    main()
