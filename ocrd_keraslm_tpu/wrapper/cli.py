"""CLI for the ``ocrd-keraslm-rate`` processor.

Standalone click command carrying the standard OCR-D processor options
(-m/-I/-O/-p/-P/--overwrite; reference wrapper/cli.py wraps
``ocrd_cli_wrap_processor`` instead, which is unavailable here).
"""
from __future__ import annotations

import json
import logging
import os
import sys

import click

from .mets import Workspace
from .rate import OCRD_TOOL, KerasRate


@click.command()
@click.option('-m', '--mets', default='mets.xml', show_default=True,
              help='METS file or workspace directory')
@click.option('-I', '--input-file-grp', default='OCR-D-OCR',
              show_default=True)
@click.option('-O', '--output-file-grp', default='OCR-D-LM',
              show_default=True)
@click.option('-p', '--parameter', default=None,
              help='JSON file or string of processor parameters')
@click.option('-P', '--parameter-override', nargs=2, multiple=True,
              help='single parameter override (repeatable)')
@click.option('--overwrite', is_flag=True,
              help='overwrite existing output files')
@click.option('-J', '--dump-json', is_flag=True,
              help='print tool description and exit')
@click.option('-l', '--log-level', default='INFO', show_default=True)
@click.option('--profile', is_flag=True,
              help='enable host profiling (cProfile)')
@click.option('--profile-file', default=None,
              type=click.Path(dir_okay=False, writable=True),
              help='write host profile stats to this file')
@click.option('--jax-trace', default=None,
              type=click.Path(file_okay=False, writable=True),
              help='capture a device trace (jax.profiler) into this '
                   'directory')
def ocrd_keraslm_rate(mets, input_file_grp, output_file_grp, parameter,
                      parameter_override, overwrite, dump_json,
                      log_level, profile, profile_file, jax_trace):
    """Rate elements of the text with a character-level LSTM language
    model (TPU-native)."""
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
    if dump_json:
        click.echo(json.dumps(OCRD_TOOL, indent=2))
        return
    params = {}
    if parameter:
        if os.path.isfile(parameter):
            with open(parameter, encoding='utf-8') as fh:
                params = json.load(fh)
        else:
            params = json.loads(parameter)
    for key, value in parameter_override:
        schema = OCRD_TOOL['parameters'].get(key, {})
        if schema.get('type') == 'boolean':
            value = value.lower() in ('1', 'true', 'yes')
        elif schema.get('type') == 'number':
            value = float(value) if '.' in value else int(value)
        params[key] = value
    if overwrite:
        os.environ['OCRD_EXISTING_OUTPUT'] = 'OVERWRITE'
    directory = mets if os.path.isdir(mets) else os.path.dirname(mets) \
        or '.'
    workspace = Workspace(directory)
    processor = KerasRate(workspace=workspace,
                          input_file_grp=input_file_grp,
                          output_file_grp=output_file_grp,
                          parameter=params)
    processor.setup()
    processor.process_workspace(workspace)


if __name__ == '__main__':
    ocrd_keraslm_rate()
