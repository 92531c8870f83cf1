# -*- coding: utf-8 -*-
"""Stand-alone CLI (``keraslm-rate`` equivalent).

Command set and options mirror the reference click group
(/root/reference/ocrd_keraslm/scripts/run.py:14-225): train (with
continuation from model/checkpoint), test, apply, generate,
print-history, print-charset, prune-charset, and the three embedding
plot commands; context argument parsed as ceil(year/10).
"""
from __future__ import annotations

import json
import os
import sys
from functools import partial
from math import ceil

import click

from .. import lib


class SortedGroup(click.Group):
    """Keep commands in a task-logical order (train first)."""

    def list_commands(self, ctx):
        commands = set(super().list_commands(ctx))
        ordered = ['train', 'test', 'apply', 'generate',
                   'print-history', 'print-charset', 'prune-charset',
                   'plot-char-embeddings-similarity',
                   'plot-context-embeddings-similarity',
                   'plot-context-embeddings-projection']
        ordered.extend(sorted(commands.difference(ordered)))
        return ordered


@click.group(cls=SortedGroup)
@click.option('-l', '--log-level', default='INFO', show_default=True,
              type=click.Choice(['DEBUG', 'INFO', 'WARNING', 'ERROR'],
                                case_sensitive=False))
@click.option('--profile', is_flag=True,
              help='enable host profiling (cProfile)')
@click.option('--profile-file', default=None,
              type=click.Path(dir_okay=False, writable=True),
              help='write host profile stats to this file')
@click.option('--jax-trace', default=None,
              type=click.Path(file_okay=False, writable=True),
              help='capture a device trace (jax.profiler) into this '
                   'directory, viewable in TensorBoard/Perfetto')
@click.pass_context
def cli(ctx, log_level, profile, profile_file, jax_trace):
    import logging as _logging
    _logging.basicConfig(
        level=getattr(_logging, log_level.upper(), _logging.INFO),
        format='%(asctime)s %(levelname)s %(name)s - %(message)s')
    # optional backend override (e.g. KERASLM_PLATFORM=cpu for fast
    # compiles / environments where the TPU plugin hijacks the default)
    platform = os.environ.get('KERASLM_PLATFORM')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    # multi-host: join the process group BEFORE anything touches the
    # XLA backend — Rater() queries jax.default_backend() at
    # construction, and jax.distributed.initialize refuses to run
    # after backend init (the train command's mesh handling is too
    # late; no-op when the env vars are unset)
    # KERASLM_PROCESS_ID alone must hit init_multihost's partial-config
    # rejection (not silently train independent models), and
    # KERASLM_MULTIHOST=1 forces the no-arg auto-detection path (TPU
    # pods, cloud clusters) where none of the explicit vars are set
    # KERASLM_MULTIHOST is a boolean flag: falsy spellings
    # ('0'/''/'false'/'no') count as unset, so KERASLM_MULTIHOST=0
    # does NOT trigger auto-detection.  The other three are values,
    # where '0' is meaningful (KERASLM_PROCESS_ID=0 is process zero
    # and must still reach the partial-config rejection).
    mh_flag = os.environ.get('KERASLM_MULTIHOST', '').strip().lower() \
        not in ('', '0', 'false', 'no')
    if mh_flag or any(os.environ.get(v) for v in (
            'KERASLM_COORDINATOR', 'KERASLM_NUM_PROCESSES',
            'KERASLM_PROCESS_ID')):
        from ..parallel.multihost import init_multihost
        try:
            init_multihost()
        except ValueError as err:  # partial KERASLM_* configuration
            raise click.UsageError(str(err))
        except RuntimeError as err:  # auto-detection failed
            raise click.UsageError(
                'multihost initialization failed: %s (KERASLM_'
                'MULTIHOST=1 relies on cluster auto-detection; set '
                'KERASLM_COORDINATOR/KERASLM_NUM_PROCESSES/'
                'KERASLM_PROCESS_ID explicitly otherwise)' % err)
    # profiling equivalent to the OCR-D core --profile/--profile-file
    # flags (reference README:190-191) + device-side tracing
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


def _expand_paths(items):
    out = []
    for item in items:
        if os.path.isdir(item):
            out.extend(sorted(
                os.path.join(item, f) for f in os.listdir(item)
                if os.path.isfile(os.path.join(item, f))))
        else:
            out.append(item)
    return out


def _parse_context(context):
    if not context:
        return None
    return [ceil(int(x) / 10) for x in context.split(' ')]


def _load_rater(model, incremental=False):
    rater = lib.Rater()
    rater.load_config(model)
    if incremental:
        rater.stateful = False
        rater.incremental = True
    rater.configure()
    rater.load_weights(model)
    return rater


@cli.command(short_help='train a language model')
@click.option('-m', '--model', default='model.h5', show_default=True,
              help='model file', type=click.Path(dir_okay=False,
                                                 writable=True))
@click.option('-C', '--ckpt', default='ckpt.h5', show_default=True,
              help='checkpoint file', type=click.Path(dir_okay=False))
@click.option('-w', '--width', default=128, show_default=True,
              help='number of nodes per hidden layer',
              type=click.IntRange(min=1, max=9128))
@click.option('-d', '--depth', default=2, show_default=True,
              help='number of hidden layers',
              type=click.IntRange(min=1, max=10))
@click.option('-l', '--length', default=256, show_default=True,
              help='number of previous characters seen (window size)',
              type=click.IntRange(min=1, max=1024))
@click.option('-v', '--val-data', default=None, show_default=True,
              help='validation data file or directory '
                   '(instead of automatic split)',
              type=click.Path(exists=True, dir_okay=True, file_okay=True))
@click.option('-e', '--epochs', default=100, show_default=True,
              help='maximum number of epochs (early-stopped)',
              type=click.IntRange(min=1, max=10000))
@click.option('-b', '--batch-size', default=128, show_default=True,
              help='parallel training streams (the reference pins '
                   '128, rating.py:49; larger batches raise TPU '
                   'throughput ~30%% at 512-1024 but take fewer '
                   'optimizer steps per epoch)',
              type=click.IntRange(min=1, max=65536))
@click.option('--bf16', is_flag=True,
              help='bfloat16 matmul operands in the recurrent core '
                   '(float32 cell state/softmax; faster on TPU)')
@click.option('--resume-dir', default=None,
              type=click.Path(file_okay=False),
              help='directory for full train-state snapshots '
                   '(params + Adam moments + RNG + history, Orbax): '
                   'every epoch is checkpointed and an interrupted '
                   'run resumes from the last completed epoch')
@click.option('--mesh', 'mesh_spec', default=None, metavar='DPxMP',
              help='shard the train step over a device mesh, e.g. '
                   '"4" (4-way data parallel), "4x2" (4-way data x '
                   '2-way model parallel), or "2x4p" (2-way data x '
                   '4-stage GPipe PIPELINE over the layer stack; '
                   'depth must divide by the stage count); requires '
                   'that many JAX devices and batch_size divisible '
                   'by DP')
@click.argument('data', nargs=-1,
                type=click.Path(exists=True, dir_okay=True,
                                file_okay=True))
def train(model, ckpt, width, depth, length, val_data, epochs,
          batch_size, bf16, resume_dir, mesh_spec, data):
    """Fit a char-LM of the given WIDTH/DEPTH/LENGTH on the DATA
    text files.

    Without VAL_DATA, a random train/validation split is made.
    """
    from .. import training
    training.EPOCHS = epochs

    rater = lib.Rater()
    continuation = None
    if os.path.isfile(model):
        rater.load_config(model)
        if rater.width == width and rater.depth == depth:
            continuation = partial(rater.load_weights, model)
            print('continuing training from saved model %s' % model)
        else:
            rater.status = 0
            print('warning: saved model %s has different topology '
                  '(width=%d, depth=%d) - starting fresh'
                  % (model, rater.width, rater.depth), file=sys.stderr)
    elif os.path.isfile(ckpt):
        continuation = partial(rater.load_weights, ckpt)
        print('continuing training from checkpoint %s' % ckpt)
    rater.width = width
    rater.depth = depth
    rater.length = length
    rater.batch_size = batch_size
    if resume_dir:
        rater.resume_dir = resume_dir
    if bf16:
        rater.compute_dtype = 'bfloat16'

    if mesh_spec:
        spec = mesh_spec.lower()
        import jax
        # an ACTIVE process group (joined at cli() entry, incl. the
        # KERASLM_MULTIHOST auto-detect path) or an explicit
        # configuration both count
        multihost = jax.process_count() > 1 or any(
            os.environ.get(v) for v in (
                'KERASLM_COORDINATOR', 'KERASLM_NUM_PROCESSES',
                'KERASLM_MULTIHOST'))
        try:
            parts = spec.split('x')
            pipe = parts[-1].endswith('p')
            if pipe:
                # "DPxPPp" (or "PPp" for dp=1): data x PIPELINE
                # stages (parallel/pipeline.py)
                pp = int(parts[-1][:-1])
                dp = int(parts[0]) if len(parts) > 1 else 1
                mp = 1
            else:
                dp = int(parts[0])
                mp = int(parts[1]) if len(parts) > 1 else 1
        except ValueError:
            raise click.UsageError(
                '--mesh expects DP, DPxMP or DPxPPp (e.g. "4", '
                '"4x2", "2x4p"), got %r' % mesh_spec)
        if pipe:
            if multihost:
                raise click.UsageError(
                    'pipeline meshes (--mesh %s) are single-host; '
                    'unset KERASLM_COORDINATOR/KERASLM_NUM_PROCESSES '
                    'or use a DPxMP mesh (multi-host dp/tp)'
                    % mesh_spec)
            from ..parallel.pipeline import make_pipe_mesh
            rater.mesh = make_pipe_mesh(n_devices=dp * pp,
                                        pipe_parallel=pp)
        elif multihost:
            # multi-host: join the process group and mesh over ALL
            # hosts' devices (model axis stays intra-host; see
            # parallel/multihost.py)
            from ..parallel.multihost import (init_multihost,
                                              make_global_mesh)
            init_multihost()
            rater.mesh = make_global_mesh(model_parallel=mp)
        else:
            from ..parallel import make_mesh
            rater.mesh = make_mesh(n_devices=dp * mp,
                                   model_parallel=mp)

    rater.configure()
    if continuation:
        continuation()
    val_files = _expand_paths([val_data]) if val_data else None
    trn_files = _expand_paths(data)
    rater.train(trn_files, val_data=val_files)
    assert rater.status == 2
    # ALL processes call save: the h5 writer's device→host gather is a
    # collective (process_allgather for model-sharded params) that
    # every process must enter; the file write itself is gated to
    # process 0 inside h5io (one writer per shared path — pod launches
    # run the identical command line, and thus the same -m, everywhere)
    rater.save(model)


@cli.command(short_help='get individual probabilities from language model')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.option('-c', '--context', default=None,
              help='constant meta-data input')
@click.argument('text', type=click.STRING)
def apply(model, text, context):
    """Rate TEXT with the model: per-character probabilities plus the
    overall perplexity.

    Pass '-' as TEXT to rate standard input instead.
    """
    rater = _load_rater(model)
    if text and text[0] == u'-':
        text = sys.stdin.read()
    ratings, perplexity = rater.rate2(text, _parse_context(context))
    click.echo(perplexity)
    click.echo(json.dumps(ratings, ensure_ascii=False))


@cli.command(short_help='get overall perplexity from language model')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.argument('data', nargs=-1,
                type=click.Path(exists=True, dir_okay=True,
                                file_okay=True))
def test(model, data):
    """Evaluate the model on the DATA text files and print the corpus
    perplexity."""
    rater = _load_rater(model)
    perplexity = rater.test(_expand_paths(data))
    click.echo(perplexity)


@cli.command(short_help='sample characters from language model')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.option('-n', '--number', default=1,
              help='number of characters to sample',
              type=click.IntRange(min=1, max=10000))
@click.option('-v', '--variants', default=1,
              help='number of character sequences to sample',
              type=click.IntRange(min=1, max=10000))
@click.option('-c', '--context', default=None,
              help='constant meta-data input')
@click.argument('prefix', type=click.STRING)
def generate(model, number, variants, context, prefix):
    """Sample the most probable continuations of PREFIX from the
    model (beam search)."""
    rater = _load_rater(model, incremental=True)
    context = _parse_context(context) or rater.underspecify_contexts()
    result = rater.generate(prefix, number, context, variants)
    for res in result:
        click.echo(prefix[:-1] + res)


@cli.command(short_help='Print the training history')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
def print_history(model):
    rater = lib.Rater()
    rater.load_config(model)
    rater.print_history()


@cli.command(short_help='Print the mapped characters')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
def print_charset(model):
    rater = lib.Rater()
    rater.load_config(model)
    rater.print_charset()


@cli.command(short_help='Delete one character from mapping')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True,
                              writable=True))
@click.argument('char')
def prune_charset(model, char):
    rater = _load_rater(model)
    if rater.remove_from_mapping(char=char):
        rater.save(model)


@cli.command(short_help='Paint a heat map of character embeddings')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.argument('filename', type=click.Path(dir_okay=False,
                                            writable=True))
def plot_char_embeddings_similarity(model, filename):
    rater = _load_rater(model)
    rater.plot_char_embeddings_similarity(filename)


@cli.command(short_help='Paint a heat map of context embeddings')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.option('-n', '--number', default=1,
              help='which context variable',
              type=click.IntRange(min=1, max=100))
@click.argument('filename', type=click.Path(dir_okay=False,
                                            writable=True))
def plot_context_embeddings_similarity(model, filename, number):
    rater = _load_rater(model)
    rater.plot_context_embeddings_similarity(filename, n=number)


@cli.command(short_help='Paint a 2-d PCA projection of context embeddings')
@click.option('-m', '--model', required=True, help='model file',
              type=click.Path(dir_okay=False, exists=True))
@click.option('-n', '--number', default=1,
              help='which context variable',
              type=click.IntRange(min=1, max=100))
@click.argument('filename', type=click.Path(dir_okay=False,
                                            writable=True))
def plot_context_embeddings_projection(model, filename, number):
    rater = _load_rater(model)
    rater.plot_context_embeddings_projection(filename, n=number)


if __name__ == '__main__':
    cli()
