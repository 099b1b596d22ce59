"""One-decorator CLI over spark-submit-able commands.

Reproduces the reference's ``@autocli`` contract
(`/root/reference/erde/__init__.py:171-337`): annotate a function's
parameters with ``DataFrame`` and the CLI opens the path argument via the
IO facade (``read_df``); a ``DataFrame`` return value appends a positional
``output-path`` argument and the result is written via ``write_df``.
Scalar annotations/defaults become typed options. The ``erde_spark``
entrypoint registers the same 9 subcommands as the reference: area,
buffer, convert, isochrone, length, osm, route, subset, table
(`/root/reference/erde/__init__.py:340-377`) — plus 32 curation
EXTENSIONS the reference has no equivalent for: dedup, quality, mix,
pack, scrub, extract, select, tokenize, fixenc, urlcanon,
boilerplate, robots, langid, capdomains, linededup, bitext, wds,
tfexport, ppl, megexport, shuffle, unimax, curate, fim, chat,
entropy, spancorrupt, ul2, semdedup, wsample, d4, decon (the
training-data pipeline from the shell).

Execution is lazy end-to-end: the command builds one DataFrame graph
(scan -> operator -> write) and Catalyst plans it — the reference's
reader/writer background processes dissolve into Spark stages.
"""

from __future__ import annotations

import argparse
import inspect
import os
import sys
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame

from erde_spark.io import read_df, write_df
from erde_spark.streaming.chunks import read_stream, write_stream


class AutocliError(TypeError):
    """Invalid input x function x output combination (the reference's
    ``ErdeDecoratorError``, `/root/reference/erde/__init__.py:217-243`:
    of the 12 combos, generators must write to a stream, and a stream
    input cannot collapse back to a single returned DataFrame)."""


def dprint(*args, **kwargs):
    """Debug logging gated on ``ELOG=1`` (reference ``dprint``,
    `/root/reference/erde/__init__.py:25-28`)."""
    if os.environ.get('ELOG') == '1':
        print(*args, file=sys.stderr, **kwargs)


@contextmanager
def debug_capture():
    """Post-mortem debugger on command failure when ``IPDB=1`` or
    ``PUDB=1`` (reference `/root/reference/erde/__init__.py:36-47`).
    ipdb/pudb aren't in this container, so stdlib pdb is the fallback;
    the exception always re-raises after the debugger exits."""
    try:
        yield
    except Exception:
        want = os.environ.get('IPDB') == '1' or os.environ.get('PUDB') == '1'
        if want:
            import traceback
            traceback.print_exc()
            try:
                if os.environ.get('PUDB') == '1':
                    import pudb
                    pudb.post_mortem()
                else:
                    import ipdb
                    ipdb.post_mortem()
            except ImportError:
                import pdb
                pdb.post_mortem()
        raise


def _add_param(parser: argparse.ArgumentParser, name: str, param: inspect.Parameter):
    cli_name = name.replace('_', '-')
    ann = param.annotation
    has_default = param.default is not inspect.Parameter.empty
    if ann is DataFrame:
        parser.add_argument(name, metavar=cli_name, help=f'input path for {name}')
        return 'df'
    if ann is read_stream:
        parser.add_argument(name, metavar=cli_name,
                            help=f'input path for {name} (chunk stream)')
        return 'stream'
    if param.kind == inspect.Parameter.VAR_POSITIONAL:
        parser.add_argument(name, nargs='+')
        return 'var'
    typ = ann if ann in (int, float, str) else None
    if typ is None and has_default and param.default is not None:
        typ = type(param.default)
    if typ is bool or isinstance(param.default, bool):
        parser.add_argument(f'--{cli_name}', dest=name, default=bool(param.default),
                            action='store_false' if param.default else 'store_true')
        return 'flag'
    if has_default:
        parser.add_argument(f'--{cli_name}', dest=name, type=typ or str,
                            default=param.default)
    else:
        parser.add_argument(name, metavar=cli_name, type=typ or str)
    return 'opt'


def autocli(func):
    """Attach an argparse builder + runner to ``func``.

    ``func.cli(argv)`` parses arguments, opens DataFrame-annotated params
    from paths, runs, and writes a returned DataFrame to the trailing
    ``output-path`` argument.
    """
    # eval_str: PEP 563 stringified annotations must resolve to real types
    sig = inspect.signature(func, eval_str=True)
    returns_df = sig.return_annotation is DataFrame
    returns_stream = sig.return_annotation is write_stream
    is_gen = inspect.isgeneratorfunction(func)
    stream_params = [n for n, p in sig.parameters.items()
                     if p.annotation is read_stream]

    # the reference's forbidden combinations (input x func x output;
    # `/root/reference/erde/__init__.py:217-243`, validated in its
    # tests/test_command.py bad1/bad2/bad3)
    if len(stream_params) > 1:
        raise AutocliError(
            f'{func.__name__}: at most one read_stream input is allowed')
    if is_gen and not returns_stream:
        raise AutocliError(
            f'{func.__name__}: a generator function must be annotated '
            '-> write_stream (yielded chunks need an append sink; combos '
            'gen x nothing and gen x df are forbidden)')
    if stream_params and returns_df:
        raise AutocliError(
            f'{func.__name__}: a read_stream input cannot return a single '
            'DataFrame; annotate -> write_stream (combo stream x func x df '
            'is forbidden)')

    def build(parser: argparse.ArgumentParser):
        kinds = {}
        for name, param in sig.parameters.items():
            kinds[name] = _add_param(parser, name, param)
        if returns_df or returns_stream:
            parser.add_argument('output_path', metavar='output-path',
                                help='where to write the result')
        parser.set_defaults(__func=func, __kinds=kinds, __returns_df=returns_df,
                            __returns_stream=returns_stream, __is_gen=is_gen,
                            __sig=sig)
        return parser

    def cli(argv=None):
        parser = build(argparse.ArgumentParser(prog=func.__name__,
                                               description=func.__doc__))
        ns = parser.parse_args(argv)
        return run_parsed(ns)

    func.build_parser = build
    func.cli = cli
    return func


def run_parsed(ns: argparse.Namespace):
    """Execute a parsed autocli command namespace."""
    func = ns.__func
    sig = ns.__sig
    t0 = time.time()
    args = []
    kwargs = {}
    for name, param in sig.parameters.items():
        kind = ns.__kinds[name]
        val = getattr(ns, name)
        if kind == 'df':
            val = read_df(val)
        elif kind == 'stream':
            val = read_stream(val)
        if kind == 'var':
            args.extend(val)
        elif param.default is inspect.Parameter.empty:
            args.append(val)
        else:
            kwargs[name] = val
    with debug_capture():
        result = func(*args, **kwargs)
        if ns.__returns_stream:
            # generator: append every yielded chunk; plain func: write once.
            # write_stream's context removes partial output on failure.
            with write_stream(ns.output_path) as w:
                if ns.__is_gen:
                    for chunk in result:
                        w(chunk)
                        dprint(f'{func.__name__}: chunk appended -> {ns.output_path}')
                elif result is not None:
                    w(result)
            result = None
        elif ns.__returns_df and result is not None:
            write_df(result, ns.output_path)
    print(f'{func.__name__} finished in {time.time() - t0:.1f}s', file=sys.stderr)
    return result


# ---------------------------------------------------------------- commands

@autocli
def area(input_data: DataFrame, column_name: str = 'area',
         skip_transform: bool = False, nullify_irrelevant: bool = False,
         default_crs: int = 4326) -> DataFrame:
    """Add a metric-area column."""
    from erde_spark.operators.area import area as _area
    return _area(input_data, column_name, skip_transform, nullify_irrelevant,
                 default_crs)


@autocli
def buffer(input_data: DataFrame, radius: float, dissolve: bool = False,
           resolution: int = 16, default_crs: int = 4326) -> DataFrame:
    """Replace geometry with its metric buffer."""
    from erde_spark.operators.buffer import buffer as _buffer
    return _buffer(input_data, radius, dissolve, default_crs, resolution)


@autocli
def convert(input_data: DataFrame, to_crs: int = None, from_crs: int = None) -> DataFrame:
    """Set and/or reproject the CRS."""
    from erde_spark.operators.convert import convert as _convert
    return _convert(input_data, to_crs, from_crs)


@autocli
def length(input_data: DataFrame, column_name: str = 'length',
           skip_transform: bool = False, nullify_irrelevant: bool = False,
           default_crs: int = 4326) -> DataFrame:
    """Add a metric-length column."""
    from erde_spark.operators.length import length as _length
    return _length(input_data, column_name, skip_transform, nullify_irrelevant,
                   default_crs)


@autocli
def subset(input_data: DataFrame, columns: str) -> DataFrame:
    """Rename/drop/keep/assert columns with the subset DSL."""
    from erde_spark.operators.subset import subset as _subset
    return _subset(input_data, columns)


@autocli
def route(input_data: DataFrame, mode: str, overview: str = 'full',
          annotations: str = 'duration,distance', alternatives: int = 1,
          retries: int = 10) -> DataFrame:
    """Route each row's waypoint LineString via OSRM."""
    from erde_spark.routing.route import route_df
    return route_df(input_data, mode, overview, annotations, alternatives, retries)


@autocli
def table(sources: DataFrame, destinations: DataFrame, router: str,
          annotations: str = 'duration', mts: int = 2000,
          keep_columns: str = None) -> DataFrame:
    """OD matrix between source and destination points."""
    from pyspark.sql import functions as F

    from erde_spark.routing.table import od_table_lines
    keep = keep_columns.split(',') if keep_columns else None
    src = sources.withColumn('sid', F.monotonically_increasing_id())
    dst = destinations.withColumn('did', F.monotonically_increasing_id())
    return od_table_lines(src, dst, router, keep_columns=keep,
                          max_table_size=mts, annotations=annotations)


@autocli
def isochrone(sources: DataFrame, router: str, durations: str, speed: float,
              grid_density: float = 1.0, max_snap: float = 250.0,
              mts: int = 2000) -> DataFrame:
    """Isochrone MultiPolygons per source point and duration level."""
    from pyspark.sql import functions as F

    from erde_spark.routing.isochrone import isochrones
    levels = [float(d) for d in str(durations).split(',')]
    src = sources.withColumn('sid', F.monotonically_increasing_id())
    return isochrones(src, router, levels, speed, grid_density, max_snap, mts)


@autocli
def osm(*filenames, layers: str = 'points,lines,multipolygons', tags: str = None,
        crop: str = None, columns: str = None, keep_tmp_files: bool = False,
        dry: bool = False):
    """Filter/crop/merge/convert OSM files via osmium + ogr2ogr."""
    from erde_spark.io.osm import run_osm_pipeline
    return run_osm_pipeline(
        *filenames, dry=dry, keep_tmp_files=keep_tmp_files, layers=layers,
        tags=tags.split(',') if tags else None, crop=crop,
        columns=columns.split(';') if columns else None)


# -- curation extensions (beyond the reference's 9 geo subcommands) ------

@autocli
def dedup(input_data: DataFrame, strategy: str = 'cluster',
          threshold: float = 0.9, id_column: str = 'doc_id',
          text_column: str = 'text') -> DataFrame:
    """Deduplicate documents: 'exact' (normalized-text fingerprint),
    'cluster' (one survivor per MinHash-LSH near-dup component) or
    'pairs' (the verified near-dup pair list itself)."""
    from erde_spark.scale.dedup import (dedup_clusters, exact_dedup,
                                        minhash_lsh_pairs)
    if strategy == 'exact':
        keep = exact_dedup(input_data, id_column, text_column)
        return input_data.join(keep.select(id_column), id_column, 'left_semi')
    if strategy == 'cluster':
        return dedup_clusters(input_data, id_column, text_column, threshold)
    if strategy == 'pairs':
        return minhash_lsh_pairs(input_data, id_column, text_column, threshold)
    raise AutocliError(f'unknown dedup strategy {strategy!r} '
                       "(use 'exact', 'cluster' or 'pairs')")


@autocli
def quality(input_data: DataFrame, text_column: str = 'text',
            keep_flags: bool = False) -> DataFrame:
    """Keep rows passing the Gopher-style quality gates."""
    from erde_spark.scale.text import quality_filter
    return quality_filter(input_data, text_column, keep_flags)


@autocli
def mix(input_data: DataFrame, weights: str, group_column: str = 'lang',
        id_column: str = 'doc_id') -> DataFrame:
    """Rebalance to target group proportions; weights like
    'en=0.4,de=0.2,fr=0.2' (deterministic hash-rank quotas)."""
    from erde_spark.scale.sampling import target_mix
    parsed = {}
    for part in weights.split(','):
        g, _, v = part.partition('=')
        try:
            parsed[g.strip()] = float(v)
        except ValueError:
            raise AutocliError(
                f'bad weights fragment {part!r}: expected comma-separated '
                "group=number pairs, e.g. 'en=0.4,de=0.2,fr=0.2'")
    return target_mix(input_data, group_column, id_column, parsed)


@autocli
def unimax(input_data: DataFrame, budget: float, max_epochs: int = 4,
           group_column: str = 'lang', id_column: str = 'doc_id',
           weight_column: str = '', salt: str = '',
           materialize: bool = False) -> DataFrame:
    """UniMax language sampling: equal budget per group capped at
    --max-epochs passes, freed budget redistributed uniformly; budget
    counts rows (or sum of --weight-column, e.g. token counts).
    Default output adds n_full_epochs + frac_kept; --materialize
    explodes to one row per (doc, epoch)."""
    from erde_spark.scale.sampling import unimax_mix
    return unimax_mix(input_data, group_column, id_column, budget,
                      max_epochs, weight_col=weight_column or None,
                      salt=salt, materialize=materialize)


@autocli
def pack(input_data: DataFrame, max_tokens: int = 2048,
         shard_column: str = None, id_column: str = 'doc_id',
         text_column: str = 'text') -> DataFrame:
    """Concat-then-chunk sequence-packing offsets per shard."""
    from erde_spark.scale.text import pack_offsets
    return pack_offsets(input_data, id_column, text_column, max_tokens,
                        shard_column)


@autocli
def scrub(input_data: DataFrame, text_column: str = 'text',
          types: str = 'email,credit_card,phone,ipv4',
          redaction: str = '[PII]') -> DataFrame:
    """Redact PII (emails/cards/phones/IPs) and count spans per type."""
    from erde_spark.scale.text import PII_PATTERNS, pii_scrub
    wanted = tuple(t.strip() for t in types.split(',') if t.strip())
    bad = [t for t in wanted if t not in PII_PATTERNS]
    if bad:
        raise AutocliError(f'unknown PII types {bad}: '
                           f'choose from {sorted(PII_PATTERNS)}')
    return pii_scrub(input_data, text_column, wanted, redaction)


@autocli
def extract(input_data: DataFrame, html_column: str = 'html',
            text_only: bool = False) -> DataFrame:
    """Strip HTML to visible text (plus title/links/text_ratio report;
    --text-only keeps just the id columns and extracted text)."""
    from erde_spark.scale.html import html_extract
    out = html_extract(input_data, html_column)
    if text_only:
        carry = [c for c in input_data.columns if c != html_column]
        return out.select(*carry, 'text')
    return out


@autocli
def select(input_data: DataFrame, target_data: DataFrame, k: int,
           id_column: str = 'doc_id', text_column: str = 'text',
           gumbel: bool = True) -> DataFrame:
    """DSIR data selection: the k raw documents most like the target
    corpus under hashed-n-gram importance weights."""
    from erde_spark.scale.dsir import dsir_topk
    return dsir_topk(input_data, target_data, k, id_column, text_column,
                     gumbel=gumbel)


@autocli
def tokenize(input_data: DataFrame, n_merges: int = 100,
             text_column: str = 'text', emit: str = 'merges',
             id_column: str = 'doc_id') -> DataFrame:
    """Train a BPE tokenizer on the corpus ('merges' emits the learned
    merge table; 'tokens' additionally encodes every document)."""
    from erde_spark.scale.bpe import bpe_encode, bpe_train, merges_df
    merges = bpe_train(input_data, n_merges, text_column)
    if emit == 'merges':
        return merges_df(input_data.sparkSession, merges)
    if emit == 'tokens':
        return bpe_encode(input_data, merges, id_column, text_column)
    raise AutocliError(f"unknown emit {emit!r} (use 'merges' or 'tokens')")


@autocli
def fixenc(input_data: DataFrame, text_column: str = 'text') -> DataFrame:
    """Repair UTF-8-as-Latin-1 mojibake in a text column (conditional,
    signature-gated; clean text is untouched)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.text import fix_mojibake
    return input_data.withColumn(text_column,
                                 fix_mojibake(F.col(text_column)))


@autocli
def urlcanon(input_data: DataFrame, url_column: str = 'url',
             output_column: str = 'canon_url') -> DataFrame:
    """Append the canonical dedup-key form of a URL column (case,
    default ports, tracking params, fragments, trailing slashes)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.text import canonicalize_url
    return input_data.withColumn(output_column,
                                 canonicalize_url(F.col(url_column)))


@autocli
def boilerplate(input_data: DataFrame, min_count: int = 3,
                id_column: str = 'doc_id',
                text_column: str = 'text') -> DataFrame:
    """Remove lines repeated in >= min-count documents corpus-wide
    (CCNet-style nav/footer/banner stripping), order preserved."""
    from erde_spark.scale.text import remove_boilerplate_lines
    return remove_boilerplate_lines(input_data, min_count,
                                    id_col=id_column,
                                    text_col=text_column)


@autocli
def langid(input_data: DataFrame, id_column: str = 'doc_id',
           text_column: str = 'text',
           prefix_chars: int = 200) -> DataFrame:
    """Tag each document with its language (30 languages / 9 scripts,
    char-n-gram NB, broadcast-model scoring): appends lang +
    lang_score columns."""
    from erde_spark.scale.langid import identify_language
    tags = identify_language(input_data, id_col=id_column,
                             text_col=text_column,
                             prefix_chars=prefix_chars)
    # overwrite any pre-existing lang/lang_score (the documents contract
    # already carries `lang`) so the join never emits duplicate columns
    return input_data.drop('lang', 'lang_score').join(
        tags.withColumnRenamed('id', id_column), id_column, 'left')


@autocli
def capdomains(input_data: DataFrame, key_column: str = 'domain',
               cap: int = 1000, id_column: str = 'doc_id',
               salt: str = '') -> DataFrame:
    """Keep at most cap documents per key (domain-frequency
    downsampling, deterministic hash order; skew-aware — under-cap
    keys pass through without entering the window)."""
    from erde_spark.scale.sampling import cap_per_key
    return cap_per_key(input_data, key_column, cap,
                       id_col=id_column, salt=salt)


@autocli
def linededup(input_data: DataFrame, id_column: str = 'doc_id',
              text_column: str = 'text', separator: str = '\n',
              min_line_chars: int = 5) -> DataFrame:
    """Remove lines repeated WITHIN each document (first occurrence
    kept, order preserved; lines shorter than min-line-chars after
    trimming pass through) — the within-doc counterpart of
    boilerplate."""
    from erde_spark.scale.text import dedup_lines_within_doc
    return dedup_lines_within_doc(input_data, id_col=id_column,
                                  text_col=text_column, sep=separator,
                                  min_line_chars=min_line_chars)


@autocli
def bitext(input_data: DataFrame, target_data: DataFrame, k: int = 4,
           threshold: float = 1.04, method: str = 'exact',
           id_column: str = 'vec_id',
           vector_column: str = 'embedding') -> DataFrame:
    """Mine parallel (translation) pairs between two embedded corpora
    by ratio margin (Artetxe & Schwenk 2019) — returns src-id/tgt-id/
    cosine/margin for pairs at or above the margin threshold."""
    from erde_spark.scale.similarity import bitext_mine
    return bitext_mine(input_data, target_data, k=k, threshold=threshold,
                       method=method, id_col=id_column,
                       vec_col=vector_column)


@autocli
def wds(input_data: DataFrame, output_dir: str, key_column: str = 'doc_id',
        shard_size: int = 10000):
    """Export to WebDataset tar shards (the tar-of-samples
    training-loader format): string columns become .txt members,
    binary .bin, everything else .json, keyed by key-column."""
    from erde_spark.io.wds import write_webdataset
    write_webdataset(input_data, output_dir, key_col=key_column,
                     shard_size=shard_size)


@autocli
def tfexport(input_data: DataFrame, output_dir: str,
             key_column: str = 'doc_id'):
    """Export to TFRecord files of tf.train.Example records (feature
    kinds inferred: string/binary -> bytes, integral -> int64,
    fractional -> float; CRC-32C framing per the published spec)."""
    from erde_spark.io.tfrecord import write_tfrecord
    write_tfrecord(input_data, output_dir, key_col=key_column)


@autocli
def megexport(input_data: DataFrame, output_dir: str,
              tokens_column: str = 'tokens', dtype: str = 'int32'):
    """Export a token-array column to Megatron-LM/fairseq indexed-
    dataset shard pairs (.bin/.idx, the memory-mapped binarized-token
    format; dtype one of uint8/int8/int16/int32/int64/uint16/float64,
    bounds-checked)."""
    from erde_spark.io.megatron import write_megatron
    write_megatron(input_data, output_dir, tokens_col=tokens_column,
                   dtype=dtype)


@autocli
def zarrexport(input_data: DataFrame, output_dir: str,
               value_column: str = 'value', chunk_rows: int = 4096,
               compressor: str = 'zlib'):
    """Export a constant-width numeric array column as a Zarr v2
    chunked array directory (one chunk file per row band; stdlib
    zlib/gzip or no compression — blosc is refused at read time with
    the numcodecs.Zlib recipe)."""
    from erde_spark.io.zarr import write_zarr
    write_zarr(input_data, output_dir, value_col=value_column,
               chunk_rows=chunk_rows,
               compressor=None if compressor in ('', 'none', 'null')
               else compressor)


@autocli
def shuffle(input_data: DataFrame, id_column: str = 'doc_id',
            salt: str = '', buckets: int = 1024) -> DataFrame:
    """Assign a reproducible global training-order position
    (shuffle_pos, dense 0-based md5 rank — same permutation on any
    engine at any parallelism; vary --salt per epoch)."""
    from erde_spark.scale.sampling import shuffle_deterministic
    return shuffle_deterministic(input_data, id_column, salt=salt,
                                 buckets=buckets)


@autocli
def ppl(input_data: DataFrame, train_path: str = '', n: int = 3,
        min_count: int = 2, max_perplexity: float = 0.0,
        bucket: bool = False, lang_column: str = 'lang',
        id_column: str = 'doc_id', text_column: str = 'text') -> DataFrame:
    """Score (or filter, or bucket) documents by stupid-backoff n-gram
    LM perplexity, CCNet-style: the LM trains on --train-path
    (default: the input itself); with --max-perplexity > 0 the output
    is the filtered input; with --bucket it is the score table plus
    the per-language head/middle/tail split on --lang-column;
    otherwise the per-document score table."""
    from erde_spark.scale.lm import (perplexity_buckets,
                                     perplexity_filter,
                                     score_perplexity, train_ngram_lm)
    train = (read_df(train_path, input_data.sparkSession)
             if train_path else input_data)
    lm = train_ngram_lm(train, text_col=text_column, n=n,
                        min_count=min_count)
    if max_perplexity > 0:
        return perplexity_filter(input_data, lm, max_perplexity,
                                 id_col=id_column, text_col=text_column)
    scored = score_perplexity(input_data, lm, id_col=id_column,
                              text_col=text_column)
    if not bucket:
        return scored
    if lang_column not in input_data.columns:
        raise AutocliError(f'--bucket needs column {lang_column!r} '
                           '(set --lang-column)')
    scored = scored.join(
        input_data.select(id_column, lang_column), id_column)
    return perplexity_buckets(scored, lang_col=lang_column,
                              id_col=id_column)


@autocli
def curate(input_data: DataFrame, steps: str = '', langs: str = 'en',
           dedup_mode: str = 'exact', dedup_threshold: float = 0.8,
           min_ratio: float = 1.05, max_ratio: float = 12.0,
           id_column: str = 'doc_id',
           text_column: str = 'text') -> DataFrame:
    """Run the standard curation pipeline (normalize -> langid ->
    quality -> compression -> pii -> dedup) in one fused plan; --steps
    is a comma list to run a subset (order is fixed), --langs the
    comma list the language gate keeps ('' keeps all, tagged)."""
    from erde_spark.scale.pipeline import CURATE_STEPS
    from erde_spark.scale.pipeline import curate as _curate
    step_list = tuple(s.strip() for s in steps.split(',')
                      if s.strip()) or CURATE_STEPS
    lang_list = tuple(s.strip() for s in langs.split(',')
                      if s.strip()) or None
    return _curate(input_data, steps=step_list, id_col=id_column,
                   text_col=text_column, langs=lang_list,
                   min_ratio=min_ratio, max_ratio=max_ratio,
                   dedup=dedup_mode, dedup_threshold=dedup_threshold)


@autocli
def fim(input_data: DataFrame, rate: float = 0.5, salt: str = '',
        mode: str = 'psm', id_column: str = 'doc_id',
        text_column: str = 'text') -> DataFrame:
    """Fill-in-the-middle augmentation for code-model training: a
    --rate fraction of documents (md5-selected, reproducible) is
    rewritten as sentinel-delimited prefix/suffix/middle triples
    (--mode psm or spm); adds fim_text + fim_applied."""
    from erde_spark.scale.text import fim_transform
    return fim_transform(input_data, id_col=id_column,
                         text_col=text_column, rate=rate, salt=salt,
                         mode=mode)


@autocli
def spancorrupt(input_data: DataFrame, noise_density: float = 0.15,
                mean_span: float = 3.0, salt: str = '',
                id_column: str = 'doc_id',
                text_column: str = 'text') -> DataFrame:
    """T5-style span corruption: mask ~--noise-density of each
    document's tokens in spans of ~--mean-span, appending the
    sentinel-masked inputs and the span targets (deterministic;
    vary --salt per epoch)."""
    from erde_spark.scale.text import span_corrupt
    return span_corrupt(input_data, id_col=id_column,
                        text_col=text_column,
                        noise_density=noise_density,
                        mean_span=mean_span, salt=salt)


@autocli
def ul2(input_data: DataFrame, r_weight: float = 0.5,
        s_weight: float = 0.25, x_weight: float = 0.25,
        x_density: float = 0.5, x_mean_span: float = 8.0,
        salt: str = '', id_column: str = 'doc_id',
        text_column: str = 'text') -> DataFrame:
    """UL2 mixture-of-denoisers: md5-assign each document to R
    (regular span corruption), S (prefix-LM) or X (extreme) by the
    given weights and append denoiser/inputs/targets with the
    paradigm tags."""
    from erde_spark.scale.text import ul2_mix
    return ul2_mix(input_data, id_col=id_column, text_col=text_column,
                   r_weight=r_weight, s_weight=s_weight,
                   x_weight=x_weight, x_density=x_density,
                   x_mean_span=x_mean_span, salt=salt)


@autocli
def semdedup(input_data: DataFrame, threshold: float = 0.95,
             n_clusters: int = 0, keep: str = 'far',
             max_cluster: int = 0, id_column: str = 'vec_id',
             vector_column: str = 'embedding') -> DataFrame:
    """SemDeDup semantic dedup over an embedding column: kmeans-
    cluster-scoped cosine duplicate groups, one survivor per group
    ('far' = the paper's lowest-centroid-similarity policy, 'min' =
    minimum id). n_clusters 0 means ~sqrt(n); max_cluster > 0 caps
    per-task cluster size via deterministic sign-bit sub-splits."""
    from erde_spark.scale.dedup import semdedup as _sd
    return _sd(input_data, id_col=id_column, vec_col=vector_column,
               threshold=threshold, n_clusters=n_clusters or None,
               keep=keep, max_cluster=max_cluster or None)


@autocli
def d4(input_data: DataFrame, threshold: float = 0.95,
       proto_frac: float = 0.25, n_clusters: int = 0,
       max_cluster: int = 0, id_column: str = 'vec_id',
       vector_column: str = 'embedding') -> DataFrame:
    """D4 data selection (SemDeDup then drop the proto_frac most
    PROTOTYPICAL members of each re-clustered survivor cluster —
    highest centroid cosine): the dedup-plus-diversify pipeline of
    arXiv:2308.12284. n_clusters 0 means ~sqrt(n)."""
    from erde_spark.scale.dedup import d4_select
    return d4_select(input_data, id_col=id_column,
                     vec_col=vector_column, threshold=threshold,
                     proto_frac=proto_frac,
                     n_clusters=n_clusters or None,
                     max_cluster=max_cluster or None)


@autocli
def decon(input_data: DataFrame, eval_data: DataFrame, n: int = 13,
          id_column: str = 'doc_id', text_column: str = 'text',
          fpp: float = 0.01) -> DataFrame:
    """Benchmark decontamination, bloom-prefiltered: drop every corpus
    document sharing a word n-gram (default 13, the GPT-3/PaLM
    overlap size) with the eval set. The Bloom prefilter broadcasts
    ~10 bits per eval n-gram and candidates are exact-verified, so the
    output equals the exact anti-join at any fpp."""
    from erde_spark.scale.bloom import decontaminate_bloom
    return decontaminate_bloom(input_data, eval_data, n=n,
                               id_col=id_column, text_col=text_column,
                               fpp=fpp)


@autocli
def wsample(input_data: DataFrame, n: int, weight_column: str,
            id_column: str = 'doc_id', salt: str = '') -> DataFrame:
    """Weighted sample WITHOUT replacement (Efraimidis-Spirakis):
    exactly n rows, inclusion proportional to weight, deterministic
    given the salt."""
    from erde_spark.scale.sampling import weighted_sample
    return weighted_sample(input_data, id_column, weight_column, n,
                           salt=salt)


@autocli
def chat(input_data: DataFrame, turns_column: str = 'turns',
         template: str = 'chatml', id_column: str = 'conv_id',
         spans: bool = False, validate: bool = False,
         max_chars: int = 0) -> DataFrame:
    """SFT conversation prep over an array<struct<role,content>>
    column: render the chat template (default), or emit the
    assistant loss-mask character spans (--spans), or filter to
    structurally valid conversations (--validate); --max-chars > 0
    first truncates to whole tail turns within the budget."""
    from erde_spark.scale.sft import (assistant_spans, render_chat,
                                      truncate_turns, validate_turns)
    df = input_data
    if max_chars > 0:
        df = truncate_turns(df, turns_col=turns_column,
                            max_chars=max_chars, template=template) \
            .drop(turns_column) \
            .withColumnRenamed('turns_kept', turns_column)
    if validate:
        return validate_turns(df, turns_col=turns_column) \
            .filter('turns_valid').drop('turns_valid')
    if spans:
        return assistant_spans(df, id_col=id_column,
                               turns_col=turns_column,
                               template=template)
    return render_chat(df, turns_col=turns_column, template=template)


@autocli
def entropy(input_data: DataFrame, min_ratio: float = 1.1,
            max_ratio: float = 12.0, level: int = 6,
            text_column: str = 'text',
            filter_rows: bool = False) -> DataFrame:
    """zlib compression-ratio quality signal: append the ratio column
    (default) or keep only rows inside the [--min-ratio, --max-ratio]
    band (--filter-rows) — high ratio = machine repetition, ~1 =
    binary/base64 spill."""
    from erde_spark.scale.text import compression_filter, compression_ratio
    if filter_rows:
        return compression_filter(input_data, text_col=text_column,
                                  min_ratio=min_ratio,
                                  max_ratio=max_ratio, level=level)
    return compression_ratio(input_data, text_col=text_column,
                             level=level)


@autocli
def snapshot(dataset: str, action: str = 'stats', keep_last: int = 1,
             min_bytes: int = 32 << 20, target_bytes: int = 128 << 20):
    """Inspect or maintain a manifested parquet dataset (*.mparquet,
    io/manifest.py — versioned manifests + atomic pointer commit):
    action 'stats' (latest-snapshot metadata without touching a data
    byte), 'versions' (every readable snapshot), 'vacuum' (delete
    data files unreferenced by the newest --keep-last snapshots) or
    'compact' (rewrite files under --min-bytes into ~--target-bytes
    files as a new snapshot). The data plane needs no dedicated
    command: every subcommand's input/output paths dispatch
    *.mparquet through the facade."""
    import json
    from erde_spark.io import manifest as m
    if action == 'stats':
        out = m.manifest_stats(dataset)
    elif action == 'versions':
        out = m.manifest_versions(dataset)
    elif action == 'vacuum':
        out = {'removed': m.vacuum_manifest(dataset, keep_last=keep_last)}
    elif action == 'compact':
        out = {'version': m.compact_manifest(dataset, min_bytes=min_bytes,
                                             target_bytes=target_bytes)}
    else:
        raise ValueError(f'unknown snapshot action {action!r} '
                         "(use 'stats', 'versions', 'vacuum' or "
                         "'compact')")
    print(json.dumps(out))
    return out


@autocli
def robots(input_data: DataFrame, robots_data: DataFrame,
           url_column: str = 'url', agent: str = '*') -> DataFrame:
    """Keep only documents whose URL the host's robots.txt allows
    (RFC 9309 longest-match; robots-data needs domain + robots_txt
    columns)."""
    from erde_spark.scale.robots import parse_robots, robots_filter
    rules = parse_robots(robots_data, agent=agent)
    return robots_filter(input_data, rules, url_col=url_column)


COMMANDS = {
    'area': area, 'buffer': buffer, 'convert': convert, 'isochrone': isochrone,
    'length': length, 'osm': osm, 'route': route, 'subset': subset, 'table': table,
    # extensions: the curation pipeline from the shell
    'dedup': dedup, 'quality': quality, 'mix': mix, 'pack': pack,
    'scrub': scrub, 'extract': extract, 'select': select, 'tokenize': tokenize,
    'fixenc': fixenc, 'urlcanon': urlcanon, 'boilerplate': boilerplate,
    'robots': robots, 'langid': langid, 'capdomains': capdomains,
    'linededup': linededup, 'bitext': bitext, 'wds': wds,
    'tfexport': tfexport, 'ppl': ppl, 'megexport': megexport,
    'shuffle': shuffle, 'unimax': unimax, 'fim': fim, 'chat': chat,
    'entropy': entropy, 'curate': curate, 'spancorrupt': spancorrupt,
    'ul2': ul2, 'semdedup': semdedup, 'wsample': wsample, 'd4': d4,
    'decon': decon, 'zarrexport': zarrexport, 'snapshot': snapshot,
}


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(
        prog='erde_spark',
        description='PySpark-native geospatial/analytics toolkit CLI')
    sub = parser.add_subparsers(dest='command', required=True)
    for name, fn in COMMANDS.items():
        fn.build_parser(sub.add_parser(name, help=(fn.__doc__ or '').strip()))
    ns = parser.parse_args(argv)
    return run_parsed(ns)


if __name__ == '__main__':
    entrypoint()
