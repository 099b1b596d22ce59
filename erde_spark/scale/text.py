"""Text analysis over document tables: tokenization, quality scoring,
language ID, fingerprinting.

Scoring/ID/fingerprint are JVM-side built-ins (``F.split`` / ``F.filter``
/ regex / ``F.md5``) — no Python in the hot path, so the scan → score
pipeline stays inside whole-stage codegen and scales linearly with
executors. Winnowing fingerprints are the one numpy-vectorized pandas UDF
(rolling hashes aren't SQL-expressible). Designed for the ``documents``
table (doc_id, text, lang, source, n_chars) but any string column works.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: token = maximal run of lowercase alphanumerics (language-neutral,
#: BPE-ish pre-tokenization boundary). Keep in sync with the DuckDB oracle
#: expression `string_split_regex(lower(text), '[^a-z0-9]+')`.
TOKEN_SPLIT_RE = '[^a-z0-9]+'

#: small built-in stopword list used by quality scoring (English core).
STOPWORDS = ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it',
             'on', 'for', 'with', 'as', 'by', 'at', 'this', 'that')


def tokens(col: Column | str) -> Column:
    """Array of lowercase tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != '')


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Array of overlapping lowercase character n-grams (shingles) —
    the classic MinHash unit (Broder '97): robust to word-boundary edits
    that word tokens miss. Whitespace runs collapse to one space first so
    formatting-only changes don't alter the shingle set. Built from JVM
    ``sequence``/``transform``/``substring`` — higher-order functions are
    interpreted (not codegen), but this is a LINEAR per-document pass, not
    a per-pair one, so the cost is bounded by corpus size.

    Documents shorter than ``n`` chars yield a single whole-text shingle
    (never an empty set, so Jaccard stays defined).

    The normalized string is let-BOUND (functions/bind.py) before the
    per-shingle lambda: an unbound expression inside a higher-order
    lambda re-evaluates per element, so the regex+lower normalization
    would otherwise run once per shingle — quadratic in document length
    (measured 14.9 s -> 2.1 s at sf0.1 for the bare shingle explode;
    same cliff as lm.py::_padded_base)."""
    from erde_spark.functions.bind import bind
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(F.regexp_replace(F.lower(c), r'\s+', ' '))

    def _shingles(sb):  # sb: the lambda-bound normalized string
        idx = F.sequence(F.lit(1),
                         F.greatest(F.length(sb) - (n - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.substring(sb, i, n))

    return bind(s, _shingles)


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0 for empty docs)."""
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    kept = F.length(F.regexp_replace(low, '[^a-z0-9 ]', ''))
    return F.when(F.length(low) > 0,
                  (F.length(low) - kept) / F.length(low)).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x)
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score for training-data filtering, in the
    spirit of Gopher/C4 rules (published heuristics): prefer docs with
    20-1000 tokens, moderate stopword presence, low punctuation noise,
    mean token length 3-10. Pure JVM expression."""
    n = token_count(col).cast('double')
    length_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)) \
                 .otherwise(F.least(n / F.lit(20.0), F.lit(1.0)))
    sw = stopword_ratio(col)
    sw_ok = F.when(sw > 0.01, F.lit(1.0)).otherwise(F.lit(0.5))
    p = punct_ratio(col)
    punct_ok = F.lit(1.0) - F.least(p * 2, F.lit(1.0))
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok * 0.4 + sw_ok * 0.2 + punct_ok * 0.2 + mtl_ok * 0.2)


#: language marker stopwords: (lang, [markers]). Checked in order; the
#: language with the most distinct marker hits wins, ties broken by list
#: order; no hits -> 'und' (undetermined). Same contract as fastText-style
#: n-gram ID, reduced to a deterministic, SQL-expressible core.
LANG_MARKERS = [
    ('en', ['the', 'and', 'of', 'is', 'to']),
    ('de', ['der', 'die', 'das', 'und', 'ist']),
    ('fr', ['le', 'la', 'et', 'les', 'est']),
    ('es', ['el', 'los', 'las', 'es', 'una']),
]


def lang_id(col: Column | str) -> Column:
    """Marker-stopword language ID ('en'/'de'/'fr'/'es'/'und') — a
    CHEAP column-expression tag for plans that can't afford a join.
    For real language identification (30 languages / 9 scripts,
    trainable, oracled) use
    :func:`erde_spark.scale.langid.identify_language`."""
    t = tokens(col)
    scores = []
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(F.array_distinct(t),
                                             lambda x: F.array_contains(arr, x)))))
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit('und')
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of overlapping word n-grams (space-joined token windows).
    Documents with fewer than ``n`` tokens yield an empty array. JVM
    higher-order functions only (``sequence``/``transform``/``slice``),
    so the per-document pass is linear and stays executor-side; the
    token array is let-bound (functions/bind.py) so the tokenizer runs
    once per document, not once per n-gram."""
    from erde_spark.functions.bind import bind

    def _grams(tb):
        m = F.size(tb) - (n - 1)
        grams = F.transform(F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                            lambda i: F.array_join(F.slice(tb, i, n), ' '))
        return F.when(m >= 1, grams).otherwise(
            F.array().cast(T.ArrayType(T.StringType())))

    return bind(tokens(col), _grams)


def dup_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram in
    the same document — the Gopher-style intra-document repetition signal
    (Rae et al. 2021 §A1.1 'repetition'): high values mark boilerplate /
    looping generations. 0.0 for documents shorter than ``n`` tokens."""
    g = word_ngrams(col, n)
    return F.when(
        F.size(g) > 0,
        1.0 - F.size(F.array_distinct(g)) / F.size(g)).otherwise(F.lit(0.0))


def contamination_hits(corpus: DataFrame, eval_df: DataFrame, n: int = 8,
                       id_col: str = 'doc_id',
                       text_col: str = 'text') -> DataFrame:
    """Benchmark decontamination: (id, contaminated_ngrams) for every
    corpus document sharing at least one word ``n``-gram with the eval
    set (the GPT-3 appendix-C / PaLM 13-gram overlap method; n is a
    parameter because the right n depends on tokenizer granularity).

    Scale shape: the eval set is always tiny relative to a 100 TB corpus,
    so its distinct n-gram set is broadcast; the corpus side is ONE linear
    scan (explode + distinct-per-doc + broadcast semi-style join + map-side
    combined groupBy). The corpus is never shuffled by n-gram."""
    ev = (eval_df.select(F.explode(word_ngrams(text_col, n)).alias('ngram'))
          .distinct())
    # per-doc dedup happens MAP-SIDE (array_distinct before the explode):
    # the corpus's n-gram stream is never shuffled for distinctness
    doc_grams = (corpus
                 .select(F.col(id_col),
                         F.explode(F.array_distinct(word_ngrams(text_col, n)))
                         .alias('ngram')))
    return (doc_grams.join(F.broadcast(ev), 'ngram')
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias('contaminated_ngrams')))


def vocab_coverage(df: DataFrame, id_col: str = 'doc_id',
                   text_col: str = 'text', vocab_size: int = 512) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` tokens — the cheap fluency/domain-shift signal of
    CCNet-style curation (documents full of rare tokens are boilerplate,
    code, or noise). Returns (id, n_tokens, in_vocab, oov_rate).

    Two linear passes: a token-count aggregation cut to the top-k via
    TakeOrdered — partial top-k per partition, never a global sort or a
    single-partition window — then the tiny deterministic vocabulary
    (count desc, token asc) broadcast back over one explode of the
    corpus. Token OCCURRENCES are counted, not distinct tokens."""
    t = df.select(F.col(id_col).alias('id'),
                  F.explode(tokens(text_col)).alias('token'))
    counts = t.groupBy('token').agg(F.count(F.lit(1)).alias('n'))
    vocab = (counts.orderBy(F.col('n').desc(), F.col('token'))
             .limit(vocab_size).select('token'))
    per_doc = (t.join(F.broadcast(vocab).withColumn('_iv', F.lit(1)),
                      'token', 'left')
               .groupBy('id')
               .agg(F.count(F.lit(1)).alias('n_tokens'),
                    F.sum(F.coalesce('_iv', F.lit(0))).alias('in_vocab')))
    return (df.select(F.col(id_col).alias('id'))
            .join(per_doc, 'id', 'left')
            .select('id',
                    F.coalesce('n_tokens', F.lit(0)).cast('long').alias('n_tokens'),
                    F.coalesce('in_vocab', F.lit(0)).cast('long').alias('in_vocab'),
                    F.round(F.when(F.coalesce('n_tokens', F.lit(0)) > 0,
                                   1.0 - F.col('in_vocab') / F.col('n_tokens'))
                            .otherwise(F.lit(0.0)), 4).alias('oov_rate')))


def unigram_logprob(df: DataFrame, id_col: str = 'doc_id',
                    text_col: str = 'text', alpha: float = 0.5) -> DataFrame:
    """Per-document mean token log-probability under the corpus's OWN
    add-``alpha``-smoothed unigram LM — the cheap LM-quality proxy of
    CCNet-style curation (a document whose tokens are all corpus-rare
    scores low: boilerplate, noise, wrong-language). Returns
    (id, n_tokens, avg_logprob rounded to 4).

    Scale shape: one word-count aggregation (map-side combined), a
    two-scalar collect for the corpus totals (semantic constants, same
    bounded-collect discipline as ``target_mix``), then one join of the
    exploded token stream against the per-token logprob table — the
    classic word-count shuffle; AQE broadcasts the vocab side when it is
    small. No driver-side loops, no Python UDFs.
    """
    t = df.select(F.col(id_col).alias('id'),
                  F.explode(tokens(text_col)).alias('token'))
    # vocabulary-sized wordcount read twice (corpus totals + the logprob
    # table): the lazy checkpoint is materialized by the totals
    # aggregation below, so the token-stream shuffle runs ONCE with no
    # extra action (r13, guide §5)
    counts = (t.groupBy('token').agg(F.count(F.lit(1)).alias('n'))
              .localCheckpoint(eager=False))
    tot = counts.agg(F.sum('n').alias('N'),
                     F.count(F.lit(1)).alias('V')).first()
    n_total, v_size = int(tot['N'] or 0), int(tot['V'] or 0)
    denom = float(n_total + alpha * v_size) or 1.0
    lp = counts.select(
        'token', F.log((F.col('n') + F.lit(alpha)) / F.lit(denom)).alias('lp'))
    per_doc = (t.join(lp, 'token')  # every corpus token is in the vocab
               .groupBy('id')
               .agg(F.count(F.lit(1)).alias('n_tokens'),
                    F.avg('lp').alias('avg_lp')))
    return (df.select(F.col(id_col).alias('id'))
            .join(per_doc, 'id', 'left')
            .select('id',
                    F.coalesce('n_tokens', F.lit(0)).cast('long')
                    .alias('n_tokens'),
                    F.round(F.coalesce('avg_lp', F.lit(0.0)), 4)
                    .alias('avg_logprob')))


def token_divergence(df: DataFrame, group_col: str, slice_a, slice_b,
                     id_col: str = 'doc_id', text_col: str = 'text',
                     alpha: float = 0.5, top_k: int = 20) -> DataFrame:
    """Top-``top_k`` tokens by contribution to KL(P_a || P_b) between two
    corpus slices' add-``alpha``-smoothed unigram distributions (union
    vocabulary) — the distribution-shift report of corpus curation:
    which tokens make slice A most unlike slice B. Returns
    (token, p_a, p_b, kl_term), kl_term descending, token ascending
    tiebreak, all rounded to 6.

    Scale shape: two word-count aggregations, a full-outer token join,
    two scalar collects for the totals, and a TakeOrdered top-k —
    never a global sort of the vocabulary.
    """
    def _counts(v):
        return (df.filter(F.col(group_col) == v)
                .select(F.explode(tokens(text_col)).alias('token'))
                .groupBy('token').agg(F.count(F.lit(1)).alias('n')))
    ca, cb = _counts(slice_a), _counts(slice_b)
    both = (ca.withColumnRenamed('n', 'n_a')
            .join(cb.withColumnRenamed('n', 'n_b'), 'token', 'full_outer')
            .select('token', F.coalesce('n_a', F.lit(0)).alias('n_a'),
                    F.coalesce('n_b', F.lit(0)).alias('n_b'))
            # vocabulary-sized frame read twice (totals probe + top-k
            # output): the lazy checkpoint is materialized by the
            # totals aggregation below — which scans every partition —
            # so the two wordcount passes + full-outer join run ONCE
            # instead of twice, with no extra action (r13, guide §5)
            .localCheckpoint(eager=False))
    tot = both.agg(F.sum('n_a').alias('na'), F.sum('n_b').alias('nb'),
                   F.count(F.lit(1)).alias('v')).first()
    da = float((tot['na'] or 0) + alpha * (tot['v'] or 0)) or 1.0
    db = float((tot['nb'] or 0) + alpha * (tot['v'] or 0)) or 1.0
    p_a = (F.col('n_a') + F.lit(alpha)) / F.lit(da)
    p_b = (F.col('n_b') + F.lit(alpha)) / F.lit(db)
    return (both.select('token',
                        F.round(p_a, 6).alias('p_a'),
                        F.round(p_b, 6).alias('p_b'),
                        F.round(p_a * F.log(p_a / p_b), 6).alias('kl_term'))
            .orderBy(F.col('kl_term').desc(), 'token')
            .limit(top_k))


def bpe_pair_stats(df: DataFrame, text_col: str = 'text',
                   top_k: int = 50) -> DataFrame:
    """First-iteration BPE merge statistics: corpus-wide frequency of
    every adjacent CHARACTER pair inside words (initial BPE symbols =
    characters, Sennrich et al. 2016) — the aggregation a distributed
    tokenizer-training loop runs each merge round. Returns the
    ``top_k`` (pair, count) merge candidates, count desc / pair asc.

    Scale shape: one word-count aggregation first (map-side combined),
    then pairs explode off the DISTINCT-token table weighted by token
    frequency — the pair stream is O(vocab x word-length), not
    O(corpus tokens x word-length); final top-k is TakeOrdered. All
    JVM expressions (sequence/substring), no Python.
    """
    t = df.select(F.explode(tokens(text_col)).alias('token'))
    counts = t.groupBy('token').agg(F.count(F.lit(1)).alias('n'))
    pairs = counts.select(
        'n',
        F.explode(F.when(
            F.length('token') >= 2,
            F.transform(F.sequence(F.lit(1), F.length('token') - 1),
                        lambda i: F.col('token').substr(i, F.lit(2))))
          .otherwise(F.array().cast('array<string>'))).alias('pair'))
    return (pairs.groupBy('pair').agg(F.sum('n').alias('count'))
            .orderBy(F.col('count').desc(), 'pair')
            .limit(top_k))


def pack_offsets(df: DataFrame, id_col: str = 'doc_id',
                 text_col: str = 'text', max_tokens: int = 2048,
                 shard_col: str | None = None,
                 order_col: str | None = None) -> DataFrame:
    """Concat-then-chunk sequence packing — the GPT-style training
    batcher: documents are laid end to end in a deterministic order and
    cut into fixed ``max_tokens`` windows (documents may span a cut).
    Returns each document's placement: token count, global start offset,
    and the first/last sequence index it lands in.

    Scale shape: the running sum is a window over ``shard_col`` — pass a
    shard (language, source, hash bucket) so every shard packs
    independently in parallel; with ``shard_col=None`` the window is
    global, i.e. ONE ordered partition — fine for a head sample, wrong
    for 100 TB (offsets are then per-shard, which is what a sharded
    training run wants anyway).
    """
    if max_tokens <= 0:
        raise ValueError('max_tokens must be positive')
    order = F.col(order_col) if order_col else F.col(id_col)
    part = [F.col(shard_col)] if shard_col else [F.lit(0)]
    w = (Window.partitionBy(*part).orderBy(order, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = token_count(F.col(text_col))
    out = (df.withColumn('n_tokens', n.cast('long'))
           .withColumn('end_offset', F.sum('n_tokens').over(w))
           .withColumn('start_offset', F.col('end_offset') - F.col('n_tokens')))
    first = F.floor(F.col('start_offset') / max_tokens)
    last = F.when(F.col('n_tokens') > 0,
                  F.floor((F.col('end_offset') - 1) / max_tokens)) \
        .otherwise(first)
    keep = ([F.col(shard_col)] if shard_col else []) + [
        F.col(id_col), F.col('n_tokens'), F.col('start_offset'),
        first.cast('long').alias('first_seq'), last.cast('long').alias('last_seq')]
    return out.select(*keep)


def pack_bins_bestfit(df: DataFrame, id_col: str = 'doc_id',
                      text_col: str = 'text', max_tokens: int = 2048,
                      shard_col: str | None = None) -> DataFrame:
    """Whole-document bin packing — the padding-minimizing alternative
    to :func:`pack_offsets` for runs that forbid documents spanning a
    sequence cut (no cross-document attention, no truncated heads):
    best-fit-decreasing per shard, each document lands WHOLE in
    exactly one sequence, over-long documents (> ``max_tokens``) get
    their own sequence flagged ``truncated``. Returns (shard?, id,
    n_tokens, seq_id, seq_fill, truncated) where ``seq_fill`` is the
    packed token count of the document's sequence — 1 - fill/max is
    the padding the packer saved or must pay.

    Scale shape: packing is inherently sequential WITHIN a bin set, so
    the parallel unit is the shard — one ``applyInPandas`` group per
    ``shard_col`` value (language, source, hash bucket; REQUIRED
    discipline at scale, same contract as pack_offsets' window), BFD
    inside the kernel over that shard's (n_tokens, id) pairs only —
    token counts, never text, cross into Python. Deterministic:
    descending n_tokens, ascending id tie-break."""
    if max_tokens <= 0:
        raise ValueError('max_tokens must be positive')
    shard = shard_col or '_shard'
    base = df.select(
        *([F.col(shard_col)] if shard_col else [F.lit(0).alias('_shard')]),
        F.col(id_col).alias('_id'),
        token_count(F.col(text_col)).cast('long').alias('n_tokens'))
    out_schema = T.StructType([
        T.StructField(shard, base.schema[shard].dataType),
        T.StructField('_id', base.schema['_id'].dataType),
        T.StructField('n_tokens', T.LongType()),
        T.StructField('seq_id', T.LongType()),
        T.StructField('seq_fill', T.LongType()),
        T.StructField('truncated', T.BooleanType())])

    def _bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect
        rows = sorted(zip(pdf['n_tokens'], pdf['_id']),
                      key=lambda t: (-t[0], t[1]))
        fills: list = []     # fills[b] = tokens in bin b
        rema: list = []      # open bins' remaining capacity, sorted asc
        rbin: list = []      # bin id parallel to rema
        assign = {}
        for n, i in rows:
            n = int(n)
            if n >= max_tokens:
                assign[i] = (len(fills), n, n > max_tokens)
                fills.append(max_tokens)   # full: nothing else fits
                continue
            # best fit = smallest remaining capacity that still takes n
            # (O(log bins) bisect instead of an O(bins) scan — a shard
            # of 100k docs would otherwise pay docs x bins)
            j = bisect.bisect_left(rema, n)
            if j < len(rema):
                b, rem = rbin[j], rema[j]
                del rema[j], rbin[j]
            else:
                b, rem = len(fills), max_tokens
                fills.append(0)
            fills[b] += n
            rem -= n
            if rem > 0:
                k = bisect.bisect_left(rema, rem)
                rema.insert(k, rem)
                rbin.insert(k, b)
            assign[i] = (b, n, False)
        sh = pdf[shard].iloc[0] if len(pdf) else None
        recs = [(sh, i, n, b, min(fills[b], max_tokens), tr)
                for i, (b, n, tr) in assign.items()]
        return pd.DataFrame(recs, columns=[shard, '_id', 'n_tokens',
                                           'seq_id', 'seq_fill',
                                           'truncated'])

    out = base.groupBy(shard).applyInPandas(_bfd, out_schema)
    keep = ([F.col(shard)] if shard_col else []) + [
        F.col('_id').alias(id_col), 'n_tokens', 'seq_id', 'seq_fill',
        'truncated']
    return out.select(*keep)


def fim_transform(df: DataFrame, id_col: str = 'doc_id',
                  text_col: str = 'text', rate: float = 0.5,
                  salt: str = '', out_col: str = 'fim_text',
                  pre: str = '<PRE>', suf: str = '<SUF>',
                  mid: str = '<MID>', mode: str = 'psm') -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle") — the standard
    code-model data augmentation: a ``rate`` fraction of documents is
    rewritten as sentinel-delimited (prefix, suffix, middle) triples so
    the model learns infilling; the rest stay autoregressive. Adds
    ``out_col`` (the transformed text) and ``fim_applied``.

    Every decision is derived from md5 of the row id, never from RNG
    state: the SAME documents are selected and split at the SAME two
    character offsets on any engine, at any parallelism, across reruns
    (the property :mod:`erde_spark.scale.sampling` keys splits on).
    Selection reuses :func:`~erde_spark.scale.sampling.sample_key`'s
    16-bit bucket; the two cut points are independent 32-bit hashes
    reduced mod (len+1), so cuts at 0 / len (empty prefix, suffix or
    middle) occur naturally, as the paper requires.

    ``mode='psm'`` emits ``PRE p SUF s MID m``; ``'spm'`` emits
    ``SUF s PRE p MID m`` (the paper's joined-SPM variant — middle
    always last, so training masks stay contiguous).

    Scale shape: pure JVM string expressions (md5/conv/substring/
    concat), one narrow map-side projection inside whole-stage codegen
    — no shuffle, no Python, pushdown-transparent at 100 TB."""
    from .sampling import _threshold_hex, sample_key
    if mode not in ('psm', 'spm'):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    c = F.col(text_col)
    length = F.length(c)

    def _cut(tag: str) -> Column:
        h = F.md5(F.encode(F.concat(F.col(id_col).cast('string'),
                                    F.lit(f':{tag}{salt}')), 'UTF-8'))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast('long')
                % (length.cast('long') + 1)).cast('int')

    c1, c2 = _cut('fim1'), _cut('fim2')
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    prefix = F.substring(c, F.lit(1), lo)
    middle = F.substring(c, lo + 1, hi - lo)
    suffix = F.substring(c, hi + 1, length)
    if mode == 'psm':
        fim = F.concat(F.lit(pre), prefix, F.lit(suf), suffix,
                       F.lit(mid), middle)
    else:
        fim = F.concat(F.lit(suf), suffix, F.lit(pre), prefix,
                       F.lit(mid), middle)
    selected = (sample_key(id_col, salt + '|fim')
                < F.lit(_threshold_hex(rate)))
    applied = F.when(c.isNull(), F.lit(None).cast('boolean')) \
        .otherwise(selected)
    return (df.withColumn('fim_applied', applied)
            .withColumn(out_col, F.when(F.coalesce(applied, F.lit(False)),
                                        fim).otherwise(c)))


def span_corrupt(df: DataFrame, id_col: str = 'doc_id',
                 text_col: str = 'text', noise_density: float = 0.15,
                 mean_span: float = 3.0, salt: str = '',
                 sentinel: str = '<extra_id_{}>') -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4; the R-
    denoiser of UL2) — the masked-span denoising objective: ~
    ``noise_density`` of each document's tokens are removed in spans
    of ~``mean_span`` tokens, each span replaced by a numbered
    sentinel in ``inputs`` and emitted after the same sentinel in
    ``targets``. Adds ``inputs`` and ``targets``.

    Deterministic variant for reproducible distributed curation: the
    token array splits into ``n_spans = max(1, floor(n*density/
    mean_span))`` equal segments; segment i corrupts a window of
    ``L_i = clamp(floor(seg_len*density*...), 1, seg_len)`` tokens at
    an offset drawn from md5(id:i:salt) — same spans on any engine,
    at any parallelism, across reruns (the FIM/sampling md5
    discipline; T5's RNG segmentation is not replayable, its
    STATISTICS are what's preserved). Only floor/mod integer
    arithmetic, so a SQL oracle rebuilds inputs and targets
    byte-for-byte. Documents with zero tokens yield empty strings.

    Scale shape: one codegen projection over a let-bound token array
    (functions/bind.py) — no shuffle, no Python."""
    from erde_spark.functions.bind import bind
    both = bind(tokens(F.col(text_col)),
                _span_corrupt_struct(id_col, noise_density, mean_span,
                                     salt, sentinel))
    return (df.withColumn('__sc', both)
            .select('*', F.col('__sc.inputs').alias('inputs'),
                    F.col('__sc.targets').alias('targets'))
            .drop('__sc'))


def _span_corrupt_struct(id_col: str, noise_density: float,
                         mean_span: float, salt: str,
                         sentinel: str = '<extra_id_{}>'):
    """The span-corruption kernel as a bound-token-array -> struct
    (inputs, targets) callable — shared by :func:`span_corrupt` and
    :func:`ul2_mix` (whose denoisers are parameterizations of it)."""
    if not 0 < noise_density < 1:
        raise ValueError('noise_density must be in (0, 1)')
    if mean_span < 1:
        raise ValueError('mean_span must be >= 1')
    # rational arithmetic: density as parts-per-10000 so both engines
    # compute identical integer span lengths
    dppm = int(round(noise_density * 10000))
    mspan = int(round(mean_span * 100))
    sent_pre, sent_post = sentinel.split('{}')

    def _corrupt(t):
        n = F.size(t).cast('long')
        n_spans = F.greatest(
            F.lit(1).cast('long'),
            F.floor(n * dppm / F.lit(100 * mspan)).cast('long'))
        idx = F.sequence(F.lit(0).cast('long'), n_spans - 1)

        def seg(i):
            s = F.floor(i * n / n_spans).cast('int')
            e = F.floor((i + 1) * n / n_spans).cast('int')
            seg_len = e - s
            li = F.greatest(F.lit(1), F.floor(
                seg_len * F.lit(dppm) / F.lit(10000)).cast('int'))
            li = F.least(li, seg_len)
            h = F.md5(F.encode(F.concat(
                F.col(id_col).cast('string'), F.lit(':'),
                i.cast('string'), F.lit(f':{salt}')), 'UTF-8'))
            off = (F.conv(F.substring(h, 1, 8), 16, 10).cast('long')
                   % (seg_len - li + 1).cast('long')).cast('int')
            start = s + off
            sent = F.concat(F.lit(sent_pre), i.cast('string'),
                            F.lit(sent_post))
            # array_join over non-empty pieces, NOT concat_ws: concat_ws
            # keeps empty strings and would double separators when a
            # span touches a segment edge
            inp = F.array_join(F.filter(F.array(
                F.array_join(F.slice(t, s + 1, start - s), ' '), sent,
                F.array_join(F.slice(t, start + li + 1, e - start - li),
                             ' ')), lambda x: x != ''), ' ')
            tgt = F.concat(sent, F.lit(' '),
                           F.array_join(F.slice(t, start + 1, li), ' '))
            return F.struct(inp.alias('inp'), tgt.alias('tgt'))

        parts = F.transform(idx, seg)
        inputs = F.array_join(F.transform(parts, lambda p: p['inp']), ' ')
        targets = F.array_join(F.transform(parts, lambda p: p['tgt']), ' ')
        return F.struct(
            F.when(n > 0, inputs).otherwise(F.lit('')).alias('inputs'),
            F.when(n > 0, targets).otherwise(F.lit('')).alias('targets'))

    return _corrupt


def ul2_mix(df: DataFrame, id_col: str = 'doc_id',
            text_col: str = 'text', r_weight: float = 0.5,
            s_weight: float = 0.25, x_weight: float = 0.25,
            x_density: float = 0.5, x_mean_span: float = 8.0,
            salt: str = '') -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022): each document is
    md5-assigned one of the three published objectives and rewritten
    accordingly — R (regular span corruption, the T5 recipe: density
    0.15, mean span 3, paradigm tag ``[NLU]``), S (sequential /
    prefix-LM: one md5 cut point, the prefix becomes the input and
    the suffix the target, tag ``[S2S]``), X (extreme corruption:
    ``x_density``/``x_mean_span``, tag ``[NLG]``). Adds ``denoiser``
    ('R'|'S'|'X'), ``inputs`` and ``targets``.

    Assignment and every span/cut decision are md5 arithmetic
    (engine-portable, the FIM/sampling discipline); weights are
    normalized to integer parts-per-10000 thresholds so the same
    documents land in the same denoiser on any engine. The S cut
    leaves at least one token on each side when n >= 2 (a document of
    one token puts it in the target, inputs = the bare tag; a
    zero-token document yields the bare tag with empty targets — keep
    a length filter upstream if those must not reach training). One
    codegen projection over a let-bound token array — no shuffle, no
    Python."""
    from erde_spark.functions.bind import bind
    total = r_weight + s_weight + x_weight
    if total <= 0 or min(r_weight, s_weight, x_weight) < 0:
        raise ValueError('denoiser weights must be >= 0 with a '
                         'positive sum')
    r_thr = int(round(r_weight / total * 10000))
    s_thr = r_thr + int(round(s_weight / total * 10000))
    h = F.md5(F.encode(F.concat(F.col(id_col).cast('string'),
                                F.lit(f':ul2{salt}')), 'UTF-8'))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast('long') % 10000
    r_struct = _span_corrupt_struct(id_col, 0.15, 3.0, salt)
    x_struct = _span_corrupt_struct(id_col, x_density, x_mean_span,
                                    salt)

    def _s_struct(t):
        n = F.size(t).cast('long')
        hc = F.md5(F.encode(F.concat(F.col(id_col).cast('string'),
                                     F.lit(f':ul2s{salt}')), 'UTF-8'))
        # cut in [1, n-1] when n >= 2: both sides non-empty
        cut = F.when(n >= 2, (F.conv(F.substring(hc, 1, 8), 16, 10)
                              .cast('long') % (n - 1)) + 1) \
            .otherwise(F.lit(0)).cast('int')
        inputs = F.array_join(F.slice(t, 1, cut), ' ')
        targets = F.array_join(
            F.slice(t, cut + 1, (n - cut).cast('int')), ' ')
        return F.struct(
            F.when(n > 0, inputs).otherwise(F.lit('')).alias('inputs'),
            F.when(n > 0, targets).otherwise(F.lit('')).alias('targets'))

    def _mix(t):
        r, s, x = r_struct(t), _s_struct(t), x_struct(t)
        den = F.when(bucket < r_thr, 'R') \
            .when(bucket < s_thr, 'S').otherwise('X')
        pick = F.when(den == 'R', r).when(den == 'S', s).otherwise(x)
        tag = F.when(den == 'R', '[NLU]').when(den == 'S', '[S2S]') \
            .otherwise('[NLG]')
        joined = F.when(pick['inputs'] == '', tag) \
            .otherwise(F.concat(tag, F.lit(' '), pick['inputs']))
        return F.struct(den.alias('denoiser'),
                        joined.alias('inputs'),
                        pick['targets'].alias('targets'))

    both = bind(tokens(F.col(text_col)), _mix)
    return (df.withColumn('__u', both)
            .select('*', F.col('__u.denoiser').alias('denoiser'),
                    F.col('__u.inputs').alias('inputs'),
                    F.col('__u.targets').alias('targets'))
            .drop('__u'))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercase text. The exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r'\s+', ' '))


_WINNOW_B = np.uint64(1000003)  # odd multiplier, full-period mod 2^64


def _winnow_kernel(t: str | None, k: int, window: int):
    """The ONE winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm), shared by :func:`winnow_fingerprints` and
    :func:`winnow_positions` so fingerprint compatibility between them
    can never drift: polynomial rolling hash of every k-char gram of the
    whitespace-normalized lowercase text, then each sliding window of
    ``window`` gram hashes keeps its rightmost minimum. Returns
    (positions ndarray, gram-hash ndarray) — positions are the kept
    indices, fingerprints are ``h[positions]``."""
    if t is None:
        return None, None
    norm = ' '.join(t.lower().split())
    raw = np.frombuffer(norm.encode('utf-8'), dtype=np.uint8).astype(np.uint64)
    if len(raw) < k:
        return None, None
    # polynomial hash of all k-grams at once: h[i] = sum over the
    # gram of raw[i+o] * B^(k-1-o) — k vectorized multiply-adds,
    # no per-position Python loop
    n_h = len(raw) - k + 1
    h = np.zeros(n_h, dtype=np.uint64)
    p = np.uint64(1)
    # uint64 wraparound IS the hash's modulus (2^64); numpy's
    # overflow warning is expected, not a bug
    with np.errstate(over='ignore'):
        for o in range(k - 1, -1, -1):
            h += raw[o:o + n_h] * p
            p = p * _WINNOW_B
    if len(h) <= window:
        pos = np.array([int(h.argmin())])
    else:
        win = np.lib.stride_tricks.sliding_window_view(h, window)
        rev_arg = np.argmin(win[:, ::-1], axis=1)   # first in reversed =
        pos = np.unique(np.arange(len(win)) + (window - 1 - rev_arg))
    return pos, h


def winnow_fingerprints(df: DataFrame, id_col: str = 'doc_id',
                        text_col: str = 'text', k: int = 9,
                        window: int = 16) -> DataFrame:
    """(id, fingerprints: array<long>) — winnowing document fingerprints:
    the distinct kept hashes of :func:`_winnow_kernel`. Guarantees: any
    match of length >= k + window - 1 between two documents shares at
    least one fingerprint, so local (partial-overlap) duplication is
    detectable where whole-doc hashing fails.

    Vectorized numpy per Arrow batch (sliding_window_view, uint64
    wraparound arithmetic); one narrow projection, no shuffle.
    """
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pos, h = _winnow_kernel(t, k, window)
            out.append([] if pos is None else
                       np.unique(h[pos]).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias('id'),
                     _winnow(F.col(text_col)).alias('fingerprints'))


def winnow_pairs(df: DataFrame, id_col: str = 'doc_id', text_col: str = 'text',
                 min_shared: int = 3, k: int = 9, window: int = 16) -> DataFrame:
    """(id_a, id_b, shared) — document pairs sharing >= ``min_shared``
    winnowing fingerprints (local-overlap near-dup candidates).

    Plan: fingerprints -> explode (inverted index) -> self-equi-join on
    hash -> groupBy pair count. Shuffles one row per (doc, fingerprint);
    fan-out per hash is bounded by its document frequency, same posture
    as the MinHash bucket join.
    """
    fp = winnow_fingerprints(df, id_col, text_col, k, window)
    ex = fp.select('id', F.explode('fingerprints').alias('fp'))
    a, b = ex.alias('a'), ex.alias('b')
    return (a.join(b, (F.col('a.fp') == F.col('b.fp')) &
                      (F.col('a.id') < F.col('b.id')))
            .groupBy(F.col('a.id').alias('id_a'), F.col('b.id').alias('id_b'))
            .agg(F.count(F.lit(1)).alias('shared'))
            .filter(F.col('shared') >= min_shared))


def winnow_positions(df: DataFrame, id_col: str = 'doc_id',
                     text_col: str = 'text', k: int = 9,
                     window: int = 16) -> DataFrame:
    """(id, pos, fp) — winnowing fingerprints WITH their character
    positions (same kernel as :func:`winnow_fingerprints`, but keeping
    where each kept hash starts). Positions are what turn fingerprint
    overlap into PASSAGE evidence: consecutive shared fingerprints at
    consistent offsets in two documents localize the copied span. Same
    kernel as :func:`winnow_fingerprints` — literally
    (:func:`_winnow_kernel`), so the two can never drift."""
    out_t = T.ArrayType(T.StructType([T.StructField('pos', T.IntegerType()),
                                      T.StructField('fp', T.LongType())]))

    @F.pandas_udf(out_t)
    def _winnow_pos(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pos, h = _winnow_kernel(t, k, window)
            out.append([] if pos is None else
                       [(int(i), int(np.int64(h[i]))) for i in pos])
        return pd.Series(out)

    return (df.select(F.col(id_col).alias('id'),
                      F.explode(_winnow_pos(F.col(text_col))).alias('m'))
            .select('id', F.col('m.pos').alias('pos'),
                    F.col('m.fp').alias('fp')))


def shared_passage_spans(df: DataFrame, id_col: str = 'doc_id',
                         text_col: str = 'text', k: int = 9,
                         window: int = 16, max_doc_freq: int = 64,
                         max_gap: int = 128,
                         min_span_fps: int = 2) -> DataFrame:
    """Passage-level duplication report: for every document pair sharing
    winnowed content, the number of distinct COPIED SPANS, the total
    shared fingerprints, and the longest span's approximate character
    length — the local-overlap analogue of whole-doc near-dup (detects a
    copied paragraph inside otherwise-unrelated documents, the shape
    whole-document Jaccard misses).

    A span is a maximal run of shared fingerprints whose positions
    advance consistently in BOTH documents: matches are grouped by the
    OFFSET BUCKET ``floor((pos_b - pos_a) / max_gap)`` — a copied
    passage keeps a near-constant offset, so its matches land in one
    (occasionally two adjacent) buckets, while stray repeats of the
    same fingerprint elsewhere in either document land in other buckets
    and can neither fragment nor inflate the true run — then split at
    ``pos_a`` gaps above ``max_gap``. Runs shorter than ``min_span_fps``
    fingerprints are discarded as isolated hash collisions; a span
    straddling a bucket boundary may count as two (the report is
    winnowing-granular, not exact).

    Scale shape: positions explode once; fingerprints seen in more than
    ``max_doc_freq`` documents are dropped BEFORE the self-join (they
    are boilerplate — the same df-cap discipline as ``jaccard_pairs``),
    so per-hash fan-out is bounded; multi-position repeats collapse to
    one row per (pair, bucket, pos_a) before run detection, which is
    one window per (pair, bucket) partition — never a driver loop.
    """
    pos = winnow_positions(df, id_col, text_col, k, window)
    rare = (pos.groupBy('fp')
            .agg(F.countDistinct('id').alias('_df'))
            .filter(F.col('_df') <= max_doc_freq)
            .select('fp'))
    pos = pos.join(rare, 'fp')
    a = pos.select(F.col('id').alias('id_a'), F.col('pos').alias('pos_a'),
                   'fp')
    b = pos.select(F.col('id').alias('id_b'), F.col('pos').alias('pos_b'),
                   'fp')
    m = (a.join(b, 'fp').filter(F.col('id_a') < F.col('id_b'))
         .withColumn('obk', F.floor((F.col('pos_b') - F.col('pos_a'))
                                    / max_gap))
         .select('id_a', 'id_b', 'obk', 'pos_a')
         .distinct())
    w = Window.partitionBy('id_a', 'id_b', 'obk').orderBy('pos_a')
    gap_a = F.col('pos_a') - F.lag('pos_a').over(w)
    new_span = (gap_a.isNull() | (gap_a > max_gap)).cast('int')
    spans = (m.withColumn('_ns', new_span)
             .withColumn('span_id', F.sum('_ns').over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy('id_a', 'id_b', 'obk', 'span_id')
             .agg(F.count(F.lit(1)).alias('n_fps'),
                  (F.max('pos_a') - F.min('pos_a') + k).alias('span_chars'))
             .filter(F.col('n_fps') >= min_span_fps))
    return (spans.groupBy('id_a', 'id_b')
            .agg(F.count(F.lit(1)).alias('n_spans'),
                 F.sum('n_fps').alias('shared_fps'),
                 F.max('span_chars').alias('longest_span_chars')))


def cut_duplicate_spans(df: DataFrame, id_col: str = 'doc_id',
                        text_col: str = 'text',
                        min_tokens: int = 50) -> DataFrame:
    """EXACT duplicate-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the ExactSubstr variant): CUT from every
    document each token span of length >= ``min_tokens`` whose exact
    text occurs more than once in the corpus, keeping the rest of the
    document. Whole-document dedup keeps one copy of a duplicated
    PASSAGE in every document that quotes it; this removes all of
    them — the paper's stronger variant. Output text is the surviving
    tokens joined with single spaces (whitespace-token granularity,
    the stated normalization; the paper cuts byte ranges of a BPE
    stream — same semantics at this engine's token granularity).

    Pure DataFrame pipeline, token-count LINEAR at 100 TB (the paper
    uses a suffix array for the same O(total tokens) bound on one
    machine; shuffles replace suffix-array adjacency here):
    every position's ``min_tokens``-gram is hashed JVM-side
    (slice+concat+xxhash64 inside codegen, one row per token), grams
    with corpus count > 1 are the duplicated seeds (map-side-combined
    count + semi join — never all-pairs), each seed marks its L
    covered token indices (bounded explode), and the per-document
    covered set drives one indexed ``F.filter`` over the token array.
    Documents with no duplicated span pass through with normalized
    whitespace only. Within-document repeats count (the corpus-global
    occurrence count is what crosses 1), exactly the paper's contract.
    Collision note: two DIFFERENT grams colliding in xxhash64 could
    cut an extra span — P ~ n_grams^2 / 2^64, negligible below ~10^9
    grams per corpus; the winnowing family remains the approximate /
    report-oriented surface (:func:`shared_passage_spans`)."""
    if min_tokens < 2:
        raise ValueError(f'min_tokens must be >= 2, got {min_tokens}')
    toks = F.filter(F.split(F.col(text_col), r'\s+'), lambda x: x != '')
    base = df.select(F.col(id_col).alias('id'), toks.alias('toks'))
    n = F.size('toks')
    grams = (base.select(
        'id',
        F.explode(F.when(n >= min_tokens,
                         F.sequence(F.lit(0), n - min_tokens))
                  .otherwise(F.array().cast('array<int>'))).alias('pos'),
        F.col('toks'))
        .select('id', 'pos',
                F.xxhash64(F.concat_ws(
                    ' ', F.slice('toks', F.col('pos') + 1, min_tokens)))
                .alias('g')))
    dup = (grams.groupBy('g').agg(F.count(F.lit(1)).alias('c'))
           .filter(F.col('c') > 1).select('g'))
    covered = (grams.join(dup, 'g', 'left_semi')
               .select('id', F.explode(F.sequence(
                   F.col('pos'), F.col('pos') + min_tokens - 1))
                   .alias('i'))
               .groupBy('id').agg(F.collect_set('i').alias('cov')))
    # Complement-interval rebuild, O(n + |cov| log |cov|) per doc: sort
    # the covered set once, walk the gaps between consecutive covered
    # indices, and flatten one slice per gap. A per-token
    # array_contains(cov, i) refilter is O(|cov|) per position —
    # quadratic on a fully-duplicated long document (a 100k-token doc
    # whose covered set is the whole doc would cost 10^10 comparisons
    # in one row), exactly the adversarial tail a 100 TB crawl
    # contains. The sorted array MUST be its own projected column:
    # referenced inside a lambda, array_sort(cov) gets re-evaluated
    # per transform element (no common-subexpression elimination
    # across lambda bodies) — O(n^2 log n), worse than the bug.
    staged = (base.join(covered, 'id', 'left')
              .select('id', 'toks', F.array_sort('cov').alias('_cs')))
    cs = F.col('_cs')
    m = F.size(cs)
    n_toks = F.size('toks')
    gaps = F.transform(
        F.sequence(F.lit(0), m),
        lambda k: F.struct(
            F.when(k == F.lit(0), F.lit(0))
            .otherwise(F.element_at(cs, k) + 1).alias('s'),
            F.when(k == m, n_toks)
            .otherwise(F.element_at(cs, k + 1)).alias('e')))
    sliced = F.flatten(F.transform(
        gaps,
        lambda g: F.slice('toks', g['s'] + 1,
                          F.greatest(g['e'] - g['s'], F.lit(0)))))
    kept = staged.select(
        'id',
        F.when(cs.isNull(), F.col('toks')).otherwise(sliced).alias('toks'))
    return kept.select(F.col('id').alias(id_col),
                       F.array_join('toks', ' ').alias(text_col))


def analyze(df: DataFrame, text_col: str = 'text') -> DataFrame:
    """Attach the full text-analysis column set in one projection."""
    c = F.col(text_col)
    return df.withColumns({
        'n_tokens': token_count(c),
        'stopword_ratio': stopword_ratio(c),
        'punct_ratio': punct_ratio(c),
        'mean_token_len': mean_token_len(c),
        'quality': quality_score(c),
        'lang_pred': lang_id(c),
        'fingerprint': fingerprint(c),
    })


def gopher_quality_flags(col: Column | str, min_tokens: int = 50,
                         max_tokens: int = 100_000,
                         min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                         max_punct_ratio: float = 0.2,
                         min_stop_hits: int = 2) -> Column:
    """Per-rule boolean struct of Gopher-style quality gates (published
    heuristics: Rae et al. 2021 §A1.1 'quality filtering'): token-count
    window, mean-token-length window, punctuation-noise ceiling, and a
    minimum number of DISTINCT stopword hits (a cheap English-fluency
    signal). All JVM expressions over one tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n = F.size(t)
    mtl = mean_token_len(c)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(t), F.array(*[F.lit(s) for s in STOPWORDS])))
    return F.struct(
        ((n >= min_tokens) & (n <= max_tokens)).alias('tokens_ok'),
        ((mtl >= min_mean_len) & (mtl <= max_mean_len)).alias('mean_len_ok'),
        (punct_ratio(c) <= max_punct_ratio).alias('punct_ok'),
        (stop_hits >= min_stop_hits).alias('stopwords_ok'))


def readability(col: Column | str) -> Column:
    """Readability metrics as one codegen struct: word count (letter
    runs), sentence count (terminal-punctuation runs, floored at 1 so
    fragments score as one sentence), syllable estimate (vowel-group
    runs — the standard automated approximation), and the Flesch
    Reading Ease score 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words) (Flesch 1948; the curation use is
    complexity bucketing / filtering alongside the Gopher gates).
    Every term is per-row integer-count arithmetic followed by scalar
    IEEE operations in a fixed order, so the score is exactly
    reproducible by any engine — the driver gate value-hashes it
    unrounded."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.regexp_count(c, F.lit('[A-Za-z]+'))
    sentences = F.greatest(F.regexp_count(c, F.lit('[.!?]+')), F.lit(1))
    syllables = F.regexp_count(F.lower(c), F.lit('[aeiouy]+'))
    w = F.greatest(words, F.lit(1)).cast('double')
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (w / sentences.cast('double'))
              - F.lit(84.6) * (syllables.cast('double') / w))
    return F.struct(words.alias('n_words'),
                    sentences.alias('n_sentences'),
                    syllables.alias('n_syllables'),
                    flesch.alias('flesch'))


def c4_filter(df: DataFrame, id_col: str = 'doc_id',
              text_col: str = 'text', min_words_per_line: int = 5,
              min_sentences: int = 3,
              blocklist: tuple = ()) -> DataFrame:
    """The classic C4 cleaning rules (Raffel et al. 2020 §2.2, the
    most-reproduced page-level curation recipe) as one JVM pass:

    - keep only LINES ending in a terminal punctuation mark
      (``. ! ? "``) with at least ``min_words_per_line`` words and
      no occurrence of the word 'javascript';
    - drop PAGES containing 'lorem ipsum', a curly bracket (code), a
      blocklisted word, or fewer than ``min_sentences`` sentences
      after line filtering (sentences counted as terminal-punctuation
      marks in the kept text — the standard reimplementation of the
      paper's sentence heuristic).

    Returns the surviving (id, text) with kept lines rejoined in
    order. Pure whole-stage-codegen arrays — no shuffle, no Python:
    at 100 TB this rides the scan like every other line filter (the
    three-sentence-span dedup C4 pairs with this lives in
    ``passage_dedup_report``/``dedup_exact`` as its own tier)."""
    c = F.col(text_col)
    lower = F.lower(c)
    kept_lines = F.filter(
        F.split(c, '\n'),
        lambda ln: F.trim(ln).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(ln), ' +')) >= min_words_per_line)
        & ~F.lower(ln).contains('javascript'))
    kept_text = F.array_join(kept_lines, '\n')
    n_sentences = (
        F.length(kept_text)
        - F.length(F.regexp_replace(kept_text, '[.!?]', '')))
    page_ok = (~lower.contains('lorem ipsum')
               & ~c.contains('{')
               & (n_sentences >= min_sentences))
    for word in blocklist:
        page_ok = page_ok & ~lower.rlike(
            r'\b' + re.escape(word.lower()) + r'\b')
    return (df.select(F.col(id_col), kept_text.alias(text_col),
                      page_ok.alias('_ok'))
            .where(F.col('_ok')).drop('_ok'))


def quality_filter(df: DataFrame, text_col: str = 'text',
                   keep_flags: bool = False, **bounds) -> DataFrame:
    """Keep only rows passing every Gopher-style gate (the curation-
    pipeline filter shape: one projection computes all rule flags, the
    filter is their conjunction — no shuffle, fully pushdown-friendly).
    ``keep_flags=True`` retains the per-rule booleans for auditing."""
    flags = gopher_quality_flags(F.col(text_col), **bounds)
    out = df.withColumn('__q', flags)
    kept = out.filter(F.col('__q.tokens_ok') & F.col('__q.mean_len_ok')
                      & F.col('__q.punct_ok') & F.col('__q.stopwords_ok'))
    if keep_flags:
        return kept.select('*', F.col('__q.*')).drop('__q')
    return kept.drop('__q')


def compression_ratio(df: DataFrame, text_col: str = 'text',
                      level: int = 6,
                      out_col: str = 'compression_ratio') -> DataFrame:
    """Adds ``out_col`` = UTF-8 bytes / zlib-deflated bytes — the
    entropy proxy web-curation recipes use to catch what rule lists
    miss: a very HIGH ratio is machine-generated repetition (keyword
    stuffing, boilerplate loops, tag soup), a ratio near 1.0 is
    high-entropy non-text (base64 blobs, minified bundles, binary
    spill). Complements :func:`gopher_quality_flags` (which sees token
    shapes, not redundancy). None -> None; '' -> 0.0 (eight bytes of
    deflate header for zero payload).

    Exact compressed sizes vary a little across zlib builds, so
    downstream thresholds must be margins, not pins (the gate plants
    classes an order of magnitude apart). Scale shape: one
    Arrow-batched pandas UDF over the text column (zlib has no SQL
    form) — map-only, no shuffle; ~100 MB/s/core deflate keeps it scan
    -bound at level 6."""
    import zlib
    if not 0 <= level <= 9:
        # validate on the driver — executor-side zlib would raise the
        # same error per task, wrapped in a Py4J stack
        raise ValueError(f'zlib level must be in [0, 9], got {level}')

    @F.pandas_udf(T.DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            b = x.encode('utf-8')
            return len(b) / len(zlib.compress(b, level))
        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def compression_filter(df: DataFrame, text_col: str = 'text',
                       min_ratio: float = 1.1, max_ratio: float = 12.0,
                       level: int = 6,
                       keep_ratio: bool = False) -> DataFrame:
    """Drop documents outside the [min_ratio, max_ratio] compression
    band (both pathological ends — see :func:`compression_ratio`).
    Null text never passes (no bytes to judge)."""
    out = compression_ratio(df, text_col, level, '__cr')
    kept = out.filter(F.col('__cr').between(min_ratio, max_ratio))
    if keep_ratio:
        return kept.withColumnRenamed('__cr', 'compression_ratio')
    return kept.drop('__cr')


# ---------------------------------------------------------------- PII / URLs

#: PII patterns restricted to syntax with IDENTICAL semantics in Java
#: regex (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
#: Ordering matters for redaction: credit cards before phones, so a
#: 16-digit grouped number is not half-eaten by the phone pattern.
PII_PATTERNS = {
    'email': r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
    'credit_card': r'\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b',
    'phone': r'\+?\d{1,3}[- .]?\(?\d{3}\)?[- .]\d{3}[- .]\d{4}',
    'ipv4': r'\b(?:\d{1,3}\.){3}\d{1,3}\b',
}


def pii_scrub(df: DataFrame, text_col: str = 'text',
              types: tuple = ('email', 'credit_card', 'phone', 'ipv4'),
              redaction: str = '[PII]') -> DataFrame:
    """Redact PII spans and count them per type — the standard
    pre-training scrub stage (emails, phone numbers, IPs, card
    numbers). Adds ``n_<type>`` count columns (counted on the ORIGINAL
    text) and ``text_scrubbed``.

    Pure JVM regexp expressions: at 100 TB this is one narrow
    whole-stage-codegen pass over the text column — no Python workers,
    no shuffle, filter/count pushdown-friendly."""
    out = df
    scrubbed = F.col(text_col)
    for t in types:
        pat = PII_PATTERNS[t]
        out = out.withColumn(f'n_{t}',
                             F.regexp_count(F.col(text_col), F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, redaction)
    return out.withColumn('text_scrubbed', scrubbed)


#: capture group 1 = the registrable host (RE2/Java-identical)
URL_PATTERN = r'https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+)'


def domain_stats(df: DataFrame, text_col: str = 'text',
                 id_col: str = 'doc_id') -> DataFrame:
    """(domain, n_urls, n_docs) — URL extraction + per-domain corpus
    statistics, the web-curation primitive behind domain allow/deny
    lists and per-source mixing weights.

    Extraction is a JVM ``regexp_extract_all`` + ``explode``; the
    aggregation is one map-side-combined shuffle on domain — the same
    linear shape as every other corpus-stats op here."""
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col),
                                       F.lit(URL_PATTERN), 1))
        .alias('domain'))
    return (urls.groupBy('domain')
            .agg(F.count(F.lit(1)).alias('n_urls'),
                 F.countDistinct(id_col).alias('n_docs')))


def normalize_text(col: Column | str, collapse_spaces: bool = True) -> Column:
    """Unicode text normalization for crawl ingest: NFC composition
    (Arrow-batched ``unicodedata`` — Spark has no JVM normalizer), CRLF
    -> LF, control characters stripped (tab/newline kept), Unicode
    space separators (\\p{Zs}) mapped to ASCII space, and optional
    space-run collapse. The regex stages are whole-stage-codegen and
    use the Java/RE2 common dialect (explicit ranges, no class
    intersection), matching DuckDB's nfc_normalize + regexp_replace for
    cross-engine parity (pinned in tests/test_scale.py)."""
    import unicodedata

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: unicodedata.normalize('NFC', x)
                     if x is not None else None)

    c = F.col(col) if isinstance(col, str) else col
    c = _nfc(c)
    c = F.regexp_replace(c, '\r\n?', '\n')
    c = F.regexp_replace(c, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '')
    c = F.regexp_replace(c, r'\p{Zs}', ' ')
    if collapse_spaces:
        c = F.regexp_replace(c, '  +', ' ')
    return c


#: fixed-width negative lookbehinds (Java regex requires bounded
#: lookbehind) for terminators that are abbreviations, not sentence
#: ends — the list every rule-based splitter carries (Koehn's
#: split-sentences.perl ships per-language nonbreaking_prefix files;
#: this is the English core of it)
_SENT_ABBREV = ('Mr', 'Ms', 'Mrs', 'Dr', 'Prof', 'St', 'Jr', 'Sr',
                'vs', 'etc', 'No', 'Inc', 'Ltd', 'Co', 'Fig', 'approx')
_SENT_SPLIT_RE = (
    r'(?<=[.!?]["\')\]]?)'        # terminator, optional closing quote
    + ''.join(rf'(?<!\b{a}\.)' for a in _SENT_ABBREV)
    + r'(?<!\b[A-Z]\.)'           # single-initial "J. Smith"
    + r'\s+(?=["\'(]?[A-Z0-9])')


def split_sentences(col: Column | str) -> Column:
    """Rule-based sentence segmentation -> ``array<string>`` (the
    granularity bitext mining, passage dedup and PII windows operate
    at). Split points are terminator ([.!?]) + whitespace + an
    upper/digit (optionally quote/paren) start, guarded by fixed-width
    negative lookbehinds for the standard abbreviation list and single
    initials — one JVM ``split``, whole-stage codegen, sentence text
    preserved byte-exact (the delimiter whitespace is all that's
    consumed). Deterministic by construction; RE2 engines can't replay
    the lookarounds, so gates use planted constructions. For
    locale-aware segmentation of word LISTS, Spark's built-in
    ``F.sentences`` (java.text.BreakIterator) is the alternative —
    this splitter exists because BreakIterator discards the original
    spacing/punctuation, which passage-level dedup needs intact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, _SENT_SPLIT_RE)


def explode_sentences(df: DataFrame, id_col: str = 'doc_id',
                      text_col: str = 'text',
                      min_chars: int = 1) -> DataFrame:
    """One row per sentence: (id, sent_id, sentence) — ``posexplode``
    over :func:`split_sentences`, sentences shorter than ``min_chars``
    after trimming dropped (keeps indices of the SURVIVORS dense).
    Map-only; feeds bitext mining / sentence-level dedup."""
    sents = F.filter(
        F.transform(split_sentences(text_col), lambda s: F.trim(s)),
        lambda s: F.length(s) >= min_chars)
    return (df.select(id_col, F.posexplode(sents)
                      .alias('sent_id', 'sentence')))


def url_domain(col: Column | str) -> Column:
    """Lower-cased host part of a URL column ('' when not a URL).
    Case-insensitive scheme; userinfo ('user:pass@host') and port are
    skipped — both occur in real crawl URLs and would otherwise leak
    into blocklist/stats keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(
        c, r'(?i)^https?://(?:[^/?#@]*@)?([A-Za-z0-9.-]+)', 1))


def _domain_suffixes(dom: Column) -> Column:
    """All registrable suffixes of a host: a.b.example -> [a.b.example,
    b.example, example] — the unit a subdomain-matching blocklist join
    keys on."""
    from erde_spark.functions.bind import bind
    return bind(
        F.split(dom, r'\.'),
        lambda parts: F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(F.slice(parts, i, F.size(parts)), '.')))


def filter_by_domain(df: DataFrame, url_col: str = 'url',
                     deny=(), allow=None,
                     match_subdomains: bool = True) -> DataFrame:
    """URL allow/deny filtering — the crawl-hygiene gate in front of
    every curation run. ``deny`` / ``allow`` are either small Python
    collections (compiled into one whole-stage-codegen boolean
    expression) or DataFrames with a ``domain`` column (suffix-explode
    + join — the scale path for million-entry blocklists: the list is
    joined, never collected, and the corpus contributes one row per
    host LABEL, not per list entry). With ``match_subdomains`` a listed
    ``example.com`` also matches ``ads.example.com``.
    """
    dom = url_domain(url_col)

    def _expr_match(domains) -> Column:
        m = F.lit(False)
        for d in domains:
            d = d.lower()
            hit = dom == d
            if match_subdomains:
                hit = hit | dom.endswith('.' + d)
            m = m | hit
        return m

    def _hit_ids(frame: DataFrame, domains_df: DataFrame) -> DataFrame:
        """Surrogate keys of ``frame`` rows whose host matches a listed
        domain. Joining back on the key (not on every frame column)
        keeps the filter null-safe — an equi-join on all columns would
        let any row with a NULL attribute slip past the blocklist,
        since NULL never equals itself — and never collapses genuine
        duplicate rows."""
        key = _domain_suffixes(dom) if match_subdomains else F.array(dom)
        keyed = frame.select('_rid', F.explode(key).alias('_sfx'))
        dl = (domains_df.select(F.lower(F.col('domain')).alias('_sfx'))
              .distinct())
        return keyed.join(dl, '_sfx', 'left_semi').select('_rid')

    needs_rid = isinstance(deny, DataFrame) or isinstance(allow, DataFrame)
    out = (df.withColumn('_rid', F.monotonically_increasing_id())
           if needs_rid else df)
    if isinstance(deny, DataFrame):
        out = out.join(_hit_ids(out, deny), '_rid', 'left_anti')
    elif deny:
        out = out.filter(~_expr_match(deny))
    if isinstance(allow, DataFrame):
        out = out.join(_hit_ids(out, allow), '_rid', 'left_semi')
    elif allow is not None:
        out = out.filter(_expr_match(allow))
    return out.drop('_rid') if needs_rid else out


def remove_boilerplate_lines(df: DataFrame, min_count: int = 3,
                             min_line_chars: int = 5,
                             id_col: str = 'doc_id',
                             text_col: str = 'text') -> DataFrame:
    """CCNet-style boilerplate removal: drop every line that repeats in
    at least ``min_count`` documents corpus-wide (nav bars, cookie
    banners, footers — the lines that dominate raw crawl text), keeping
    each document's remaining lines in order. Lines shorter than
    ``min_line_chars`` after trimming (blank separators, lone
    punctuation) are never counted as boilerplate — removing them by
    frequency would destroy paragraph structure.

    Scale shape: one map-side-combined count over (trimmed-line hash,
    distinct doc) pairs, then the FREQUENT set — small by definition:
    boilerplate is the few lines repeated everywhere — broadcasts into
    an anti-join against the exploded lines, so the corpus's line
    stream crosses exactly one shuffle (the count) and the rebuild
    groupBy. Returns (id, text) with ``text`` rebuilt via an in-order
    array join."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), '\n'))
        .alias('_pos', '_line'))
    key = F.xxhash64(F.trim(F.col('_line')))
    countable = (F.length(F.trim(F.col('_line'))) >= min_line_chars)
    frequent = (lines.where(countable)
                .select(key.alias('_k'), id_col)
                .distinct()                      # count DOCUMENTS, not
                .groupBy('_k')                   # repeats within one doc
                .agg(F.count(F.lit(1)).alias('_n'))
                .where(F.col('_n') >= min_count)
                .select('_k'))
    kept = lines.withColumn('_k', F.when(countable, key)) \
        .join(F.broadcast(frequent), '_k', 'left_anti')
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct('_pos', '_line'))),
                       lambda s: s['_line']),
                   '\n').alias(text_col)))
    # a document whose every line is boilerplate has zero kept rows —
    # it must survive as (id, '') rather than vanish (downstream inner
    # joins would silently drop it), so re-attach against the full id
    # set; the id projection rides the same scan, no extra shuffle
    # beyond the join on the (already-shuffled-by-id) rebuild
    return (df.select(id_col)
            .join(rebuilt, id_col, 'left')
            .select(id_col,
                    F.coalesce(F.col(text_col), F.lit(''))
                    .alias(text_col)))


def dedup_lines_within_doc(df: DataFrame, id_col: str = 'doc_id',
                           text_col: str = 'text',
                           sep: str = '\n',
                           min_line_chars: int = 5) -> DataFrame:
    """Remove REPEATED lines/paragraphs WITHIN each document, keeping
    the first occurrence in order — the within-doc counterpart of
    :func:`remove_boilerplate_lines` (which removes lines repeated
    ACROSS documents). Templated pages repeat their own nav/footer
    blocks many times inside one document; corpus-wide counting never
    sees those because the count is per-distinct-document-line.

    Segments shorter than ``min_line_chars`` after trimming (blank
    separators, lone punctuation) are kept UNCONDITIONALLY — the same
    guard as :func:`remove_boilerplate_lines`: 'p1\\n\\np2\\n\\np3'
    splits on '\\n' to [p1, '', p2, '', p3], and deduplicating the
    empty separator would silently collapse every paragraph break
    after the first.

    Pure JVM (split -> indexed array filter keeping positions where
    the FIRST occurrence index equals the current index -> rejoin):
    no shuffle, no Python, scales as a map over any corpus. The split
    array is let-bound (functions/bind.py) so the text splits once per
    document, not once per line; the remaining cost is O(lines^2) per
    document worst case (array_position scans), fine at real document
    line counts. Null text passes through as null. ``sep`` is a
    LITERAL separator (regex-escaped for the split, used verbatim for
    the rejoin) — pass '\\n\\n' for paragraph granularity."""
    import re

    from erde_spark.functions.bind import bind
    kept = bind(
        F.split(F.col(text_col), re.escape(sep)),
        lambda parts: F.filter(
            parts,
            lambda x, i: (F.length(F.trim(x)) < min_line_chars)
            | (F.array_position(parts, x) == i + 1)))
    return df.withColumn(text_col, F.array_join(kept, sep))


def chunk_documents(df: DataFrame, max_tokens: int = 128,
                    overlap: int = 16, id_col: str = 'doc_id',
                    text_col: str = 'text') -> DataFrame:
    """Split documents into overlapping token-window passages — the
    chunking step in front of embedding/RAG indexing and the unit
    passage-level dedup consumes. Windows advance by
    ``max_tokens - overlap``; the final window is the remainder (never
    empty); documents shorter than ``max_tokens`` yield one chunk.
    Returns (id, chunk_idx, chunk_text, n_tokens).

    Pure JVM: tokenization, window arithmetic and slicing are array
    expressions; one ``posexplode`` fans out the windows, so the only
    data growth is the ~``overlap/max_tokens`` duplication the overlap
    itself asks for — no shuffle at all (chunking rides the scan)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError('need 0 <= overlap < max_tokens')
    step = max_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)).cast('int')
    base = df.select(F.col(id_col).alias('id'), t.alias('_t'),
                     F.posexplode(F.sequence(F.lit(1), n_chunks))
                     .alias('chunk_idx', '_one'))
    chunk = F.slice(F.col('_t'), F.col('chunk_idx') * step + 1, max_tokens)
    return base.select('id', 'chunk_idx',
                       F.array_join(chunk, ' ').alias('chunk_text'),
                       F.size(chunk).alias('n_tokens'))


def fix_mojibake(col: Column | str) -> Column:
    """Repair the most common crawl encoding corruption — UTF-8 bytes
    that were mis-read as Latin-1 ('â€™' for a right
    quote, 'Ã©' for 'é') and re-emitted as UTF-8
    ("double-encoded" text). The repair is the exact inverse
    round-trip, entirely JVM-side:
    ``decode(encode(text, ISO-8859-1), UTF-8)``.

    Applied conditionally: only when the text carries a double-encoding
    signature (a Latin-1-read UTF-8 lead byte followed by a
    continuation-byte character) AND the repaired form is clean —
    re-encoding genuine Latin-1-alphabet text would corrupt it, so no
    signature means no touch. One whole-stage-codegen expression, no
    Python workers; at 100 TB this rides the same scan as every other
    text op."""
    c = F.col(col) if isinstance(col, str) else col
    # lead bytes C2-EF read as Latin-1 land in U+00C2-U+00EF;
    # continuation bytes 80-BF land in U+0080-U+00BF
    # UTF-8 lead bytes read as Latin-1: C2-DF (2-byte), E0-EF (3-byte),
    # F0-F4 (4-byte, emoji) -> U+00C2-U+00F4
    signature = c.rlike('[\\u00C2-\\u00F4][\\u0080-\\u00BF]')
    # true double-encoded text contains ONLY U+00FF-and-below (it
    # came through a Latin-1 read); any higher code point means the
    # text is already real Unicode and the Latin-1 encode would
    # destroy it
    latin1_only = ~c.rlike('[\\u0100-\\uFFFF]')
    repaired = F.decode(F.encode(c, 'ISO-8859-1'), 'UTF-8')
    # a failed repair surfaces U+FFFD replacement chars: keep original
    clean = ~repaired.contains('�')
    return F.when(signature & latin1_only & clean, repaired).otherwise(c)


def canonicalize_url(col: Column | str,
                     drop_params: tuple = ('utm_source', 'utm_medium',
                                           'utm_campaign', 'utm_term',
                                           'utm_content', 'gclid',
                                           'fbclid', 'ref')) -> Column:
    """Canonical form of a URL for dedup keys: lower-cased scheme+host,
    tracking query parameters removed, remaining query parameters
    sorted, no fragment, no trailing slash on paths. Crawls see the
    same document under dozens of URL spellings; keying exact dedup on
    the canonical form collapses them. Pure codegen (split / filter /
    array_sort / concat), no Python."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r'^([A-Za-z][A-Za-z0-9+.-]*)://',
                                      1))
    hostport = F.lower(
        F.regexp_extract(c, r'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
    # strip only the scheme's DEFAULT port; explicit non-defaults stay
    host = F.when(scheme == 'http',
                  F.regexp_replace(hostport, ':80$', '')) \
        .when(scheme == 'https', F.regexp_replace(hostport, ':443$', '')) \
        .otherwise(hostport)
    rest = F.regexp_replace(c, r'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
    rest = F.regexp_replace(rest, r'#.*$', '')           # fragment
    path = F.regexp_extract(rest, r'^([^?]*)', 1)
    path = F.when(path == '', F.lit('/')).otherwise(path)
    # strip ALL trailing slashes in one pass ('/x//' -> '/x', not
    # '/x/') so canon(canon(u)) == canon(u) — one-at-a-time stripping
    # breaks the fixed point and lets dedup keys drift between passes
    path = F.regexp_replace(path, r'(.)/+$', '$1')       # trailing slashes
    query = F.regexp_extract(rest, r'\?(.*)$', 1)
    kept = F.filter(
        F.split(query, '&'),
        lambda p: (p != '') & ~F.split(p, '=')[0].isin(*drop_params))
    qcanon = F.array_join(F.array_sort(kept), '&')
    canon = F.concat(
        scheme, F.lit('://'), host, path,
        F.when(qcanon == '', F.lit('')).otherwise(
            F.concat(F.lit('?'), qcanon)))
    # non-URL input passes through unchanged — fabricating '://' keys
    # for plain labels would collapse unrelated rows in dedup use
    return F.when(scheme == '', c).otherwise(canon)
