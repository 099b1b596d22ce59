"""The standard curation pipeline as ONE composition: normalize ->
language gate -> quality rules -> compression band -> PII scrub ->
dedup, in the published stage order (C4/CCNet/Gopher pipelines all run
shape-rules before pair-level dedup, because dedup is the expensive
stage and every earlier filter shrinks its input).

``curate`` exists for two reasons beyond convenience. First, plan
fusion: every stage up to dedup is a narrow column expression, so
composing them HERE means Catalyst fuses normalize + langid + quality
+ PII into a single whole-stage-codegen pass over the scan — running
the stages as separate jobs re-reads the corpus once per stage, which
at 100 TB is the difference between one pass and six. Second, a
pinned, documented stage order with one audit trail (``keep_stats``)
instead of ad-hoc scripts that each order the stages differently.

Scale shape: stages 1-5 are map-only (zero shuffle; the one Arrow
boundary is the optional zlib kernel). Dedup adds the one shuffle
exact dedup needs (hash groupBy on the fingerprint) or the documented
minhash join graph. ``keep_stats=True`` adds per-stage survivor
counts; it costs one extra action per stage, so leave it off in
production runs and measure on samples.

Composition note: chaining curate with further expression-heavy
operators (span corruption, UL2) in ONE plan can push a generated
method past the JVM's 64 KB limit; Spark then logs a codegen compile
error and falls back to interpreted execution for that stage —
correct, just slower. If a profiled hot path hits it, break the
pipeline with an eager ``localCheckpoint`` at the stage boundary so
each side compiles separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the canonical stage order; subset via ``steps=`` (order is fixed —
#: requesting a subset reorders nothing)
CURATE_STEPS = ('normalize', 'langid', 'quality', 'compression',
                'pii', 'dedup')


def curate(docs: DataFrame, steps=CURATE_STEPS, id_col: str = 'doc_id',
           text_col: str = 'text', langs: tuple | None = ('en',),
           langid_model=None, quality_bounds: dict | None = None,
           min_ratio: float = 1.05, max_ratio: float = 12.0,
           dedup: str = 'exact', dedup_threshold: float = 0.8,
           keep_stats: bool = False):
    """Run the standard curation stages in the pinned order and return
    the cleaned DataFrame (same columns; ``text_col`` rewritten by
    normalize/PII; a ``lang_pred`` column is ADDED only in the
    tag-without-filtering mode ``langs=None`` — filtering runs drop
    it). Unknown step names raise; stages not requested are skipped
    without reordering the rest.

    - ``normalize``: NFC + control-strip + space canonicalization
      (:func:`~erde_spark.scale.text.normalize_text`).
    - ``langid``: keep rows whose identified language is in ``langs``
      (:func:`~erde_spark.scale.langid.identify_language`; pass
      ``langs=None`` to tag without filtering).
    - ``quality``: conjunction of the Gopher-style rule flags
      (:func:`~erde_spark.scale.text.gopher_quality_flags`, bounds
      overridable via ``quality_bounds``).
    - ``compression``: zlib ratio inside [min_ratio, max_ratio]
      (:func:`~erde_spark.scale.text.compression_filter`).
    - ``pii``: redact emails/cards/phones/IPs in place
      (:func:`~erde_spark.scale.text.pii_scrub`; count columns are
      dropped, the scrub is what survives).
    - ``dedup``: ``'exact'`` keeps the min-id representative per
      normalized fingerprint (one groupBy); ``'minhash'`` drops
      near-duplicates above ``dedup_threshold`` keeping each cluster's
      min id (the LSH join graph); ``None``/'none' skips.

    Returns ``df`` — or ``(df, stats)`` with per-stage survivor counts
    when ``keep_stats=True`` (stats is a list of (stage, rows) tuples,
    'input' first; forces one action per stage).
    """
    from .text import (compression_filter, gopher_quality_flags,
                       normalize_text, pii_scrub, quality_filter)  # noqa: F401
    unknown = set(steps) - set(CURATE_STEPS)
    if unknown:
        raise ValueError(f'unknown curate steps {sorted(unknown)}; '
                         f'known: {list(CURATE_STEPS)}')
    df = docs
    stats = [('input', df.count())] if keep_stats else None

    def _mark(stage):
        if keep_stats:
            stats.append((stage, df.count()))

    if 'normalize' in steps:
        df = df.withColumn(text_col, normalize_text(F.col(text_col)))
        _mark('normalize')
    if 'langid' in steps:
        from .langid import identify_language
        # collision-safe internal name: the caller's own lang_pred (if
        # any) must survive untouched when we only filter
        ided = identify_language(df, model=langid_model, id_col=id_col,
                                 text_col=text_col) \
            .select(F.col('id').alias(id_col),
                    F.col('lang').alias('__lang_pred'))
        df = df.join(ided, id_col, 'left')
        if langs is not None:
            df = df.where(F.col('__lang_pred').isin(*langs)) \
                   .drop('__lang_pred')
        else:
            if 'lang_pred' in df.columns:
                raise ValueError(
                    "curate(langs=None) tags a lang_pred column but the "
                    "input already has one — rename it or pass langs to "
                    "filter instead of tag")
            df = df.withColumnRenamed('__lang_pred', 'lang_pred')
        _mark('langid')
    if 'quality' in steps:
        flags = gopher_quality_flags(F.col(text_col),
                                     **(quality_bounds or {}))
        df = df.withColumn('__q', flags).where(
            F.col('__q.tokens_ok') & F.col('__q.mean_len_ok')
            & F.col('__q.punct_ok') & F.col('__q.stopwords_ok')) \
            .drop('__q')
        _mark('quality')
    if 'compression' in steps:
        df = compression_filter(df, text_col=text_col,
                                min_ratio=min_ratio, max_ratio=max_ratio)
        _mark('compression')
    if 'pii' in steps:
        scrubbed = pii_scrub(df, text_col=text_col)
        # keep the caller's columns, text replaced by the scrub
        df = scrubbed.select(*[
            F.col('text_scrubbed').alias(text_col) if c == text_col
            else F.col(c) for c in df.columns])
        _mark('pii')
    if 'dedup' in steps and dedup not in (None, 'none'):
        if dedup == 'exact':
            # min-id-per-fingerprint via a window, NOT exact_dedup +
            # semi join: the join's two plan branches would each
            # re-run the whole upstream stage chain (including the
            # Arrow zlib kernel) — one window keeps the pipeline a
            # single pass over the scan plus one shuffle
            from pyspark.sql import Window

            from .text import fingerprint
            w = Window.partitionBy(fingerprint(F.col(text_col)))
            df = (df.withColumn('__keep',
                                F.col(id_col) == F.min(id_col).over(w))
                  .where('__keep').drop('__keep'))
        elif dedup == 'minhash':
            from .dedup import dedup_clusters
            df = dedup_clusters(df, id_col=id_col, text_col=text_col,
                                threshold=dedup_threshold) \
                .drop('cluster_size')
        else:
            raise ValueError(f'unknown dedup mode {dedup!r}')
        _mark('dedup')
    return (df, stats) if keep_stats else df
