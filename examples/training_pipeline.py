"""End-to-end training-data curation pipeline over the documents table —
the scale-extension operators composed the way a 100 TB corpus run would:

0. crawl hygiene    — mojibake repair (conditional JVM round trip),
                      boilerplate-line removal (corpus-frequent lines),
                      robots.txt compliance + canonical-URL exact dedup
1. quality gate     — JVM-side heuristics (length / punctuation /
                      stopword ratios) + REAL language identification
                      (30-language char-n-gram NB, broadcast model)
2. exact dedup      — one hash-groupBy, keep the smallest doc_id
3. near-dedup       — MinHash + banded LSH candidate pairs, exact-Jaccard
                      verified, connected components, one survivor per
                      cluster
4. decontamination  — drop docs sharing word 4-grams with the eval
                      slice (eval n-grams broadcast; corpus never
                      shuffled by n-gram)
5. repetition gate  — Gopher duplicate-bigram fraction ceiling, then an
                      LM-quality floor (corpus unigram-LM log-prob,
                      CCNet-style — bottom 5% dropped)
6. corpus mixing    — rebalance to target language proportions
                      (deterministic hash-rank quotas)
7. tokenize + stats — BPE-ish token counts for the survivors
8. sequence packing — concat-then-chunk offsets per language shard
9. z-order layout   — cluster output by (lang, n_tokens) so downstream
                      scans prune row groups

Every step is a lazy DataFrame transform; nothing collects to the driver.

Run:  python examples/training_pipeline.py [sf_dir] [out.parquet]
"""

import sys

from pyspark.sql import functions as F

from erde_spark.session import get_spark, load_tables


def curate(spark, sf_dir: str):
    from erde_spark.operators.zorder import cluster_by_zorder
    from erde_spark.scale.dedup import dedup_clusters, exact_dedup
    from erde_spark.scale.text import quality_score

    docs = load_tables(spark, sf_dir, 'documents')['documents']

    # 0. crawl hygiene: fix double-encoded text, strip corpus-frequent
    #    boilerplate lines, honor robots.txt, and collapse URL-spelling
    #    duplicates on the canonical form (all JVM-side)
    from erde_spark.scale.robots import parse_robots, robots_filter
    from erde_spark.scale.text import (canonicalize_url, fix_mojibake,
                                       remove_boilerplate_lines)
    docs = docs.withColumn('text', fix_mojibake(F.col('text')))
    # within-document repeated lines first (templated nav/footer blocks
    # repeated INSIDE one page — invisible to the corpus-wide counter),
    # then corpus-frequent boilerplate lines
    from erde_spark.scale.text import dedup_lines_within_doc
    docs = dedup_lines_within_doc(docs)
    cleaned = remove_boilerplate_lines(docs, min_count=20)
    docs = docs.drop('text').join(cleaned, 'doc_id')
    if 'source' in docs.columns:
        # hosts' robots.txt bodies would come from the crawl store;
        # empty here, but this is the production call shape
        robots = spark.createDataFrame(
            [], 'domain string, robots_txt string')
        docs = robots_filter(docs, parse_robots(robots),
                             url_col='source')
        # canonical-URL exact dedup: same page under many spellings.
        # Non-URL sources (this demo corpus uses plain labels) fall
        # back to a per-row key so they are never collapsed.
        is_url = F.col('source').rlike('^[A-Za-z][A-Za-z0-9+.-]*://')
        key = F.when(is_url, canonicalize_url(F.col('source'))).otherwise(
            F.concat(F.lit('_row_'), F.col('doc_id').cast('string')))
        docs = docs.withColumn('_curl', key)
        first = docs.groupBy('_curl').agg(F.min('doc_id').alias('doc_id'))
        docs = docs.join(first.select('doc_id'), 'doc_id', 'left_semi') \
                   .drop('_curl')
        # domain-frequency cap: no host may dominate the corpus
        # (skew-aware — under-cap hosts never enter the rank window).
        # Materialize the hygiene stage first: cap_per_key references
        # its input three times (count/pass-through/rank) and the
        # hygiene plan above already self-joins several times — an
        # uncheckpointed reference would double the analyzed subtree
        # per use (in production this boundary is a parquet write)
        from erde_spark.scale.sampling import cap_per_key
        from erde_spark.scale.text import url_domain
        docs = docs.localCheckpoint(eager=True)
        docs = (cap_per_key(docs.withColumn('_dom',
                                            url_domain(F.col('source'))),
                            '_dom', cap=100_000).drop('_dom'))

    # 1. quality + language gate: quality is a codegen expression;
    #    language comes from the REAL identifier (30-language char-
    #    n-gram NB, broadcast model) — the front gate every production
    #    curation pipeline runs before anything else
    from erde_spark.scale.langid import identify_language
    tags = (identify_language(docs)
            .select(F.col('id').alias('doc_id'),
                    F.col('lang').alias('lang_guess'), 'lang_score'))
    docs = (docs.join(tags, 'doc_id')
                .withColumn('quality', quality_score(F.col('text')))
                .filter((F.col('quality') > 0.3) & (F.length('text') >= 40)
                        & (F.col('lang_guess') != 'und')))

    # materialize the gate stage: langid/quality joined twice below and
    # every later stage re-references docs — stage boundaries keep the
    # analyzed plan linear in pipeline length instead of exponential
    # (in production each boundary is a parquet write between jobs)
    docs = docs.localCheckpoint(eager=True)

    # 2. exact dedup: keep the lowest doc_id of each identical text
    keep = exact_dedup(docs, id_col='doc_id', text_col='text')
    docs = docs.join(keep.select('doc_id'), 'doc_id', 'left_semi')

    # 3. near-dedup: dedup_clusters returns ONE representative row per
    #    MinHash-LSH connected component (singletons included)
    docs = dedup_clusters(docs, threshold=0.85).localCheckpoint(eager=True)

    # 4. decontamination against the held-out eval slice
    from erde_spark.scale.text import (contamination_hits,
                                       dup_ngram_fraction, pack_offsets)
    ev = docs.filter(F.col('doc_id') % 97 == 0)
    corpus = docs.filter(F.col('doc_id') % 97 != 0)
    dirty = contamination_hits(corpus, ev, n=4)
    docs = corpus.join(dirty.select('doc_id'), 'doc_id', 'left_anti')

    # 5. repetition ceiling (boilerplate / looping generations)
    docs = docs.filter(dup_ngram_fraction(F.col('text'), 2) < 0.5)

    # 5b. LM-quality floor: drop the lowest-scoring tail under the
    #     corpus's own unigram LM (CCNet-style proxy — catches noise
    #     the heuristic gates miss). Threshold = bottom ~5% by score.
    from erde_spark.scale.text import unigram_logprob
    # materialize: both the quantile action and the join below read it
    lp = unigram_logprob(docs).localCheckpoint(eager=True)
    cutoff = lp.approxQuantile('avg_logprob', [0.05], 0.01)[0]
    docs = docs.join(lp.filter(F.col('avg_logprob') >= cutoff)
                     .select(F.col('id').alias('doc_id')),
                     'doc_id', 'left_semi')

    # 6. rebalance to a target language mix (binding group kept whole)
    from erde_spark.scale.sampling import target_mix
    docs = target_mix(docs, 'lang', 'doc_id',
                      {'en': 0.4, 'de': 0.2, 'fr': 0.2, 'es': 0.1,
                       'zh': 0.1})

    # 7. token statistics for the survivors
    pat = r' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'
    docs = docs.withColumn('n_tokens', F.regexp_count('text', F.lit(pat)))

    # 8. sequence-packing offsets, per language shard
    offsets = pack_offsets(docs, max_tokens=512, shard_col='lang')
    docs = docs.join(offsets.select('doc_id', 'start_offset', 'first_seq'),
                     'doc_id')

    # 9. z-ordered layout for downstream scan pruning
    docs = docs.withColumn('lang_code',
                           F.crc32(F.col('lang')).bitwiseAND(F.lit(0xFFFF)))
    return cluster_by_zorder(docs, ['lang_code', 'n_tokens'], num_partitions=8)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name='training_pipeline')
    result = curate(spark, sf_dir)
    if out and out.endswith('.wds'):
        # 10. hand the curated corpus straight to a training loader:
        # WebDataset tar shards (or swap in write_tfrecord for TFRecord)
        from erde_spark.io.wds import write_webdataset
        write_webdataset(result.select('doc_id', 'text', 'lang'), out,
                         shard_size=10_000)
        print(f'wrote WebDataset shards to {out}')
    elif out:
        result.write.mode('overwrite').parquet(out)
        print(f'wrote {spark.read.parquet(out).count()} curated docs to {out}')
    else:
        print(f'curated docs: {result.count()}')


if __name__ == '__main__':
    main()
