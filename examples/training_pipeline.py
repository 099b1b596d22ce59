"""End-to-end training-data curation pipeline over the documents table —
the scale-extension operators composed the way a 100 TB corpus run would:

1. quality gate     — JVM-side heuristics (length / punctuation /
                      stopword ratios), language-ID filter
2. exact dedup      — one hash-groupBy, keep the smallest doc_id
3. near-dedup       — MinHash + banded LSH candidate pairs, exact-Jaccard
                      verified, connected components, one survivor per
                      cluster
4. tokenize + stats — BPE-ish token counts for the survivors
5. z-order layout   — cluster output by (lang, n_tokens) so downstream
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
    from erde_spark.scale.text import lang_id, quality_score

    docs = load_tables(spark, sf_dir, 'documents')['documents']

    # 1. quality + language gate (all whole-stage-codegen expressions)
    docs = (docs.withColumn('quality', quality_score(F.col('text')))
                .withColumn('lang_guess', lang_id(F.col('text')))
                .filter((F.col('quality') > 0.3) & (F.length('text') >= 40)))

    # 2. exact dedup: keep the lowest doc_id of each identical text
    keep = exact_dedup(docs, id_col='doc_id', text_col='text')
    docs = docs.join(keep.select('doc_id'), 'doc_id', 'left_semi')

    # 3. near-dedup: dedup_clusters returns ONE representative row per
    #    MinHash-LSH connected component (singletons included)
    docs = dedup_clusters(docs, threshold=0.85)

    # 4. token statistics for the survivors
    pat = r' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'
    docs = docs.withColumn('n_tokens', F.regexp_count('text', F.lit(pat)))

    # 5. z-ordered layout for downstream scan pruning
    docs = docs.withColumn('lang_code',
                           F.crc32(F.col('lang')).bitwiseAND(F.lit(0xFFFF)))
    return cluster_by_zorder(docs, ['lang_code', 'n_tokens'], num_partitions=8)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name='training_pipeline')
    result = curate(spark, sf_dir)
    if out:
        result.write.mode('overwrite').parquet(out)
        print(f'wrote {spark.read.parquet(out).count()} curated docs to {out}')
    else:
        print(f'curated docs: {result.count()}')


if __name__ == '__main__':
    main()
