"""Crawl-ingest pipeline: raw HTML pages to a clean, split corpus — the
front half that feeds examples/training_pipeline.py, composed from the
round-4 ingest operators the way a recurring 100 TB crawl run would:

1. HTML -> text       — whole-stage-codegen regex extraction (tags,
                        scripts, entities, whitespace), text_ratio gate
                        to drop markup soup
2. normalize          — NFC + control-char / unicode-space cleanup
3. PII scrub          — email/card/phone/IP redaction in one regex pass
4. passage dedup      — remove later duplicates of any 20-token passage
                        (boilerplate shared across pages)
5. snapshot dedup     — drop documents the previous snapshot already
                        contains (exact fingerprint anti-join)
6. DSIR selection     — keep the documents most like a small target
                        corpus (hashed n-gram importance weights)
7. leakage-safe split — train/val/test keyed on content fingerprints so
                        duplicates can never straddle train and eval

Every step is a lazy DataFrame transform; the only driver-side values
are two bounded scalar totals inside DSIR and the corpus count that
sizes the selection quota.

Run:  python examples/web_ingest.py [sf_dir] [out.parquet]
"""

import sys

from pyspark.sql import functions as F

from erde_spark.session import get_spark, load_tables


def ingest(spark, sf_dir: str, select_k: int | None = None):
    from erde_spark.scale.dedup import dedup_against, drop_duplicate_passages
    from erde_spark.scale.dsir import dsir_topk
    from erde_spark.scale.html import html_extract
    from erde_spark.scale.sampling import split_no_leakage
    from erde_spark.scale.text import normalize_text, pii_scrub

    docs = load_tables(spark, sf_dir, 'documents')['documents']

    # stand-in crawl: wrap each document in an HTML shell (a real run
    # reads WARC-derived parquet with an html column)
    pages = docs.select(
        'doc_id', 'lang',
        F.concat(F.lit('<html><head><title>d</title></head><body>'
                       '<script>nav();</script><p>'),
                 F.col('text'),
                 F.lit('</p><a href="https://example.com/x">m</a>'
                       '</body></html>')).alias('html'))

    # 1. extract + junk gate
    ex = html_extract(pages, 'html').filter(F.col('text_ratio') > 0.3)

    # 2-3. normalize, scrub
    clean = ex.select('doc_id', 'lang',
                      normalize_text('text').alias('text'))
    clean = pii_scrub(clean).select('doc_id', 'lang',
                                    F.col('text_scrubbed').alias('text'))

    # 4. passage-level dedup (first occurrence wins), drop emptied docs
    passaged = drop_duplicate_passages(clean, window=20) \
        .withColumnRenamed('id', 'doc_id')
    clean = (clean.drop('text')
             .join(passaged, 'doc_id')
             .filter(F.length('text') > 0))

    # 5. snapshot dedup: previous snapshot = every 7th doc (stand-in)
    prev = clean.filter(F.col('doc_id') % 7 == 0)
    fresh = dedup_against(clean.filter(F.col('doc_id') % 7 != 0), prev)

    # 6. DSIR: keep the documents most like the English slice
    target = fresh.filter(F.col('lang') == 'en')
    k = select_k if select_k else max(50, fresh.count() // 2)
    picked = dsir_topk(fresh, target, k).select(
        F.col('id').alias('doc_id'), 'log_weight')
    fresh = fresh.join(picked, 'doc_id')

    # 7. duplicate-safe split
    return split_no_leakage(fresh, {'train': 0.9, 'val': 0.05,
                                    'test': 0.05})


def main(sf_dir: str, out_path: str) -> None:
    spark = get_spark()
    out = ingest(spark, sf_dir)
    out.write.mode('overwrite').parquet(out_path)
    print(f'{out.count()} curated rows -> {out_path}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001',
         sys.argv[2] if len(sys.argv) > 2 else '/tmp/web_ingest_out.parquet')
