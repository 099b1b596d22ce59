"""Measure the driver merge-loop bounds at their edges (round-7 verdict
ask #6): latency + driver memory of the micro-batch driver path as the
(id, band, bh) bucket table approaches _MICROBATCH_BUCKET_CAP (500k) and
just past it (fallback engages), vs the distributed path on the same
corpus. Bucket rows = docs x bands, so the bucket bound binds first on
real batches (edges need a dup-dense corpus to approach 100k).

Usage: python tools/measure_merge_bounds.py   -> markdown rows for SCALE.md
"""
import sys
import time
import tracemalloc

sys.path.insert(0, '.')

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, n_docs):
    """n_docs short docs in identical PAIRS (n_docs/2 verified edges),
    16 tokens each — content derived from doc_id arithmetic."""
    return (spark.range(n_docs).select(
        F.col('id').alias('doc_id'),
        F.concat_ws(' ', *[
            F.md5(F.concat_ws('-', ((F.col('id') / 2).cast('long'))
                              .cast('string'), F.lit(str(i))))
            for i in range(16)]).alias('text')))


def main():
    import erde_spark.scale.dedup as D
    from erde_spark.session import get_spark
    spark = get_spark(app_name='merge_bounds')
    orig = D._microbatch_spanning_clusters
    seen = {}

    def spy(df, id_col, edges, buckets, *a, **kw):
        seen['buckets'] = buckets.count()
        seen['edges'] = edges.count()
        out = orig(df, id_col, edges, buckets, *a, **kw)
        seen['engaged'] = out is not None
        return out

    D._microbatch_spanning_clusters = spy
    # bands for threshold=0.9 / num_perm=96
    bands = D._threshold_bands(96, 0.9)
    print(f'bands at t=0.9/96 perm: {bands}', file=sys.stderr)
    print('| docs | bucket rows | edge rows | path | wall s | '
          'driver peak MB | distributed s |')
    print('|---|---|---|---|---|---|---|')
    for n_docs in (4_000, 12_000, int(500_000 // bands),
                   int(500_000 // bands) + 2_000):
        docs = corpus(spark, n_docs).localCheckpoint(eager=True)
        # warm
        D.dedup_clusters(docs, threshold=0.9, pair_strategy='spanning',
                         cc_probe_first=True).count()
        best, peak = float('inf'), 0
        for _ in range(3):
            seen.clear()
            tracemalloc.start()
            t0 = time.perf_counter()
            D.dedup_clusters(docs, threshold=0.9,
                             pair_strategy='spanning',
                             cc_probe_first=True).count()
            dt = time.perf_counter() - t0
            _, pk = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            best, peak = min(best, dt), max(peak, pk)
        dist_best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            D.dedup_clusters(docs, threshold=0.9,
                             pair_strategy='spanning',
                             cc_probe_first=False).count()
            dist_best = min(dist_best, time.perf_counter() - t0)
        path = 'driver' if seen.get('engaged') else 'FALLBACK'
        print(f'| {n_docs} | {seen["buckets"]} | {seen["edges"]} | {path} '
              f'| {best:.2f} | {peak / 1e6:.0f} | {dist_best:.2f} |')
        docs.unpersist()


if __name__ == '__main__':
    main()
