"""Direct scale-up evidence for the dedup/sjoin/curation family.

Synthesizes a 10x corpus ("sf1") from the sf0.1 testdata and runs the
headline scale-path operators at both sizes, recording wall seconds,
total shuffle-write bytes (Spark /api/v1 stage metrics) and output rows.
Observed scaling close to ~10x in time and shuffle for a 10x input is
the direct evidence behind the "would survive 100x" plan-shape claims.

The 10x corpus construction keeps the duplicate STRUCTURE of each copy
while making copies mutually dissimilar (every token gets a per-copy
suffix, so cross-copy Jaccard is 0): the result is 10 independent
shards, whose ground truth is exactly 10x the sf0.1 one — the right
fixture for verifying linear scaling (10x dup-density would instead
scale pair outputs quadratically by design).

Usage: SPARK_GRAFT_UI=1 python tools/scale_check.py [--runs N]
Writes results as a markdown table on stdout (paste into SCALE.md).
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, '.')

SF01 = '/root/testdata/sf0.1'
SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.scale_sf1')


def shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f'{ui}/api/v1/applications/{app}/stages?status=complete'))
    return sum(s.get('shuffleWriteBytes', 0) for s in stages)


def build_sf1(spark):
    """10 mutually-dissimilar copies of the sf0.1 documents + customer
    + embeddings. Embedding copies go through a per-copy random ROTATION
    (seeded QR): rotations preserve every intra-copy cosine exactly, so
    the near-dup ground truth is exactly 10x sf0.1's, while cross-copy
    cosines are random (~N(0, 1/sqrt(dim)) — far below threshold). The
    right fixture for verifying linear scaling of the embedding tier."""
    from pyspark.sql import functions as F
    if all(os.path.isdir(os.path.join(SF1_DIR, f'{t}.parquet'))
           for t in ('documents', 'customer', 'nation', 'embeddings')):
        return
    docs = spark.read.parquet(f'{SF01}/documents.parquet')
    n = docs.agg(F.max('doc_id')).first()[0] + 1
    copies = []
    for i in range(10):
        copies.append(docs.select(
            (F.col('doc_id') + i * n).alias('doc_id'),
            F.regexp_replace('text', r'(\S+)', r'$1' + f'x{i}').alias('text'),
            'lang'))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode('overwrite').parquet(f'{SF1_DIR}/documents.parquet')
    cust = spark.read.parquet(f'{SF01}/customer.parquet')
    m = cust.agg(F.max('c_custkey')).first()[0] + 1
    cc = [cust.withColumn('c_custkey', F.col('c_custkey') + i * m)
          for i in range(10)]
    outc = cc[0]
    for c in cc[1:]:
        outc = outc.unionByName(c)
    outc.write.mode('overwrite').parquet(f'{SF1_DIR}/customer.parquet')
    for t in ('nation',):
        spark.read.parquet(f'{SF01}/{t}.parquet').write.mode(
            'overwrite').parquet(f'{SF1_DIR}/{t}.parquet')
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    emb = spark.read.parquet(f'{SF01}/embeddings.parquet')
    dim = len(emb.first()['embedding'])
    ne = emb.agg(F.max('vec_id')).first()[0] + 1
    rng = np.random.RandomState(1234)

    def _vec_udf(fn):
        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def _u(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype='object')
            m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
            return pd.Series(list(fn(m).astype(np.float32)))
        return _u

    # the raw synthetic embeddings carry ~no pairs above 0.9, so the
    # fixture PLANTS near-dups (5% of vectors + small noise, cosine
    # ~0.999) into the base; sf1 then sees exactly 10x the base's pairs
    noise = rng.normal(size=(ne, dim)) * 0.02

    def _perturb(m):
        nz = noise[:len(m)]
        out = m / np.linalg.norm(m, axis=1, keepdims=True) + nz
        return out

    dup_src = emb.filter(F.col('vec_id') % 20 == 0)
    planted = dup_src.select((F.col('vec_id') + ne).alias('vec_id'),
                             _vec_udf(_perturb)(F.col('embedding'))
                             .alias('embedding'), 'label')
    base = emb.unionByName(planted)
    base.write.mode('overwrite').parquet(f'{SF1_DIR}/embeddings01.parquet')
    base = spark.read.parquet(f'{SF1_DIR}/embeddings01.parquet')
    nb = 2 * ne
    copies_e = []
    for i in range(10):
        q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
        copies_e.append(base.select(
            (F.col('vec_id') + i * nb).alias('vec_id'),
            _vec_udf(lambda m, q=q: m @ q.T)(F.col('embedding'))
            .alias('embedding'), 'label'))
    oute = copies_e[0]
    for c in copies_e[1:]:
        oute = oute.unionByName(c)
    oute.write.mode('overwrite').parquet(f'{SF1_DIR}/embeddings.parquet')


def build_sf1_events(spark):
    """10 user-disjoint copies of the sf0.1 events (user_id and
    event_id offset per copy): interval-join ground truth is exactly
    10x sf0.1's because cross-copy users never match."""
    from pyspark.sql import functions as F
    if os.path.isdir(f'{SF1_DIR}/events.parquet'):
        return
    ev = spark.read.parquet(f'{SF01}/events.parquet')
    nu = ev.agg(F.max('user_id')).first()[0] + 1
    ne = ev.agg(F.max('event_id')).first()[0] + 1
    copies = [ev.select((F.col('event_id') + i * ne).alias('event_id'),
                        'ts', (F.col('user_id') + i * nu).alias('user_id'),
                        'event_type', 'value', 'props')
              for i in range(10)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode('overwrite').parquet(f'{SF1_DIR}/events.parquet')


def op_zarr_roundtrip(spark, sf):
    """zarr v2 write+read: one grid shuffle on write, shuffle-0 read
    (one task per chunk band) — time should track rows."""
    import os as _os
    import tempfile

    from erde_spark.io.zarr import read_zarr, write_zarr
    e = spark.read.parquet(f'{sf}/embeddings.parquet')
    out = _os.path.join(tempfile.gettempdir(),
                        'zarr_scale_' + _os.path.basename(sf.rstrip('/')))
    write_zarr(e.repartition(32), out, value_col='embedding',
               chunk_rows=2048)
    return read_zarr(out, spark).select('row_id')


def op_bloom_decon(spark, sf):
    """Bloom-prefiltered decontamination: eval side fixed (doc_id%97
    slice of the BASE corpus at both sizes would shrink relatively —
    instead %97 of each sf's own corpus, so eval grows with corpus and
    the verify join's candidate side stays ~hit-rate x corpus)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.bloom import decontaminate_bloom
    d = spark.read.parquet(f'{sf}/documents.parquet')
    ev = d.filter(F.col('doc_id') % 97 == 0)
    corpus = d.filter(F.col('doc_id') % 97 != 0)
    return decontaminate_bloom(corpus, ev, n=4).select('doc_id')


def op_stream_interval_join(spark, sf):
    """Watermarked interval join, batch expression (the plan is the
    same operator chain the streaming job runs): one range-condition
    join whose cost tracks candidate pairs per user — sf1's 10
    user-disjoint copies make output exactly 10x, and time/shuffle
    should follow."""
    from pyspark.sql import functions as F

    from erde_spark.streaming.windows import stream_interval_join
    if sf == SF1_DIR:
        build_sf1_events(spark)
    ev = spark.read.parquet(f'{sf}/events.parquet')
    ts = F.col('ts').cast('timestamp')
    views = ev.filter(F.col('event_type') == 'view').select(
        'user_id', F.col('event_id').alias('view_id'), ts.alias('view_ts'))
    clicks = ev.filter(F.col('event_type') == 'click').select(
        'user_id', F.col('event_id').alias('click_id'),
        ts.alias('click_ts'))
    return stream_interval_join(views, clicks, 'user_id', 'view_ts',
                                'click_ts', '2 hours') \
        .select('view_id', 'click_id')


def op_d4(spark, sf):
    """D4 = semdedup + per-cluster prototype drop: with cluster size
    pinned (n/256, the semdedup linearity posture) both phases should
    track ~10x for 10x rows; the extra cost over semdedup is one
    narrow centroid-cosine pass + one rank-window shuffle."""
    from erde_spark.scale.dedup import d4_select
    e = spark.read.parquet(f'{sf}/embeddings.parquet')
    n = e.count()
    return d4_select(e, threshold=0.95, proto_frac=0.25,
                     n_clusters=max(16, n // 256), n_docs=n) \
        .select('vec_id')


def op_dedup_clusters(spark, sf):
    from erde_spark.scale.dedup import dedup_clusters
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return dedup_clusters(d, threshold=0.9).select('doc_id', 'cluster_size')


def op_minhash_lsh(spark, sf):
    from erde_spark.scale.dedup import minhash_lsh_pairs
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return minhash_lsh_pairs(d, threshold=0.9)


def op_sjoin(spark, sf):
    import __spark_entry__ as e
    from erde_spark.operators.sjoin import sjoin
    cust = spark.read.parquet(f'{sf}/customer.parquet')
    nation = spark.read.parquet(f'{sf}/nation.parquet')
    pts = e._cust_points(cust)
    rects = e._nation_rects(nation)
    return sjoin(pts, rects, op='within').select(
        'c_custkey', 'n_nationkey', 'n_name')


def op_contamination(spark, sf):
    from pyspark.sql import functions as F

    from erde_spark.scale.text import contamination_hits
    d = spark.read.parquet(f'{sf}/documents.parquet')
    ev = d.filter(F.col('doc_id') % 97 == 0)
    corpus = d.filter(F.col('doc_id') % 97 != 0)
    return contamination_hits(corpus, ev, n=4)


def _emb(spark, sf):
    """The embedding fixture: planted-dup base for the small side (the
    raw sf0.1 table has ~no pairs over 0.9), rotated 10x for sf1."""
    path = (f'{SF1_DIR}/embeddings01.parquet' if sf == SF01
            else f'{sf}/embeddings.parquet')
    return spark.read.parquet(path)


def op_embedding_clusters(spark, sf):
    from erde_spark.scale.dedup import embedding_dedup_clusters
    return embedding_dedup_clusters(_emb(spark, sf), threshold=0.9) \
        .select('vec_id', 'cluster_size')


def op_embedding_lsh_pairs(spark, sf):
    from erde_spark.scale.dedup import embedding_lsh_pairs
    return embedding_lsh_pairs(_emb(spark, sf), threshold=0.8)


def op_similarity_ivfpq(spark, sf):
    from pyspark.sql import functions as F

    from erde_spark.scale.similarity import ivfpq_topk
    e = _emb(spark, sf)
    q = e.filter(F.col('vec_id') % 100 == 0)  # query count scales with corpus
    # n_lists left to the sqrt(n) default: a fixed list count makes
    # per-probe scans grow linearly with the corpus (measured 29x time
    # for 10x rows at n_lists=16)
    return ivfpq_topk(e, q, k=5, n_probes=6, m=16, ks=64, refine=8)


def op_streaming_backfill(spark, sf):
    import __spark_entry__ as e
    return e.q_streaming_neardup_backfill(spark, sf)


def op_dsir_weights(spark, sf):
    from pyspark.sql import functions as F

    from erde_spark.scale.dsir import dsir_logweights
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return dsir_logweights(d, d.filter(F.col('lang') == 'en'))


def op_passage_dedup(spark, sf):
    from erde_spark.scale.dedup import passage_dedup_report
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return passage_dedup_report(d)


def op_html_extract(spark, sf):
    from pyspark.sql import functions as F

    from erde_spark.scale.html import html_extract
    d = spark.read.parquet(f'{sf}/documents.parquet')
    wrapped = d.select('doc_id', F.concat(
        F.lit('<html><head><title>t</title><style>p{}</style></head><body>'
              '<script>var x = 1;</script><p>'),
        F.col('text'),
        F.lit('</p><a href="https://e.com/x">l</a></body></html>'))
        .alias('html'))
    return html_extract(wrapped, 'html').select('doc_id', 'n_links',
                                                'text_ratio')


def op_phash_hamming_join(spark, sf):
    """Isolates the Manku banded Hamming join's scaling: random 64-bit
    hashes (worst case — no real clusters, pure bucket-collision cost)
    at corpus-proportional counts, k=4 (the recommended crawl-scale
    threshold; the candidate volume grows ~n^2/2^keybits, so the
    measured exponent is the honest number to watch)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.imagehash import hamming_neardup_pairs
    n = 50_000 if sf == SF01 else 500_000
    h = spark.range(n).select(F.col('id').alias('asset_id'),
                              F.xxhash64('id').alias('phash'))
    return hamming_neardup_pairs(h, max_hamming=4, n_docs=n)


def op_image_dedup_planted(spark, sf):
    """The full image-dedup tail (Manku band join + connected
    components) on a PLANTED-duplicate hash population — the imagehash
    analogue of the rotated-embedding fixture: 20% of assets sit in
    visual classes of 5 (each member one random bit-flip off the class
    base hash, so intra-class Hamming <= 2 while cross-class is ~32),
    80% are random singletons. Ground truth clusters scale exactly
    linearly, so super-linear time/shuffle here is algorithmic, not
    data-density, cost. (The decode+hash stage is a linear mapInPandas
    pass measured by the media bench entries; this isolates the join
    graph.)"""
    from pyspark.sql import functions as F

    from erde_spark.scale.imagehash import image_dedup_clusters
    n = 50_000 if sf == SF01 else 500_000
    n_pl = n // 5
    base = F.xxhash64((F.col('id') / 5).cast('long'), F.lit(1))
    flip = F.expr('shiftleft(1L, cast(pmod(xxhash64(id, 7), 64) as int))')
    pl = spark.range(n_pl).select(
        F.col('id').alias('asset_id'),
        base.bitwiseXOR(flip).alias('phash'))
    sg = spark.range(n_pl, n).select(
        F.col('id').alias('asset_id'),
        F.xxhash64('id', F.lit(2)).alias('phash'))
    return image_dedup_clusters(pl.unionByName(sg), max_hamming=4, n_docs=n)


def op_langid(spark, sf):
    """Language ID scaling: broadcast model + one map-side-combined
    groupBy; per-document work bounded by prefix_chars, so time and
    shuffle should track ~10x for 10x documents."""
    from erde_spark.scale.langid import identify_language
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return identify_language(d)


def op_warc_roundtrip(spark, sf):
    """The crawl ingest boundary at scale: export the documents table
    to WARC segments (distributed sink, one gzip member per record) and
    stream them back through the path-only source + documents bridge.
    Both directions are embarrassingly parallel — the honest number to
    watch is wall time staying ~flat at 10x on underfilled cores and
    rows exactly 10x."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from erde_spark.io.warc import read_warc, warc_to_documents, write_warc
    d = spark.read.parquet(f'{sf}/documents.parquet').select(
        'text', F.concat(F.lit('https://x.example/'),
                         F.col('doc_id').cast('string')).alias('source'))
    out = os.path.join(tempfile.gettempdir(),
                       'warc_scale_' + os.path.basename(sf.rstrip('/')))
    write_warc(d.repartition(32), out, mode='overwrite')
    return warc_to_documents(read_warc(out, spark))


def op_shuffle_deterministic(spark, sf):
    from erde_spark.scale.sampling import shuffle_deterministic
    d = spark.read.parquet(f'{sf}/documents.parquet').select('doc_id')
    return shuffle_deterministic(d, 'doc_id', buckets=1024) \
        .select('shuffle_pos')


def op_ppl_buckets_threshold(spark, sf):
    from pyspark.sql import functions as F

    from erde_spark.scale.lm import perplexity_buckets
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'lang')
    scored = d.withColumn(
        'perplexity', (F.col('doc_id') * 37 % 10007).cast('double'))
    return perplexity_buckets(scored, method='threshold') \
        .select('doc_id', 'ppl_bucket')


def op_unimax_materialized(spark, sf):
    from erde_spark.scale.sampling import unimax_mix
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'lang')
    n = d.count()
    return unimax_mix(d, 'lang', 'doc_id', budget=n, max_epochs=2,
                      materialize=True)


def op_megatron_roundtrip(spark, sf):
    import tempfile

    from pyspark.sql import functions as F

    from erde_spark.io.megatron import read_megatron, write_megatron
    d = spark.read.parquet(f'{sf}/documents.parquet').select(
        'doc_id', F.sequence(F.lit(1), F.lit(64)).alias('tokens'))
    out = os.path.join(tempfile.gettempdir(),
                       'meg_scale_' + os.path.basename(sf.rstrip('/')))
    write_megatron(d.repartition(32), out, dtype='int32')
    return read_megatron(spark, out).select('seq_id')


def op_fim_transform(spark, sf):
    """FIM is one codegen projection: time should stay scan-bound and
    shuffle exactly 0 at any size."""
    from erde_spark.scale.text import fim_transform
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text')
    return fim_transform(d, rate=0.5).select('doc_id', 'fim_text')


def op_chat_spans(spark, sf):
    """Loss-mask spans = posexplode + one prefix-sum window keyed by
    conversation id: shuffle should track ~10x rows, no skew (unique
    small keys)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.sft import assistant_spans
    d = spark.read.parquet(f'{sf}/documents.parquet').select('doc_id')
    turn = lambda j: F.struct(
        F.when(j % 2 == 0, 'user').otherwise('assistant').alias('role'),
        F.concat(F.lit('turn '), j.cast('string'), F.lit(' of '),
                 F.col('doc_id').cast('string')).alias('content'))
    conv = d.select(
        F.col('doc_id').alias('conv_id'),
        F.transform(F.sequence(F.lit(0), (F.col('doc_id') % 6 + 1)
                               .cast('int')), turn).alias('turns'))
    return assistant_spans(conv)


def op_compression_ratio(spark, sf):
    """Arrow-batched zlib kernel: map-only (shuffle 0), wall time is
    the deflate throughput bound."""
    from erde_spark.scale.text import compression_ratio
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text')
    return compression_ratio(d).select('doc_id', 'compression_ratio')


def op_span_corrupt(spark, sf):
    """Span corruption is one codegen projection over the let-bound
    token array: shuffle 0, time scan-bound."""
    from erde_spark.scale.text import span_corrupt
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text')
    return span_corrupt(d).select('doc_id', 'inputs', 'targets')


def op_curate_exact(spark, sf):
    """The composed pipeline (compression -> pii -> exact dedup;
    quality is omitted because the sf1 fixture's per-copy token
    suffixes remove every stopword and the gate would trivially empty
    the corpus): stages fuse into one pass + the dedup window's
    single shuffle — shuffle should track ~10x rows, time
    near-flat."""
    from erde_spark.scale.pipeline import curate
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text')
    return curate(d, steps=('compression', 'pii', 'dedup'))


def op_hard_negatives(spark, sf):
    """Exact miner at a FIXED anchor count (10): work = anchors x
    corpus, so 10x corpus should cost ~10x scan at constant anchors —
    the honest exact-path scaling (anchor growth multiplies it, which
    is why ivf/lsh are the 100 TB retrievers)."""
    from pyspark.sql import functions as F

    from erde_spark.scale.similarity import mine_hard_negatives
    e = spark.read.parquet(f'{sf}/embeddings.parquet')
    q = e.where((F.col('vec_id') < 2000)
                & (F.col('vec_id') % 200 == 0))
    pos = q.select(F.col('vec_id').alias('query_id'),
                   (F.col('vec_id') + 1).alias('vec_id'))
    return mine_hard_negatives(e, q, pos, k=10)


def op_pagerank(spark, sf):
    """Iterative graph shape: ranks-table size = domains (here scaled
    with the corpus), five join+agg rounds — shuffle should track
    edge count ~linearly; the checkpoints bound lineage, so time per
    iteration stays flat across rounds."""
    from pyspark.sql import functions as F

    from erde_spark.scale.graphrank import pagerank
    d = spark.read.parquet(f'{sf}/documents.parquet').select('doc_id')
    n_dom = 500 if sf == SF01 else 5000
    r = F.col('doc_id') % n_dom
    e1 = d.select(r.alias('src'),
                  ((F.col('doc_id') * 7 + 3) % n_dom).alias('dst'))
    e2 = d.select(r.alias('src'), ((r * r + 1) % n_dom).alias('dst'))
    edges = e1.unionByName(e2).where(F.col('src') != F.col('dst'))
    return pagerank(edges, iterations=5)


def op_avro_roundtrip(spark, sf):
    """Pure-Python per-record codec: the honest number to watch is
    rows/s staying proportional (time ~10x for 10x rows on
    underfilled cores is acceptable; the format is interchange, not a
    hot analytical path)."""
    import os as _os
    import tempfile

    from erde_spark.io.avro_ocf import read_avro, write_avro
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text', 'lang')
    out = _os.path.join(tempfile.gettempdir(),
                        'avro_scale_' + _os.path.basename(sf.rstrip('/')))
    write_avro(d.repartition(32), out)
    return read_avro(spark, out).select('doc_id')


def op_semdedup(spark, sf):
    """SemDeDup with cluster SIZE pinned (n_clusters ~ n/256): per-task
    pairwise work stays constant, so total time/shuffle should track
    ~10x for 10x rows (the sqrt(n) default instead gives the paper's
    n^1.5 total pairwise compute — fine at fixed k, wrong for a
    linearity harness). sf1's per-copy rotations preserve intra-copy
    cosines, so planted dup structure is exactly 10x sf0.1's."""
    from erde_spark.scale.dedup import semdedup
    e = spark.read.parquet(f'{sf}/embeddings.parquet')
    n = e.count()
    return semdedup(e, threshold=0.95,
                    n_clusters=max(16, n // 256), n_docs=n) \
        .select('vec_id')


def op_zst_roundtrip(spark, sf):
    """jsonl.zst write+read: line shoveling in Python, JSON JVM-side;
    shuffle 0 both directions — the honest number is rows/s staying
    proportional."""
    import os as _os
    import tempfile

    from erde_spark.io.zst import read_jsonl_zst, write_jsonl_zst
    d = spark.read.parquet(f'{sf}/documents.parquet') \
        .select('doc_id', 'text', 'lang')
    out = _os.path.join(tempfile.gettempdir(),
                        'zst_scale_' + _os.path.basename(sf.rstrip('/')))
    write_jsonl_zst(d.repartition(32), out)
    return read_jsonl_zst(out, spark,
                          schema='doc_id bigint, text string, lang string') \
        .select('doc_id')


def op_npy_roundtrip(spark, sf):
    """npy write+read: fixed-stride binary, byte-range sliced read;
    shuffle 0 — scan-bound, time ~rows."""
    import os as _os
    import tempfile

    from erde_spark.io.npy import read_npy, write_npy
    e = spark.read.parquet(f'{sf}/embeddings.parquet')
    out = _os.path.join(tempfile.gettempdir(),
                        'npy_scale_' + _os.path.basename(sf.rstrip('/')))
    write_npy(e.repartition(32), out, value_col='embedding')
    return read_npy(out, spark).select('row_id')


def op_build_postings(spark, sf):
    """Inverted index: two map-side-combined shuffles on term keys;
    max_df pruning bounds the largest postings list, so shuffle should
    track ~10x rows without a giant-key straggler."""
    from erde_spark.scale.ranking import build_postings
    d = spark.read.parquet(f'{sf}/documents.parquet')
    return build_postings(d, min_df=2, max_df_frac=0.5)


OPS = {
    'dedup_clusters': op_dedup_clusters,
    'dedup_minhash_lsh': op_minhash_lsh,
    'sjoin_points_rects': op_sjoin,
    'contamination_check': op_contamination,
    'dedup_embedding_clusters': op_embedding_clusters,
    'embedding_lsh_pairs': op_embedding_lsh_pairs,
    'similarity_ivfpq': op_similarity_ivfpq,
    'streaming_neardup_backfill': op_streaming_backfill,
    'dsir_weights': op_dsir_weights,
    'passage_dedup': op_passage_dedup,
    'html_extract': op_html_extract,
    'phash_hamming_join': op_phash_hamming_join,
    'image_dedup_planted': op_image_dedup_planted,
    'warc_roundtrip': op_warc_roundtrip,
    'langid': op_langid,
    'shuffle_deterministic': op_shuffle_deterministic,
    'ppl_buckets_threshold': op_ppl_buckets_threshold,
    'unimax_materialized': op_unimax_materialized,
    'megatron_roundtrip': op_megatron_roundtrip,
    'fim_transform': op_fim_transform,
    'chat_spans': op_chat_spans,
    'compression_ratio': op_compression_ratio,
    'span_corrupt': op_span_corrupt,
    'curate_exact': op_curate_exact,
    'hard_negatives': op_hard_negatives,
    'avro_roundtrip': op_avro_roundtrip,
    'pagerank': op_pagerank,
    'semdedup': op_semdedup,
    'zst_roundtrip': op_zst_roundtrip,
    'npy_roundtrip': op_npy_roundtrip,
    'build_postings': op_build_postings,
    'stream_interval_join': op_stream_interval_join,
    'd4_select': op_d4,
    'zarr_roundtrip': op_zarr_roundtrip,
    'bloom_decon': op_bloom_decon,
}


def main():
    os.environ.setdefault('SPARK_GRAFT_UI', '1')
    from erde_spark.session import get_spark
    spark = get_spark(app_name='erde_spark_scale_check')
    build_sf1(spark)
    # warm JVM + python workers
    spark.read.parquet(f'{SF01}/documents.parquet').count()
    only = {a for a in sys.argv[1:] if not a.startswith('-')}
    results = []
    for name, fn in OPS.items():
        if only and name not in only:
            continue
        row = {'op': name}
        # one UNTIMED warm pass at the small size first: the first
        # execution of an op pays python-worker pool spin-up + codegen
        # compilation, which otherwise lands entirely on the sf0.1
        # number and makes the 10x run look faster than the 1x run
        # (r11's zarr/bloom rows showed 0.4-0.5x time at 10x data even
        # on a settled host — this artifact, not host drift)
        fn(spark, SF01).count()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
        for label, sf in (('sf0.1', SF01), ('sf1', SF1_DIR)):
            sw0 = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            rows = fn(spark, sf).count()
            dt = time.perf_counter() - t0
            sw = shuffle_write_bytes(spark) - sw0
            row[label] = (dt, sw, rows)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
        (t1, s1, r1), (t10, s10, r10) = row['sf0.1'], row['sf1']
        results.append(row)
        print(f"| {name} | {t1:.1f}s / {s1/1e6:.2f}MB / {r1} rows "
              f"| {t10:.1f}s / {s10/1e6:.2f}MB / {r10} rows "
              f"| {t10/t1:.1f}x / {s10/max(s1,1):.1f}x / {r10/max(r1,1):.1f}x |",
              flush=True)


if __name__ == '__main__':
    main()
