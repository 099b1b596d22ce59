"""Chunk-stream facade tests (reference read_stream/write_stream contract:
`tests/io/test_streaming.py`, `tests/io/test_io_base.py`)."""

import os

import pytest
from pyspark.sql import functions as F

import erde_spark as es
from erde_spark.geo import geom as G


def test_read_stream_is_dataframe(spark, tmp_path):
    p = tmp_path / 'x.csv'
    p.write_text('a,b\n1,2\n3,4\n')
    df = es.read_stream(str(p), spark=spark)
    assert df.count() == 2


def test_read_stream_geometry_filter_wkt(spark, tmp_path):
    p = tmp_path / 'pts.csv'
    p.write_text('WKT,pid\n"POINT (1 1)",1\n"POINT (9 9)",2\n')
    df = es.read_stream(str(p), spark=spark,
                        geometry_filter='POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')
    rows = df.collect()
    assert [r['pid'] for r in rows] == [1]


def test_write_stream_appends_chunks(spark, tmp_path):
    out = str(tmp_path / 'out.parquet')
    a = spark.createDataFrame([(1,)], 'v int')
    b = spark.createDataFrame([(2,)], 'v int')
    with es.write_stream(out) as w:
        w(a)
        w(b)
    assert {r['v'] for r in spark.read.parquet(out).collect()} == {1, 2}


def test_write_stream_cleans_partial_output_on_error(spark, tmp_path):
    out = str(tmp_path / 'out.parquet')
    a = spark.createDataFrame([(1,)], 'v int')
    with pytest.raises(RuntimeError):
        with es.write_stream(out) as w:
            w(a)
            raise RuntimeError('boom')
    assert not os.path.exists(out)


def test_as_local_chunks(spark):
    from erde_spark.streaming.chunks import as_local_chunks
    df = spark.range(25).select(F.col('id'))
    chunks = list(as_local_chunks(df, chunk_size=10))
    assert [len(c) for c in chunks] == [10, 10, 5]
    assert sorted(v for c in chunks for v in c['id']) == list(range(25))


def test_read_write_geom_roundtrip(spark, tmp_path):
    p = str(tmp_path / 'g.csv')
    es.write_geom(('Point', (5.0, 6.0)), p, spark)
    assert es.read_geom(p, spark) == ('Point', (5.0, 6.0))


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids across micro-batches are dropped while inside
    the watermark window; state stays bounded (dropDuplicatesWithinWatermark)."""
    import datetime as dt
    from pyspark.sql import types as T
    from erde_spark.streaming.windows import stream_dedup, stream_parquet_pipeline

    schema = T.StructType([T.StructField('event_id', T.LongType()),
                           T.StructField('ts', T.TimestampType())])
    t0 = dt.datetime(2024, 1, 1)
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ('in', 'out', 'ckpt'))
    rows = [(1, t0), (2, t0 + dt.timedelta(seconds=10)),
            (1, t0 + dt.timedelta(seconds=20)),   # dup of 1
            (3, t0 + dt.timedelta(seconds=30)),
            (2, t0 + dt.timedelta(seconds=35))]   # dup of 2
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(in_dir)

    stream_parquet_pipeline(
        spark, in_dir, schema,
        lambda df: stream_dedup(df, 'ts', '10 minutes', ['event_id']),
        out_dir, ckpt)
    got = sorted(r['event_id'] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]


def test_incremental_rollup_two_batches(spark, tmp_path):
    """Incremental hourly rollup maintained across two availableNow runs:
    the checkpoint guarantees the second run processes ONLY the new file,
    and the merged rollup equals the batch recomputation (exactly-once)."""
    import datetime as dt
    from pyspark.sql import types as T
    from erde_spark.streaming.windows import stream_parquet_pipeline, tumbling_agg

    schema = T.StructType([T.StructField('ts', T.TimestampType()),
                           T.StructField('v', T.LongType())])
    t0 = dt.datetime(2024, 1, 1)
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ('in', 'out', 'ckpt'))

    def rollup(df):
        return tumbling_agg(df.withWatermark('ts', '0 seconds'), 'ts', '1 hour',
                            {'n': F.count(F.lit(1)), 'sum_v': F.sum('v')})

    batch1 = [(t0 + dt.timedelta(minutes=m), m) for m in (0, 30, 90)]
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode('append').parquet(in_dir)
    stream_parquet_pipeline(spark, in_dir, schema, rollup, out_dir, ckpt)

    batch2 = [(t0 + dt.timedelta(minutes=m), m) for m in (150, 170)]
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode('append').parquet(in_dir)
    stream_parquet_pipeline(spark, in_dir, schema, rollup, out_dir, ckpt)

    def rolled():
        return {r['window_start'].hour: (r['n'], r['sum_v'])
                for r in (spark.read.parquet(out_dir)
                          .groupBy('window_start')
                          .agg(F.sum('n').alias('n'), F.sum('sum_v').alias('sum_v'))
                          .collect())}

    # append-mode watermark semantics: a window emits only once the
    # watermark passes its END, exactly once — hour 2 is still open
    assert rolled() == {0: (2, 30), 1: (1, 90)}

    # a later event advances the watermark and closes hour 2; the earlier
    # windows are NOT re-emitted (exactly-once across restarts)
    spark.createDataFrame([(t0 + dt.timedelta(hours=10), 0)], schema) \
        .coalesce(1).write.mode('append').parquet(in_dir)
    stream_parquet_pipeline(spark, in_dir, schema, rollup, out_dir, ckpt)
    assert rolled() == {0: (2, 30), 1: (1, 90), 2: (2, 320)}


def test_stream_to_shards_two_batches_and_replay_idempotence(spark, tmp_path):
    """The foreachBatch training-shard bridge: two availableNow runs
    land two batch-<id> directories (the checkpoint makes run 2 see
    only the new file); the glob read unions them with no duplicates;
    re-writing a batch id (the replay case) overwrites instead of
    appending; tfrecord and megatron formats route to their sinks."""
    import glob

    from pyspark.sql import types as T

    from erde_spark.io.megatron import read_megatron
    from erde_spark.io.wds import read_webdataset
    from erde_spark.streaming.shards import stream_to_shards

    schema = T.StructType([T.StructField('doc_id', T.LongType()),
                           T.StructField('text', T.StringType())])
    in_dir, out_dir, ckpt = (str(tmp_path / d)
                             for d in ('in', 'wds_out', 'ck1'))

    def run():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = stream_to_shards(stream, out_dir, ckpt, fmt='wds',
                             shard_size=50)
        q.awaitTermination(120)

    spark.createDataFrame([(i, f'doc {i}') for i in range(10)], schema) \
        .coalesce(1).write.mode('append').parquet(in_dir)
    run()
    spark.createDataFrame([(i, f'doc {i}') for i in range(10, 25)],
                          schema) \
        .coalesce(1).write.mode('append').parquet(in_dir)
    run()
    batches = sorted(glob.glob(out_dir + '/batch-*'))
    assert len(batches) == 2
    back = read_webdataset(spark, out_dir + '/batch-*')
    got = {int(r['key']): r['text'] for r in back.collect()}
    assert got == {i: f'doc {i}' for i in range(25)}
    # megatron route + bad fmt validation
    tok_schema = T.StructType([
        T.StructField('doc_id', T.LongType()),
        T.StructField('tokens', T.ArrayType(T.LongType()))])
    in2, out2, ck2 = (str(tmp_path / d) for d in ('in2', 'meg_out', 'ck2'))
    spark.createDataFrame([(i, [i, i + 1]) for i in range(8)],
                          tok_schema) \
        .coalesce(1).write.mode('append').parquet(in2)
    s2 = spark.readStream.schema(tok_schema).parquet(in2)
    q2 = stream_to_shards(s2, out2, ck2, fmt='megatron', dtype='int32')
    q2.awaitTermination(120)
    toks = sorted(r['tokens'][0] for r in
                  read_megatron(spark, out2 + '/batch-*').collect())
    assert toks == list(range(8))
    import pytest as _p
    with _p.raises(ValueError, match='fmt'):
        stream_to_shards(s2, out2, ck2, fmt='nope')


def test_stream_to_shards_avro_route(spark, tmp_path):
    """The fifth bridge format: micro-batches land as Avro OCF batch
    directories and the glob read unions them."""
    from pyspark.sql import types as T

    from erde_spark.io.avro_ocf import read_avro
    from erde_spark.streaming.shards import stream_to_shards
    schema = T.StructType([T.StructField('doc_id', T.LongType()),
                           T.StructField('text', T.StringType())])
    in_dir, out_dir, ckpt = (str(tmp_path / d)
                             for d in ('in', 'avro_out', 'ck'))
    spark.createDataFrame([(i, f'doc {i}') for i in range(12)], schema) \
        .coalesce(1).write.mode('append').parquet(in_dir)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = stream_to_shards(stream, out_dir, ckpt, fmt='avro')
    q.awaitTermination(120)
    back = read_avro(spark, out_dir + '/batch-*/*.avro')
    got = {r['doc_id']: r['text'] for r in back.collect()}
    assert got == {i: f'doc {i}' for i in range(12)}


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """stream_interval_join: the streaming result (two file-stream
    sources, availableNow, append memory sink) must equal the batch
    join of the same frames — inner interval joins emit on match, and
    a single micro-batch per source means nothing is ever late."""
    from erde_spark.streaming.windows import stream_interval_join
    views = spark.createDataFrame(
        [(1, 100, '2024-01-01 10:00:00'),
         (1, 101, '2024-01-01 12:00:00'),
         (2, 102, '2024-01-01 10:00:00')],
        'user_id long, view_id long, vts string').select(
        'user_id', 'view_id', F.col('vts').cast('timestamp').alias('vts'))
    clicks = spark.createDataFrame(
        [(1, 200, '2024-01-01 10:05:00'),   # matches view 100
         (1, 201, '2024-01-01 12:30:00'),   # within 1h of 101 only
         (1, 202, '2024-01-01 09:00:00'),   # before every view
         (2, 203, '2024-01-01 11:30:00'),   # 1.5h after 102: too late
         (3, 204, '2024-01-01 10:00:00')],  # no such user in views
        'user_id long, click_id long, cts string').select(
        'user_id', 'click_id', F.col('cts').cast('timestamp').alias('cts'))
    expected = {(1, 100, 200), (1, 101, 201)}
    batch = stream_interval_join(views, clicks, 'user_id',
                                 'vts', 'cts', '1 hour')
    got = {(r['user_id'], r['view_id'], r['click_id'])
           for r in batch.collect()}
    assert got == expected
    vdir, cdir = str(tmp_path / 'v'), str(tmp_path / 'c')
    views.write.parquet(vdir)
    clicks.write.parquet(cdir)
    vs = spark.readStream.schema(views.schema).parquet(vdir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    sj = stream_interval_join(vs, cs, 'user_id', 'vts', 'cts', '1 hour',
                              watermark='1 minute')
    assert sj.isStreaming
    q = (sj.writeStream.format('memory').queryName('sij_test')
         .outputMode('append')
         .option('checkpointLocation', str(tmp_path / 'ckpt'))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_s = {(r['user_id'], r['view_id'], r['click_id'])
             for r in spark.table('sij_test').collect()}
    # plan pin: the streaming side must run the stateful
    # symmetric-hash join — the operator whose per-partition state the
    # interval predicate bounds; a silent fallback to a batch join
    # would break state eviction on a real unbounded stream
    exec_plan = q._jsq.explainInternal(False)
    assert 'StreamingSymmetricHashJoin' in exec_plan, exec_plan[:2000]
    spark.catalog.dropTempView('sij_test')
    assert got_s == expected


def test_stream_interval_join_validates(spark):
    from erde_spark.streaming.windows import stream_interval_join
    a = spark.createDataFrame([(1, '2024-01-01')],
                              'k long, ts string').select(
        'k', F.col('ts').cast('timestamp').alias('ts'))
    b = a.withColumnRenamed('ts', 'ts2')
    import pytest as _p
    with _p.raises(ValueError, match='missing from left'):
        stream_interval_join(a, b, 'nope', 'ts', 'ts2', '1 hour')
    with _p.raises(ValueError, match='rename before joining'):
        # 'ts' exists on both sides as a non-key column
        stream_interval_join(a, a, 'k', 'ts', 'ts', '1 hour')
