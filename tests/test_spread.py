"""Pins for erde_spark.session.spread_to_cores (r13: the adaptive
input-spread helper, rewritten to probe parallelism from the file index
instead of ``df.rdd`` — verdict ask #7)."""

import os

import pytest
from pyspark.sql import functions as F

from erde_spark.session import _bytes_conf, spread_to_cores


def test_bytes_conf_parses_spark_size_values():
    assert _bytes_conf('134217728') == 128 * 1024 ** 2
    assert _bytes_conf('134217728b') == 128 * 1024 ** 2
    assert _bytes_conf('128m') == 128 * 1024 ** 2
    assert _bytes_conf('128mb') == 128 * 1024 ** 2
    assert _bytes_conf('1g') == 1024 ** 3
    assert _bytes_conf('16k') == 16 * 1024


def test_single_small_file_is_spread(spark, tmp_path):
    p = str(tmp_path / 'one')
    spark.range(0, 100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = spread_to_cores(df)
    assert out is not df
    cores = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == cores
    # content untouched
    assert out.count() == 100


def test_many_files_returned_untouched(spark, tmp_path):
    cores = spark.sparkContext.defaultParallelism
    p = str(tmp_path / 'many')
    spark.range(0, 1000).repartition(cores + 1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= cores
    # identity return: no repartition inserted, plan untouched
    assert spread_to_cores(df) is df


def test_few_big_files_estimated_splittable(spark, tmp_path):
    # one file, but its size / maxPartitionBytes >= cores: a splittable
    # scan is already wide, so the helper must NOT repartition
    p = str(tmp_path / 'big')
    spark.range(0, 20000).select(
        'id', F.sha2(F.col('id').cast('string'), 256).alias('s')) \
        .coalesce(1).write.parquet(p)
    size = sum(os.path.getsize(os.path.join(p, f))
               for f in os.listdir(p) if f.endswith('.parquet'))
    old = spark.conf.get('spark.sql.files.maxPartitionBytes')
    cores = spark.sparkContext.defaultParallelism
    try:
        # pick a split size that makes the single file count as >= cores
        spark.conf.set('spark.sql.files.maxPartitionBytes',
                       str(max(1, size // (cores + 1))))
        df = spark.read.parquet(p)
        assert spread_to_cores(df) is df
    finally:
        spark.conf.set('spark.sql.files.maxPartitionBytes', old)


def test_non_file_backed_falls_back_to_rdd_probe(spark):
    cores = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 100, 1, 1)
    assert narrow.inputFiles() == []
    out = spread_to_cores(narrow)
    assert out.rdd.getNumPartitions() == cores
    wide = spark.range(0, 100, 1, cores)
    assert spread_to_cores(wide) is wide


def test_streaming_frame_returned_unchanged(spark, tmp_path):
    p = str(tmp_path / 'stream_src')
    spark.range(0, 10).write.parquet(p)
    stream = (spark.readStream.schema('id long').parquet(p))
    assert stream.isStreaming
    assert spread_to_cores(stream) is stream
