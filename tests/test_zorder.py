"""Z-order clustering: Morton-code correctness and the locality property
(clustered partitions cover small 2D extents -> row-group pruning works)."""

import random

from pyspark.sql import functions as F

from erde_spark.operators.zorder import (cluster_by_zorder, interleave_bits,
                                         zorder_value)


def test_interleave_known_values(spark):
    df = spark.range(1).select(
        interleave_bits([F.lit(3), F.lit(1)], bits=2).alias('z'),
        interleave_bits([F.lit(0b101), F.lit(0b010)], bits=3).alias('z2'))
    row = df.first()
    # x=11b, y=01b -> bits x0,y0,x1,y1 = 1,1,1,0 -> 0b0111 = 7
    assert row['z'] == 7
    # x=101b, y=010b -> x0,y0,x1,y1,x2,y2 = 1,0,0,1,1,0 -> 0b011001 = 25
    assert row['z2'] == 25


def test_zvalue_monotone_in_shared_prefix(spark):
    """Points in the same quadrant share high z-bits: quadrant-sorted
    order == z-sorted order at 1-bit resolution."""
    pts = [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9), (0.9, 0.9)]
    df = spark.createDataFrame(pts, 'x double, y double')
    z = zorder_value(df, ['x', 'y'], bits=1)
    got = {(r['x'], r['y']): r['z'] for r in df.select('x', 'y', z.alias('z')).collect()}
    assert got == {(0.1, 0.1): 0, (0.9, 0.1): 1, (0.1, 0.9): 2, (0.9, 0.9): 3}


def test_cluster_locality(spark):
    """Z-clustered partitions each cover a small fraction of the 2D
    extent; random row order does not."""
    rng = random.Random(7)
    rows = [(rng.random() * 1000, rng.random() * 1000) for _ in range(4000)]
    df = spark.createDataFrame(rows, 'x double, y double')
    clustered = cluster_by_zorder(df, ['x', 'y'], num_partitions=16)
    spans = (clustered
             .groupBy(F.spark_partition_id().alias('p'))
             .agg(((F.max('x') - F.min('x')) * (F.max('y') - F.min('y')))
                  .alias('bbox_area'))
             .agg(F.avg('bbox_area').alias('avg_area')).first())
    # random layout: every partition's bbox ~ the full 1e6 extent;
    # z-order: 16 partitions -> ~1/16th each (allow 3x slack)
    assert spans['avg_area'] < 1e6 / 16 * 3


def test_cluster_preserves_rows(spark):
    df = spark.range(100).select(
        (F.col('id') % 10).alias('a'), (F.col('id') * 7 % 13).alias('b'))
    out = cluster_by_zorder(df, ['a', 'b'], num_partitions=4)
    assert out.count() == 100
    assert sorted(out.columns) == ['a', 'b']
