"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated big-big equi-join is re-shuffling
both sides on every run. Spark's bucketing amortizes that: write each side
hash-partitioned into N buckets on the join keys ONCE (`bucketBy` +
`saveAsTable`); every later join/groupBy on those keys reads the buckets
co-located and skips the exchange entirely (the plan shows SortMergeJoin
with no Exchange under either side).

The reference has no notion of this (single-machine pandas); it's part of
the 100 TB posture this engine adds. Plan invariants are asserted in
tests/test_plans.py via ``plans.inspect``.

Usage::

    write_bucketed(lineitem, 'li_b', ['l_orderkey'], n_buckets=64)
    write_bucketed(orders,  'ord_b', ['o_orderkey'], n_buckets=64)
    j = bucketed_join(spark, 'li_b', 'ord_b',
                      left_on=['l_orderkey'], right_on=['o_orderkey'])
    assert not join_exchanges(j)       # no shuffle on either side

Sizing guidance: pick ``n_buckets`` so a bucket of the LARGER table is
100-500 MB at target scale (e.g. 30 TB side -> ~65k buckets); both sides
of a recurring join should use the same count so bucket i joins bucket i
1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str] | str,
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = 'overwrite', format: str = 'parquet') -> None:
    """Persist ``df`` as a bucketed (and by default per-bucket sorted)
    managed table. Sorting makes later sort-merge joins skip the Sort as
    well as the Exchange."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format(format).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode(mode).saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_on: list[str] | str, right_on: list[str] | str | None = None,
                  how: str = 'inner') -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With both
    sides bucketed (and sorted) on the keys, the physical plan is a
    sort-merge join with NO Exchange and NO Sort — each task streams
    bucket i of both tables."""
    from pyspark.sql import functions as F
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = left_on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    cond = None
    for a, b in zip(left_on, right_on):
        c = lt[a] == rt[b]
        cond = c if cond is None else (cond & c)
    return lt.join(rt, cond, how)


def join_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan —
    0 for a fully co-located join."""
    from erde_spark.plans.inspect import physical_plan
    return physical_plan(df).count('Exchange')
