"""Attribute lookup + crossjoin (non-spatial relational helpers).

Reference semantics:

* ``lookup`` — ``/root/reference/erde/utils.py:136-160``: left join on
  key(s), take the FIRST matching right row per key, attach the requested
  columns to the left frame. Reference "first" follows pandas row order,
  which is accidental; we make it deterministic (documented divergence,
  SURVEY.md §7.2e): the caller may pass ``order_by`` — otherwise the right
  side is deduplicated by the join keys with an arbitrary-but-stable
  ``min``-per-key policy is NOT used; instead we require/accept any order
  column, defaulting to the right frame's remaining natural key columns.

* ``crossjoin`` — ``/root/reference/erde/utils.py:70-79``: cartesian
  product. Lowered to Spark ``crossJoin``; Catalyst broadcasts the smaller
  side automatically (BroadcastNestedLoopJoin), which is the right physical
  plan when one side is a small dim.

Scale notes: the dedup-before-join keeps the join input minimal; for a
small right side Catalyst broadcasts it so the lookup is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookup(left_df: DataFrame, right_df: DataFrame, column_names: str | list[str],
           left_on: str | list[str], right_on: str | list[str] | None = None,
           suffixes: tuple[str, str] = ('', '_right'), how: str = 'left',
           order_by: str | list[str] | None = None) -> DataFrame:
    """Attach ``column_names`` from the first matching ``right_df`` row per key."""
    if isinstance(column_names, str):
        column_names = [column_names]
    if isinstance(left_on, str):
        left_on = [left_on]
    right_on = right_on or left_on
    if isinstance(right_on, str):
        right_on = [right_on]
    if len(left_on) != len(right_on):
        raise ValueError('left_on and right_on must have the same number of keys')

    if order_by is None:
        # deterministic "first": order by all non-key lookup columns
        order_by = column_names
    if isinstance(order_by, str):
        order_by = [order_by]

    w = Window.partitionBy(*right_on).orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    right_first = (right_df
                   .select(*right_on, *column_names)
                   .withColumn('__rn', F.row_number().over(w))
                   .filter(F.col('__rn') == 1)
                   .drop('__rn'))

    # rename collisions on the looked-up columns with suffixes
    rename = {}
    for c in column_names:
        if c in left_df.columns:
            rename[c] = c + suffixes[1]
    for old, new in rename.items():
        right_first = right_first.withColumnRenamed(old, new)

    cond = [left_df[l] == right_first[r] for l, r in zip(left_on, right_on)]
    joined = left_df.join(right_first, cond, how)
    drop_keys = [right_first[r] for l, r in zip(left_on, right_on) if r in left_df.columns or r in left_on]
    # drop the duplicated right-side key columns
    for l, r in zip(left_on, right_on):
        joined = joined.drop(right_first[r])
    return joined


def crossjoin(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Cartesian product of two DataFrames (reference ``crossjoin``)."""
    return df1.crossJoin(df2)
