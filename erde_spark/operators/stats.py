"""Per-column numeric stats (reference ``GpkgReader.stats``,
``/root/reference/erde/io/gpkg.py:102-117``: min/mean/max/variance/count per
numeric column, pushed to the storage engine).

On Spark this is one ``agg`` over the scan — parquet column pruning means
only the numeric columns are read; partial aggregation (map-side combine)
keeps the shuffle at one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)]


def stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per numeric column: min, mean, max, variance (population), count.

    Matches the reference's sqlite formula (AVG(col*col) - AVG(col)^2 =
    population variance).
    """
    cols = columns or numeric_columns(df)
    if not cols:
        raise ValueError('no numeric columns to compute stats for')
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast('double').alias(f'{c}__min'),
            F.avg(c).alias(f'{c}__mean'),
            F.max(c).cast('double').alias(f'{c}__max'),
            F.var_pop(c).alias(f'{c}__variance'),
            F.count(c).cast('long').alias(f'{c}__count'),
        ]
    wide = df.agg(*aggs)
    # unpivot to one row per column: stack(n, 'name', min, mean, ...)
    stack_args = ', '.join(
        f"'{c}', `{c}__min`, `{c}__mean`, `{c}__max`, `{c}__variance`, `{c}__count`"
        for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (column_name, min, mean, max, variance, count)")
