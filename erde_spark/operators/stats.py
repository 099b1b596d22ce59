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


def profile(df: DataFrame, columns: list[str] | None = None,
            approx_distinct: bool = False) -> DataFrame:
    """Data-profile report: one row per column with (column_name,
    data_type, n_rows, null_count, n_distinct, min_value, max_value) —
    the first look a pipeline takes at an unfamiliar table. min/max are
    cast to string so every column type fits one schema.

    ONE aggregation pass over the scan (parquet reads only the profiled
    columns). ``approx_distinct=False`` uses exact distinct counts —
    value-checkable against a SQL oracle but each exact distinct adds an
    expand step; ``approx_distinct=True`` switches to HLL
    ``approx_count_distinct`` (single pass, constant memory), the right
    setting at 100 TB.
    """
    cols = columns or df.columns
    nd = (F.approx_count_distinct if approx_distinct
          else F.countDistinct)
    field_types = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias('__n')]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f'{c}__nulls'))
        if isinstance(field_types.get(c), T.MapType):
            # maps are unorderable/unhashable in Spark: no min/max or
            # distinct — profile the rest of the table instead of failing
            aggs += [F.lit(None).cast('long').alias(f'{c}__nd'),
                     F.lit(None).cast('string').alias(f'{c}__min'),
                     F.lit(None).cast('string').alias(f'{c}__max')]
        else:
            aggs += [nd(c).cast('long').alias(f'{c}__nd'),
                     F.min(c).cast('string').alias(f'{c}__min'),
                     F.max(c).cast('string').alias(f'{c}__max')]
    wide = df.agg(*aggs)
    types = dict(df.dtypes)
    stack_args = ', '.join(
        f"'{c}', '{types[c]}', `__n`, `{c}__nulls`, `{c}__nd`, "
        f"`{c}__min`, `{c}__max`" for c in cols)
    return wide.selectExpr(
        f'stack({len(cols)}, {stack_args}) as (column_name, data_type, '
        'n_rows, null_count, n_distinct, min_value, max_value)')
