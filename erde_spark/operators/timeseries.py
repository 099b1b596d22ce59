"""Time-series regularization: resample to a fixed grid with
last-observation-carried-forward (LOCF) — the hypertable "gap-fill"
primitive. Not in the reference (it has no time-series surface at all,
SURVEY.md §2.5); provided as an extension because event pipelines need
regular grids for joins/feature windows.

Physical plan, built for scale: the grid is GENERATED, not shuffled into
existence — per-key rows explode a literal ``sequence(start, end, step)``
(JVM-side, whole-stage codegen), then a single ``asof_join`` (union +
one window pass — one shuffle on the keys) carries each key's latest
observation forward onto its grid points. Total cost: one distinct over
the keys + one shuffle, regardless of grid density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erde_spark.operators.asof import asof_join


def resample_locf(df: DataFrame, ts_col: str, interval: str,
                  by: str | list[str] | None = None,
                  value_cols: list[str] | None = None,
                  start=None, end=None,
                  grid_col: str = 'grid_ts') -> DataFrame:
    """Regular ``interval`` grid from ``start`` to ``end`` (default: the
    data's min/max ``ts_col``, floor-truncated to the interval start),
    one row per key x grid point, each carrying the key's most recent
    ``value_cols`` at-or-before that point (NULL before the first
    observation). ``interval`` is a SQL interval string ('1 hour',
    '15 minutes', ...).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    value_cols = value_cols or [c for c in df.columns
                                if c not in by and c != ts_col]

    if start is None or end is None:
        row = df.agg(F.min(ts_col).alias('lo'), F.max(ts_col).alias('hi')).first()
        start = start if start is not None else row['lo']
        end = end if end is not None else row['hi']

    seq = F.explode(F.expr(
        f"sequence(to_timestamp('{start}'), to_timestamp('{end}'), "
        f"interval {interval})")).alias(grid_col)
    keys = df.select(*by).distinct() if by else df.sparkSession.range(1).select()
    grid = keys.select(*by, seq) if by else keys.select(seq)

    right = df.select(*by, ts_col, *value_cols)
    out = asof_join(grid, right, on=grid_col, right_on=ts_col, by=by,
                    suffix='_obs')
    # the matched observation timestamp comes back keyed to the grid
    # column name; rename it to the natural <ts_col>_obs
    return out.withColumnRenamed(grid_col + '_obs', ts_col + '_obs')
