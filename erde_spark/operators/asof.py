"""As-of (nearest-timestamp) join — a time-series primitive the reference
lacks entirely (SURVEY.md §2.3 "Not present in reference: ... as-of ...
joins"); provided as a first-class extension because attaching "the most
recent fact as of each observation" is a staple of event pipelines.

Semantics match the SQL ``ASOF JOIN`` shape (DuckDB) / pandas
``merge_asof``: for every left row, pick the single right row with the
greatest ``right.on <= left.on`` (direction='backward', inclusive) or the
smallest ``right.on >= left.on`` (direction='forward'), optionally within
the same ``by`` keys and within ``tolerance`` seconds.

Physical strategy — built for the 100 TB posture: instead of a non-equi
range join (which Spark lowers to a broadcast-nested-loop or a sort-merge
with per-row scans), both sides are UNIONed with a side tag and a single
window ``last(right_payload, ignorenulls)`` ordered by (ts, side) carries
the latest right payload forward onto each left row. Cost = exactly one
shuffle on the ``by`` keys + one sort — the same as any groupBy over the
union, independent of match fan-out, and AQE-skew-splittable. No pair
table ever materializes.

Tie rules (documented determinism, cf. SURVEY.md §7.2e): right rows at
the same (by, on) instant sort before left rows (so an exact-timestamp
fact is visible to the observation, matching ASOF's inclusive bound), and
among themselves by their payload struct — the maximum payload wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              right_on: str | None = None,
              by: str | list[str] | None = None,
              right_by: str | list[str] | None = None,
              direction: str = 'backward',
              tolerance: float | None = None,
              suffix: str = '_right') -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the single
    nearest ``right`` row at-or-before (backward) / at-or-after (forward)
    its ``on`` timestamp, NULL when none exists (or none within
    ``tolerance`` seconds).

    Right payload columns that collide with left column names get
    ``suffix``; the right ``on`` column always comes back as
    ``f'{on}{suffix}'`` so the match distance is inspectable.
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f'direction must be backward or forward, got {direction!r}')
    right_on = right_on or on
    by = [by] if isinstance(by, str) else list(by or [])
    right_by = [right_by] if isinstance(right_by, str) else list(right_by or by)
    if len(by) != len(right_by):
        raise ValueError('by and right_by must have the same number of keys')

    payload = [c for c in right.columns if c not in right_by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    out_names[right_on] = on + suffix

    r = right.select(
        *[F.col(rb).alias(b) for b, rb in zip(by, right_by)],
        F.col(right_on).alias('__ts'),
        F.lit(0).alias('__side'),
        F.struct(*[F.col(c).alias(out_names[c]) for c in payload]).alias('__p'),
        *[F.lit(None).alias(f'__l_{c}') for c in left.columns],
    )
    l = left.select(
        *by,
        F.col(on).alias('__ts'),
        F.lit(1).alias('__side'),
        F.lit(None).alias('__p'),
        *[F.col(c).alias(f'__l_{c}') for c in left.columns],
    )
    # align __p/__l_* types across the union by casting the NULL side
    l = l.withColumn('__p', F.col('__p').cast(dict(r.dtypes)['__p']))
    ldt = dict(l.dtypes)
    r = r.select(*by, '__ts', '__side', '__p',
                 *[F.col(f'__l_{c}').cast(ldt[f'__l_{c}']).alias(f'__l_{c}')
                   for c in left.columns])

    asc = direction == 'backward'
    order = [F.col('__ts').asc() if asc else F.col('__ts').desc(),
             F.col('__side').asc(), F.col('__p').asc_nulls_first()]
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn('__m', F.last('__p', ignorenulls=True).over(w))
               .filter(F.col('__side') == 1))

    m_ts = F.col('__m.' + out_names[right_on])
    if tolerance is not None:
        dist = F.abs(F.unix_micros(F.col('__ts')) - F.unix_micros(m_ts)) / 1e6 \
            if dict(matched.dtypes)['__ts'].startswith('timestamp') \
            else F.abs(F.col('__ts') - m_ts)
        matched = matched.withColumn(
            '__m', F.when(dist <= F.lit(tolerance), F.col('__m')))

    return matched.select(
        *[F.col(f'__l_{c}').alias(c) for c in left.columns],
        *[F.col('__m.' + out_names[c]).alias(out_names[c]) for c in payload])
