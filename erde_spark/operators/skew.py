"""Skew mitigation: salted two-phase aggregation and salted replicate
joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default
in this engine's session) handles most runtime skew by splitting
oversized shuffle partitions. These operators cover the cases AQE can't:

* ``salted_agg`` — a SINGLE hot group key (one reducer owns the whole
  key no matter how partitions split) becomes ``salt`` sub-groups
  aggregated in parallel, then re-aggregated. Only decomposable
  aggregates are supported (sum/count/min/max, and mean via sum+count
  re-derivation) — exactly the set that composes across partial groups.
* ``salted_join`` — a hot join key on the big side: the small side is
  replicated ``salt`` times (one copy per salt value) so the big side's
  hot key spreads over ``salt`` reducers. Result is row-identical to the
  plain join; cost is small-side duplication, so keep the replicated
  side genuinely small (it is usually broadcast-sized but may exceed the
  broadcast threshold — that's the niche where salting beats both plain
  shuffle and broadcast).

The reference is single-machine pandas and has no skew concept; this is
part of the 100 TB posture the engine adds (same tier as bucketing and
z-ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    'sum': F.sum, 'count': F.count, 'min': F.min, 'max': F.max,
}
_FINAL = {
    'sum': F.sum, 'count': F.sum, 'min': F.min, 'max': F.max,
}


def salted_agg(df: DataFrame, keys: list[str] | str, aggs: dict,
               salt: int = 16) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column name -> (source column, fn name) with fn
    in sum/count/min/max/mean. The salt is a uniform hash of a random
    per-row value, so phase one splits every group ``salt`` ways; phase
    two combines the partials. Values are identical to the plain groupBy
    (mean is re-derived exactly from sum+count).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partials, finals = [], []
    for out, (col, fn) in aggs.items():
        if fn == 'mean' or fn == 'avg':
            partials += [F.sum(col).alias(f'__s_{out}'),
                         F.count(col).alias(f'__c_{out}')]
            finals.append((F.sum(f'__s_{out}') / F.sum(f'__c_{out}')).alias(out))
        elif fn in _PARTIAL:
            partials.append(_PARTIAL[fn](col).alias(f'__p_{out}'))
            finals.append(_FINAL[fn](f'__p_{out}').alias(out))
        else:
            raise ValueError(
                f'{fn!r} is not decomposable; salted_agg supports '
                'sum/count/min/max/mean')
    phase1 = (df.withColumn('__salt', (F.rand(seed=0) * salt).cast('int'))
              .groupBy(*keys, '__salt').agg(*partials))
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                how: str = 'inner', salt: int = 16) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    reducers: big rows get a random salt in [0, salt); the small side is
    replicated once per salt value; the join adds the salt to the key.

    Row-for-row identical to ``big.join(small, on, how)`` for
    'inner'/'left'. Use when the big side has hot keys AND the small side
    is too large to broadcast — otherwise prefer ``F.broadcast``.
    """
    if how not in ('inner', 'left'):
        raise ValueError(f'how must be inner or left, got {how!r}')
    on = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn('__salt', (F.rand(seed=0) * salt).cast('int'))
    small_s = small.withColumn(
        '__salt', F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = big_s.join(small_s, on + ['__salt'], how)
    return out.drop('__salt')
