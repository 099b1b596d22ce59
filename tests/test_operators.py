"""Operator-level utilities: the data-profile report."""

import pytest

def test_profile_exact_and_approx(spark):
    from erde_spark.operators.stats import profile
    df = spark.createDataFrame(
        [(1, 'a', None), (2, 'b', 5.0), (2, None, 5.0), (3, 'a', None)],
        'k long, s string, v double')
    got = {r['column_name']: r for r in profile(df).collect()}
    assert got['k']['n_rows'] == 4 and got['k']['null_count'] == 0
    assert got['k']['n_distinct'] == 3
    assert got['k']['min_value'] == '1' and got['k']['max_value'] == '3'
    assert got['s']['null_count'] == 1 and got['s']['n_distinct'] == 2
    assert got['v']['null_count'] == 2 and got['v']['n_distinct'] == 1
    # HLL path: same schema, counts within HLL error on tiny input
    ap = {r['column_name']: r for r in
          profile(df, approx_distinct=True).collect()}
    assert ap['k']['n_distinct'] == 3


def test_profile_skips_unorderable_map_columns(spark):
    """Map columns are unorderable/unhashable: profile() reports their
    type and null count and leaves distinct/min/max NULL instead of
    failing the whole report."""
    from pyspark.sql import functions as F

    from erde_spark.operators.stats import profile
    df = spark.createDataFrame([(1,), (2,)], 'k long').withColumn(
        'm', F.create_map(F.lit('a'), F.col('k')))
    got = {r['column_name']: r for r in profile(df).collect()}
    assert got['m']['null_count'] == 0
    assert got['m']['n_distinct'] is None and got['m']['min_value'] is None
    assert got['k']['n_distinct'] == 2


class TestUpsertLatest:
    """Latest-wins snapshot merge (operators/upsert.py)."""

    def _frames(self, spark):
        base = spark.createDataFrame(
            [(1, 1, 'a'), (2, 1, 'b'), (3, 1, 'c')],
            'k long, version int, val string')
        upd = spark.createDataFrame(
            [(2, 2, 'B', False),    # newer rewrite
             (3, 2, 'x', True),     # tombstone
             (4, 1, 'd', False)],   # insert
            'k long, version int, val string, dead boolean')
        return base, upd

    def test_merge_semantics(self, spark):
        from erde_spark.operators.upsert import upsert_latest
        base, upd = self._frames(spark)
        got = {r['k']: (r['version'], r['val']) for r in
               upsert_latest(base, upd, 'k', 'version',
                             tombstone_col='dead').collect()}
        assert got == {1: (1, 'a'), 2: (2, 'B'), 4: (1, 'd')}

    def test_version_tie_prefers_updates(self, spark):
        from erde_spark.operators.upsert import upsert_latest
        base = spark.createDataFrame([(1, 5, 'old')],
                                     'k long, version int, val string')
        upd = spark.createDataFrame([(1, 5, 'new')],
                                    'k long, version int, val string')
        rows = upsert_latest(base, upd, 'k', 'version').collect()
        assert len(rows) == 1 and rows[0]['val'] == 'new'

    def test_stale_update_loses(self, spark):
        from erde_spark.operators.upsert import upsert_latest
        base = spark.createDataFrame([(1, 9, 'current')],
                                     'k long, version int, val string')
        upd = spark.createDataFrame([(1, 3, 'late-arriving')],
                                    'k long, version int, val string')
        rows = upsert_latest(base, upd, 'k', 'version').collect()
        assert rows[0]['val'] == 'current'

    def test_composite_keys_and_one_shuffle(self, spark):
        from erde_spark.operators.upsert import upsert_latest
        base = spark.createDataFrame([(1, 'en', 1, 'a'), (1, 'de', 1, 'b')],
                                     'k long, lang string, version int, val string')
        upd = spark.createDataFrame([(1, 'de', 2, 'B')],
                                    'k long, lang string, version int, val string')
        q = upsert_latest(base, upd, ['k', 'lang'], 'version')
        got = {(r['k'], r['lang']): r['val'] for r in q.collect()}
        assert got == {(1, 'en'): 'a', (1, 'de'): 'B'}
        # exactly ONE shuffle key: every exchange partitions on (k, lang)
        # (AQE's executed-plan string prints the exchange in both the
        # final and initial plan, so count the distinct KEYS, not lines)
        import re
        from erde_spark.plans.inspect import physical_plan
        keys = set(re.findall(r'Exchange hashpartitioning\(([^)]*), \d+\)',
                              physical_plan(q)))
        assert len(keys) == 1 and 'k#' in next(iter(keys)), keys

    def test_validation(self, spark):
        from erde_spark.operators.upsert import upsert_latest
        base, upd = self._frames(spark)
        with pytest.raises(ValueError, match='non-empty'):
            upsert_latest(base, upd, [], 'version')
        with pytest.raises(ValueError, match='missing'):
            upsert_latest(base, upd.drop('val'), 'k', 'version')
        with pytest.raises(ValueError, match='tombstone'):
            upsert_latest(base, upd.drop('dead'), 'k', 'version',
                          tombstone_col='dead')
