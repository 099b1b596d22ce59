"""lookup / crossjoin / stats tests (reference `/root/reference/erde/utils.py:70-79,136-160`,
`/root/reference/erde/io/gpkg.py:102-117`)."""

import pytest
from pyspark.sql import functions as F

from erde_spark.operators.lookup import crossjoin, lookup
from erde_spark.operators.stats import stats


def test_lookup_first_match(spark):
    left = spark.createDataFrame([(1, 'a'), (2, 'b'), (3, 'c')], 'k int, lv string')
    right = spark.createDataFrame([(1, 'x'), (1, 'y'), (2, 'z')], 'k int, v string')
    got = {r['k']: r['v'] for r in lookup(left, right, 'v', left_on='k').collect()}
    assert got == {1: 'x', 2: 'z', 3: None}


def test_lookup_how_inner(spark):
    left = spark.createDataFrame([(1,), (3,)], 'k int')
    right = spark.createDataFrame([(1, 'x')], 'k int, v string')
    assert lookup(left, right, 'v', left_on='k', how='inner').count() == 1


def test_lookup_suffix_on_collision(spark):
    left = spark.createDataFrame([(1, 'L')], 'k int, v string')
    right = spark.createDataFrame([(1, 'R')], 'k int, v string')
    row = lookup(left, right, 'v', left_on='k').first()
    assert row['v'] == 'L' and row['v_right'] == 'R'


def test_lookup_different_keys(spark):
    left = spark.createDataFrame([(1,)], 'a int')
    right = spark.createDataFrame([(1, 'x')], 'b int, v string')
    assert lookup(left, right, 'v', left_on='a', right_on='b').first()['v'] == 'x'


def test_crossjoin(spark):
    df1 = spark.createDataFrame([(1,), (2,)], 'a int')
    df2 = spark.createDataFrame([('x',), ('y',), ('z',)], 'b string')
    got = crossjoin(df1, df2)
    assert got.count() == 6
    assert sorted(got.columns) == ['a', 'b']


def test_stats(spark):
    df = spark.createDataFrame([(1, 2.0, 'x'), (3, 4.0, 'y')], 'a int, b double, s string')
    rows = {r['column_name']: r for r in stats(df).collect()}
    assert set(rows) == {'a', 'b'}
    assert rows['a']['min'] == 1.0 and rows['a']['max'] == 3.0
    assert rows['a']['mean'] == 2.0 and rows['a']['variance'] == 1.0
    assert rows['a']['count'] == 2


def test_stats_no_numeric(spark):
    df = spark.createDataFrame([('x',)], 's string')
    with pytest.raises(ValueError):
        stats(df)
