"""Salted skew operators: value parity with the plain plans."""

import pytest
from pyspark.sql import functions as F

SF = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def lineitem(spark):
    return spark.read.parquet(f'{SF}/lineitem.parquet')


def test_salted_agg_matches_plain(spark, lineitem):
    from erde_spark.operators.skew import salted_agg
    got = salted_agg(
        lineitem, 'l_returnflag',
        {'n': ('l_quantity', 'count'),
         'sum_qty': ('l_quantity', 'sum'),
         'min_qty': ('l_quantity', 'min'),
         'max_qty': ('l_quantity', 'max'),
         'avg_price': ('l_extendedprice', 'mean')},
        salt=8)
    exp = (lineitem.groupBy('l_returnflag')
           .agg(F.count('l_quantity').alias('n'),
                F.sum('l_quantity').alias('sum_qty'),
                F.min('l_quantity').alias('min_qty'),
                F.max('l_quantity').alias('max_qty'),
                F.avg('l_extendedprice').alias('avg_price')))
    g = {r['l_returnflag']: r for r in got.collect()}
    e = {r['l_returnflag']: r for r in exp.collect()}
    assert g.keys() == e.keys()
    for k in e:
        assert g[k]['n'] == e[k]['n']
        assert abs(g[k]['sum_qty'] - e[k]['sum_qty']) < 1e-6
        assert g[k]['min_qty'] == e[k]['min_qty']
        assert g[k]['max_qty'] == e[k]['max_qty']
        assert abs(g[k]['avg_price'] - e[k]['avg_price']) < 1e-6


def test_salted_agg_rejects_nondecomposable(spark, lineitem):
    from erde_spark.operators.skew import salted_agg
    with pytest.raises(ValueError, match='decomposable'):
        salted_agg(lineitem, 'l_returnflag',
                   {'p50': ('l_quantity', 'median')})


def test_salted_join_matches_plain(spark, lineitem):
    from erde_spark.operators.skew import salted_join
    dim = (lineitem.select('l_returnflag').distinct()
           .withColumn('flag_name', F.concat(F.lit('flag_'), 'l_returnflag')))
    li = lineitem.select('l_orderkey', 'l_linenumber', 'l_returnflag')
    got = salted_join(li, dim, 'l_returnflag').orderBy(
        'l_orderkey', 'l_linenumber').collect()
    exp = li.join(dim, 'l_returnflag').orderBy(
        'l_orderkey', 'l_linenumber').collect()
    assert len(got) == len(exp)
    assert ({(r['l_orderkey'], r['l_linenumber'], r['flag_name']) for r in got}
            == {(r['l_orderkey'], r['l_linenumber'], r['flag_name']) for r in exp})


def test_salted_join_left_keeps_unmatched(spark):
    from erde_spark.operators.skew import salted_join
    big = spark.createDataFrame([(1, 'a'), (2, 'b'), (3, 'c')], 'k int, v string')
    small = spark.createDataFrame([(1, 'x'), (2, 'y')], 'k int, w string')
    got = {(r['k'], r['w']) for r in salted_join(big, small, 'k', how='left').collect()}
    assert got == {(1, 'x'), (2, 'y'), (3, None)}
