"""Plan-shape tests: the scale properties (pushdown, pruning, broadcast,
bounded shuffles) asserted as behavior on the real queries."""

import pytest
from pyspark.sql import functions as F

from erde_spark.plans.inspect import (count_python_udf_passes, count_shuffles,
                                      has_broadcast_join, pushed_filters,
                                      read_schemas)

SF = '/root/testdata/sf0.001'


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f'{SF}/lineitem.parquet')
    q = li.filter(F.col('l_quantity') > 30).select('l_orderkey', 'l_quantity')
    pf = pushed_filters(q)
    assert any('l_quantity' in f for f in pf), pf


def test_column_pruning_subset_dsl(spark):
    """The subset DSL lowers to a single select -> only named columns are
    read off parquet."""
    from erde_spark.operators.subset import subset
    li = spark.read.parquet(f'{SF}/lineitem.parquet')
    q = subset(li, 'l_orderkey:ok, l_quantity:qty')
    schemas = read_schemas(q)
    assert len(schemas) == 1
    assert 'l_orderkey' in schemas[0] and 'l_quantity' in schemas[0]
    assert 'l_comment' not in schemas[0] and 'l_extendedprice' not in schemas[0]


def test_tpch_q3_broadcasts_customer(spark):
    import __spark_entry__ as E
    q = E.q_tpch_q3(spark, SF)
    assert has_broadcast_join(q)
    # the mktsegment filter must reach the customer scan
    assert any('c_mktsegment' in f for f in pushed_filters(q))


def test_lookup_is_broadcast_when_small(spark):
    import __spark_entry__ as E
    q = E.q_lookup_customer(spark, SF)
    assert has_broadcast_join(q)


def test_sjoin_udf_passes_bounded(spark):
    """The grid spatial join must cross the Python boundary a bounded
    number of times (geometry synthesis + bounds per side + one refine),
    not once per plan node."""
    import __spark_entry__ as E
    q = E.q_sjoin_points_rects(spark, SF)
    assert count_python_udf_passes(q) <= 6


def test_sagg_shuffle_count(spark):
    """sagg = candidate join + groupBy + join-back: the aggregation input
    shuffles once on the group key; total hash shuffles stay small."""
    import __spark_entry__ as E
    q = E.q_sagg_rect_demand(spark, SF)
    assert count_shuffles(q) <= 6
