"""Operator-level utilities: the data-profile report."""

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
