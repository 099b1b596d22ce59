"""Hybrid large-geometry path of the grid spatial join: an outlier
polygon spanning thousands of grid cells must neither explode nor be
missed, and results must equal the pure-grid answer."""

from pyspark.sql import functions as F

from erde_spark.functions.geo import st_envelope, st_point
from erde_spark.operators.sjoin import sjoin


def _pts(spark, n=200):
    df = spark.range(n)
    lon = (F.col('id') % 20).cast('double') / 2.0   # 0 .. 9.5
    lat = F.floor(F.col('id') / 20).cast('double') / 2.0
    return df.select(F.col('id').alias('pid'),
                     st_point(lon + 0.01, lat + 0.01).alias('geometry'))


def test_large_polygon_joins_every_point(spark):
    pts = _pts(spark)
    # one giant rect covering everything + one tiny rect; with cell size
    # driven by the tiny rect the giant one crosses MAX_CELLS_PER_GEOM
    rects = spark.createDataFrame([(1, -1.0, -1.0, 50.0, 50.0),
                                   (2, 0.0, 0.0, 0.1, 0.1)],
                                  'rid int, x0 double, y0 double, x1 double, y1 double') \
        .select('rid', st_envelope('x0', 'y0', 'x1', 'y1').alias('geometry'))
    out = sjoin(pts, rects, op='within', cell_size=0.05)
    counts = {r['rid']: r['n'] for r in
              out.groupBy('rid').agg(F.count(F.lit(1)).alias('n')).collect()}
    assert counts[1] == 200          # giant rect contains every point
    assert counts[2] == 1            # tiny rect contains only (0.01, 0.01)


def test_large_path_equals_grid_path(spark):
    """Same join with a big cell (all-grid) and a small cell (forces the
    large path) must agree exactly."""
    pts = _pts(spark, 100)
    rects = spark.createDataFrame([(1, -1.0, -1.0, 20.0, 20.0)],
                                  'rid int, x0 double, y0 double, x1 double, y1 double') \
        .select('rid', st_envelope('x0', 'y0', 'x1', 'y1').alias('geometry'))
    grid = {(r['pid'], r['rid']) for r in
            sjoin(pts, rects, cell_size=100.0).collect()}
    hybrid = {(r['pid'], r['rid']) for r in
              sjoin(pts, rects, cell_size=0.01).collect()}
    assert grid == hybrid and len(grid) == 100
