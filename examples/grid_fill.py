"""Point-grid generator over polygon bboxes, Spark-first.

Reference: /root/reference/examples/4_generator_script/grid_fill.py — a
generator script yielding chunked GeoDataFrames of lattice points (step
metres apart) over each polygon's bbox, optionally cropped to the polygon.

Spark re-expression: the lattice IS a relational product — per polygon,
``sequence(x1, x2, step)`` × ``sequence(y1, y2, step)`` exploded JVM-side.
No driver loop, no chunk plumbing: lazy evaluation streams partitions
end-to-end (what the reference's generator machinery existed to do), and
the result distributes across executors for any polygon count.

Run:  python examples/grid_fill.py polygons.geojson 500 out.csv [--crop]
"""

import sys

import erde_spark as es
from erde_spark.functions.geo import st_bounds, st_coslat, st_point
from erde_spark.geo.crs import set_crs
from pyspark.sql import functions as F


def grid_fill(polygons, step: float, crop: bool = False):
    """One point row per lattice node; `polygon` column = source row id."""
    p = (polygons
         .withColumn('polygon', F.monotonically_increasing_id())
         .withColumn('coslat', st_coslat(F.col('geometry')))
         # metric step in degrees at each polygon's latitude (4326 lattice;
         # same step/coslat correction the reference applies in 3857)
         .withColumn('dx', F.lit(step) / F.col('coslat') / F.lit(111319.49079327358))
         .withColumn('dy', F.lit(step) / F.lit(111319.49079327358))
         .withColumn('b', st_bounds(F.col('geometry'))))
    nx = F.floor((F.col('b.maxx') - F.col('b.minx')) / F.col('dx')).cast('int')
    ny = F.floor((F.col('b.maxy') - F.col('b.miny')) / F.col('dy')).cast('int')
    pts = (p.select(
        'polygon', 'b', 'dx', 'dy',
        F.explode(F.sequence(F.lit(0), nx)).alias('ix'))
        .select(
        'polygon', 'b', 'dx', 'dy', 'ix',
        F.explode(F.sequence(F.lit(0), ny)).alias('iy'))
        .select('polygon', st_point(
            F.col('b.minx') + F.col('ix') * F.col('dx'),
            F.col('b.miny') + F.col('iy') * F.col('dy')).alias('geometry')))
    pts = set_crs(pts, 4326)
    if crop:
        pts = es.sfilter(pts, polygons, op='within')
    return pts


if __name__ == '__main__':
    spark = es.get_spark()
    polygons = es.read_df(sys.argv[1], spark)
    out = grid_fill(polygons, float(sys.argv[2]), crop='--crop' in sys.argv)
    es.write_df(out, sys.argv[3])
