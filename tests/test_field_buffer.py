"""Distance-field buffer/erode/union kernel tests (GEOS-free line and
polygon buffers — reference shapely semantics, `erde/op/buffer.py:41`).
Analytic targets: buffer of a line = 2rL + pi r^2; of a convex polygon =
A + Pr + pi r^2; erosion of a WxH rectangle = (W-2r)(H-2r)."""

import math

import pytest

from erde_spark.geo.field import buffer_field, union_field
from erde_spark.geo.ops import buffer_geom, geom_area

RECT = ('Polygon', [[(0, 0), (40, 0), (40, 20), (0, 20), (0, 0)]])


def approx(a, b, tol=0.01):
    assert a == pytest.approx(b, rel=tol), (a, b)


def test_line_buffer_area():
    line = ('LineString', [(0, 0), (100, 0)])
    approx(geom_area(buffer_field([line], 5.0)), 2 * 5 * 100 + math.pi * 25)


def test_bent_line_buffer_contains_vertices():
    from erde_spark.geo.ops import contains
    line = ('LineString', [(0, 0), (50, 0), (50, 50)])
    buf = buffer_field([line], 4.0)
    for x, y in line[1]:
        assert contains(buf, ('Point', (x, y)))


def test_polygon_buffer_area():
    approx(geom_area(buffer_field([RECT], 3.0)), 800 + 120 * 3 + math.pi * 9)


def test_polygon_erosion():
    approx(geom_area(buffer_field([RECT], -3.0)), 34 * 14)


def test_erosion_vanishes():
    assert buffer_field([RECT], -11.0) == ('MultiPolygon', [])


def test_hole_preserved():
    holed = ('Polygon', [[(0, 0), (40, 0), (40, 40), (0, 40), (0, 0)],
                         [(15, 15), (25, 15), (25, 25), (15, 25), (15, 15)]])
    buf = buffer_field([holed], 2.0)
    assert len(buf[1]) == 1 and len(buf[1][0]) == 2  # one part, shell + hole
    # hole shrinks by r with corners rounding into it
    approx(geom_area(buf), 1600 + 160 * 2 + math.pi * 4 - (36 - (16 - math.pi * 4)),
           tol=0.02)


def test_dissolving_buffers_merge():
    near = [('Point', (0.0, 0.0)), ('Point', (6.0, 0.0))]
    merged = buffer_field(near, 5.0)
    assert len(merged[1]) == 1
    far = [('Point', (0.0, 0.0)), ('Point', (100.0, 0.0))]
    two = buffer_field(far, 5.0)
    assert len(two[1]) == 2
    approx(geom_area(two), 2 * math.pi * 25)


def test_union_field_overlap():
    s1 = ('Polygon', [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
    s2 = ('Polygon', [[(5, 5), (15, 5), (15, 15), (5, 15), (5, 5)]])
    u = union_field([s1, s2])
    assert len(u[1]) == 1
    approx(geom_area(u), 175.0)


def test_buffer_geom_dispatch():
    line = ('LineString', [(0, 0), (10, 0)])
    out = buffer_geom(line, 2.0)
    assert out[0] == 'MultiPolygon'
    approx(geom_area(out), 2 * 2 * 10 + math.pi * 4)
    assert buffer_geom(line, -1.0) == ('MultiPolygon', [])
    poly = buffer_geom(RECT, -3.0)
    approx(geom_area(poly), 34 * 14)


def test_buffer_operator_line_rows(spark):
    """End-to-end: line rows through the buffer operator (previously a
    NotImplementedError stub)."""
    from erde_spark.geo import geom as G
    from erde_spark.operators.buffer import buffer
    from erde_spark.geo.crs import set_crs
    from pyspark.sql import types as T
    line = ('LineString', [(0.0, 0.0), (0.01, 0.0)])  # ~1113 m at equator
    schema = T.StructType([T.StructField('geometry', T.BinaryType())])
    df = set_crs(spark.createDataFrame([(G.wkb_dumps(line),)], schema), 4326)
    out = buffer(df, 100.0)
    buf = G.wkb_loads(bytes(out.first()['geometry']))
    assert buf[0] == 'MultiPolygon' and len(buf[1]) == 1


def test_dissolve_true_union(spark):
    """Two overlapping point buffers dissolve into ONE merged polygon with
    the union area (not two stacked shells)."""
    from erde_spark.geo import geom as G
    from erde_spark.operators.buffer import buffer
    from erde_spark.geo.crs import set_crs
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField('geometry', T.BinaryType())])
    rows = [(G.wkb_dumps(('Point', (0.0, 0.0))),),
            (G.wkb_dumps(('Point', (0.001, 0.0))),)]  # ~111 m apart
    df = set_crs(spark.createDataFrame(rows, schema), 4326)
    out = buffer(df, 100.0, dissolve=True)
    merged = G.wkb_loads(bytes(out.first()['geometry']))
    assert merged[0] == 'MultiPolygon' and len(merged[1]) == 1
