"""Geometry kernel unit tests (no Spark needed).

Mirrors the reference's golden-value strategy (SURVEY.md §5.1): exact values
for integer-coordinate shapes, 1% tolerance for metric formulas
(`/root/reference/tests/area/test_area.py:16-26` style).
"""

import math

import pytest

from erde_spark.geo import geom as G
from erde_spark.geo import ops as O


WKTS = [
    'POINT (1 2)',
    'POINT (1.5 -2.25)',
    'LINESTRING (0 0, 3 4, 10 0)',
    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))',
    'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))',
    'MULTIPOINT (1 1, 2 2)',
    'MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))',
    'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))',
    'GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))',
]


@pytest.mark.parametrize('wkt', WKTS)
def test_wkt_wkb_roundtrip(wkt):
    g = G.wkt_loads(wkt)
    assert G.wkb_loads(G.wkb_dumps(g)) == g
    assert G.wkt_loads(G.wkt_dumps(g)) == g


def test_wkt_errors():
    for bad in ['POINT 1 2', 'FOO (1 2)', 'POINT (1)', 'POLYGON ((0 0, 1 1)']:
        with pytest.raises((ValueError, IndexError)):
            G.wkt_loads(bad)


def test_area_length_centroid():
    poly = G.wkt_loads('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')
    assert O.geom_area(poly) == 100.0
    assert O.geom_length(poly) == 40.0
    assert O.geom_centroid(poly) == (5.0, 5.0)

    hole = G.wkt_loads('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')
    assert O.geom_area(hole) == 96.0

    line = G.wkt_loads('LINESTRING (0 0, 3 4)')
    assert O.geom_length(line) == 5.0
    assert O.geom_centroid(line) == (1.5, 2.0)
    assert O.geom_area(line) == 0.0


def test_bounds():
    g = G.wkt_loads('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))')
    assert O.geom_bounds(g) == (0.0, 0.0, 6.0, 6.0)


@pytest.mark.parametrize('a,b,inter,wit', [
    ('POINT (5 5)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', True, True),
    ('POINT (0 5)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', True, False),   # boundary
    ('POINT (50 5)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', False, False),
    ('POINT (3 3)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))', False, False),  # in hole
    ('LINESTRING (-1 5, 11 5)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', True, False),
    ('LINESTRING (1 5, 9 5)', 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', True, True),
    ('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', True, False),
    ('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', True, True),
    ('POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))', 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', False, False),
    ('LINESTRING (0 0, 2 2)', 'LINESTRING (0 2, 2 0)', True, False),
    ('LINESTRING (0 0, 1 1)', 'LINESTRING (3 3, 4 4)', False, False),
])
def test_predicates(a, b, inter, wit):
    ga, gb = G.wkt_loads(a), G.wkt_loads(b)
    assert O.intersects(ga, gb) == inter
    assert O.intersects(gb, ga) == inter  # symmetric
    assert O.within(ga, gb) == wit
    assert O.contains(gb, ga) == wit


def test_mercator_roundtrip():
    for lon, lat in [(0, 0), (82.9, 55.0), (-122.4, 37.8), (179.9, -85.0)]:
        x, y = O.mercator_fwd(lon, lat)
        lon2, lat2 = O.mercator_inv(x, y)
        assert abs(lon - lon2) < 1e-9 and abs(lat - lat2) < 1e-9


def test_point_buffer_area():
    buf = O.buffer_geom(('Point', (10.0, 20.0)), 100.0, resolution=16)
    # 64-gon inscribed in circle: area = n/2 * R^2 * sin(2pi/n)
    expected = 32 * 100.0 ** 2 * math.sin(2 * math.pi / 64)
    assert abs(O.geom_area(buf) - expected) < 1e-6
    assert abs(O.geom_area(buf) - math.pi * 100 ** 2) / (math.pi * 100 ** 2) < 0.01


def test_buffer_line_now_supported():
    out = O.buffer_geom(G.wkt_loads('LINESTRING (0 0, 1 1)'), 0.1)
    assert out[0] == 'MultiPolygon' and len(out[1]) == 1


def test_buffer_zero_unsupported():
    with pytest.raises(NotImplementedError):
        O.buffer_geom(G.wkt_loads('LINESTRING (0 0, 1 1)'), 0.0)


def test_coslat():
    v = O.coslat_factor(G.wkt_loads('POINT (82.9 55.0)'))
    assert abs(v - math.cos(math.radians(55.0))) < 1e-12


def test_transform_unsupported():
    # World Mollweide is a pseudo-cylindrical equal-area projection —
    # outside every closed-form family this engine ships (Mercator/UTM/
    # TM/LCC/sterea/omerc/krovak) and not registrable, so it must raise
    # clearly and name the register_crs escape hatch
    with pytest.raises(NotImplementedError, match='register_crs'):
        O.transform_geom(('Point', (0.0, 0.0)), 4326, 54009)


def test_wkb_reads_postgis_ewkb():
    """EWKB (PostGIS hex output) embeds an SRID after the type word when
    flag 0x20000000 is set; the reader must skip it."""
    import struct
    ewkb = (b'\x01' + struct.pack('<I', 0x20000001)        # Point + SRID flag
            + struct.pack('<I', 4326)                      # embedded SRID
            + struct.pack('<2d', 30.5, 50.25))
    assert G.wkb_loads(ewkb) == ('Point', (30.5, 50.25))
    # nested EWKB inside a multi-geometry
    mp = (b'\x01' + struct.pack('<I', 0x20000004)          # MultiPoint + flag
          + struct.pack('<I', 3857) + struct.pack('<I', 1) + ewkb)
    assert G.wkb_loads(mp) == ('MultiPoint', [(30.5, 50.25)])
