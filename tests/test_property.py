"""Property-based tests (hypothesis) for the pure-Python kernels:
WKB/WKT codecs, polyline codec, Mercator inversion, marching-squares
invariants. These run without Spark."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from erde_spark.geo import geom as G
from erde_spark.geo import ops as O

coord = st.tuples(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False, width=64),
    st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64))


def ring(min_size=4):
    return st.lists(coord, min_size=min_size, max_size=8).map(
        lambda pts: pts + [pts[0]])


geometry = st.one_of(
    coord.map(lambda c: ('Point', c)),
    st.lists(coord, min_size=2, max_size=10).map(lambda c: ('LineString', c)),
    ring().map(lambda r: ('Polygon', [r])),
    st.lists(coord, min_size=1, max_size=6).map(lambda c: ('MultiPoint', c)),
    st.lists(ring(), min_size=1, max_size=3).map(
        lambda rs: ('MultiPolygon', [[r] for r in rs])),
)


@given(geometry)
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip(geom):
    assert G.wkb_loads(G.wkb_dumps(geom)) == geom


@given(geometry)
@settings(max_examples=200, deadline=None)
def test_wkt_roundtrip(geom):
    back = G.wkt_loads(G.wkt_dumps(geom))
    assert back[0] == geom[0]

    def flat(g):
        return [c for c in O._iter_coords(g)]
    for (x1, y1), (x2, y2) in zip(flat(geom), flat(back)):
        assert math.isclose(x1, x2, rel_tol=0, abs_tol=1e-12) or x1 == x2
        assert math.isclose(y1, y2, rel_tol=0, abs_tol=1e-12) or y1 == y2


@given(coord)
@settings(max_examples=300, deadline=None)
def test_mercator_inverse(c):
    lon, lat = c
    x, y = O.mercator_fwd(lon, lat)
    lon2, lat2 = O.mercator_inv(x, y)
    assert math.isclose(lon, lon2, abs_tol=1e-9)
    assert math.isclose(lat, lat2, abs_tol=1e-9)


utm_coord = st.tuples(
    st.floats(min_value=9.01, max_value=20.99, allow_nan=False, width=64),
    st.floats(min_value=-80.0, max_value=84.0, allow_nan=False, width=64))


@given(utm_coord)
@settings(max_examples=300, deadline=None)
def test_utm_roundtrip_zone33(c):
    """4326 -> EPSG:32633 -> 4326 inside the zone (±1 neighbour) at
    < 1e-6 deg — the reference `convert` contract for UTM CRS."""
    lon, lat = c
    crs = 32633 if lat >= 0 else 32733
    g = O.transform_geom(('Point', (lon, lat)), 4326, crs)
    lon2, lat2 = O.transform_geom(g, crs, 4326)[1]
    assert math.isclose(lon, lon2, abs_tol=1e-6)
    assert math.isclose(lat, lat2, abs_tol=1e-6)


def test_utm_known_values():
    """Zone-center exactness + cross-zone composition via lon/lat."""
    e, n = O.transform_geom(('Point', (15.0, 0.0)), 4326, 32633)[1]
    assert math.isclose(e, 500000.0, abs_tol=1e-6)
    assert math.isclose(n, 0.0, abs_tol=1e-6)
    # south-zone false northing
    _, ns = O.transform_geom(('Point', (15.0, 0.0)), 4326, 32733)[1]
    assert math.isclose(ns, 10000000.0, abs_tol=1e-6)
    # 3857 -> UTM composes through 4326
    g = O.transform_geom(('Point', (15.0, 50.0)), 4326, 3857)
    e2, n2 = O.transform_geom(g, 3857, 32633)[1]
    assert math.isclose(e2, 500000.0, abs_tol=1e-5)


@given(st.lists(st.tuples(
    st.floats(min_value=-85, max_value=85, allow_nan=False),
    st.floats(min_value=-179, max_value=179, allow_nan=False)),
    min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_polyline_roundtrip(coords):
    from erde_spark.routing.polyline import decode, encode
    back = decode(encode(coords))
    assert len(back) == len(coords)
    for (a1, b1), (a2, b2) in zip(coords, back):
        # codec precision is 1e-5 plus cumulative delta rounding
        assert abs(a1 - a2) < 1e-4 and abs(b1 - b2) < 1e-4


@given(st.lists(st.sampled_from('abcdef'), min_size=1, max_size=6),
       st.lists(st.sampled_from('abcdef'), min_size=0, max_size=3))
@settings(max_examples=100, deadline=None)
def test_subset_spec_parse_never_crashes_on_valid(keep, drop):
    from erde_spark.operators.subset import parse_spec
    spec = ', '.join(list(dict.fromkeys(keep)) + [f'-{d}' for d in dict.fromkeys(drop)])
    pairs = parse_spec(spec)
    assert len(pairs) == len(dict.fromkeys(keep)) + len(dict.fromkeys(drop))


@given(st.floats(min_value=0.1, max_value=1000), st.floats(min_value=-80, max_value=80))
@settings(max_examples=100, deadline=None)
def test_point_buffer_area_converges(radius, lat):
    """64-gon area must be within 0.2% of the true circle area."""
    poly = O.point_buffer(0.0, lat, radius)
    assert abs(O.geom_area(poly) - math.pi * radius * radius) / \
        (math.pi * radius * radius) < 0.002


@given(st.lists(st.floats(min_value=0.1, max_value=10, allow_nan=False),
                min_size=5, max_size=12),
       st.floats(min_value=-0.3, max_value=0.3, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_centroid_inside_bbox(radii, jitter):
    """Star-shaped rings (angular gaps < pi -> simple): centroid must fall
    in the bbox. (Self-intersecting rings have undefined centroids — GEOS
    too; an angular gap > pi lets a chord cross other sectors.)"""
    n = len(radii)
    r = [(rad * math.cos(2 * math.pi * i / n + jitter),
          rad * math.sin(2 * math.pi * i / n + jitter))
         for i, rad in enumerate(radii)]
    r.append(r[0])
    cx, cy = O.geom_centroid(('Polygon', [r]))
    x1, y1, x2, y2 = O.geom_bounds(('Polygon', [r]))
    assert x1 - 1e-6 <= cx <= x2 + 1e-6
    assert y1 - 1e-6 <= cy <= y2 + 1e-6


@given(geometry, geometry)
@settings(max_examples=150, deadline=None)
def test_geom_distance_symmetric_nonnegative(a, b):
    d1 = O.geom_distance(a, b)
    d2 = O.geom_distance(b, a)
    assert d1 >= 0.0
    assert math.isclose(d1, d2, rel_tol=1e-12, abs_tol=1e-12)
    if O.intersects(a, b):
        assert d1 == 0.0


@given(geometry)
@settings(max_examples=100, deadline=None)
def test_geom_distance_self_is_zero(geom):
    assert O.geom_distance(geom, geom) == 0.0


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                max_size=60))
@settings(max_examples=200, deadline=None)
def test_union_find_min_matches_bruteforce(edges):
    """_union_find_min must map every node in a merge set to the set's
    global minimum — cross-checked against a brute-force closure."""
    from erde_spark.scale.dedup import _union_find_min
    remap = _union_find_min(edges)
    # brute force: adjacency closure
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x])
        seen |= comp
        m = min(comp)
        for x in comp:
            if x != m:
                assert remap.get(x) == m, (x, m, remap)
            else:
                assert x not in remap
