"""Determinism pins for the construction-oracled routing gates.

The gates in __spark_entry__.py (routing_route_check / od_table_check /
isochrone_grid_check) FLOOR-quantize the mock OSRM's straight-line
metrics and have DuckDB replay the same arithmetic. The driver's value
compare is bit-exact, so this file proves — exhaustively over the fixed
key domain, not statistically — that

1. every quantized value sits far (>= 0.01) from a floor boundary, so
   the Python-mock round(x, 3) vs DuckDB unrounded FLOOR can never
   disagree (a disagreement needs the value within 5e-4 of an integer);
2. the DuckDB expression replays the Python mock arithmetic
   (tests/osrm_mock.py `_dist`, including the polyline precision-5
   quantization on the /table path) bit-identically for every key.

Key domain: c_custkey is a contiguous range from 0 at every SF, so
checking 0..40 covers every key any SF's gate can select.
"""

import math

import duckdb
import pytest

M_PER_DEG = 111319.49079327358


def _pl_quant(x: float) -> float:
    """Polyline precision-5 round-trip (tests/osrm_mock.py decodes the
    /table point list from a polyline; 2-decimal inputs are exact)."""
    return round(x * 1e5) / 1e5


class TestRouteCheckArithmetic:
    def _mock_values(self):
        rows = []
        for k in range(0, 41):
            lon = 30.0 + (k % 100) / 10.0
            x2 = lon + (1 + k % 7) / 100.0
            # the kernel formats coords with str() into the URL; the
            # mock parses them back — exact double round-trip
            a0, b0 = float(str(lon)), float(str(x2))
            dist = math.hypot(b0 - a0, 0.0) * M_PER_DEG
            for alt, factor in ((1, 1.0), (2, 1.5)):
                dur = round(dist * factor / 10.0, 3)
                dst = round(dist * factor, 3)
                rows.append((k, alt, dur, dst))
        return rows

    def test_floor_margin(self):
        for k, alt, dur, dst in self._mock_values():
            for v in (dur, dst):
                frac = v - math.floor(v)
                assert min(frac, 1 - frac) >= 0.01, (k, alt, v)

    def test_duckdb_replay_bit_exact(self):
        expected = sorted((k, alt, math.floor(dur), math.floor(dst))
                          for k, alt, dur, dst in self._mock_values())
        got = duckdb.connect().execute("""
            WITH ks AS (SELECT UNNEST(RANGE(0, 41)) AS k),
            alts AS (SELECT 1 AS alternative, 1.0 AS factor
                     UNION ALL SELECT 2, 1.5)
            SELECT k, alternative,
              CAST(FLOOR(((30.0 + (k % 100)/10.0 + (1 + k % 7)/100.0)
                          - (30.0 + (k % 100)/10.0))
                         * 111319.49079327358 * factor / 10.0) AS BIGINT),
              CAST(FLOOR(((30.0 + (k % 100)/10.0 + (1 + k % 7)/100.0)
                          - (30.0 + (k % 100)/10.0))
                         * 111319.49079327358 * factor) AS BIGINT)
            FROM ks CROSS JOIN alts ORDER BY k, alternative
        """).fetchall()
        assert [tuple(r) for r in got] == expected


class TestOdTableCheckArithmetic:
    def _mock_values(self):
        rows = []
        for s in range(0, 13):
            for d in range(0, 9):
                sx = _pl_quant(30.0 + (s % 5) / 100.0)
                dx = _pl_quant(30.5 + (d % 3) / 100.0)
                dist = math.hypot(dx - sx, 0.0) * M_PER_DEG
                rows.append((s, d, round(dist / 10.0, 3), round(dist, 3)))
        return rows

    def test_polyline_quantization_is_exact(self):
        # 2-decimal longitudes survive precision-5 encoding bit-exactly,
        # so the mock's decoded points equal the gate's WKB points
        for k in range(0, 13):
            for base in (30.0, 30.5):
                x = base + (k % 5) / 100.0
                assert _pl_quant(x) == x

    def test_floor_margin(self):
        for s, d, dur, dst in self._mock_values():
            for v in (dur, dst):
                frac = v - math.floor(v)
                assert min(frac, 1 - frac) >= 0.01, (s, d, v)

    def test_duckdb_replay_bit_exact(self):
        expected = sorted((s, d, math.floor(dur), math.floor(dst))
                          for s, d, dur, dst in self._mock_values())
        got = duckdb.connect().execute("""
            WITH s AS (SELECT UNNEST(RANGE(0, 13)) AS sk),
                 d AS (SELECT UNNEST(RANGE(0, 9)) AS dk)
            SELECT sk, dk,
              CAST(FLOOR(ABS((30.5 + (dk % 3)/100.0)
                             - (30.0 + (sk % 5)/100.0))
                         * 111319.49079327358 / 10.0) AS BIGINT),
              CAST(FLOOR(ABS((30.5 + (dk % 3)/100.0)
                             - (30.0 + (sk % 5)/100.0))
                         * 111319.49079327358) AS BIGINT)
            FROM s CROSS JOIN d ORDER BY sk, dk
        """).fetchall()
        assert [tuple(r) for r in got] == expected


@pytest.mark.usefixtures('spark')
class TestIsochroneGateGeometry:
    def test_disk_radius_formula(self):
        # the gate's analytic disk: mock duration = dist/10, constant
        # 5 m snaps penalized at 2.5 km/h walking speed
        for lv in (3.0, 6.0):
            radius = 10.0 * (lv * 60.0 - (5.0 + 5.0) / 2.5 * 3.6)
            assert radius > 0
        assert 10.0 * (3.0 * 60.0 - 14.4) == pytest.approx(1656.0)
        assert 10.0 * (6.0 * 60.0 - 14.4) == pytest.approx(3456.0)

    def test_gate_end_to_end(self, spark):
        # the full gate at the smallest SF: exact coverage + all checks
        import __spark_entry__ as entry
        pdf = entry.q_isochrone_grid_check(
            spark, '/root/testdata/sf0.001').toPandas()
        assert sorted(zip(pdf['sid'], pdf['duration'])) == [
            (s, lv) for s in (0, 1, 2, 3) for lv in (3.0, 6.0)]
        assert (pdf['geom_type'] == 'MultiPolygon').all()
        assert pdf['origin_inside'].all()
        assert pdf['area_ok'].all()
