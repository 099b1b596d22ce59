"""Distributed OSRM routing: one ``/route/v1`` request per input row.

Semantics follow the reference's ``route`` operator
(`/root/reference/erde/op/route.py:46-132`): the input geometry is a
LineString of waypoints; the output has one row per returned alternative
with ``alternative`` (1-based), ``duration`` (s), ``distance`` (m), the
route ``geometry`` (decoded polyline; the input line when overview is
off), and ``nodes`` (OSM node ids, de-duplicated across legs) when
requested. All other input columns pass through.

Physical shape: ``mapInPandas`` — each task streams its partition and
issues HTTP requests with a per-executor connection pool. The reference's
ThreadPoolExecutor(10) becomes Spark task parallelism; ``repartition`` the
input to control request concurrency against the OSRM server.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from erde_spark.routing import polyline as PL
from erde_spark.routing.client import get_retry, resolve_router

ANNOTATIONS = 'duration,distance'


def raw_route(coords_lonlat, host: str, retries: int = 10, **params) -> dict:
    """Single OSRM /route/v1 request for a waypoint list; returns parsed
    JSON (reference ``raw_route``, `erde/op/route.py:9-43`)."""
    q = {
        'overview': 'simplified', 'alternatives': 'false', 'steps': 'false',
        'geometries': 'polyline', 'annotations': 'false',
        'generate_hints': 'false', **params,
    }
    coordinates = ';'.join(f'{x},{y}' for x, y in coords_lonlat)
    url = f'{host}/route/v1/driving/{coordinates}'
    return get_retry(url, q, retries).json()


def _dedup_leg_nodes(legs) -> list:
    """Concatenate per-leg node lists, dropping the duplicated edge at leg
    boundaries (OSRM repeats the shared edge when a waypoint projects onto
    a node — reference `erde/op/route.py:96-103`)."""
    nds: list = []
    for leg in legs:
        n = leg['annotation']['nodes']
        nds.extend(n[2:] if n[:2] == nds[-2:] else n)
    return nds


def route_df(df: DataFrame, mode: str, overview: str = 'full',
             annotations: str = ANNOTATIONS, alternatives: int = 1,
             retries: int = 10, geometry: str = 'geometry', **params) -> DataFrame:
    """Route every row's waypoint LineString; explode alternatives."""
    from erde_spark.geo import geom as G

    host = resolve_router(mode)
    want_nodes = overview == 'full' and 'nodes' in annotations
    passthrough = [f for f in df.schema.fields if f.name != geometry]
    out_fields = list(passthrough) + [
        T.StructField('alternative', T.IntegerType()),
        T.StructField('duration', T.DoubleType()),
        T.StructField('distance', T.DoubleType()),
        T.StructField('geometry', T.BinaryType()),
    ]
    if want_nodes:
        out_fields.append(T.StructField('nodes', T.ArrayType(T.LongType())))
    out_schema = T.StructType(out_fields)
    pass_names = [f.name for f in passthrough]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():  # row count == HTTP count; not hot
                line = G.wkb_loads(bytes(r[geometry]))
                if line[0] != 'LineString':
                    raise ValueError(f'route input must be LineString, got {line[0]}')
                data = raw_route(line[1], host, retries=retries, overview=overview,
                                 annotations=annotations,
                                 alternatives=str(alternatives).lower(), **params)
                for alt, route in enumerate(data.get('routes', [])[:alternatives], start=1):
                    if overview in (False, 'false', 'False', 'no'):
                        geom = G.wkb_dumps(line)
                    else:
                        pts = [(lon, lat) for lat, lon in PL.decode(route['geometry'])]
                        geom = G.wkb_dumps(('LineString', pts))
                    row = {c: r[c] for c in pass_names}
                    row.update(alternative=alt, duration=float(route['duration']),
                               distance=float(route['distance']), geometry=geom)
                    if want_nodes:
                        row['nodes'] = _dedup_leg_nodes(route['legs'])
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return df.mapInPandas(_kernel, schema=out_schema)
