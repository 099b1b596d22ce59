"""Metric buffer operator (reference `/root/reference/erde/op/buffer.py:5-51`).

Replaces the geometry column with its buffer of ``radius`` metres: transform
to EPSG:3857, buffer by ``radius / cos(centroid latitude)``, transform back.

``dissolve=True`` in the reference unions all buffers (`unary_union`).
Without GEOS we support dissolve only as a MultiPolygon *collection* of the
per-row buffers (no boolean union of overlaps) — see ``dissolve`` docstring.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from erde_spark.functions.geo import st_buffer
from erde_spark.geo.crs import require_crs, set_crs


def buffer(df: DataFrame, radius: float, dissolve: bool = False,
           default_crs: int | None = None, resolution: int = 16,
           geometry: str = 'geometry') -> DataFrame:
    crs = require_crs(df, geometry, default_crs)
    out = df.withColumn(geometry, st_buffer(df[geometry], radius, crs=crs,
                                            resolution=resolution))
    out = set_crs(out, crs, geometry)
    if dissolve:
        out = _dissolve(out, geometry)
        out = set_crs(out, crs, geometry)
    return out


def _dissolve(df: DataFrame, geometry: str) -> DataFrame:
    """Union all buffer polygons into one MultiPolygon row (reference
    shapely ``unary_union``, `erde/op/buffer.py:47,51`).

    Overlapping shells genuinely merge: non-overlapping parts pass through
    with their exact vertices; each connected overlap group is re-traced by
    the distance-field union kernel (`erde_spark.geo.field.union_field`,
    resolution-bounded — GEOS-free). Distributed shape: a two-level tree
    aggregation (partial collect per partition, final merge in one task).
    """
    from erde_spark.geo import geom as G
    from erde_spark.geo import ops as O
    from erde_spark.geo.field import union_field

    @F.pandas_udf(T.BinaryType())
    def _merge(wkb_lists: pd.Series) -> pd.Series:
        out = []
        for lst in wkb_lists:
            polys = []
            for v in lst:
                if v is None:
                    continue
                g = G.wkb_loads(bytes(v))
                if g[0] == 'Polygon':
                    polys.append(g[1])
                elif g[0] == 'MultiPolygon':
                    polys.extend(g[1])
                else:
                    raise ValueError(f'dissolve expects polygonal geometries, got {g[0]}')
            # group polygons into connected overlap components (bbox
            # prefilter + exact intersects); singletons keep exact vertices
            n = len(polys)
            parent = list(range(n))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            bbs = [O.geom_bounds(('Polygon', p)) for p in polys]
            order = sorted(range(n), key=lambda i: bbs[i][0])
            for oi, i in enumerate(order):  # x-sweep: only x-overlapping pairs
                for j in order[oi + 1:]:
                    a, b = bbs[i], bbs[j]
                    if b[0] > a[2]:
                        break
                    if find(i) == find(j) or a[1] > b[3] or b[1] > a[3]:
                        continue
                    if O.intersects(('Polygon', polys[i]), ('Polygon', polys[j])):
                        parent[find(i)] = find(j)
            groups: dict = {}
            for i in range(n):
                groups.setdefault(find(i), []).append(polys[i])
            merged = []
            for grp in groups.values():
                if len(grp) == 1:
                    merged.append(grp[0])
                else:
                    merged.extend(union_field([('Polygon', p) for p in grp])[1])
            out.append(G.wkb_dumps(('MultiPolygon', merged)))
        return pd.Series(out)

    return (df.agg(F.collect_list(F.col(geometry)).alias('__gs'))
              .select(_merge(F.col('__gs')).alias(geometry)))
