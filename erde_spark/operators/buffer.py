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
    """Collect all buffer polygons into one MultiPolygon row.

    Reference uses shapely ``unary_union`` which also merges overlapping
    polygons; true boolean union needs GEOS (absent here), so overlapping
    shells are kept as-is inside the MultiPolygon. Distributed shape: a
    two-level tree aggregation (partial collect per partition, final merge),
    valid because the merge is concatenation.
    """
    from erde_spark.geo import geom as G

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
            out.append(G.wkb_dumps(('MultiPolygon', polys)))
        return pd.Series(out)

    return (df.agg(F.collect_list(F.col(geometry)).alias('__gs'))
              .select(_merge(F.col('__gs')).alias(geometry)))
