"""Metric area operator (reference `/root/reference/erde/op/area.py:10-45`).

Adds ``column_name`` with the geometry's area in m² (3857 planar area ×
cos²(centroid latitude)), or raw CRS units with ``skip_transform``.
``nullify_irrelevant`` sets NaN for non-(Multi)Polygon rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from erde_spark.functions.geo import st_area, st_metric_area
from erde_spark.geo.crs import require_crs, set_crs


def area(df: DataFrame, column_name: str = 'area', skip_transform: bool = False,
         nullify_irrelevant: bool = False, default_crs: int | None = None,
         geometry: str = 'geometry') -> DataFrame:
    if skip_transform:
        return df.withColumn(column_name,
                             st_area(df[geometry], nullify_irrelevant=nullify_irrelevant))
    crs = require_crs(df, geometry, default_crs)
    out = df.withColumn(column_name, st_metric_area(df[geometry], crs=crs,
                                                    nullify_irrelevant=nullify_irrelevant))
    return set_crs(out, crs, geometry)
