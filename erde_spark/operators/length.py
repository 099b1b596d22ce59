"""Metric length operator (reference `/root/reference/erde/op/length.py:10-45`).

Adds ``column_name`` with the geometry's length in metres (3857 planar
length × cos(centroid latitude)), or raw CRS units with ``skip_transform``.
``nullify_irrelevant`` sets NaN for non-(Multi)LineString rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from erde_spark.functions.geo import st_length, st_metric_length
from erde_spark.geo.crs import require_crs, set_crs


def length(df: DataFrame, column_name: str = 'length', skip_transform: bool = False,
           nullify_irrelevant: bool = False, default_crs: int | None = None,
           geometry: str = 'geometry') -> DataFrame:
    if skip_transform:
        return df.withColumn(column_name,
                             st_length(df[geometry], nullify_irrelevant=nullify_irrelevant))
    crs = require_crs(df, geometry, default_crs)
    out = df.withColumn(column_name, st_metric_length(df[geometry], crs=crs,
                                                      nullify_irrelevant=nullify_irrelevant))
    return set_crs(out, crs, geometry)
