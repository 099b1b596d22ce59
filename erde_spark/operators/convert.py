"""CRS set/convert operator (reference `/root/reference/erde/op/convert.py:4-16`).

``from_crs`` stamps the CRS (no coordinate change); ``to_crs`` reprojects.
Supported CRS: EPSG:4326, EPSG:3857 (closed-form spherical Mercator),
EPSG:326xx/327xx (WGS84 UTM, Krüger flattening series — sub-mm in zone)
and the ``erde_spark.geo.ops._CRS_TABLE`` registry (generalized
transverse Mercator and Lambert Conformal Conic 2SP with 7-parameter
Helmert datum shift — ships OSGB 27700, Lambert-93 2154, State Plane
26985/32140, ETRS89 UTM 25832; other TM/LCC codes are one-line registry
entries); pairs compose through lon/lat. The reference reprojects
arbitrary pyproj CRS; this container has no pyproj, so other codes raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from erde_spark.functions.geo import st_transform
from erde_spark.geo.crs import get_crs, set_crs


def convert(df: DataFrame, to_crs: int | None = None, from_crs: int | None = None,
            geometry: str = 'geometry') -> DataFrame:
    if from_crs is not None:
        df = set_crs(df, from_crs, geometry)

    if to_crs is not None:
        crs = get_crs(df, geometry)
        if crs is None:
            raise RuntimeError(
                f'Input DataFrame has no CRS, but conversion is requested with to_crs={to_crs}')
        if crs != to_crs:
            df = df.withColumn(geometry, st_transform(df[geometry], crs, to_crs))
        df = set_crs(df, to_crs, geometry)

    return df
