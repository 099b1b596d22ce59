"""CRS set/convert operator (reference `/root/reference/erde/op/convert.py:4-16`).

``from_crs`` stamps the CRS (no coordinate change); ``to_crs`` reprojects.
Supported CRS: EPSG:4326, EPSG:3857 (closed-form spherical Mercator),
EPSG:326xx/327xx (WGS84 UTM, Krüger flattening series — sub-mm in zone)
and the ``erde_spark.geo.ops._CRS_TABLE`` registry (~170 codes) —
generalized transverse Mercator (incl. the bulk-loaded zoned grids:
ETRS89/NAD83/NAD27/ED50 UTM, GDA MGA, SIRGAS UTM, Pulkovo
Gauss-Krüger, POSGAR fajas), Lambert Conformal Conic 2SP, oblique
stereographic (Amersfoort 28992), Hotine oblique Mercator (Swiss
LV95/LV03, Hungarian EOV), Krovak (S-JTSK 5514), Albers and LAEA, all
with 7-parameter Helmert datum shift; pairs compose through lon/lat. Unlisted EPSG codes on those projection
methods need NO code change: pass a projection parameter dict as the
CRS (optionally carrying an ``'epsg'`` key, which also registers it for
the session), or call ``erde_spark.geo.ops.register_crs`` up front —
the reference's accept-any-pyproj-CRS contract, bounded by the methods
this engine ships closed-form math for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from erde_spark.functions.geo import st_transform
from erde_spark.geo.crs import get_crs, set_crs


def _crs_code(crs) -> int:
    """Metadata code for a CRS argument: the int itself, a dict's
    ``'epsg'`` key, or 0 for an anonymous parameter dict."""
    if isinstance(crs, dict):
        return int(crs.get('epsg', 0))
    return int(crs)


def convert(df: DataFrame, to_crs=None, from_crs=None,
            geometry: str = 'geometry') -> DataFrame:
    from erde_spark.geo.ops import _CRS_TABLE, register_crs
    for c in (to_crs, from_crs):
        if isinstance(c, dict) and 'epsg' in c and c['epsg'] not in _CRS_TABLE:
            register_crs(c['epsg'], {k: v for k, v in c.items()
                                     if k != 'epsg'})
    if from_crs is not None:
        df = set_crs(df, _crs_code(from_crs), geometry)
        src = from_crs
    else:
        src = None

    if to_crs is not None:
        crs = get_crs(df, geometry)
        if crs is None:
            raise RuntimeError(
                f'Input DataFrame has no CRS, but conversion is requested with to_crs={to_crs}')
        # an explicit from_crs dict keeps its parameters for the
        # transform; metadata only carries the int code
        src = src if isinstance(src, dict) else crs
        # same known code on both sides = no-op; an anonymous dict
        # (code 0) always transforms since its identity is unknown
        if _crs_code(src) != _crs_code(to_crs) or _crs_code(to_crs) == 0:
            df = df.withColumn(geometry, st_transform(df[geometry], src, to_crs))
        df = set_crs(df, _crs_code(to_crs), geometry)

    return df
