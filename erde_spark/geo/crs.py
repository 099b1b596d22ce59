"""CRS propagation.

The reference keeps CRS as frame-level state (``gdf.crs``) and fails fast
when it's missing (`/root/reference/erde/op/area.py:34-38`). Spark has no
frame-level state, so we tag the geometry column's ``StructField.metadata``
with ``{'crs': <epsg int>}`` and re-assert it after transformations
(SURVEY.md §4.2.3). Column metadata survives select/filter/join of the
same column object; operators in this package always re-stamp their output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def set_crs(df: DataFrame, crs: int, column: str = 'geometry') -> DataFrame:
    meta = dict(_field_meta(df, column))
    meta['crs'] = int(crs)
    return df.withMetadata(column, meta)


def get_crs(df: DataFrame, column: str = 'geometry') -> int | None:
    meta = _field_meta(df, column)
    crs = meta.get('crs')
    return int(crs) if crs is not None else None


def set_covering(df: DataFrame, bbox_col: str | None,
                 column: str = 'geometry') -> DataFrame:
    """Record that ``bbox_col`` is the GeoParquet 1.1 bbox covering of
    ``column`` (a struct<xmin,ymin,xmax,ymax> column that exists in the
    scan, so range predicates on it push down to parquet row-group
    stats). None is a no-op — callers can pass the parsed footer value
    straight through."""
    if bbox_col is None:
        return df
    meta = dict(_field_meta(df, column))
    meta['covering_bbox'] = str(bbox_col)
    return df.withMetadata(column, meta)


def get_covering(df: DataFrame, column: str = 'geometry') -> str | None:
    """The bbox covering column recorded by :func:`set_covering`, if it
    still exists in the DataFrame (a select that dropped it makes the
    stamp stale — return None rather than a dangling name)."""
    try:
        cov = _field_meta(df, column).get('covering_bbox')
    except KeyError:
        return None
    return cov if cov is not None and cov in df.columns else None


def require_crs(df: DataFrame, column: str = 'geometry', default_crs: int | None = None) -> int:
    """Fail-fast CRS resolution, mirroring the reference's error contract."""
    crs = get_crs(df, column)
    if crs is None:
        if default_crs is None:
            raise ValueError(
                f'Input data has no CRS on column {column!r}. Set it with set_crs(), '
                'or provide default_crs, or use skip_transform where supported.')
        return int(default_crs)
    return crs


def _field_meta(df: DataFrame, column: str) -> dict:
    for f in df.schema.fields:
        if f.name == column:
            return f.metadata or {}
    raise KeyError(f'column {column!r} not found (columns: {df.columns})')
