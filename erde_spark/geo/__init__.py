"""Pure-Python/numpy geometry kernel.

The container has no shapely/GEOS, so this package implements the subset of
computational geometry the reference uses (see SURVEY.md §2.6): WKT/WKB
codecs, shoelace area, length, centroid, bounds, intersects/within/contains
predicates, point buffers, and the closed-form EPSG:4326↔3857 transform.

Geometries are lightweight tagged tuples (see ``geom.py``); DataFrames carry
them as WKB ``BinaryType`` columns. All heavy use goes through vectorized
pandas UDFs (Arrow batches), never row-at-a-time Python UDFs.
"""

from erde_spark.geo.geom import (  # noqa: F401
    Geometry, wkt_loads, wkt_dumps, wkb_loads, wkb_dumps,
)
from erde_spark.geo.ops import (  # noqa: F401
    geom_area, geom_length, geom_centroid, geom_bounds, geom_type_of,
    intersects, within, contains, point_buffer, buffer_geom,
    mercator_fwd, mercator_inv, transform_geom, coslat_factor,
)
