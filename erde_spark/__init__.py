"""erde_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``culebron/erde`` geospatial toolkit,
re-expressed Spark-first.

Design (see SURVEY.md):

* Tables are ``pyspark.sql.DataFrame``; geometry is a WKB ``BinaryType``
  column named ``geometry`` by convention (reference keeps a GeoDataFrame
  geometry column, ``/root/reference/erde/op/buffer.py:41``).
* CRS is carried as column metadata + asserted by the geo operator layer
  (reference: frame-level ``df.crs``, ``/root/reference/erde/op/area.py:34-38``).
* All relational work is the plain DataFrame API so Catalyst gets full
  visibility (pushdown / pruning / broadcast / AQE).
* Geometry math is a pure-numpy kernel (this container has no
  shapely/geopandas) exposed through vectorized pandas UDFs.
"""

from erde_spark.session import get_spark  # noqa: F401
from erde_spark.io import read_df, write_df, read_geom, write_geom  # noqa: F401
from erde_spark.streaming.chunks import read_stream, write_stream  # noqa: F401
from erde_spark.operators.subset import subset  # noqa: F401
from erde_spark.operators.lookup import lookup, crossjoin  # noqa: F401
from erde_spark.operators.sjoin import sjoin, sjfull, sagg, slookup, sfilter, snearest  # noqa: F401
from erde_spark.operators.buffer import buffer  # noqa: F401
from erde_spark.operators.area import area  # noqa: F401
from erde_spark.operators.length import length  # noqa: F401
from erde_spark.operators.convert import convert  # noqa: F401
from erde_spark.operators.asof import asof_join  # noqa: F401
from erde_spark.operators.timeseries import resample_locf  # noqa: F401
from erde_spark.operators.stats import stats  # noqa: F401
from erde_spark.operators.upsert import upsert_latest  # noqa: F401
from erde_spark.operators.zorder import cluster_by_zorder, zorder_value  # noqa: F401
from erde_spark.functions.sqlreg import register_sql_functions  # noqa: F401

__version__ = "0.1.0"
